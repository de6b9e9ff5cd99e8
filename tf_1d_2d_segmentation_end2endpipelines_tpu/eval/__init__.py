"""Evaluation: confusion-matrix metrics, NILM 1D metrics, reports."""

from .nilm import (  # noqa: F401
    calculate_deoi,
    calculate_ea,
    calculate_jeoi,
    calculate_sae,
    construction_error,
)
from .reports import (  # noqa: F401
    export_results_sheet,
    plot_prediction_distributions,
    plot_sample_grid,
    plot_conf_mat,
    plot_history,
    plot_multiclass_precision_recall_curves,
    plot_multiclass_roc,
)
from .tta import (  # noqa: F401
    make_tta_fn,
    parse_tta,
)
from .segmetrics import (  # noqa: F401
    confusion_matrix_update,
    dice,
    evaluation_table,
    init_confusion_matrix,
    label_from_pred,
    one_hot_encoding,
    per_class_binary_counts,
    reverse_one_hot_encoding,
)
