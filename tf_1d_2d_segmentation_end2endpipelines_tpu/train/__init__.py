"""Training runtime: losses, metrics, optimizers, pjit steps, trainer."""

from .callbacks import (  # noqa: F401
    BestTracker,
    EarlyStopping,
    LearningRateScheduler,
    NaNGuard,
    ReduceLROnPlateau,
    cosine_decay,
    exponential_decay,
)
from .checkpoint import CheckpointManager  # noqa: F401
from .losses import (  # noqa: F401
    LOSSES,
    deep_supervision_loss,
    default_ds_weights,
    get_loss,
)
from .metrics import METRIC_NAMES, Metric, make_metric  # noqa: F401
from .optimizers import (  # noqa: F401
    OPTIMIZER_NAMES,
    get_learning_rate,
    make_optimizer,
    set_learning_rate,
)
from .state import (  # noqa: F401
    TrainState,
    create_train_state,
    make_eval_step,
    make_predict_step,
    make_train_step,
)
from .trainer import Trainer  # noqa: F401
