"""Host-side report generation: training-curve plots, confusion-matrix /
ROC / PRC figures, spreadsheet export.

Reference: utils/helper_functions.py:63-228 (plot_history, plot_conf_mat,
plot_multiclass_roc, plot_multiclass_precision_recall_curves) and
Test.py:280-299 (xlsx export).  openpyxl is not available in this image,
so the spreadsheet export falls back to CSV next to the requested path.
"""
from __future__ import annotations

import os
import typing as tp

import numpy as np

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def plot_history(history: tp.Dict[str, tp.Sequence[float]], save_path: str,
                 metric_name: tp.Optional[str] = None) -> str:
    """Loss (+ one metric) training curves -> PNG
    (helper_functions.py:63-101)."""
    fig, axes = plt.subplots(1, 2 if metric_name else 1,
                             figsize=(12 if metric_name else 6, 4))
    axes = np.atleast_1d(axes)
    ax = axes[0]
    ax.plot(history.get("loss", []), label="train")
    if "val_loss" in history:
        ax.plot(history["val_loss"], label="val")
    ax.set_title("Loss")
    ax.set_xlabel("Epoch")
    ax.legend()
    if metric_name:
        ax = axes[1]
        ax.plot(history.get(metric_name, []), label="train")
        if f"val_{metric_name}" in history:
            ax.plot(history[f"val_{metric_name}"], label="val")
        ax.set_title(metric_name)
        ax.set_xlabel("Epoch")
        ax.legend()
    fig.tight_layout()
    fig.savefig(save_path, dpi=150)
    plt.close(fig)
    return save_path


def plot_conf_mat(cm: np.ndarray, labels: tp.Sequence[str],
                  save_path: str) -> str:
    """Confusion-matrix heatmap (helper_functions.py:104-116)."""
    try:
        import seaborn as sns
        fig, ax = plt.subplots(figsize=(6, 5))
        sns.heatmap(np.asarray(cm), annot=True, fmt=".0f", cmap="Blues",
                    xticklabels=labels, yticklabels=labels, ax=ax)
    except ImportError:
        fig, ax = plt.subplots(figsize=(6, 5))
        ax.imshow(np.asarray(cm), cmap="Blues")
    ax.set_xlabel("Predicted Class")
    ax.set_ylabel("True Class")
    fig.tight_layout()
    fig.savefig(save_path, dpi=150)
    plt.close(fig)
    return save_path


def _roc_curve(y_true: np.ndarray, y_score: np.ndarray):
    order = np.argsort(-y_score)
    y = y_true[order]
    tps = np.cumsum(y)
    fps = np.cumsum(1 - y)
    tpr = tps / max(tps[-1], 1)
    fpr = fps / max(fps[-1], 1)
    return np.r_[0.0, fpr], np.r_[0.0, tpr]


def plot_multiclass_roc(y_true: np.ndarray, y_pred: np.ndarray,
                        num_classes: int, save_path: str,
                        y_score: tp.Optional[np.ndarray] = None) -> str:
    """Per-class + micro-average ROC (helper_functions.py:119-169).

    Default scores the curve from the HARD labels ``y_pred`` — degenerate
    two-point curves, faithfully matching the reference (Test.py:226-228
    feeds binarized int8 predictions into roc_curve).  Pass ``y_score``
    (N, num_classes) per-class probabilities for real threshold-swept
    curves (drivers.test INI key ``roc_from_scores``)."""
    fig, ax = plt.subplots(figsize=(6, 5))
    for c in range(num_classes):
        t = (np.asarray(y_true).ravel() == c).astype(np.float64)
        s = (np.asarray(y_score[:, c]).astype(np.float64)
             if y_score is not None
             else (np.asarray(y_pred).ravel() == c).astype(np.float64))
        if t.sum() == 0:
            continue
        fpr, tpr = _roc_curve(t, s)
        auc = float(np.trapezoid(tpr, fpr))
        ax.plot(fpr, tpr, label=f"class {c} (AUC={auc:.3f})")
    ax.plot([0, 1], [0, 1], "k--", lw=0.5)
    ax.set_xlabel("False Positive Rate")
    ax.set_ylabel("True Positive Rate")
    ax.legend()
    fig.tight_layout()
    fig.savefig(save_path, dpi=150)
    plt.close(fig)
    return save_path


def plot_multiclass_precision_recall_curves(
        y_true: np.ndarray, y_pred: np.ndarray, num_classes: int,
        save_path: str, y_score: tp.Optional[np.ndarray] = None) -> str:
    """Per-class PRC (helper_functions.py:172-228).  ``y_score`` as in
    ``plot_multiclass_roc``: real probability-swept curves instead of the
    reference-faithful hard-label ones."""
    fig, ax = plt.subplots(figsize=(6, 5))
    for c in range(num_classes):
        t = (np.asarray(y_true).ravel() == c).astype(np.float64)
        s = (np.asarray(y_score[:, c]).astype(np.float64)
             if y_score is not None
             else (np.asarray(y_pred).ravel() == c).astype(np.float64))
        if t.sum() == 0:
            continue
        order = np.argsort(-s)
        y = t[order]
        tps = np.cumsum(y)
        precision = tps / np.arange(1, len(y) + 1)
        recall = tps / max(t.sum(), 1)
        ax.plot(recall, precision, label=f"class {c}")
    ax.set_xlabel("Recall")
    ax.set_ylabel("Precision")
    ax.legend()
    fig.tight_layout()
    fig.savefig(save_path, dpi=150)
    plt.close(fig)
    return save_path


def export_results_sheet(report: tp.Dict[str, tp.Any], save_path: str
                         ) -> str:
    """Evaluation-table + confusion-matrix export (Test.py:280-299).
    Writes .xlsx when openpyxl is available, otherwise CSVs."""
    import pandas as pd
    labels_wa = report["labels"] + ["Weighted Average"]
    rows = np.vstack([report["per_class"], report["weighted_average"]])
    eval_table = pd.DataFrame(rows, index=labels_wa,
                              columns=report["headers"])
    cm_table = pd.DataFrame(report["confusion_matrix"],
                            index=report["labels"],
                            columns=report["labels"])
    try:
        with pd.ExcelWriter(save_path, engine="openpyxl") as writer:
            eval_table.to_excel(writer, "Results", startcol=1, startrow=1)
            cm_table.to_excel(writer, "Results", startcol=11, startrow=2)
        return save_path
    except (ImportError, ModuleNotFoundError):
        base = os.path.splitext(save_path)[0]
        eval_table.to_csv(base + "_results.csv")
        cm_table.to_csv(base + "_confusion_matrix.csv")
        return base + "_results.csv"


def plot_prediction_distributions(y_true, y_pred, save_path: str) -> str:
    """GT-vs-prediction distribution plots (KDE + violin), the 2D
    notebook's qualitative checks (2D_Segmentation_TF.ipynb cells 72-74)."""
    t = np.asarray(y_true).ravel()
    p = np.asarray(y_pred).ravel()
    fig, axes = plt.subplots(1, 2, figsize=(10, 4))
    try:
        import seaborn as sns
        sns.kdeplot(t, ax=axes[0], label="ground truth", fill=True)
        sns.kdeplot(p, ax=axes[0], label="prediction", fill=True)
        sns.violinplot(data=[t, p], ax=axes[1])
        axes[1].set_xticks([0, 1], ["ground truth", "prediction"])
    except ImportError:
        axes[0].hist(t, bins=50, alpha=0.5, label="ground truth",
                     density=True)
        axes[0].hist(p, bins=50, alpha=0.5, label="prediction",
                     density=True)
        axes[1].violinplot([t, p])
    axes[0].legend()
    axes[0].set_title("Value distribution")
    axes[1].set_title("Violin")
    fig.tight_layout()
    fig.savefig(save_path, dpi=150)
    plt.close(fig)
    return save_path


def plot_sample_grid(images, masks, preds, save_path: str,
                     max_samples: int = 4) -> str:
    """image / ground-truth / prediction sample grid (notebook cells
    77-78)."""
    n = min(len(images), max_samples)
    fig, axes = plt.subplots(n, 3, figsize=(9, 3 * n), squeeze=False)
    for i in range(n):
        img = np.asarray(images[i])
        axes[i][0].imshow(img.squeeze(), cmap="gray" if img.shape[-1] == 1
                          else None)
        axes[i][0].set_title("image")
        axes[i][1].imshow(np.asarray(masks[i]).squeeze(), cmap="viridis")
        axes[i][1].set_title("ground truth")
        axes[i][2].imshow(np.asarray(preds[i]).squeeze(), cmap="viridis")
        axes[i][2].set_title("prediction")
        for ax in axes[i]:
            ax.axis("off")
    fig.tight_layout()
    fig.savefig(save_path, dpi=150)
    plt.close(fig)
    return save_path
