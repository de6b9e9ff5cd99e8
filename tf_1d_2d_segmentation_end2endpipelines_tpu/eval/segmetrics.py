"""Segmentation evaluation metrics (reference: 2DCNN/Test.py:187-299).

The reference accumulates sklearn confusion matrices per batch on the host;
here the confusion matrix and the per-class binary matrices accumulate
on-device with ``jnp.bincount`` (one fused kernel per batch), and only the
final (C, C) matrix crosses to the host for the report.  The 7 per-class
metric formulas and the class-size-weighted average match Test.py:232-262
exactly (including the percent scaling and 2-decimal rounding).
"""
from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
import numpy as np


from functools import partial


@partial(jax.jit, static_argnums=2)
def _batch_confusion_counts(y_true: jax.Array, y_pred: jax.Array,
                            n: int) -> jax.Array:
    """Per-batch (C, C) int32 counts via one fused bincount on device."""
    t = y_true.reshape(-1).astype(jnp.int32)
    p = y_pred.reshape(-1).astype(jnp.int32)
    idx = t * n + p
    return jnp.bincount(idx, length=n * n).reshape(n, n)


def confusion_matrix_update(cm: np.ndarray, y_true, y_pred) -> np.ndarray:
    """Accumulate a (C, C) confusion matrix from int label arrays.

    The per-batch counts run on device (int32 bincount, exact for any
    realistic batch); the running total accumulates in int64 on the host so
    counts never lose integer exactness (float32 silently rounds above
    2**24 ≈ 16.7M px per cell)."""
    n = np.shape(cm)[0]
    counts = _batch_confusion_counts(jnp.asarray(y_true),
                                     jnp.asarray(y_pred), n)
    return np.asarray(cm, np.int64) + np.asarray(jax.device_get(counts),
                                                 np.int64)


def init_confusion_matrix(num_classes: int) -> np.ndarray:
    return np.zeros((num_classes, num_classes), np.int64)


def per_class_binary_counts(cm: np.ndarray) -> np.ndarray:
    """(C, 2, 2) one-vs-rest confusion matrices from the (C, C) matrix
    (equivalent to sklearn.multilabel_confusion_matrix on int labels)."""
    cm = np.asarray(cm, np.float64)
    total = cm.sum()
    out = np.zeros((cm.shape[0], 2, 2), np.float64)
    for k in range(cm.shape[0]):
        tp_ = cm[k, k]
        fn_ = cm[k].sum() - tp_
        fp_ = cm[:, k].sum() - tp_
        tn_ = total - tp_ - fn_ - fp_
        out[k] = [[tn_, fp_], [fn_, tp_]]
    return out


def evaluation_table(cm: np.ndarray, labels: tp.Sequence[str]
                     ) -> tp.Dict[str, tp.Any]:
    """Per-class Accuracy/Precision/Sensitivity/F1/Specificity/DSC/IoU (in
    percent, rounded to 2 decimals) + class-size-weighted averages + overall
    accuracy -- Test.py:216-262 formulas."""
    cm = np.asarray(cm, np.float64)
    per_class = per_class_binary_counts(cm)
    rows = []
    for k in range(len(labels)):
        TN, FP = per_class[k][0]
        FN, TP = per_class[k][1]
        denom = TP + TN + FP + FN
        acc = round(100 * (TP + TN) / denom, 2) if denom else 0.0
        prec = round(100 * TP / (TP + FP), 2) if TP + FP else 0.0
        sens = round(100 * TP / (TP + FN), 2) if TP + FN else 0.0
        f1 = (round((2 * prec * sens) / (prec + sens), 2)
              if prec + sens else 0.0)
        spec = round(100 * TN / (TN + FP), 2) if TN + FP else 0.0
        dsc = (round(100 * (2 * TP) / (2 * TP + FP + FN), 2)
               if 2 * TP + FP + FN else 0.0)
        iou = round(100 * TP / (TP + FP + FN), 2) if TP + FP + FN else 0.0
        rows.append([acc, prec, sens, f1, spec, dsc, iou])
    rows = np.asarray(rows)
    sizes = cm.sum(axis=1)
    weights = sizes / max(sizes.sum(), 1.0)
    weighted = np.round(rows.T @ sizes / max(sizes.sum(), 1.0), 2)
    overall_acc = round(100 * np.trace(cm) / max(cm.sum(), 1.0), 2)
    headers = ["Accuracy", "Precision", "Sensitivity", "F1-score",
               "Specificity", "DSC", "IOU"]
    return {
        "headers": headers,
        "labels": list(labels),
        "per_class": rows,
        "weighted_average": weighted,
        "overall_accuracy": overall_acc,
        "confusion_matrix": cm,
        "normalized_confusion_matrix": cm / np.maximum(
            cm.sum(axis=1, keepdims=True), 1.0),
        "class_sizes": sizes,
        "class_weights": weights,
    }


def one_hot_encoding(labels: np.ndarray, num_classes: int) -> np.ndarray:
    """Reference ``one_hot_encoding`` (utils/helper_functions.py:31-36)."""
    flat = np.asarray(labels, np.int64)
    out = np.eye(num_classes, dtype=np.float32)[flat]
    return out


def reverse_one_hot_encoding(one_hot: np.ndarray) -> np.ndarray:
    """Reference ``reverse_one_hot_encoding`` (helper_functions.py:39-44)."""
    return np.argmax(one_hot, axis=-1)


def dice(y_true: np.ndarray, y_pred: np.ndarray, smooth: float = 1.0
         ) -> float:
    """Reference ``dice`` (helper_functions.py:383-388)."""
    t = np.asarray(y_true).ravel()
    p = np.asarray(y_pred).ravel()
    inter = np.sum(t * p)
    return (2.0 * inter + smooth) / (t.sum() + p.sum() + smooth)


def label_from_pred(pred: np.ndarray, class_number: int,
                    threshold: float = 0.5) -> np.ndarray:
    """Model output -> integer label map (ONE shared implementation of the
    reference's rule, Test.py:169-175): binary = threshold channel 0;
    multiclass = binarize each of the ``class_number`` foreground channels
    at the threshold and SUM, so ordinal mask encodings (e.g.
    tumor-within-kidney) land in 0..class_number.  Used by the test
    driver, the predict CLI, and the HTTP server."""
    pred = np.asarray(pred)
    if class_number <= 1:
        return (pred[..., 0] > threshold).astype(np.int32)
    fg = pred[..., :class_number]
    return (fg > threshold).astype(np.int32).sum(-1)
