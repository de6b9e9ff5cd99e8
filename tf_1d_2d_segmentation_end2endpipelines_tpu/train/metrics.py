"""Streaming metric registry (reference: 2DCNN/utils/tf_metrics.py:17-98).

Every metric the reference exposes by name, reimplemented as a pure
functional streaming metric: ``init() -> state``, ``update(state, y_true,
y_pred) -> state``, ``result(state) -> scalar``.  States are additive
pytrees, so they jit, accumulate across batches on-device, and merge across
a mesh with a single ``psum`` -- no host round-trips in the eval loop.

Threshold-curve metrics (AUC, PrecisionAtRecall, ...) use Keras's
``num_thresholds`` evenly-spaced-threshold scheme (default 200) so results
match the reference's compiled metrics.
"""
from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp

_EPS = 1e-7


class Metric(tp.NamedTuple):
    name: str
    init: tp.Callable[[], tp.Any]
    update: tp.Callable[[tp.Any, jax.Array, jax.Array], tp.Any]
    result: tp.Callable[[tp.Any], jax.Array]


# ------------------------------------------------------------- mean metrics

def _mean_metric(name: str, fn: tp.Callable[[jax.Array, jax.Array], jax.Array]
                 ) -> Metric:
    """Streaming mean of a per-sample value (Keras Mean-wrapper metrics).

    ``fn`` returns the per-element value tensor; we accumulate sum + count.
    """

    def init():
        return {"total": jnp.zeros((), jnp.float32),
                "count": jnp.zeros((), jnp.float32)}

    def update(state, y_true, y_pred):
        v = fn(y_true.astype(jnp.float32), y_pred.astype(jnp.float32))
        return {"total": state["total"] + jnp.sum(v),
                "count": state["count"] + jnp.asarray(v.size, jnp.float32)}

    def result(state):
        return state["total"] / jnp.maximum(state["count"], 1.0)

    return Metric(name, init, update, result)


def _clip(p):
    return jnp.clip(p, _EPS, 1.0 - _EPS)


def _bce_el(t, p):
    p = _clip(p)
    return -(t * jnp.log(p) + (1 - t) * jnp.log1p(-p))


def _cce_el(t, p):
    p = _clip(p / jnp.sum(p, axis=-1, keepdims=True))
    return -jnp.sum(t * jnp.log(p), axis=-1)


def _scce_el(t, p):
    p = _clip(p)
    labels = t.astype(jnp.int32)
    if labels.shape == p.shape[:-1] + (1,):
        labels = labels[..., 0]
    return -jnp.take_along_axis(jnp.log(p), labels[..., None], axis=-1)[..., 0]


# ------------------------------------------------- confusion-based metrics

def _conf_counts(y_true: jax.Array, y_pred: jax.Array,
                 thresholds: jax.Array) -> tp.Dict[str, jax.Array]:
    """Per-threshold TP/FP/TN/FN (Keras-style inclusive `pred > thresh`)."""
    t = y_true.reshape(-1).astype(jnp.float32)
    p = y_pred.reshape(-1).astype(jnp.float32)
    pred_pos = p[None, :] > thresholds[:, None]
    pos = t[None, :] > 0.5
    tp_ = jnp.sum(pred_pos & pos, axis=1).astype(jnp.float32)
    fp_ = jnp.sum(pred_pos & ~pos, axis=1).astype(jnp.float32)
    fn_ = jnp.sum(~pred_pos & pos, axis=1).astype(jnp.float32)
    tn_ = jnp.sum(~pred_pos & ~pos, axis=1).astype(jnp.float32)
    return {"tp": tp_, "fp": fp_, "fn": fn_, "tn": tn_}


def _conf_metric(name: str, thresholds: tp.Sequence[float],
                 result_fn: tp.Callable[[tp.Dict[str, jax.Array]], jax.Array]
                 ) -> Metric:
    th = jnp.asarray(thresholds, jnp.float32)

    def init():
        z = jnp.zeros((len(thresholds),), jnp.float32)
        return {"tp": z, "fp": z, "fn": z, "tn": z}

    def update(state, y_true, y_pred):
        c = _conf_counts(y_true, y_pred, th)
        return jax.tree.map(jnp.add, state, c)

    return Metric(name, init, update, result_fn)


def _keras_thresholds(num: int) -> tp.List[float]:
    # keras: [-eps, 0/(n-1), ..., 1, 1+eps] interior evenly spaced
    if num == 1:
        return [0.5]
    inner = [(i + 1) * 1.0 / (num - 1) for i in range(num - 2)]
    return [-1e-7] + inner + [1.0 + 1e-7]


def _auc_roc_result(state):
    tp_, fp_, fn_, tn_ = state["tp"], state["fp"], state["fn"], state["tn"]
    tpr = tp_ / jnp.maximum(tp_ + fn_, _EPS)
    fpr = fp_ / jnp.maximum(fp_ + tn_, _EPS)
    # thresholds ascending -> rates descending; integrate via trapezoid
    return jnp.sum((fpr[:-1] - fpr[1:]) * (tpr[:-1] + tpr[1:]) / 2.0)


# --------------------------------------------------------- IoU / confusion

def _iou_metric(name: str, num_classes: int,
                target_class_ids: tp.Optional[tp.Sequence[int]],
                mode: str) -> Metric:
    """IoU family over an accumulated num_classes^2 confusion matrix.

    mode: 'iou' (int labels), 'binary' (threshold 0.5), 'onehot'
    (argmax over channels).
    """
    ids = list(target_class_ids) if target_class_ids is not None else list(
        range(num_classes))
    ids = [i for i in ids if i < num_classes]

    def init():
        return jnp.zeros((num_classes, num_classes), jnp.float32)

    def update(cm, y_true, y_pred):
        if mode == "binary":
            t = (y_true.reshape(-1) > 0.5).astype(jnp.int32)
            p = (y_pred.reshape(-1) > 0.5).astype(jnp.int32)
        elif mode == "onehot":
            t = jnp.argmax(y_true, axis=-1).reshape(-1)
            p = jnp.argmax(y_pred, axis=-1).reshape(-1)
        else:
            t = y_true.reshape(-1).astype(jnp.int32)
            p = y_pred.reshape(-1).astype(jnp.int32)
        idx = t * num_classes + p
        counts = jnp.bincount(idx, length=num_classes * num_classes)
        return cm + counts.reshape(num_classes, num_classes).astype(jnp.float32)

    def result(cm):
        row = jnp.sum(cm, axis=1)
        col = jnp.sum(cm, axis=0)
        diag = jnp.diagonal(cm)
        union = row + col - diag
        iou = diag / jnp.maximum(union, _EPS)
        sel = jnp.asarray(ids, jnp.int32)
        valid = union[sel] > 0
        return jnp.sum(jnp.where(valid, iou[sel], 0.0)) / jnp.maximum(
            jnp.sum(valid.astype(jnp.float32)), 1.0)

    return Metric(name, init, update, result)


# --------------------------------------------------------------- accuracy

def _accuracy_el(t, p):
    return (t == p).astype(jnp.float32)


def _binary_accuracy_el(t, p):
    return ((p > 0.5).astype(jnp.float32) == t).astype(jnp.float32)


def _categorical_accuracy_el(t, p):
    return (jnp.argmax(t, -1) == jnp.argmax(p, -1)).astype(jnp.float32)


def _sparse_categorical_accuracy_el(t, p):
    labels = t.astype(jnp.int32)
    if labels.shape == p.shape[:-1] + (1,):
        labels = labels[..., 0]
    return (labels == jnp.argmax(p, -1)).astype(jnp.float32)


def _topk_accuracy_el(k):
    def fn(t, p):
        labels = jnp.argmax(t, -1)
        kk = min(k, p.shape[-1])  # keras clamps k to the class count
        topk = jax.lax.top_k(p, kk)[1]
        return jnp.any(topk == labels[..., None], axis=-1).astype(jnp.float32)
    return fn


def _sparse_topk_accuracy_el(k):
    def fn(t, p):
        labels = t.astype(jnp.int32)
        if labels.shape == p.shape[:-1] + (1,):
            labels = labels[..., 0]
        kk = min(k, p.shape[-1])
        topk = jax.lax.top_k(p, kk)[1]
        return jnp.any(topk == labels[..., None], axis=-1).astype(jnp.float32)
    return fn


# ------------------------------------------------------------ at-X metrics

def _at_param_result(kind: str, value: float):
    def result(state):
        tp_, fp_, fn_, tn_ = state["tp"], state["fp"], state["fn"], state["tn"]
        precision = tp_ / jnp.maximum(tp_ + fp_, _EPS)
        recall = tp_ / jnp.maximum(tp_ + fn_, _EPS)
        specificity = tn_ / jnp.maximum(tn_ + fp_, _EPS)
        sensitivity = recall
        tables = {
            "precision_at_recall": (recall, precision),
            "recall_at_precision": (precision, recall),
            "sensitivity_at_specificity": (specificity, sensitivity),
            "specificity_at_sensitivity": (sensitivity, specificity),
        }
        constraint, target = tables[kind]
        feasible = constraint >= value
        masked = jnp.where(feasible, target, 0.0)
        return jnp.max(masked)
    return result


def make_metric(name: str, num_classes: int = 2,
                target_class_ids: tp.Optional[tp.Sequence[int]] = None,
                k: int = 5, num_thresholds: int = 200,
                at_param: float = 0.5) -> Metric:
    """Build a streaming metric by the reference's exact name string
    (mirrors ``TFMetrics(...).metric()``, tf_metrics.py:17-98)."""
    single = [0.5]
    kth = _keras_thresholds(num_thresholds)
    table: tp.Dict[str, tp.Callable[[], Metric]] = {
        "AUC": lambda: _conf_metric(name, kth, _auc_roc_result),
        "Accuracy": lambda: _mean_metric(name, _accuracy_el),
        "BinaryAccuracy": lambda: _mean_metric(name, _binary_accuracy_el),
        "BinaryCrossentropy": lambda: _mean_metric(name, _bce_el),
        "BinaryIoU": lambda: _iou_metric(name, 2, target_class_ids, "binary"),
        "CategoricalAccuracy": lambda: _mean_metric(name, _categorical_accuracy_el),
        "CategoricalCrossentropy": lambda: _mean_metric(name, _cce_el),
        "CategoricalHinge": lambda: _mean_metric(
            name, lambda t, p: jnp.maximum(
                jnp.max((1 - t) * p, -1) - jnp.sum(t * p, -1) + 1, 0)),
        "CosineSimilarity": lambda: _mean_metric(
            name, lambda t, p: jnp.sum(
                (t / jnp.maximum(jnp.linalg.norm(t, axis=-1, keepdims=True), _EPS))
                * (p / jnp.maximum(jnp.linalg.norm(p, axis=-1, keepdims=True), _EPS)),
                -1)),
        "Hinge": lambda: _mean_metric(
            name, lambda t, p: jnp.maximum(1 - (2 * t - 1) * p, 0)),
        "IoU": lambda: _iou_metric(name, num_classes, target_class_ids, "iou"),
        "KLDivergence": lambda: _mean_metric(
            name, lambda t, p: jnp.sum(_clip(t) * jnp.log(_clip(t) / _clip(p)), -1)),
        "LogCoshError": lambda: _mean_metric(
            name, lambda t, p: jnp.abs(p - t)
            + jax.nn.softplus(-2 * jnp.abs(p - t)) - jnp.log(2.0)),
        "Mean": lambda: _mean_metric(name, lambda t, p: p),
        "MeanAbsoluteError": lambda: _mean_metric(
            name, lambda t, p: jnp.abs(p - t)),
        "MeanAbsolutePercentageError": lambda: _mean_metric(
            name, lambda t, p: 100 * jnp.abs((t - p) / jnp.maximum(jnp.abs(t), _EPS))),
        "MeanIoU": lambda: _iou_metric(name, num_classes, None, "iou"),
        "MeanSquaredError": lambda: _mean_metric(
            name, lambda t, p: jnp.square(p - t)),
        "MeanSquaredLogarithmicError": lambda: _mean_metric(
            name, lambda t, p: jnp.square(
                jnp.log1p(jnp.maximum(t, _EPS)) - jnp.log1p(jnp.maximum(p, _EPS)))),
        "OneHotIoU": lambda: _iou_metric(name, num_classes, target_class_ids,
                                         "onehot"),
        "OneHotMeanIoU": lambda: _iou_metric(name, num_classes, None, "onehot"),
        "Poisson": lambda: _mean_metric(
            name, lambda t, p: p - t * jnp.log(p + _EPS)),
        "Precision": lambda: _conf_metric(
            name, single, lambda s: (s["tp"] / jnp.maximum(s["tp"] + s["fp"],
                                                           _EPS))[0]),
        "Recall": lambda: _conf_metric(
            name, single, lambda s: (s["tp"] / jnp.maximum(s["tp"] + s["fn"],
                                                           _EPS))[0]),
        "RootMeanSquaredError": lambda: Metric(
            name,
            _mean_metric(name, lambda t, p: jnp.square(p - t)).init,
            _mean_metric(name, lambda t, p: jnp.square(p - t)).update,
            lambda s: jnp.sqrt(s["total"] / jnp.maximum(s["count"], 1.0))),
        "SparseCategoricalAccuracy": lambda: _mean_metric(
            name, _sparse_categorical_accuracy_el),
        "SparseCategoricalCrossentropy": lambda: _mean_metric(name, _scce_el),
        "SparseTopKCategoricalAccuracy": lambda: _mean_metric(
            name, _sparse_topk_accuracy_el(k)),
        "SquaredHinge": lambda: _mean_metric(
            name, lambda t, p: jnp.square(jnp.maximum(1 - (2 * t - 1) * p, 0))),
        "Sum": lambda: Metric(
            name,
            lambda: jnp.zeros((), jnp.float32),
            lambda s, t, p: s + jnp.sum(p.astype(jnp.float32)),
            lambda s: s),
        "TopKCategoricalAccuracy": lambda: _mean_metric(
            name, _topk_accuracy_el(k)),
        "tf.keras.metrics.TrueNegatives": lambda: _conf_metric(
            name, single, lambda s: s["tn"][0]),
        "tf.keras.metrics.TruePositives": lambda: _conf_metric(
            name, single, lambda s: s["tp"][0]),
        "tf.keras.metrics.FalseNegatives": lambda: _conf_metric(
            name, single, lambda s: s["fn"][0]),
        "tf.keras.metrics.FalsePositives": lambda: _conf_metric(
            name, single, lambda s: s["fp"][0]),
        "tf.keras.metrics.PrecisionAtRecall": lambda: _conf_metric(
            name, kth, _at_param_result("precision_at_recall", at_param)),
        "tf.keras.metrics.RecallAtPrecision": lambda: _conf_metric(
            name, kth, _at_param_result("recall_at_precision", at_param)),
        "tf.keras.metrics.SensitivityAtSpecificity": lambda: _conf_metric(
            name, kth, _at_param_result("sensitivity_at_specificity", at_param)),
        "tf.keras.metrics.SpecificityAtSensitivity": lambda: _conf_metric(
            name, kth, _at_param_result("specificity_at_sensitivity", at_param)),
    }
    # short aliases (without the tf.keras.metrics. prefix quirk)
    for long in list(table):
        if long.startswith("tf.keras.metrics."):
            table.setdefault(long[len("tf.keras.metrics."):], table[long])
    if name not in table:
        raise ValueError(
            "Please select a valid metric. Check for spelling mistakes, "
            f"capital/small letters, etc. (got {name!r})")
    return table[name]()


METRIC_NAMES = (
    "AUC", "Accuracy", "BinaryAccuracy", "BinaryCrossentropy", "BinaryIoU",
    "CategoricalAccuracy", "CategoricalCrossentropy", "CategoricalHinge",
    "CosineSimilarity", "Hinge", "IoU", "KLDivergence", "LogCoshError",
    "Mean", "MeanAbsoluteError", "MeanAbsolutePercentageError", "MeanIoU",
    "MeanSquaredError", "MeanSquaredLogarithmicError", "OneHotIoU",
    "OneHotMeanIoU", "Poisson", "Precision", "Recall",
    "RootMeanSquaredError", "SparseCategoricalAccuracy",
    "SparseCategoricalCrossentropy", "SparseTopKCategoricalAccuracy",
    "SquaredHinge", "Sum", "TopKCategoricalAccuracy",
    "tf.keras.metrics.TrueNegatives", "tf.keras.metrics.TruePositives",
    "tf.keras.metrics.FalseNegatives", "tf.keras.metrics.FalsePositives",
    "tf.keras.metrics.PrecisionAtRecall", "tf.keras.metrics.RecallAtPrecision",
    "tf.keras.metrics.SensitivityAtSpecificity",
    "tf.keras.metrics.SpecificityAtSensitivity",
)
