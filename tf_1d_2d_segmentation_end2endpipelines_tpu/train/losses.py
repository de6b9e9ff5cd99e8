"""Loss registry (the framework's L0).

JAX reimplementations of every loss the reference exposes by name:
- the 16 Keras losses of ``TFLosses`` (2DCNN/utils/tf_losses.py:9-42)
- the 4 custom segmentation losses of ``utils/custom_losses.py:4-47``
  (Dice / BCEDice / IoU / Focal, smooth=1e-6, focal alpha=.8 gamma=2)

Every loss is a pure jittable function ``(y_true, y_pred) -> scalar`` with
Keras reduction semantics (mean over all leading axes of the per-sample
loss).  Keras computes the per-sample loss over the last axis, then means.
Probability-space inputs (from_logits=False) to match the reference's
compile configuration; logits variants are provided with a ``_logits``
suffix for the fused fast path used by the default train step.
"""
from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp

_EPS = 1e-7  # keras backend epsilon


def _clip(p: jax.Array) -> jax.Array:
    return jnp.clip(p, _EPS, 1.0 - _EPS)


# ---------------------------------------------------------------- keras core

def binary_crossentropy(y_true: jax.Array, y_pred: jax.Array) -> jax.Array:
    p = _clip(y_pred)
    bce = -(y_true * jnp.log(p) + (1.0 - y_true) * jnp.log1p(-p))
    return jnp.mean(bce)


def binary_crossentropy_logits(y_true: jax.Array, logits: jax.Array) -> jax.Array:
    # numerically-stable sigmoid BCE on logits (preferred on TPU)
    z = jnp.maximum(logits, 0.0) - logits * y_true + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))
    return jnp.mean(z)


def binary_focal_crossentropy(y_true: jax.Array, y_pred: jax.Array,
                              gamma: float = 2.0) -> jax.Array:
    p = _clip(y_pred)
    bce = -(y_true * jnp.log(p) + (1.0 - y_true) * jnp.log1p(-p))
    p_t = y_true * p + (1.0 - y_true) * (1.0 - p)
    return jnp.mean(jnp.power(1.0 - p_t, gamma) * bce)


def categorical_crossentropy(y_true: jax.Array, y_pred: jax.Array) -> jax.Array:
    p = y_pred / jnp.sum(y_pred, axis=-1, keepdims=True)
    p = _clip(p)
    return jnp.mean(-jnp.sum(y_true * jnp.log(p), axis=-1))


def categorical_crossentropy_logits(y_true: jax.Array,
                                    logits: jax.Array) -> jax.Array:
    logp = jax.nn.log_softmax(logits, axis=-1)
    return jnp.mean(-jnp.sum(y_true * logp, axis=-1))


def sparse_categorical_crossentropy(y_true: jax.Array,
                                    y_pred: jax.Array) -> jax.Array:
    p = _clip(y_pred)
    labels = y_true.astype(jnp.int32)
    if labels.shape == p.shape[:-1] + (1,):
        labels = labels[..., 0]
    logp = jnp.log(p)
    picked = jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    return jnp.mean(-picked)


def categorical_hinge(y_true: jax.Array, y_pred: jax.Array) -> jax.Array:
    pos = jnp.sum(y_true * y_pred, axis=-1)
    neg = jnp.max((1.0 - y_true) * y_pred, axis=-1)
    return jnp.mean(jnp.maximum(neg - pos + 1.0, 0.0))


def cosine_similarity(y_true: jax.Array, y_pred: jax.Array) -> jax.Array:
    a = y_true / jnp.maximum(jnp.linalg.norm(y_true, axis=-1, keepdims=True), _EPS)
    b = y_pred / jnp.maximum(jnp.linalg.norm(y_pred, axis=-1, keepdims=True), _EPS)
    return jnp.mean(-jnp.sum(a * b, axis=-1))


def hinge(y_true: jax.Array, y_pred: jax.Array) -> jax.Array:
    y = 2.0 * y_true - 1.0  # keras maps {0,1} -> {-1,1}
    return jnp.mean(jnp.maximum(1.0 - y * y_pred, 0.0))


def squared_hinge(y_true: jax.Array, y_pred: jax.Array) -> jax.Array:
    y = 2.0 * y_true - 1.0
    return jnp.mean(jnp.square(jnp.maximum(1.0 - y * y_pred, 0.0)))


def huber(y_true: jax.Array, y_pred: jax.Array, delta: float = 1.0) -> jax.Array:
    err = y_pred - y_true
    abs_err = jnp.abs(err)
    quad = jnp.minimum(abs_err, delta)
    return jnp.mean(0.5 * quad * quad + delta * (abs_err - quad))


def kl_divergence(y_true: jax.Array, y_pred: jax.Array) -> jax.Array:
    t = _clip(y_true)
    p = _clip(y_pred)
    return jnp.mean(jnp.sum(t * jnp.log(t / p), axis=-1))


def log_cosh(y_true: jax.Array, y_pred: jax.Array) -> jax.Array:
    err = y_pred - y_true
    # stable logcosh: |x| + softplus(-2|x|) - log 2
    return jnp.mean(jnp.abs(err) + jax.nn.softplus(-2.0 * jnp.abs(err))
                    - jnp.log(2.0))


def mean_absolute_error(y_true: jax.Array, y_pred: jax.Array) -> jax.Array:
    return jnp.mean(jnp.abs(y_pred - y_true))


def mean_absolute_percentage_error(y_true: jax.Array,
                                   y_pred: jax.Array) -> jax.Array:
    diff = jnp.abs((y_true - y_pred) / jnp.maximum(jnp.abs(y_true), _EPS))
    return jnp.mean(100.0 * diff)


def mean_squared_error(y_true: jax.Array, y_pred: jax.Array) -> jax.Array:
    return jnp.mean(jnp.square(y_pred - y_true))


def mean_squared_logarithmic_error(y_true: jax.Array,
                                   y_pred: jax.Array) -> jax.Array:
    a = jnp.log1p(jnp.maximum(y_true, _EPS))
    b = jnp.log1p(jnp.maximum(y_pred, _EPS))
    return jnp.mean(jnp.square(a - b))


def poisson(y_true: jax.Array, y_pred: jax.Array) -> jax.Array:
    return jnp.mean(y_pred - y_true * jnp.log(y_pred + _EPS))


# ------------------------------------------------------------- custom losses
# Reference formulas: utils/custom_losses.py (sum over the channel axis,
# i.e. Keras's axis=-1; smooth=1e-6).

def dice_loss(y_true: jax.Array, y_pred: jax.Array,
              smooth: float = 1e-6) -> jax.Array:
    inter = jnp.sum(jnp.abs(y_true * y_pred), axis=-1)
    denom = jnp.sum(jnp.square(y_true), axis=-1) + jnp.sum(
        jnp.square(y_pred), axis=-1)
    return jnp.mean(1.0 - (2.0 * inter + smooth) / (denom + smooth))


def bce_dice_loss(y_true: jax.Array, y_pred: jax.Array,
                  smooth: float = 1e-6) -> jax.Array:
    p = _clip(y_pred)
    bce = jnp.mean(-(y_true * jnp.log(p) + (1.0 - y_true) * jnp.log1p(-p)),
                   axis=-1)
    inter = jnp.sum(jnp.abs(y_true * y_pred), axis=-1)
    denom = jnp.sum(jnp.square(y_true), axis=-1) + jnp.sum(
        jnp.square(y_pred), axis=-1)
    dice = 1.0 - (2.0 * inter + smooth) / (denom + smooth)
    return jnp.mean(bce + dice)


def iou_loss(y_true: jax.Array, y_pred: jax.Array,
             smooth: float = 1e-6) -> jax.Array:
    """Replicates the reference formula EXACTLY (custom_losses.py:26-37),
    including its quirk: ``total`` sums over the WHOLE batch while the
    intersection is per-element (axis=-1), so the loss does not reach 0
    at y_pred == y_true.  Preserved as a fidelity choice — use DiceLoss
    for a well-normalized overlap loss."""
    inter = jnp.sum(jnp.abs(y_true * y_pred), axis=-1)
    total = jnp.sum(y_true) + jnp.sum(y_pred)
    union = total - inter
    return jnp.mean(1.0 - (inter + smooth) / (union + smooth))


def focal_loss(y_true: jax.Array, y_pred: jax.Array, alpha: float = 0.8,
               gamma: float = 2.0) -> jax.Array:
    p = _clip(y_pred)
    bce = jnp.mean(-(y_true * jnp.log(p) + (1.0 - y_true) * jnp.log1p(-p)),
                   axis=-1)
    bce_exp = jnp.exp(-bce)
    return jnp.mean(alpha * jnp.power(1.0 - bce_exp, gamma) * bce)


LossFn = tp.Callable[[jax.Array, jax.Array], jax.Array]

#: registry keyed by the reference's exact name strings
LOSSES: tp.Dict[str, LossFn] = {
    "BinaryCrossentropy": binary_crossentropy,
    "BinaryFocalCrossentropy": binary_focal_crossentropy,
    "CategoricalCrossentropy": categorical_crossentropy,
    "CategoricalHinge": categorical_hinge,
    "CosineSimilarity": cosine_similarity,
    "Hinge": hinge,
    "Huber": huber,
    "KLDivergence": kl_divergence,
    "LogCosh": log_cosh,
    "MeanAbsoluteError": mean_absolute_error,
    "MeanAbsolutePercentageError": mean_absolute_percentage_error,
    "MeanSquaredError": mean_squared_error,
    "MeanSquaredLogarithmicError": mean_squared_logarithmic_error,
    "Poisson": poisson,
    "SparseCategoricalCrossentropy": sparse_categorical_crossentropy,
    "SquaredHinge": squared_hinge,
    # custom_losses.py additions (not wired into the reference's TFLosses
    # registry, but part of its public loss surface)
    "DiceLoss": dice_loss,
    "BCEDiceLoss": bce_dice_loss,
    "IoULoss": iou_loss,
    "FocalLoss": focal_loss,
}


def get_loss(name: str) -> LossFn:
    """Name-string lookup, mirroring ``TFLosses(name).loss()``."""
    if name not in LOSSES:
        raise ValueError(
            "Please select a valid loss function. Check for spelling "
            f"mistakes, capital/small letters, etc. (got {name!r})")
    return LOSSES[name]


def deep_supervision_loss(
    loss_fn: LossFn,
    outputs: tp.Dict[str, jax.Array],
    targets: tp.Dict[str, jax.Array],
    loss_weights: tp.Optional[tp.Dict[str, float]] = None,
) -> jax.Array:
    """Weighted multi-head loss over {'out', 'level1', ...} dicts.

    Mirrors the reference's deep-supervision compile: per-head Keras loss
    with ``loss_weights[k] = 1 - 0.1*k`` defaults
    (1DCNN notebook cell 29/35; Train.py compiles single-head otherwise).
    """
    total = jnp.asarray(0.0, jnp.float32)
    for key, pred in outputs.items():
        if key not in targets:
            continue
        w = 1.0
        if loss_weights is not None:
            w = loss_weights.get(key, 1.0)
        total = total + w * loss_fn(targets[key], pred)
    return total


def default_ds_weights(model_depth: int) -> tp.Dict[str, float]:
    """out=1.0, level{k} weighted 1 - 0.1*k (1D notebook cell 29)."""
    weights = {"out": 1.0}
    for k in range(1, model_depth + 1):
        weights[f"level{k}"] = max(1.0 - 0.1 * k, 0.0)
    return weights
