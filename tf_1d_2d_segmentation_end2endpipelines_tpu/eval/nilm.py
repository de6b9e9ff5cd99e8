"""1D signal (NILM-style) evaluation metrics.

Reference: 1DCNN/1D_Segmentation.ipynb cells 51-63 (Construction_Error,
Calculate_SAE, Calculate_EA, Calculate_JEOI, Calculate_DEOI).  The
reference computes these with per-sample Python scalar loops; the loops
reduce to elementwise min/max sums, so here they are vectorized jittable
reductions (the JEOI/DEOI branch logic over (g, p>=0) is exactly
EO=sum(min(g,p)), EE=sum(max(p-g,0)), EM=sum(max(g-p,0))).
"""
from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
import numpy as np


def construction_error(ground: np.ndarray, pred: np.ndarray
                       ) -> tp.Dict[str, float]:
    """Per-sample MAE/MSE/RMSE/Pearson, averaged over samples (cell 51).
    Samples where either side has zero variance are skipped, as in the
    reference."""
    maes, mses, rmses, ccs = [], [], [], []
    for g, p in zip(np.asarray(ground), np.asarray(pred)):
        g = g.ravel().astype(np.float64)
        p = p.ravel().astype(np.float64)
        if np.std(p) == 0 or np.std(g) == 0:
            continue
        err = p - g
        maes.append(np.mean(np.abs(err)))
        mses.append(np.mean(err ** 2))
        rmses.append(np.sqrt(np.mean(err ** 2)))
        ccs.append(np.corrcoef(p, g)[0, 1])
    return {
        "MAE": round(float(np.mean(maes)), 3) if maes else float("nan"),
        "MSE": round(float(np.mean(mses)), 3) if mses else float("nan"),
        "RMSE": round(float(np.mean(rmses)), 3) if rmses else float("nan"),
        "PCC": round(float(np.mean(ccs)) * 100, 3) if ccs else float("nan"),
    }


def calculate_sae(ground: np.ndarray, pred: np.ndarray) -> float:
    """Signal Aggregate Error: |sum(pred) - sum(ground)| / sum(ground)
    (cell 54)."""
    eg = float(np.sum(ground))
    ep = float(np.sum(pred))
    return round(abs(ep - eg) / eg, 3)


def calculate_ea(ground: np.ndarray, pred: np.ndarray) -> float:
    """Estimation Accuracy: mean_i [1 - sum|g-p| / (2*sum g)] (cell 57)."""
    vals = []
    for g, p in zip(np.asarray(ground), np.asarray(pred)):
        g = g.ravel().astype(np.float64)
        p = p.ravel().astype(np.float64)
        vals.append(1.0 - np.sum(np.abs(g - p)) / (2.0 * np.sum(g)))
    return round(float(np.mean(vals)), 3)


def _eo_ee_em(g: jnp.ndarray, p: jnp.ndarray):
    p = jnp.maximum(p, 0.0)
    eo = jnp.sum(jnp.minimum(g, p))
    ee = jnp.sum(jnp.maximum(p - g, 0.0))
    em = jnp.sum(jnp.maximum(g - p, 0.0))
    return eo, ee, em


@jax.jit
def _jeoi_one(g: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    eo, ee, em = _eo_ee_em(g, p)
    return eo / (eo + ee + em)


@jax.jit
def _deoi_one(g: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    eo, ee, em = _eo_ee_em(g, p)
    return (2 * eo) / (2 * eo + ee + em)


def calculate_jeoi(ground: np.ndarray, pred: np.ndarray) -> float:
    """Jaccard-style Energy Overlap Index (cell 60)."""
    vals = [float(_jeoi_one(jnp.asarray(g, jnp.float32).ravel(),
                            jnp.asarray(p, jnp.float32).ravel()))
            for g, p in zip(np.asarray(ground), np.asarray(pred))]
    return round(float(np.mean(vals)), 4)


def calculate_deoi(ground: np.ndarray, pred: np.ndarray) -> float:
    """Dice-style Energy Overlap Index (cell 63)."""
    vals = [float(_deoi_one(jnp.asarray(g, jnp.float32).ravel(),
                            jnp.asarray(p, jnp.float32).ravel()))
            for g, p in zip(np.asarray(ground), np.asarray(pred))]
    return round(float(np.mean(vals)), 4)
