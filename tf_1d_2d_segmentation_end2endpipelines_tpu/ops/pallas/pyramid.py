"""Fused deep-supervision max-pool pyramid (Pallas TPU kernel).

The DS target pyramid (reference ``prepareTrainDict``,
utils/helper_functions.py:359-380) max-pools the mask by 2**i for every
level i.  A chain of ``lax.reduce_window`` calls reads the full-res mask
once per level (D reads); this kernel tiles the mask through VMEM once and
reduces all D levels in-register per tile, so HBM traffic is one read of
the mask plus the (geometrically small) level writes.

Grid: one program per (batch, row-tile).  Each program loads a
(TILE_H, W) slab, computes level-1 by pairwise max along both axes, then
folds each further level from the previous one while it is still in VMEM.

Falls back to the reduce_window chain off-TPU (interpret mode in tests).

MEASURED RESULT (v5e, 32x256x256 f32, 4 levels): this kernel runs ~22.9ms
vs ~3.3ms for the XLA reduce_window chain -- the in-kernel transposes used
for column-pair reduction (Mosaic cannot lower strided-slice gathers)
dominate.  XLA's native reduce_window is already near the bandwidth bound
here, so ``prepare_train_dict`` keeps the XLA path; this kernel is retained
as a documented experiment per the profile-first rule (SURVEY.md §7:
Pallas only where XLA fusion demonstrably falls short -- here it does not).
"""
from __future__ import annotations

import functools
import typing as tp

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(mask_ref, *out_refs, levels: int):
    x = mask_ref[0]  # (TILE_H, W)
    for lvl in range(levels):
        h, w = x.shape
        # pairwise max along rows (reshape keeps the lane dim intact),
        # then along columns via transpose (strided slices would lower to
        # unsupported gathers in Mosaic)
        x = jnp.max(x.reshape(h // 2, 2, w), axis=1)
        xt = x.T
        xt = jnp.max(xt.reshape(w // 2, 2, h // 2), axis=1)
        x = xt.T
        out_refs[lvl][0] = x


def _pyramid_tpu(mask: jax.Array, levels: int, interpret: bool = False
                 ) -> tp.List[jax.Array]:
    b, h, w = mask.shape
    tile_h = h
    # tile rows so a slab fits VMEM comfortably (bf16/f32 < ~4MB)
    while tile_h * w * 4 > 2 * 1024 * 1024 and tile_h % 2 == 0 \
            and (tile_h // 2) % (2 ** levels) == 0:
        tile_h //= 2
    grid = (b, h // tile_h)
    out_shapes = tuple(
        jax.ShapeDtypeStruct((b, h >> (l + 1), w >> (l + 1)), mask.dtype)
        for l in range(levels))
    in_spec = pl.BlockSpec((1, tile_h, w), lambda i, j: (i, j, 0),
                           memory_space=pltpu.VMEM)
    out_specs = tuple(
        pl.BlockSpec((1, tile_h >> (l + 1), w >> (l + 1)),
                     lambda i, j, l=l: (i, j, 0),
                     memory_space=pltpu.VMEM)
        for l in range(levels))
    fn = pl.pallas_call(
        functools.partial(_kernel, levels=levels),
        grid=grid,
        in_specs=[in_spec],
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )
    return list(fn(mask))


def fused_maxpool_pyramid(mask: jax.Array, levels: int) -> tp.List[jax.Array]:
    """[maxpool(mask, 2**i) for i in 1..levels] with one HBM read.

    ``mask``: (B, H, W) or (B, H, W, 1); H and W must be divisible by
    2**levels.  Returns tensors matching the input rank.
    """
    squeeze = mask.ndim == 4
    m = mask[..., 0] if squeeze else mask
    b, h, w = m.shape
    on_tpu = jax.devices()[0].platform not in ("cpu", "gpu")
    if (h % (2 ** levels)) or (w % (2 ** levels)) or not on_tpu:
        # fallback: reduce_window chain (matches reference semantics)
        outs = []
        x = m
        for _ in range(levels):
            x = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                      (1, 2, 2), (1, 2, 2), "VALID")
            outs.append(x)
    else:
        outs = _pyramid_tpu(m, levels)
    if squeeze:
        outs = [o[..., None] for o in outs]
    return outs
