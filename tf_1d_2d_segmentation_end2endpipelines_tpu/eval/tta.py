"""Test-time augmentation (TTA): average predictions over invertible
geometric transforms.

A new inference-quality capability over the reference (whose Test.py
predicts each image exactly once, 2DCNN/Test.py:161) — standard practice
for segmentation deployment: predict on flipped/rotated views, invert
each prediction back, and average the probability maps.

TPU-native shape: the transform set is STATIC, so one jitted function
evaluates every view and the mean in a single compiled program — no
host round-trips between views, and XLA shares the weights across the
per-view forwards.  Flips/rot90s are layout moves (no resampling), so
the ensemble is exactly invertible: averaging never blurs geometry.

Works for both pipelines: 2D inputs are (B, H, W, C); 1D inputs are
(B, L, C) where ``hflip`` means reversing the length axis.
"""
from __future__ import annotations

import typing as tp

import jax.numpy as jnp

__all__ = ["TTA_2D", "TTA_1D", "make_tta_fn", "parse_tta"]


def _flip(axis):
    def t(x):
        return jnp.flip(x, axis=axis)
    return t


def _rot(k):
    # spatial axes of NHWC; rot90 k times forward, -k times to invert
    def fwd(x):
        return jnp.rot90(x, k=k, axes=(1, 2))

    def inv(x):
        return jnp.rot90(x, k=-k, axes=(1, 2))
    return fwd, inv


def _ident(x):
    return x


#: name -> (forward, inverse) view transforms.  Flips are involutions;
#: rot90/rot270 need true inverses and require square inputs (a rot90 of
#: a non-square NHWC batch changes the static shape, which a fixed-shape
#: predict fn cannot accept — parse_tta enforces this).
TTA_2D: tp.Dict[str, tp.Tuple[tp.Callable, tp.Callable]] = {
    "hflip": (_flip(2), _flip(2)),
    "vflip": (_flip(1), _flip(1)),
    "hvflip": (_flip((1, 2)), _flip((1, 2))),
    "rot90": _rot(1),
    "rot180": _rot(2),
    "rot270": _rot(3),
}

#: 1D signals (B, L, C): only the length reversal is geometric.
TTA_1D: tp.Dict[str, tp.Tuple[tp.Callable, tp.Callable]] = {
    "flip": (_flip(1), _flip(1)),
}


def parse_tta(spec: str, rank: int = 2,
              square: bool = True) -> tp.Tuple[str, ...]:
    """Parse an INI-style transform list (``'hflip, vflip'``).

    ``'none'``/'' -> (); ``'all'`` -> every applicable transform.
    Rotations are rejected for non-square inputs (shape-changing)."""
    table = TTA_2D if rank == 2 else TTA_1D
    spec = (spec or "").strip().lower()
    if spec in ("", "none", "0", "false"):
        return ()
    if spec in ("all", "1", "true"):
        names = [n for n in table
                 if square or not n.startswith("rot")]
        return tuple(names)
    names = []
    for part in spec.replace(";", ",").split(","):
        name = part.strip()
        if not name:
            continue
        if name not in table:
            raise ValueError(
                f"unknown TTA transform {name!r}; expected one of "
                f"{sorted(table)} (rank {rank})")
        if name in ("rot90", "rot270") and not square:
            raise ValueError(
                f"TTA {name!r} requires square inputs (a 90-degree "
                "rotation of a non-square batch changes its shape)")
        names.append(name)
    return tuple(names)


def make_tta_fn(predict_fn: tp.Callable, transforms: tp.Sequence[str],
                rank: int = 2) -> tp.Callable:
    """Wrap ``predict_fn`` (batch -> probability maps, same spatial
    layout) so it averages over the identity view plus ``transforms``.

    The wrapper is jit-compatible; jit it once and every view runs in
    the same compiled program.  ``predict_fn`` may return a single array
    or a pytree of arrays (e.g. a deep-supervision head dict) — the
    inverse transform and the averaging are applied per leaf, which is
    geometrically correct for any head sharing the input's axis order
    (DS level heads at lower resolution included)."""
    import jax

    table = TTA_2D if rank == 2 else TTA_1D
    pairs = [(table[name][0], table[name][1]) for name in transforms]
    if not pairs:
        return predict_fn

    def fn(x):
        acc = predict_fn(x)
        for fwd, inv in pairs:
            view = predict_fn(fwd(x))
            acc = jax.tree.map(lambda a, v: a + inv(v), acc, view)
        return jax.tree.map(lambda a: a / (1.0 + len(pairs)), acc)
    return fn
