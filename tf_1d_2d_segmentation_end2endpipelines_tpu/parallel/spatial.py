"""Spatial partitioning for megapixel inference.

The reference's long-input story is host-side patchify -> per-patch
``model.predict`` -> unpatchify (helper_functions.py:18-28, Test.py:149-159)
-- one patch per predict call.  The TPU-native equivalent (SURVEY.md §2.3:
the closest thing to context parallelism this workload admits) shards the
*patch grid* over the mesh's 'data' axis: all patches run in one jitted
call, each device computing its slice of the grid, and the overlap-averaged
reconstruction happens on the host.
"""
from __future__ import annotations

import typing as tp

import jax
import numpy as np

from ..data.patch import create_patches, unpatchify
from .mesh import shard_batch


def sharded_patch_inference(
    predict_fn: tp.Callable,
    state,
    image: np.ndarray,
    patch: int,
    overlap_ratio: float,
    mesh,
    out_key: str = "out",
) -> np.ndarray:
    """Predict one large image by mesh-sharded patches.

    ``predict_fn(state, x) -> {'out': ...}`` must be jitted; the patch
    batch is padded up to a multiple of the data-axis size so the grid
    divides evenly, and the padding is dropped before reconstruction.
    """
    patches, n = create_patches(np.asarray(image, np.float32),
                                (patch, patch), overlap_ratio)
    if patches.ndim == 3:
        patches = patches[..., None]
    n_dev = mesh.shape["data"]
    pad = (-n) % n_dev
    if pad:
        patches = np.concatenate(
            [patches, np.zeros((pad, *patches.shape[1:]), patches.dtype)], 0)
    x = shard_batch(mesh, patches)
    pred = predict_fn(state, x)
    pred = np.asarray(jax.device_get(pred[out_key]))[:n]
    return unpatchify(pred.astype(np.float32),
                      image.shape[:2], overlap_ratio)
