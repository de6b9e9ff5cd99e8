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


def sharded_window_inference(
    predict_fn: tp.Callable,
    state,
    signal: np.ndarray,
    window: int,
    overlap_ratio: float,
    mesh,
    out_key: str = "out",
) -> np.ndarray:
    """1D analog of ``sharded_patch_inference``: a long signal (the
    reference trains 21600-sample sequences at batch 1, 1D notebook cell
    29) is split into overlapping windows, predicted in one mesh-sharded
    call, and overlap-averaged back together."""
    sig = np.asarray(signal, np.float32)
    if sig.ndim == 1:
        sig = sig[:, None]
    L = sig.shape[0]
    step = max(int(window * (1 - overlap_ratio)), 1)
    starts = list(range(0, max(L - window, 0) + 1, step))
    if not starts:
        starts = [0]
    if starts[-1] + window < L:  # cover the tail
        starts.append(L - window)
    wins = np.stack([sig[s:s + window] for s in starts], 0)
    n = wins.shape[0]
    n_dev = mesh.shape["data"]
    pad = (-n) % n_dev
    if pad:
        wins = np.concatenate(
            [wins, np.zeros((pad, *wins.shape[1:]), wins.dtype)], 0)
    x = shard_batch(mesh, wins)
    pred = np.asarray(jax.device_get(predict_fn(state, x)[out_key]))[:n]
    acc = np.zeros((L, pred.shape[-1]), np.float64)
    cnt = np.zeros((L, 1), np.float64)
    for k, s0 in enumerate(starts):
        acc[s0:s0 + window] += pred[k]
        cnt[s0:s0 + window] += 1.0
    return (acc / np.maximum(cnt, 1.0)).astype(np.float32)


def signal_windows(signal: np.ndarray, window: int, overlap_ratio: float
                   ) -> tp.Tuple[np.ndarray, tp.List[int]]:
    """Split (L, C) or (N, L, C) signals into overlapping (W, window, C)
    windows for LENGTH-SHARDED TRAINING: the reference trains whole
    21600-sample sequences at batch 1 (1D notebook cells 29/35); here the
    sequence length becomes the batch dimension, sharded over the mesh's
    'data' axis by the normal train step.  Returns (windows, starts);
    ``starts`` reconstructs positions for overlap-averaged stitching."""
    sig = np.asarray(signal, np.float32)
    if sig.ndim == 1:
        sig = sig[:, None]
    if sig.ndim == 2:
        sig = sig[None]
    L = sig.shape[1]
    if L < window:
        raise ValueError(
            f"signal length {L} is shorter than window {window}; pad the "
            "signal or choose window <= L (short windows would silently "
            "change the train step's compiled shape)")
    step = max(int(window * (1 - overlap_ratio)), 1)
    starts = list(range(0, max(L - window, 0) + 1, step))
    if not starts:
        starts = [0]
    if starts[-1] + window < L:
        starts.append(L - window)
    wins = np.concatenate(
        [np.stack([s[s0:s0 + window] for s0 in starts], 0) for s in sig], 0)
    return wins, starts


def length_sharded_batches(x: np.ndarray, y: np.ndarray, window: int,
                           overlap_ratio: float, batch_size: int,
                           seed: int = 0):
    """BatchIter over aligned signal/target windows (Trainer.fit contract);
    the Trainer shards each window batch over the mesh's 'data' axis."""
    xw, _ = signal_windows(x, window, overlap_ratio)
    yw, _ = signal_windows(y, window, overlap_ratio)
    assert xw.shape[0] == yw.shape[0]
    epoch = [0]

    def batches():
        order = np.random.default_rng(seed + epoch[0]).permutation(
            xw.shape[0])
        epoch[0] += 1
        stop = xw.shape[0] - (xw.shape[0] % batch_size)
        for s in range(0, stop or batch_size, batch_size):
            sel = order[s:s + batch_size]
            if len(sel):
                yield xw[sel], yw[sel]

    return batches
