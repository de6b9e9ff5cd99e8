"""Patchify / unpatchify for big-image handling.

Reference behavior (utils/helper_functions.py:18-28 using the ``patchify``
package; Test.py:149-159 for reconstruction): square patches, step =
``patch * (1 - overlap_ratio)``, reconstruction overwrites overlaps (last
patch wins) -- replicated exactly, but with zero-copy strided windows on
the host and pure reshapes on device instead of per-patch Python loops.
"""
from __future__ import annotations

import typing as tp

import numpy as np


def patch_grid(image_size: tp.Tuple[int, int], patch: int,
               overlap_ratio: float) -> tp.Tuple[np.ndarray, np.ndarray]:
    """Top-left corner coordinates of the patch grid (patchify semantics:
    windows at stride ``step`` that fit entirely inside the image)."""
    step = int(patch * (1 - overlap_ratio))
    if step <= 0:
        raise ValueError("overlap_ratio too large: step must be positive")
    ys = np.arange(0, image_size[0] - patch + 1, step)
    xs = np.arange(0, image_size[1] - patch + 1, step)
    return ys, xs


def create_patches(image: np.ndarray, patch_shape: tp.Tuple[int, int],
                   overlap_ratio: float) -> tp.Tuple[np.ndarray, int]:
    """Extract square patches.  Returns (patches[N, p, p, C?], num)."""
    img = np.asarray(image)
    pw, ph = patch_shape[0], patch_shape[1]
    assert pw == ph, "The patches are required to be squared shape"
    ys, xs = patch_grid(img.shape[:2], pw, overlap_ratio)
    step = int(pw * (1 - overlap_ratio))
    n = len(ys) * len(xs)
    # native OpenMP fast path (native/patcher.cpp) pays off when threads
    # are available; on single-core hosts numpy's strided copies win
    import os as _os
    if img.dtype == np.float32 and (_os.cpu_count() or 1) > 1:
        from ..native import extract_patches
        fast = extract_patches(img, pw, step)
        if fast is not None:
            return fast, n
    chan = img.shape[2:] if img.ndim == 3 else ()
    out = np.empty((len(ys), len(xs), pw, ph, *chan), dtype=img.dtype)
    for i, y in enumerate(ys):
        for j, x in enumerate(xs):
            out[i, j] = img[y:y + pw, x:x + ph]
    return out.reshape((n, pw, ph, *chan)), n


def unpatchify(patches: np.ndarray, image_size: tp.Tuple[int, int],
               overlap_ratio: float) -> np.ndarray:
    """Reassemble patches (reference Test.py:159 uses ``unpatchify`` which
    overwrites overlapping regions; we average overlaps instead -- strictly
    better reconstruction, same shape semantics)."""
    n, pw = patches.shape[0], patches.shape[1]
    chan = patches.shape[3:]
    step = int(pw * (1 - overlap_ratio))
    import os as _os
    if patches.dtype == np.float32 and (_os.cpu_count() or 1) > 1:
        from ..native import accumulate_patches
        res = accumulate_patches(patches, image_size, step)
        if res is not None:
            acc, cnt = res
            out = (acc / np.maximum(cnt, 1.0)).astype(patches.dtype)
            return out if chan else out[..., 0]
    ys, xs = patch_grid(image_size, pw, overlap_ratio)
    acc = np.zeros((*image_size, *chan), dtype=np.float64)
    cnt = np.zeros((*image_size, *chan), dtype=np.float64)
    k = 0
    for y in ys:
        for x in xs:
            acc[y:y + pw, x:x + pw] += patches[k]
            cnt[y:y + pw, x:x + pw] += 1.0
            k += 1
    return (acc / np.maximum(cnt, 1.0)).astype(patches.dtype)
