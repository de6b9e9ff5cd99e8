"""Native (C++/OpenMP) host-side kernels with ctypes bindings.

Compiled lazily with g++ on first use; every entry point has a pure-numpy
fallback so the framework works without a toolchain.
"""
from __future__ import annotations

import ctypes
import os
import threading
import typing as tp

import numpy as np

from ._lazy import load as _lazy_load, versioned_so as _versioned_so

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "patcher.cpp")
# source-hashed: an edited patcher.cpp can never dlopen a stale build
_SO = _versioned_so(_SRC, "libpatcher")
_lock = threading.Lock()
_lib: tp.Optional[ctypes.CDLL] = None
_tried = False


def get_lib() -> tp.Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None on failure."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        lib = _lazy_load(_SRC, _SO, ("-fopenmp",))
        if lib is None:
            return None
        i64 = ctypes.c_int64
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        lib.extract_patches_f32.argtypes = [f32p, i64, i64, i64, i64, i64,
                                            f32p]
        lib.accumulate_patches_f32.argtypes = [f32p, i64, i64, i64, i64,
                                               i64, f64p, f64p]
        lib.normalize_u8_f32.argtypes = [u8p, i64, ctypes.c_float, f32p]
        _lib = lib
        return _lib


def extract_patches(img: np.ndarray, patch: int, step: int
                    ) -> tp.Optional[np.ndarray]:
    """(H, W, C) f32 -> (N, patch, patch, C) f32, or None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    img = np.ascontiguousarray(img, np.float32)
    H, W = img.shape[:2]
    C = img.shape[2] if img.ndim == 3 else 1
    ny = (H - patch) // step + 1
    nx = (W - patch) // step + 1
    out = np.empty((ny * nx, patch, patch, C), np.float32)
    lib.extract_patches_f32(img.reshape(H, W, C), H, W, C, patch, step, out)
    return out if img.ndim == 3 else out[..., 0]


def accumulate_patches(patches: np.ndarray, image_size: tp.Tuple[int, int],
                       step: int) -> tp.Optional[tp.Tuple[np.ndarray,
                                                          np.ndarray]]:
    lib = get_lib()
    if lib is None:
        return None
    p = np.ascontiguousarray(patches, np.float32)
    P = p.shape[1]
    C = p.shape[3] if p.ndim == 4 else 1
    H, W = image_size
    acc = np.zeros((H, W, C), np.float64)
    cnt = np.zeros((H, W, C), np.float64)
    lib.accumulate_patches_f32(p.reshape(-1, P, P, C), H, W, C, P, step,
                               acc, cnt)
    return acc, cnt


def normalize_u8(arr: np.ndarray, factor: float) -> tp.Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    a = np.ascontiguousarray(arr, np.uint8)
    out = np.empty(a.shape, np.float32)
    lib.normalize_u8_f32(a.reshape(-1), a.size, 1.0 / factor,
                         out.reshape(-1))
    return out
