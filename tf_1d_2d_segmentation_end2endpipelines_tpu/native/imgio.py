"""ctypes binding for the native image loader (imgio.cpp): decode +
convert + resize + normalize in one C call, bit-exact with the PIL path
(tests/test_native_io.py) so numerics are identical with or without a
toolchain.  ``load_image_native`` returns None whenever the library is
missing or the file needs a PIL-only path (BMP/TIFF, 16-bit PNG) — the
caller (data/generators.py::load_image) falls back to PIL.

Disable with ``TPUSEG_NATIVE_IO=0`` (e.g. to A/B the PIL path).
"""
from __future__ import annotations

import ctypes
import os
import threading
import typing as tp

import numpy as np

from ._lazy import load as _lazy_load, versioned_so as _versioned_so

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "imgio.cpp")
# source-hashed: an edited imgio.cpp can never dlopen a stale build
_SO = _versioned_so(_SRC, "libimgio")
_lock = threading.Lock()
_lib: tp.Optional[ctypes.CDLL] = None
_tried = False
# PNG decode is deterministic (zlib + fixed transforms), but JPEG output
# depends on the linked decoder: the system libjpeg this library links
# may round differently from Pillow's bundled libjpeg-turbo on some
# hosts.  A one-time probe decodes the same JPEG both ways; on any
# mismatch the JPEG path falls back to PIL while PNG stays native.
_jpeg_ok = False


def _probe_jpeg(lib) -> bool:
    import tempfile
    try:
        from PIL import Image
    except Exception:
        return False  # no arbiter available — keep numerics PIL-defined
    g = np.arange(24, dtype=np.uint8)[:, None] * 10
    arr = np.stack([g + c for c in range(3)], -1).astype(np.uint8)
    arr = np.broadcast_to(arr, (24, 24, 3)).copy()
    with tempfile.NamedTemporaryFile(suffix=".jpg", delete=False) as f:
        path = f.name
    try:
        Image.fromarray(arr).save(path, quality=90)
        ref = np.asarray(Image.open(path).convert("RGB"), np.float32)
        out = np.empty((24, 24, 3), np.float32)
        rc = lib.imgio_load(os.fsencode(path), 24, 24, 3, 0,
                            ctypes.c_float(1.0), out)
        return rc == 0 and np.array_equal(out, ref)
    finally:
        os.remove(path)


def get_lib() -> tp.Optional[ctypes.CDLL]:
    """Load (building if needed) the imgio library; None on failure."""
    global _lib, _tried, _jpeg_ok
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("TPUSEG_NATIVE_IO", "1") == "0":
            return None
        lib = _lazy_load(_SRC, _SO, ("-lpng", "-ljpeg"))
        if lib is None:
            return None
        i64 = ctypes.c_int64
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        lib.imgio_load.argtypes = [ctypes.c_char_p, i64, i64, i64, i64,
                                   ctypes.c_float, f32p]
        lib.imgio_load.restype = i64
        lib.imgio_probe.argtypes = [ctypes.c_char_p,
                                    ctypes.POINTER(i64),
                                    ctypes.POINTER(i64)]
        lib.imgio_probe.restype = i64
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        lib.imgio_load_mem.argtypes = [u8p, i64, i64, i64, i64, i64,
                                       ctypes.c_float, f32p]
        lib.imgio_load_mem.restype = i64
        _jpeg_ok = _probe_jpeg(lib)
        _lib = lib
        return _lib


def reset() -> None:
    """Forget the loaded library so the next ``get_lib`` re-evaluates the
    TPUSEG_NATIVE_IO gate and re-runs the JPEG self-check (tests and
    benchmarks toggling the env var use this instead of poking module
    privates)."""
    global _lib, _tried, _jpeg_ok
    with _lock:
        _lib = None
        _tried = False
        _jpeg_ok = False


def load_image_native(path: str, size: tp.Tuple[int, int], color_mode: str,
                      resample: str = "lanczos", norm: float = 1.0
                      ) -> tp.Optional[np.ndarray]:
    """(H, W, C) float32 = decoded `path` converted to `color_mode`,
    resized to `size` (lanczos/nearest, PIL-exact), divided by `norm`.
    None -> caller must use the PIL path."""
    lib = get_lib()
    if lib is None:
        return None
    lower = path.lower()
    if not lower.endswith((".png", ".jpg", ".jpeg")):
        return None  # BMP/TIFF stay on PIL
    if lower.endswith((".jpg", ".jpeg")) and not _jpeg_ok:
        return None  # system libjpeg disagrees with Pillow's -> PIL
    c = 1 if color_mode == "grayscale" else 3
    out = np.empty((size[0], size[1], c), np.float32)
    rc = lib.imgio_load(os.fsencode(path), size[0], size[1], c,
                        1 if resample == "lanczos" else 0,
                        float(norm), out)
    if rc != 0:  # corrupt / 16-bit PNG / unsupported -> PIL decides
        return None
    return out


def load_image_bytes_native(data: bytes, size: tp.Tuple[int, int],
                            color_mode: str, resample: str = "lanczos",
                            norm: float = 1.0) -> tp.Optional[np.ndarray]:
    """Same pipeline from an in-memory PNG/JPEG buffer (HTTP request
    bodies).  None -> caller must use the PIL path."""
    lib = get_lib()
    if lib is None or len(data) < 2:
        return None
    if data[:2] == b"\xff\xd8":
        if not _jpeg_ok:
            return None
    elif data[:2] != b"\x89P":
        return None  # not PNG/JPEG -> PIL decides
    c = 1 if color_mode == "grayscale" else 3
    buf = np.frombuffer(data, np.uint8)
    out = np.empty((size[0], size[1], c), np.float32)
    rc = lib.imgio_load_mem(buf, buf.size, size[0], size[1], c,
                            1 if resample == "lanczos" else 0,
                            float(norm), out)
    if rc != 0:
        return None
    return out
