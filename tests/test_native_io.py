"""Native image IO (native/imgio.cpp) must be BIT-EXACT with the PIL
path so numerics never depend on whether a toolchain is present.  The
PIL algorithms replicated: convert("L") fixed-point luma, NEAREST's
cumulative float64 affine stepping, LANCZOS's 22-bit fixed-point
two-pass resample (reference loader semantics: DataGenerator.py:68-77).
"""
import os

import numpy as np
import pytest
from PIL import Image

from tf_1d_2d_segmentation_end2endpipelines_tpu.data.generators import \
    load_image
from tf_1d_2d_segmentation_end2endpipelines_tpu.native import imgio

pytestmark = pytest.mark.skipif(imgio.get_lib() is None,
                                reason="native imgio unavailable")


def _pil(path, size, color_mode, resample, norm=1.0):
    img = Image.open(path).convert(
        "L" if color_mode == "grayscale" else "RGB")
    if img.size != (size[1], size[0]):
        img = img.resize((size[1], size[0]),
                         Image.LANCZOS if resample == "lanczos"
                         else Image.NEAREST)
    arr = np.asarray(img, np.float32)
    if arr.ndim == 2:
        arr = arr[..., None]
    return arr if norm == 1.0 else arr / np.float32(norm)


def _save(tmp_path, mode, name, h, w, seed=0):
    rng = np.random.default_rng(seed)
    if mode == "P":
        img = Image.fromarray(
            rng.integers(0, 256, (h, w, 3), dtype=np.uint8),
            "RGB").convert("P", palette=Image.ADAPTIVE)
    else:
        c = {"RGB": 3, "RGBA": 4, "L": 1, "LA": 2}[mode]
        arr = rng.integers(0, 256, (h, w, c) if c > 1 else (h, w),
                           dtype=np.uint8)
        img = Image.fromarray(arr, mode)
    path = str(tmp_path / name)
    img.save(path)
    return path


@pytest.mark.parametrize("mode,name", [
    ("RGB", "rgb.png"), ("L", "gray.png"), ("RGBA", "rgba.png"),
    ("P", "pal.png"), ("LA", "la.png"), ("RGB", "rgb.jpg"),
    ("L", "gray.jpg")])
def test_native_matches_pil_bit_exact(tmp_path, mode, name):
    """Every (source mode, color_mode, resample, size) cell decodes to
    the identical float32 array through C and through PIL."""
    h, w = 41, 57
    path = _save(tmp_path, mode, name, h, w)
    for cm in ("rgb", "grayscale"):
        for res in ("lanczos", "nearest"):
            for out in ((h, w), (32, 48), (96, 80)):
                nat = imgio.load_image_native(path, out, cm, res)
                assert nat is not None, (cm, res, out)
                ref = _pil(path, out, cm, res)
                np.testing.assert_array_equal(nat, ref,
                                              err_msg=str((cm, res, out)))


def test_fused_normalization_matches(tmp_path):
    """norm is fused into the C pass; float32 division semantics match
    the numpy `arr / norm` of the fallback exactly."""
    path = _save(tmp_path, "RGB", "n.png", 40, 40)
    nat = imgio.load_image_native(path, (24, 24), "rgb", "lanczos", 255.0)
    np.testing.assert_array_equal(
        nat, _pil(path, (24, 24), "rgb", "lanczos", 255.0))


def test_load_image_uses_native_and_fallback_agrees(tmp_path, monkeypatch):
    """data.generators.load_image routes through the native path and the
    PIL fallback (TPUSEG_NATIVE_IO=0 semantics) produces the same array."""
    path = _save(tmp_path, "RGB", "r.png", 50, 30)
    via_native = load_image(path, (32, 32), "rgb", "lanczos", 255.0)
    # force the fallback branch without re-importing the module
    monkeypatch.setattr(imgio, "load_image_native",
                        lambda *a, **k: None)
    monkeypatch.setattr(
        "tf_1d_2d_segmentation_end2endpipelines_tpu.native.imgio."
        "load_image_native", lambda *a, **k: None)
    via_pil = load_image(path, (32, 32), "rgb", "lanczos", 255.0)
    np.testing.assert_array_equal(via_native, via_pil)


def test_unsupported_inputs_return_none(tmp_path):
    """Corrupt files, unsupported containers (BMP), and 16-bit PNGs all
    return None so the caller falls back to PIL."""
    bad = tmp_path / "bad.png"
    bad.write_bytes(b"\x89Pnot-a-png")
    assert imgio.load_image_native(str(bad), (8, 8), "rgb") is None

    bmp = tmp_path / "img.bmp"
    Image.fromarray(np.zeros((8, 8), np.uint8)).save(str(bmp))
    assert imgio.load_image_native(str(bmp), (8, 8), "rgb") is None

    deep = tmp_path / "deep.png"
    arr16 = (np.arange(64, dtype=np.uint16).reshape(8, 8) * 1021)
    Image.fromarray(arr16, "I;16").save(str(deep))
    assert imgio.load_image_native(str(deep), (8, 8), "grayscale") is None
    # and the public loader still works via PIL
    out = load_image(str(bmp), (8, 8), "grayscale", "nearest")
    assert out.shape == (8, 8, 1)


def test_probe(tmp_path):
    import ctypes
    path = _save(tmp_path, "RGB", "p.png", 33, 21)
    lib = imgio.get_lib()
    h = ctypes.c_int64()
    w = ctypes.c_int64()
    assert lib.imgio_probe(os.fsencode(path), ctypes.byref(h),
                           ctypes.byref(w)) == 0
    assert (h.value, w.value) == (33, 21)


def test_load_image_bytes_matches_pil(tmp_path):
    """The in-memory variant (HTTP request bodies, serve._decode_request)
    is bit-exact with the PIL stream path for PNG and JPEG."""
    import io
    rng = np.random.default_rng(3)
    for mode, fmt in (("RGB", "PNG"), ("L", "PNG"), ("RGBA", "PNG"),
                      ("RGB", "JPEG")):
        c = {"RGB": 3, "RGBA": 4, "L": 1}[mode]
        arr = rng.integers(0, 256, (37, 53, c) if c > 1 else (37, 53),
                           dtype=np.uint8)
        b = io.BytesIO()
        Image.fromarray(arr, mode).save(b, fmt)
        data = b.getvalue()
        for cm in ("rgb", "grayscale"):
            img = Image.open(io.BytesIO(data)).convert(
                "L" if cm == "grayscale" else "RGB")
            img = img.resize((32, 24), Image.LANCZOS)
            ref = np.asarray(img, np.float32)
            ref = (ref[..., None] if ref.ndim == 2 else ref) / \
                np.float32(255.0)
            nat = imgio.load_image_bytes_native(data, (24, 32), cm,
                                                "lanczos", 255.0)
            assert nat is not None, (mode, fmt, cm)
            np.testing.assert_array_equal(nat, ref)
    # junk bytes -> None (caller falls back to PIL's error handling)
    assert imgio.load_image_bytes_native(b"nonsense", (8, 8), "rgb") is None
    assert imgio.load_image_bytes_native(b"\x89Pjunk", (8, 8), "rgb") is None
