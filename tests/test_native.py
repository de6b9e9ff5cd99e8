"""Native patcher: correctness vs numpy reference paths."""
import numpy as np
import pytest

from tf_1d_2d_segmentation_end2endpipelines_tpu import native
from tf_1d_2d_segmentation_end2endpipelines_tpu.data.patch import (
    create_patches, unpatchify)


@pytest.mark.skipif(native.get_lib() is None, reason="no native toolchain")
def test_native_matches_numpy():
    img = np.random.default_rng(0).random((96, 96, 3)).astype(np.float32)
    fast = native.extract_patches(img, 32, 16)
    # numpy reference
    ref, n = [], 0
    for y in range(0, 96 - 32 + 1, 16):
        for x in range(0, 96 - 32 + 1, 16):
            ref.append(img[y:y + 32, x:x + 32])
    ref = np.stack(ref)
    np.testing.assert_array_equal(fast, ref)
    acc, cnt = native.accumulate_patches(fast, (96, 96), 16)
    rec = (acc / np.maximum(cnt, 1.0)).astype(np.float32)
    np.testing.assert_allclose(rec, img, atol=1e-6)
    norm = native.normalize_u8(np.arange(256, dtype=np.uint8), 255.0)
    np.testing.assert_allclose(norm, np.arange(256) / 255.0, rtol=1e-6)


def test_patch_roundtrip_via_public_api():
    img = np.random.default_rng(1).random((64, 64, 1)).astype(np.float32)
    p, n = create_patches(img, (32, 32), 0.5)
    assert n == 9 and p.shape == (9, 32, 32, 1)
    rec = unpatchify(p, (64, 64), 0.5)
    np.testing.assert_allclose(rec, img, atol=1e-6)
