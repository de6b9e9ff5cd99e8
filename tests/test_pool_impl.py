"""The slicemax pooling path (TPUSEG_POOL_IMPL=slicemax) must be
indistinguishable from lax.reduce_window — forward bit-exact, backward
identical INCLUDING tie plateaus (post-ReLU zeros), where a naive
max-of-slices autodiff would split gradients 0.5/0.5 instead of routing
to the first max like XLA's select_and_scatter."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tf_1d_2d_segmentation_end2endpipelines_tpu.ops.blocks import (
    _slicemax_pool, downsample_pool)


@pytest.mark.parametrize("shape,f", [
    ((2, 8, 8, 3), (2, 2)),
    ((2, 9, 7, 3), (2, 2)),   # non-divisible: VALID truncation
    ((2, 12, 1), (3,)),       # 1D, factor 3
    ((1, 6, 4, 5), (3, 2)),   # anisotropic factor
])
def test_slicemax_matches_reduce_window(shape, f):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    # inject plateaus: ReLU-like zeros and exact duplicates
    x = jnp.where(x < 0.3, 0.0, x)

    factor = f if len(f) > 1 else f[0]
    ref = downsample_pool(x, factor, op="max")
    out = _slicemax_pool(x, f)
    assert out.shape == ref.shape
    assert jnp.array_equal(out, ref)

    g = jnp.asarray(rng.normal(size=ref.shape).astype(np.float32))
    ref_grad = jax.grad(lambda t: jnp.vdot(
        downsample_pool(t, factor, op="max"), g))(x)
    slice_grad = jax.grad(lambda t: jnp.vdot(_slicemax_pool(t, f), g))(x)
    assert jnp.array_equal(slice_grad, ref_grad)


def test_slicemax_env_switch(monkeypatch):
    x = jnp.asarray(np.random.default_rng(1).normal(
        size=(1, 8, 8, 2)).astype(np.float32))
    base = downsample_pool(x, 2, op="max")
    monkeypatch.setenv("TPUSEG_POOL_IMPL", "slicemax")
    assert jnp.array_equal(downsample_pool(x, 2, op="max"), base)
