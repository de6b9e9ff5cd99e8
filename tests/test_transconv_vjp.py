"""Explicit-gradient transposed conv (TPUSEG_TRANSCONV_VJP=explicit).

``lax.conv_transpose(transpose_kernel=True)`` is the linear transpose of a
plain strided conv with the same kernel; the explicit VJP in ops/blocks.py
exploits that identity so the backward pass is a plain strided conv (no
input dilation / reverses).  These tests pin (a) forward bit-equality with
``nn.ConvTranspose``, (b) gradient equality with jax's stock autodiff, for
1D/2D, even and odd sizes, f32 and bf16, and (c) param-tree compatibility
of ``TransConv`` under either implementation.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from tf_1d_2d_segmentation_end2endpipelines_tpu.ops import blocks
from tf_1d_2d_segmentation_end2endpipelines_tpu.ops.blocks import (
    TransConv, _ExplicitGradConvTranspose)


def _pair(n, size, cin=5, cout=3, dtype=jnp.float32):
    """Stock and explicit modules with identical params, plus an input."""
    kw = dict(features=cout, kernel_size=(4,) * n, strides=(2,) * n,
              padding="SAME", transpose_kernel=True, dtype=dtype)
    stock = nn.ConvTranspose(**kw)
    expl = _ExplicitGradConvTranspose(**kw)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1),
                          (2,) + (size,) * n + (cin,), jnp.float32)
    params = stock.init(rng, x)
    assert jax.tree.map(jnp.shape, params) == \
        jax.tree.map(jnp.shape, expl.init(rng, x))
    return stock, expl, params, x


@pytest.mark.parametrize("n,size", [(1, 16), (1, 13), (2, 8), (2, 7)])
def test_forward_bit_identical(n, size):
    stock, expl, params, x = _pair(n, size)
    a = stock.apply(params, x)
    b = expl.apply(params, x)
    assert a.shape == b.shape == (2,) + (2 * size,) * n + (3,)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("n,size", [(1, 16), (1, 13), (2, 8), (2, 7)])
def test_gradients_match_stock_autodiff(n, size):
    stock, expl, params, x = _pair(n, size)
    cot = jax.random.normal(jax.random.PRNGKey(2),
                            (2,) + (2 * size,) * n + (3,), jnp.float32)

    def loss(mod):
        return lambda p, v: jnp.sum(mod.apply(p, v) * cot)

    gp_a, gx_a = jax.grad(loss(stock), argnums=(0, 1))(params, x)
    gp_b, gx_b = jax.grad(loss(expl), argnums=(0, 1))(params, x)
    np.testing.assert_allclose(np.asarray(gx_a), np.asarray(gx_b),
                               rtol=1e-5, atol=1e-5)
    assert (jax.tree_util.tree_structure(gp_a)
            == jax.tree_util.tree_structure(gp_b))
    for va, vb in zip(jax.tree.leaves(gp_a), jax.tree.leaves(gp_b)):
        np.testing.assert_allclose(np.asarray(va), np.asarray(vb),
                                   rtol=1e-5, atol=1e-5)


def test_gradients_match_bf16(monkeypatch):
    # the training dtype: promotion to bf16 happens before the custom op
    stock, expl, params, x = _pair(2, 8, dtype=jnp.bfloat16)
    cot = jax.random.normal(jax.random.PRNGKey(2), (2, 16, 16, 3),
                            jnp.float32)

    def loss(mod):
        return lambda p, v: jnp.sum(
            mod.apply(p, v).astype(jnp.float32) * cot)

    gp_a, gx_a = jax.grad(loss(stock), argnums=(0, 1))(params, x)
    gp_b, gx_b = jax.grad(loss(expl), argnums=(0, 1))(params, x)
    np.testing.assert_allclose(np.asarray(gx_a), np.asarray(gx_b),
                               rtol=2e-2, atol=2e-2)
    for va, vb in zip(jax.tree.leaves(gp_a), jax.tree.leaves(gp_b)):
        np.testing.assert_allclose(np.asarray(va), np.asarray(vb),
                                   rtol=2e-2, atol=2e-2)


def test_transconv_param_tree_stable_under_toggle(monkeypatch):
    """TransConv's param tree (names + shapes) must not depend on the
    TPUSEG_TRANSCONV_VJP selection — checkpoints trained one way restore
    the other way."""
    x = jnp.ones((1, 8, 8, 4))
    trees = {}
    for flag in (False, True):
        monkeypatch.setattr(blocks, "_TRANSCONV_EXPLICIT", flag)
        params = TransConv(6).init(jax.random.PRNGKey(0), x)
        trees[flag] = jax.tree.map(jnp.shape, params)
    assert trees[False] == trees[True]
    flat = jax.tree_util.tree_leaves_with_path(trees[True])
    names = {jax.tree_util.keystr(p) for p, _ in flat}
    assert any("ConvTranspose_0" in s for s in names), names


def test_transconv_block_values_and_grads_match(monkeypatch):
    """Whole TransConv block (conv + bias + LeakyReLU) equal both ways."""
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 9, 9, 4))
    cot = jax.random.normal(jax.random.PRNGKey(4), (2, 18, 18, 6))
    out, grads = {}, {}
    for flag in (False, True):
        monkeypatch.setattr(blocks, "_TRANSCONV_EXPLICIT", flag)
        mod = TransConv(6)
        params = mod.init(jax.random.PRNGKey(0), x)
        out[flag] = mod.apply(params, x)
        grads[flag] = jax.grad(
            lambda p: jnp.sum(mod.apply(p, x) * cot))(params)
    np.testing.assert_array_equal(np.asarray(out[False]),
                                  np.asarray(out[True]))
    for va, vb in zip(jax.tree.leaves(grads[False]),
                      jax.tree.leaves(grads[True])):
        np.testing.assert_allclose(np.asarray(va), np.asarray(vb),
                                   rtol=1e-5, atol=1e-5)


def test_explicit_rejects_unsupported_config():
    mod = _ExplicitGradConvTranspose(features=3, kernel_size=(4, 4),
                                     strides=(2, 2), padding="VALID",
                                     transpose_kernel=True)
    with pytest.raises(NotImplementedError):
        mod.init(jax.random.PRNGKey(0), jnp.ones((1, 8, 8, 2)))
