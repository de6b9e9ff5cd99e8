"""Output-residual (Leaky)ReLU VJPs are bit-identical to the stock rules.

The stock jax.nn rules save the pre-activation input as the autodiff
residual; ops.blocks.relu_outres / leaky_relu_outres recompute the backward
mask from the output instead (sign is preserved by both activations), so the
residual CSEs with the next layer's saved input.  These tests pin down that
forward AND backward are bit-identical, including the x == ±0 conventions.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tf_1d_2d_segmentation_end2endpipelines_tpu.ops import blocks


def _cases(dtype):
    rng = np.random.default_rng(0)
    vals = rng.standard_normal(4096).astype(dtype) * 3.0
    # smallest magnitudes stay above min_normal/slope: XLA flushes
    # subnormals to zero, so slope*x underflows for |x| < ~3.9e-38 — the
    # one documented leaky_relu divergence (tested separately below).
    special = np.array([0.0, -0.0, 1e-30, -1e-30, 1e-37, -1e-37,
                        7.5, -7.5], dtype=dtype)
    return jnp.asarray(np.concatenate([vals, special]))


@pytest.mark.parametrize("dtype", [np.float32, jnp.bfloat16])
def test_relu_outres_bitexact(dtype):
    x = _cases(np.float32).astype(dtype)
    g = _cases(np.float32)[::-1].astype(dtype) + jnp.asarray(0.25, dtype)

    y_ref, vjp_ref = jax.vjp(jax.nn.relu, x)
    y_new, vjp_new = jax.vjp(blocks.relu_outres, x)
    np.testing.assert_array_equal(np.asarray(y_ref, np.float32),
                                  np.asarray(y_new, np.float32))
    np.testing.assert_array_equal(np.asarray(vjp_ref(g)[0], np.float32),
                                  np.asarray(vjp_new(g)[0], np.float32))


@pytest.mark.parametrize("dtype", [np.float32, jnp.bfloat16])
def test_leaky_relu_outres_bitexact(dtype):
    x = _cases(np.float32).astype(dtype)
    g = _cases(np.float32)[::-1].astype(dtype) + jnp.asarray(0.25, dtype)

    ref = lambda t: jax.nn.leaky_relu(t, negative_slope=blocks.LEAKY_SLOPE)
    y_ref, vjp_ref = jax.vjp(ref, x)
    y_new, vjp_new = jax.vjp(blocks.leaky_relu_outres, x)
    np.testing.assert_array_equal(np.asarray(y_ref, np.float32),
                                  np.asarray(y_new, np.float32))
    np.testing.assert_array_equal(np.asarray(vjp_ref(g)[0], np.float32),
                                  np.asarray(vjp_new(g)[0], np.float32))


def test_leaky_underflow_boundary():
    # The one documented divergence: negative x where slope*x flushes to
    # -0.0 (|x| < min_normal/slope under XLA's FTZ) reads mask >= 0 and
    # gets slope 1 instead of 0.3.  Pin the boundary: just above it the
    # two rules agree exactly.
    above = np.float32(1e-37)   # slope*x ~ 3e-38 >= min_normal: exact
    x = jnp.asarray(np.array([-above, above, -1.0, 1.0], np.float32))
    g = jnp.ones_like(x)
    ref = lambda t: jax.nn.leaky_relu(t, negative_slope=blocks.LEAKY_SLOPE)
    _, vjp_ref = jax.vjp(ref, x)
    _, vjp_new = jax.vjp(blocks.leaky_relu_outres, x)
    np.testing.assert_array_equal(np.asarray(vjp_ref(g)[0]),
                                  np.asarray(vjp_new(g)[0]))

    below = np.finfo(np.float32).tiny  # slope*x flushes to -0.0: diverges
    xb = jnp.asarray(np.array([-below], np.float32))
    _, vjp_new_b = jax.vjp(blocks.leaky_relu_outres, xb)
    gb = jnp.ones_like(xb)
    assert float(vjp_new_b(gb)[0][0]) in (1.0, blocks.LEAKY_SLOPE)


def test_convblock_grads_identical_under_output_residual(monkeypatch):
    # Full block: conv -> BN -> relu, grads w.r.t. params bit-identical
    # with the output-residual table switched on.
    x = jnp.asarray(np.random.default_rng(1).standard_normal(
        (2, 8, 8, 3)).astype(np.float32))

    def loss_fn(params, bst):
        m = blocks.ConvBlock(features=4)
        out, _ = m.apply({"params": params, "batch_stats": bst}, x,
                         train=True, mutable=["batch_stats"])
        return jnp.sum(out * out)

    m = blocks.ConvBlock(features=4)
    variables = m.init(jax.random.PRNGKey(0), x, train=True)
    params, bst = variables["params"], variables["batch_stats"]

    monkeypatch.setattr(blocks, "_OUTPUT_RESIDUAL_ACTS", False)
    g_ref = jax.grad(loss_fn)(params, bst)
    monkeypatch.setattr(blocks, "_OUTPUT_RESIDUAL_ACTS", True)
    g_new = jax.grad(loss_fn)(params, bst)

    for ref_leaf, new_leaf in zip(jax.tree_util.tree_leaves(g_ref),
                                  jax.tree_util.tree_leaves(g_new)):
        np.testing.assert_array_equal(np.asarray(ref_leaf),
                                      np.asarray(new_leaf))
