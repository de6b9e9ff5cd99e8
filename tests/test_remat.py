"""Per-block rematerialization (`block_remat`) and the 'conv_outs' remat
policy (train/state.py REMAT_POLICIES).

The contract under test (ops/blocks.py::remat_block):
  - param naming parity: block_remat on/off produce the SAME param pytree
    (paths + shapes), so checkpoints are interchangeable;
  - numerics: forward outputs and gradients are bit-identical on/off
    (remat recomputes the same ops in the same order);
  - 'conv_outs' is a valid remat policy for make_train_step and matches
    the plain step's loss/grads.

Reference for the models exercised: MultiResUNet
(/root/reference/TensorFlow/2DCNN/models/unet_variants.py:85-127) and
UNet++ (:277-343) — the two zoo families the per-block form targets.
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from tf_1d_2d_segmentation_end2endpipelines_tpu.models import SegModel
from tf_1d_2d_segmentation_end2endpipelines_tpu.train.state import (
    _remat_policy, make_train_step)
from tf_1d_2d_segmentation_end2endpipelines_tpu.train.losses import get_loss


def _tree_paths(tree):
    return [(jax.tree_util.keystr(p), v.shape, v.dtype)
            for p, v in jax.tree_util.tree_flatten_with_path(tree)[0]]


def _build(decoder, block_remat):
    return SegModel(decoder_name=decoder, model_width=8, model_depth=3,
                    block_remat=block_remat)


@pytest.mark.parametrize("decoder", ["UNetPP", "MultiResUNet", "UNet3P"])
def test_block_remat_param_naming_parity(decoder):
    x = jnp.zeros((1, 32, 32, 3))
    v_off = _build(decoder, False).init(jax.random.PRNGKey(0), x, train=False)
    v_on = _build(decoder, True).init(jax.random.PRNGKey(0), x, train=False)
    assert _tree_paths(v_off) == _tree_paths(v_on)
    # identical RNG folding => bit-identical initial params
    off_leaves = jax.tree_util.tree_leaves(v_off)
    on_leaves = jax.tree_util.tree_leaves(v_on)
    for a, b in zip(off_leaves, on_leaves):
        np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("decoder", ["UNetPP", "MultiResUNet"])
def test_block_remat_forward_and_grads_identical(decoder):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)), jnp.float32)
    y = jnp.asarray(rng.uniform(size=(2, 32, 32, 1)) > 0.5, jnp.float32)
    m_off, m_on = _build(decoder, False), _build(decoder, True)
    variables = m_off.init(jax.random.PRNGKey(0), x, train=False)

    def loss_fn(model, params):
        def f(p):
            out, _ = model.apply(
                {**variables, "params": p}, x, train=True,
                mutable=["batch_stats"])
            return optax.sigmoid_binary_cross_entropy(
                out["out"], y).mean()
        return jax.value_and_grad(f)(params)

    l_off, g_off = jax.jit(lambda p: loss_fn(m_off, p))(variables["params"])
    l_on, g_on = jax.jit(lambda p: loss_fn(m_on, p))(variables["params"])
    np.testing.assert_array_equal(np.asarray(l_off), np.asarray(l_on))
    for a, b in zip(jax.tree_util.tree_leaves(g_off),
                    jax.tree_util.tree_leaves(g_on)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_conv_outs_policy_resolves():
    assert callable(_remat_policy("conv_outs"))
    with pytest.raises(ValueError, match="unknown remat policy"):
        _remat_policy("nope")


def test_train_step_conv_outs_matches_plain():
    # same params + batch: remat must not change the computed loss/update
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)), jnp.float32)
    y = jnp.asarray(rng.uniform(size=(2, 32, 32, 1)) > 0.5, jnp.float32)
    model = _build("UNet", False)
    tx = optax.sgd(1e-2)
    from tf_1d_2d_segmentation_end2endpipelines_tpu.train.state import (
        create_train_state)

    results = {}
    for remat in (None, "conv_outs"):
        step = make_train_step(model, tx, get_loss("BinaryCrossentropy"),
                               remat=remat)
        state = create_train_state(model, jax.random.PRNGKey(0),
                                   np.asarray(x[:1]), tx)
        new_state, loss, _ = jax.jit(step)(state, x, y)
        results[remat] = (
            float(loss),
            [np.asarray(l) for l in
             jax.tree_util.tree_leaves(new_state.params)])
    (l0, p0), (l1, p1) = results[None], results["conv_outs"]
    assert l0 == pytest.approx(l1, abs=1e-7)
    for a, b in zip(p0, p1):
        np.testing.assert_allclose(a, b, atol=1e-7)


def test_driver_remat_blocks_builds_block_remat_model():
    # INI remat = blocks -> SegModel(block_remat=True) + un-rematted step
    from tf_1d_2d_segmentation_end2endpipelines_tpu.drivers import (
        _build_model)
    from tf_1d_2d_segmentation_end2endpipelines_tpu.utils.config import (
        TrainConfig)
    cfg = TrainConfig(decoder_name="UNet", model_width=8, model_depth=2,
                      remat="blocks")
    model = _build_model(cfg)
    assert model.block_remat is True
    cfg2 = TrainConfig(decoder_name="UNet", model_width=8, model_depth=2)
    assert _build_model(cfg2).block_remat is False


def test_driver_1d_rejects_blocks():
    from tf_1d_2d_segmentation_end2endpipelines_tpu.drivers_1d import (
        train_1d)
    from tf_1d_2d_segmentation_end2endpipelines_tpu.utils.config import (
        Signal1DConfig)
    with pytest.raises(ValueError, match="2D-only"):
        train_1d(config=Signal1DConfig(remat="blocks"))
