"""Mesh/sharding tests on the 8-virtual-device CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np

from tf_1d_2d_segmentation_end2endpipelines_tpu.models import SegModel
from tf_1d_2d_segmentation_end2endpipelines_tpu.parallel import (
    make_mesh, sharded_patch_inference, state_shardings)
from tf_1d_2d_segmentation_end2endpipelines_tpu.train import (
    Trainer, create_train_state, get_loss, make_optimizer, make_train_step)


def test_tp_sharded_train_step():
    mesh = make_mesh(jax.devices(), data=4, model=2)
    model = SegModel(decoder_name="UNet", model_width=8, model_depth=2)
    opt = make_optimizer("Adam", 1e-3)
    x = np.random.default_rng(0).normal(size=(8, 32, 32, 3)).astype(
        np.float32)
    y = (np.random.default_rng(1).uniform(size=(8, 32, 32, 1)) > 0.5
         ).astype(np.float32)
    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.asarray(x[:1]), opt)
    shardings = state_shardings(mesh, state)
    state = jax.device_put(state, shardings)
    # at least one kernel is actually sharded over 'model'
    flat = jax.tree.leaves(shardings)
    assert any("model" in str(s.spec) for s in flat)
    step = jax.jit(make_train_step(model, opt, get_loss("DiceLoss")))
    from tf_1d_2d_segmentation_end2endpipelines_tpu.parallel import shard_batch
    b = shard_batch(mesh, {"x": x, "y": y})
    new_state, loss, _ = step(state, b["x"], b["y"], ())
    assert np.isfinite(float(loss))


def test_sharded_patch_inference():
    mesh = make_mesh(jax.devices(), data=8, model=1)
    model = SegModel(decoder_name="UNet", model_width=4, model_depth=2)
    tr = Trainer(model, mesh=mesh)
    tr.init_state(np.zeros((1, 32, 32, 1), np.float32))
    tr._build_steps()
    tr._ensure_state_placement()
    img = np.random.default_rng(0).random((96, 96, 1)).astype(np.float32)
    out = sharded_patch_inference(tr._predict_step, tr.state, img,
                                  patch=32, overlap_ratio=0.5, mesh=mesh)
    assert out.shape == (96, 96, 1)
    assert np.isfinite(out).all()


def test_halo_conv_matches_unsharded():
    from tf_1d_2d_segmentation_end2endpipelines_tpu.parallel.halo import (
        halo_conv2d)
    mesh = make_mesh(jax.devices(), data=8, model=1)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 64, 32, 3)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(3, 3, 3, 4)).astype(np.float32))
    ref = jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    out = jax.jit(lambda x, k: halo_conv2d(x, k, mesh))(x, k)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_sharded_window_inference_1d():
    from tf_1d_2d_segmentation_end2endpipelines_tpu.parallel import (
        sharded_window_inference)
    mesh = make_mesh(jax.devices(), data=8, model=1)
    model = SegModel(decoder_name="UNet", model_width=4, model_depth=2)
    tr = Trainer(model, mesh=mesh)
    tr.init_state(np.zeros((1, 64, 1), np.float32))
    tr._build_steps()
    tr._ensure_state_placement()
    sig = np.random.default_rng(0).random((1000, 1)).astype(np.float32)
    out = sharded_window_inference(tr._predict_step, tr.state, sig,
                                   window=64, overlap_ratio=0.5, mesh=mesh)
    assert out.shape == (1000, 1)
    assert np.isfinite(out).all()
