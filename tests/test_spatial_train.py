"""Spatial-parallel TRAINING: the image's H axis (a signal's L axis)
sharded over a mesh 'spatial' axis, with GSPMD partitioning every
conv/pool/norm along the sharded dimension — halo exchanges and
partial-statistics reductions are derived by XLA from the sharding
annotations alone; no hand-written collectives.

This is the trainable, XLA-native generalization of the overlap-tile
inference path in parallel/halo.py, and a new capability over the
reference (whose long-input story is host-side patchify,
helper_functions.py:18-28 — patches can't train with cross-patch
receptive fields; this can).  The contract everywhere: numerically
IDENTICAL to pure data parallelism.
"""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from tf_1d_2d_segmentation_end2endpipelines_tpu.models import SegModel
from tf_1d_2d_segmentation_end2endpipelines_tpu.parallel import (
    batch_sharding, make_mesh, replicated, shard_batch)
from tf_1d_2d_segmentation_end2endpipelines_tpu.train import (
    Trainer, get_loss, make_optimizer, make_train_step)
from tf_1d_2d_segmentation_end2endpipelines_tpu.train.state import (
    create_train_state)


def _losses(mesh, model, x, y, steps=3):
    opt = make_optimizer("Adam", 1e-3)
    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.asarray(x[:1]), opt)
    state = jax.device_put(state, replicated(mesh))
    step = jax.jit(make_train_step(model, opt, get_loss("BCEDiceLoss")),
                   donate_argnums=(0,))
    b = shard_batch(mesh, {"x": x, "y": y})
    out = []
    for _ in range(steps):
        state, loss, _ = step(state, b["x"], b["y"], ())
        out.append(float(loss))
    return out


def test_spatial_train_step_matches_dp():
    """UNet++ (convs, maxpools, transposed convs, BatchNorm, concats)
    trained with H sharded 4-way: the loss trajectory must equal pure
    dp-over-8 exactly — GSPMD's partitioned reduces ARE the global
    BN statistics."""
    rng = np.random.default_rng(0)
    x = rng.normal(size=(8, 32, 32, 3)).astype(np.float32)
    y = (rng.uniform(size=(8, 32, 32, 1)) > 0.5).astype(np.float32)
    model = SegModel(decoder_name="UNetPP", model_width=4, model_depth=3,
                     final_activation="sigmoid")
    dp = _losses(make_mesh(jax.devices(), data=8), model, x, y)
    sp = _losses(make_mesh(jax.devices(), data=2, spatial=4), model, x, y)
    assert all(np.isfinite(dp))
    np.testing.assert_allclose(sp, dp, rtol=0, atol=1e-6)


def test_trainer_spatial_1d_sequence_parallel():
    """Sequence parallelism for signals: (B, L, C) with L sharded over
    'spatial' through the plain Trainer — same loss curve as dp."""
    rng = np.random.default_rng(1)
    x = rng.normal(size=(4, 64, 1)).astype(np.float32)
    y = (rng.uniform(size=(4, 64, 1)) > 0.5).astype(np.float32)

    def fit(mesh):
        model = SegModel(decoder_name="UNet", model_width=4, model_depth=2,
                         final_activation="sigmoid")
        tr = Trainer(model, loss="BinaryCrossentropy", learning_rate=1e-2,
                     mesh=mesh)
        tr.init_state(x)
        data = lambda: iter([(x, y)])  # noqa: E731
        return tr.fit(data, epochs=3, verbose=0)["loss"]

    dp = fit(make_mesh(jax.devices()[:4], data=4))
    sp = fit(make_mesh(jax.devices()[:4], data=1, spatial=4))
    np.testing.assert_allclose(sp, dp, rtol=0, atol=1e-5)


def test_batch_sharding_spatial_specs():
    """Sharding-spec plumbing: axis 1 shards over 'spatial' only for
    rank>=3 leaves whose extent divides the axis; everything else keeps
    the dp layout."""
    mesh = make_mesh(jax.devices(), data=2, spatial=4)
    assert batch_sharding(mesh, 4).spec == P("data", "spatial", None, None)
    assert batch_sharding(mesh, 3).spec == P("data", "spatial", None)
    assert batch_sharding(mesh, 2).spec == P("data", None)

    batch = {
        "img": np.zeros((4, 16, 16, 3), np.float32),   # divisible H
        "odd": np.zeros((4, 15, 16, 1), np.float32),   # 15 % 4 != 0
        "lab": np.zeros((4, 7), np.float32),           # rank 2
    }
    placed = shard_batch(mesh, batch)
    assert placed["img"].sharding.spec == P("data", "spatial", None, None)
    assert placed["odd"].sharding.spec == P("data", None, None, None)
    assert placed["lab"].sharding.spec == P("data", None)


def test_spatial_ds_pyramid_targets():
    """Deep supervision composes: the dict-of-heads pyramid trains on the
    spatial mesh (each level shards independently; indivisible levels
    fall back to replication over 'spatial') and matches dp."""
    from tf_1d_2d_segmentation_end2endpipelines_tpu.data import (
        prepare_train_dict)
    rng = np.random.default_rng(2)
    x = rng.normal(size=(4, 32, 32, 3)).astype(np.float32)
    y = (rng.uniform(size=(4, 32, 32, 1)) > 0.5).astype(np.float32)

    def fit(mesh):
        model = SegModel(decoder_name="UNet", model_width=4,
                         model_depth=2, final_activation="sigmoid", ds=1)
        tr = Trainer(model, loss="BCEDiceLoss", learning_rate=1e-2,
                     mesh=mesh)
        tr.init_state(x)
        targets = jax.tree.map(np.asarray, prepare_train_dict(
            jnp.asarray(y), model_depth=2, ds_type="UNet"))
        data = lambda: iter([(x, targets)])  # noqa: E731
        return tr.fit(data, epochs=2, verbose=0)["loss"]

    dp = fit(make_mesh(jax.devices()[:4], data=4))
    sp = fit(make_mesh(jax.devices()[:4], data=2, spatial=2))
    np.testing.assert_allclose(sp, dp, rtol=0, atol=1e-5)


def test_make_mesh_spatial_validation():
    with pytest.raises(ValueError):
        make_mesh(jax.devices(), data=3, spatial=3)
    mesh = make_mesh(jax.devices(), spatial=4)  # data inferred = 2
    assert mesh.shape == {"data": 2, "spatial": 4, "model": 1}


def test_driver_spatial_parallel_ini(tmp_path):
    """INI-level spatial parallelism: `spatial_parallel=2` trains through
    the plain 2D driver and matches the pure-dp loss curve."""
    from PIL import Image

    from tf_1d_2d_segmentation_end2endpipelines_tpu.drivers import (
        train as run_train)
    from tf_1d_2d_segmentation_end2endpipelines_tpu.utils.config import (
        TrainConfig, load_train_config, save_train_config)

    root = tmp_path / "Data" / "Train"
    rng = np.random.default_rng(0)
    for sub in ("images", "masks"):
        os.makedirs(root / sub, exist_ok=True)
    for i in range(4):
        img = rng.uniform(0, 255, (32, 32, 3)).astype(np.uint8)
        msk = np.zeros((32, 32), np.uint8)
        msk[8:20, 8:20] = 255
        Image.fromarray(img).save(root / "images" / f"{i}.png")
        Image.fromarray(msk).save(root / "masks" / f"{i}.png")

    def cfg(sp, save):
        return TrainConfig(
            train_dir=str(root), independent_val_set=False,
            imlength=32, imwidth=32, model_width=4, model_depth=2,
            decoder_name="UNet", batch_size=4, num_epochs=2,
            learning_rate=1e-3, monitor_param="loss",
            save_dir=str(tmp_path / save), load_weights=False,
            spatial_parallel=sp)

    # the key round-trips through the reference INI format
    ini = tmp_path / "Train_Configs.ini"
    save_train_config(cfg(2, "R2"), str(ini))
    loaded = load_train_config(str(ini))
    assert loaded.spatial_parallel == 2

    h_dp = run_train(config=cfg(1, "R1"))[1]["loss"]
    h_sp = run_train(config=loaded)[1]["loss"]
    np.testing.assert_allclose(h_sp, h_dp, rtol=0, atol=1e-5)
