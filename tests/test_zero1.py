"""ZeRO-1 optimizer-state sharding on the 8-virtual-device CPU mesh:
numerics identical to replicated dp, moments actually sharded over
'data', composition with tensor parallelism, and INI wiring.

New capability over the reference (single-device Keras, SURVEY.md §2.3).
"""
import jax
import numpy as np
import pytest

from tf_1d_2d_segmentation_end2endpipelines_tpu.data import batches
from tf_1d_2d_segmentation_end2endpipelines_tpu.models import SegModel
from tf_1d_2d_segmentation_end2endpipelines_tpu.parallel import (
    make_mesh, zero1_state_shardings)
from tf_1d_2d_segmentation_end2endpipelines_tpu.train import Trainer


def _data(n=16, hw=32):
    rng = np.random.default_rng(0)
    x = rng.normal(size=(n, hw, hw, 1)).astype(np.float32)
    y = (rng.uniform(size=(n, hw, hw, 1)) > 0.5).astype(np.float32)
    return x, y


def _model():
    return SegModel(decoder_name="UNet", model_width=8, model_depth=2,
                    output_nums=1, final_activation="sigmoid")


def _run(x, y, mesh, **kw):
    tr = Trainer(_model(), loss="BinaryCrossentropy", learning_rate=1e-3,
                 mesh=mesh, seed=7, **kw)
    tr.init_state(x[:8])
    hist = tr.fit(batches(x, y, 8, shuffle=False), epochs=2, verbose=0)
    return tr, hist["loss"]


def test_zero1_matches_replicated_dp():
    x, y = _data()
    mesh = make_mesh(jax.devices(), data=8, model=1)
    _, base = _run(x, y, mesh)
    tr, z1 = _run(x, y, mesh, zero1=True)
    np.testing.assert_allclose(base, z1, rtol=2e-5)
    # the optimizer state is genuinely distributed: at least one moment
    # leaf sharded over 'data', and params stay replicated
    opt_specs = [str(l.sharding.spec)
                 for l in jax.tree.leaves(tr.state.opt_state)
                 if hasattr(l, "sharding")]
    assert any("data" in s for s in opt_specs)
    for leaf in jax.tree.leaves(tr.state.params):
        assert "data" not in str(leaf.sharding.spec)


def test_zero1_memory_footprint_shrinks():
    """Per-device moment bytes drop by ~the data-axis size for sharded
    leaves (addressable-shard inspection)."""
    x, y = _data()
    mesh = make_mesh(jax.devices(), data=8, model=1)
    tr, _ = _run(x, y, mesh, zero1=True)
    sharded = [l for l in jax.tree.leaves(tr.state.opt_state)
               if hasattr(l, "sharding")
               and "data" in str(l.sharding.spec)]
    assert sharded
    for leaf in sharded:
        shard = leaf.addressable_shards[0].data
        assert shard.size == leaf.size // 8


def test_zero1_composes_with_tensor_parallel():
    x, y = _data()
    mesh = make_mesh(jax.devices(), data=4, model=2)
    tr, losses = _run(x, y, mesh, zero1=True)
    assert np.isfinite(losses).all()
    # some kernel moment carries BOTH axes (cout over 'model', another
    # divisible axis over 'data')
    specs = [str(l.sharding.spec)
             for l in jax.tree.leaves(tr.state.opt_state)
             if hasattr(l, "sharding")]
    assert any("model" in s and "data" in s for s in specs)


def test_zero1_sharding_rule_skips_indivisible_leaves():
    mesh = make_mesh(jax.devices(), data=8, model=1)
    tr = Trainer(_model(), mesh=mesh, zero1=True)
    x, _ = _data(8)
    state = tr.init_state(x[:8])
    sh = zero1_state_shardings(mesh, state)
    flat = {jax.tree_util.keystr(p): s for p, s in
            jax.tree_util.tree_flatten_with_path(sh)[0]}
    # Adam's scalar step count cannot shard
    scalar_specs = [s for p, s in flat.items() if "count" in p]
    assert scalar_specs and all(
        str(s.spec) == "PartitionSpec()" for s in scalar_specs)


def test_zero1_ini_round_trip(tmp_path):
    from tf_1d_2d_segmentation_end2endpipelines_tpu.utils.config import (
        TrainConfig, load_train_config, save_train_config)
    path = str(tmp_path / "cfg.ini")
    save_train_config(TrainConfig(zero1=True), path)
    assert load_train_config(path).zero1 is True
    assert TrainConfig().zero1 is False


def test_three_axis_composition_matches_dp():
    """The full composition — batch over 'data', conv kernels
    channel-sharded over 'model', the image H axis over 'spatial', and
    ZeRO-1 moments over 'data' — in ONE jitted step on a 2x2x2 mesh,
    with the loss trajectory matching pure dp-over-8."""
    x, y = _data()
    _, base = _run(x, y, make_mesh(jax.devices(), data=8, model=1))
    mesh = make_mesh(jax.devices(), data=2, model=2, spatial=2)
    tr, comp = _run(x, y, mesh, zero1=True)
    np.testing.assert_allclose(comp, base, rtol=5e-5)
    # all three distribution mechanisms genuinely engaged:
    pspecs = [str(l.sharding.spec) for l in jax.tree.leaves(tr.state.params)]
    assert any("model" in s for s in pspecs)          # tensor parallel
    ospecs = [str(l.sharding.spec)
              for l in jax.tree.leaves(tr.state.opt_state)
              if hasattr(l, "sharding")]
    assert any("data" in s for s in ospecs)           # ZeRO-1
    assert "spatial" in mesh.axis_names               # sp axis present
