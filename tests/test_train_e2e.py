"""End-to-end training tests: loss decreases on synthetic data (BASELINE
config 1), sharded over the 8-virtual-device CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tf_1d_2d_segmentation_end2endpipelines_tpu.data import (
    batches, prepare_train_dict, synthetic_images, synthetic_signals)
from tf_1d_2d_segmentation_end2endpipelines_tpu.models import SegModel
from tf_1d_2d_segmentation_end2endpipelines_tpu.parallel import local_mesh
from tf_1d_2d_segmentation_end2endpipelines_tpu.train import (
    EarlyStopping, ReduceLROnPlateau, Trainer, default_ds_weights)


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_1d_unet_loss_decreases():
    x, y = synthetic_signals(16, length=256)
    model = SegModel(decoder_name="UNet", model_width=8, model_depth=3,
                     output_nums=1, final_activation="sigmoid")
    tr = Trainer(model, loss="BinaryCrossentropy", optimizer="Adam",
                 learning_rate=1e-3, metrics=("BinaryAccuracy",))
    tr.init_state(x[:8])
    hist = tr.fit(batches(x, y, 8), epochs=8, verbose=0)
    assert hist["loss"][-1] < hist["loss"][0] * 0.9
    assert 0.0 <= hist["BinaryAccuracy"][-1] <= 1.0


def test_2d_unet_ds_train_step_runs():
    x, y = synthetic_images(8, size=32, channels=1)
    model = SegModel(decoder_name="UNetPP", model_width=4, model_depth=2,
                     output_nums=1, ds=1)
    targets = jax.tree.map(np.asarray,
                           prepare_train_dict(y, 2, ds_type="UNetPP"))
    tr = Trainer(model, loss="BinaryCrossentropy",
                 loss_weights=default_ds_weights(2))
    tr.init_state(x[:4])
    hist = tr.fit(batches(x, targets, 4), epochs=3, verbose=0)
    assert hist["loss"][-1] < hist["loss"][0]


def test_callbacks_early_stop_and_rlrop():
    x, y = synthetic_signals(8, length=128)
    model = SegModel(decoder_name="UNet", model_width=4, model_depth=2)
    tr = Trainer(model, learning_rate=1e-3)
    tr.init_state(x[:4])
    hist = tr.fit(
        batches(x, y, 4), val_data=batches(x, y, 4, shuffle=False),
        epochs=6,
        callbacks=[EarlyStopping(monitor="val_loss", patience=2),
                   ReduceLROnPlateau(monitor="val_loss", factor=0.5,
                                     patience=1, min_lr=1e-5)],
        verbose=0)
    assert "val_loss" in hist
    assert all(l2 <= l1 + 1e-9 for l1, l2 in zip(hist["lr"], hist["lr"][1:]))


def test_predict_shapes():
    x, _ = synthetic_images(4, size=32, channels=3)
    model = SegModel(decoder_name="UNet", model_width=4, model_depth=2,
                     output_nums=3, final_activation="softmax")
    tr = Trainer(model)
    tr.init_state(x)
    out = tr.predict(x)
    assert out["out"].shape == (4, 32, 32, 3)
    np.testing.assert_allclose(out["out"].sum(-1), 1.0, rtol=1e-3)


def test_nan_guard_recovers():
    from tf_1d_2d_segmentation_end2endpipelines_tpu.train import NaNGuard
    x, y = synthetic_signals(8, length=128)
    model = SegModel(decoder_name="UNet", model_width=4, model_depth=2,
                     final_activation=None)
    # a huge LR drives MSLE into non-finite territory quickly
    tr = Trainer(model, loss="MeanSquaredError", learning_rate=1e21)
    tr.init_state(x[:4])
    guard = NaNGuard(max_restores=2)
    tr.fit(batches(x, y, 4), epochs=6, callbacks=[guard], verbose=0)
    assert guard.restores >= 1  # guard engaged (rescued or aborted)


def test_nan_guard_reinit_without_checkpoint():
    """NaN on the very first epochs with NO checkpoint: the guard must
    re-initialize params (LR backoff alone cannot heal non-finite params)."""
    from tf_1d_2d_segmentation_end2endpipelines_tpu.train import NaNGuard
    x, y = synthetic_signals(8, length=128)
    model = SegModel(decoder_name="UNet", model_width=4, model_depth=2,
                     final_activation=None)
    tr = Trainer(model, loss="MeanSquaredError", learning_rate=1e21)
    tr.init_state(x[:4])
    guard = NaNGuard(max_restores=3)
    tr.fit(batches(x, y, 4), epochs=3, callbacks=[guard], verbose=0)
    assert guard.restores >= 1
    leaves = jax.tree.leaves(tr.state.params)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves), \
        "params still non-finite after NaNGuard recovery without checkpoint"


def test_dropout_stream_depends_on_seed():
    """Dropout noise must differ across trainer seeds (reproducibility is
    seed-controlled, not hardwired to PRNGKey(0))."""
    from tf_1d_2d_segmentation_end2endpipelines_tpu.models import SAUNet
    x = np.random.default_rng(0).normal(size=(4, 64, 1)).astype(np.float32)
    y = np.random.default_rng(1).normal(size=(4, 64, 1)).astype(np.float32)
    model = SAUNet(64, 2, 1, 4, 3).SAUNet()
    ref = Trainer(model, loss="MeanSquaredError", learning_rate=0.0, seed=0)
    state0 = jax.device_get(ref.init_state(x))
    losses = {}
    for seed in (0, 1):
        tr = Trainer(model, loss="MeanSquaredError", learning_rate=0.0,
                     seed=seed)
        tr.init_state(x)
        tr.state = jax.tree.map(np.asarray, state0)  # identical params
        tr.fit(batches(x, y, 4), epochs=1, verbose=0)
        losses[seed] = tr.history["loss"][0]
    # identical params/data, lr=0: only the dropout stream differs by seed
    assert losses[0] != losses[1]


def test_nabnet_builds_and_trains_1d():
    """NABNet (reference README.md model #10, no reference code —
    capability parity): builds 1D with DS, loss decreases on synthetic
    signals (BASELINE config 5)."""
    from tf_1d_2d_segmentation_end2endpipelines_tpu.models import NABNet
    x, y = synthetic_signals(8, length=64)
    model = NABNet(model_width=4, model_depth=2, dense_loop=2,
                   problem_type="Regression")
    tr = Trainer(model, loss="MeanSquaredError", learning_rate=3e-3)
    tr.init_state(x[:4])
    tr.fit(batches(x, y, 4), epochs=4, verbose=0)
    hist = tr.history["loss"]
    assert hist[-1] < hist[0]
    # DS build produces level heads
    ds = NABNet(model_width=4, model_depth=2, ds=1,
                problem_type="Regression")
    v = ds.init(jax.random.PRNGKey(0), x[:1], train=False)
    out = ds.apply(v, x[:1], train=False)
    assert set(out) == {"out", "level1", "level2"}
    assert out["out"].shape == (1, 64, 1)


@pytest.mark.parametrize("remat", ["dots", "full"])
def test_remat_train_step_matches_plain(remat):
    """jax.checkpoint remat is a pure memory/FLOPs trade: per-step losses
    must match the plain step bit-for-bit-ish (same graph numerics)."""
    x, y = synthetic_images(8, size=16, channels=1)
    losses = {}
    for mode in (None, remat):
        model = SegModel(decoder_name="UNetPP", model_width=4,
                         model_depth=2, output_nums=1,
                         final_activation="sigmoid")
        tr = Trainer(model, loss="BCEDiceLoss", optimizer="Adam",
                     learning_rate=1e-3, seed=7, remat=mode)
        tr.init_state(x[:4])
        hist = tr.fit(batches(x, y, 4), epochs=3, verbose=0)
        losses[mode] = hist["loss"]
    np.testing.assert_allclose(losses[remat], losses[None],
                               rtol=1e-5, atol=1e-6)


def test_remat_unknown_policy_rejected():
    from tf_1d_2d_segmentation_end2endpipelines_tpu.train.state import (
        make_train_step)
    from tf_1d_2d_segmentation_end2endpipelines_tpu.train.losses import (
        get_loss)
    from tf_1d_2d_segmentation_end2endpipelines_tpu.train.optimizers import (
        make_optimizer)
    model = SegModel(decoder_name="UNet", model_width=4, model_depth=2)
    with pytest.raises(ValueError, match="unknown remat policy"):
        make_train_step(model, make_optimizer("Adam", 1e-3),
                        get_loss("BinaryCrossentropy"), remat="bogus")


def test_remat_policy_missing_on_jax_version(monkeypatch):
    """ADVICE r2: a jax build lacking the checkpoint policy surfaces a
    friendly ValueError naming the policy, not a raw AttributeError."""
    import jax as _jax
    from tf_1d_2d_segmentation_end2endpipelines_tpu.train import state

    monkeypatch.setitem(state.REMAT_POLICIES, "dots",
                        "definitely_not_a_policy")
    with pytest.raises(ValueError, match="definitely_not_a_policy"):
        state._remat_policy("dots")
    del _jax


def test_grad_accumulation_matches_full_batch():
    """For a BatchNorm-free model, accum_steps=4 must produce EXACTLY the
    full-batch update (mean-loss gradients average across microbatches)."""
    import flax.linen as nn
    import jax.numpy as jnp
    from tf_1d_2d_segmentation_end2endpipelines_tpu.train import (
        create_train_state, get_loss, make_optimizer)
    from tf_1d_2d_segmentation_end2endpipelines_tpu.train.state import (
        make_train_step)

    class TinyNet(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            h = nn.relu(nn.Conv(8, (3, 3))(x))
            return {"out": nn.sigmoid(nn.Conv(1, (1, 1))(h))}

    rng = np.random.default_rng(0)
    x = rng.normal(size=(8, 16, 16, 1)).astype(np.float32)
    y = (rng.uniform(size=(8, 16, 16, 1)) > 0.5).astype(np.float32)
    results = {}
    for accum in (1, 4):
        model = TinyNet()
        opt = make_optimizer("Adam", 1e-3)
        state = create_train_state(model, jax.random.PRNGKey(0), x[:1], opt)
        step = jax.jit(make_train_step(model, opt,
                                       get_loss("BinaryCrossentropy"),
                                       accum_steps=accum))
        new_state, loss, _ = step(state, x, y, ())
        results[accum] = (jax.device_get(new_state.params),
                          float(loss))
    p1, l1 = results[1]
    p4, l4 = results[4]
    assert abs(l1 - l4) < 1e-6
    jax.tree.map(lambda a, b: np.testing.assert_allclose(a, b, atol=1e-6),
                 p1, p4)


def test_grad_accumulation_trains_segmodel():
    """accum_steps=2 with BatchNorm + metrics + remat: loss decreases and
    metric states accumulate across microbatches."""
    x, y = synthetic_images(8, size=16, channels=1)
    model = SegModel(decoder_name="UNet", model_width=4, model_depth=2,
                     output_nums=1, final_activation="sigmoid")
    tr = Trainer(model, loss="BCEDiceLoss", optimizer="Adam",
                 learning_rate=2e-3, metrics=("BinaryAccuracy",),
                 remat="dots", accum_steps=2)
    tr.init_state(x[:4])
    hist = tr.fit(batches(x, y, 4), epochs=5, verbose=0)
    assert hist["loss"][-1] < hist["loss"][0]
    assert 0.0 <= hist["BinaryAccuracy"][-1] <= 1.0


def test_grad_accumulation_rejects_indivisible_batch():
    from tf_1d_2d_segmentation_end2endpipelines_tpu.train import (
        create_train_state, get_loss, make_optimizer)
    from tf_1d_2d_segmentation_end2endpipelines_tpu.train.state import (
        make_train_step)
    x, y = synthetic_images(6, size=16, channels=1)
    model = SegModel(decoder_name="UNet", model_width=4, model_depth=2)
    opt = make_optimizer("Adam", 1e-3)
    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.asarray(x[:1]), opt)
    step = make_train_step(model, opt, get_loss("BinaryCrossentropy"),
                           accum_steps=4)
    with pytest.raises(ValueError, match="not divisible"):
        step(state, jnp.asarray(x), jnp.asarray(y), ())



def test_lr_scheduler_cosine_drives_logged_lr():
    from tf_1d_2d_segmentation_end2endpipelines_tpu.train import (
        LearningRateScheduler, cosine_decay)
    x, y = synthetic_signals(8, length=128)
    model = SegModel(decoder_name="UNet", model_width=4, model_depth=2,
                     output_nums=1, final_activation="sigmoid")
    sched = cosine_decay(1e-3, total_epochs=4, min_lr=1e-5,
                         warmup_epochs=2)
    tr = Trainer(model, loss="BinaryCrossentropy", learning_rate=999.0)
    tr.init_state(x[:4])
    hist = tr.fit(batches(x, y, 4), epochs=4, verbose=0,
                  callbacks=[LearningRateScheduler(sched)])
    want = [sched(e) for e in range(4)]
    np.testing.assert_allclose(hist["lr"], want, rtol=1e-5)
    assert hist["lr"][0] < hist["lr"][1]          # warmup ramps up
    assert hist["lr"][3] < hist["lr"][2]          # cosine decays


def test_prepare_train_dict_1d_rank_inference():
    """(B, L, 1) signals must pool over L only — the 2D interpretation
    would pool the size-1 axis to 0 (regression: examples/train_1d_signals
    crashed with a (B, L/2, 0, 1) target)."""
    from tf_1d_2d_segmentation_end2endpipelines_tpu.data import (
        prepare_train_dict)
    import jax.numpy as jnp
    y1d = jnp.ones((2, 64, 1))
    t = prepare_train_dict(y1d, 2, ds_type="UNet")
    assert t["level1"].shape == (2, 32, 1)
    assert t["level2"].shape == (2, 16, 1)
    y2d = jnp.ones((2, 32, 32))          # channel-less 2D: reference usage
    t = prepare_train_dict(y2d, 1, ds_type="UNet")
    assert t["level1"].shape == (2, 16, 16, 1)
    # explicit override beats inference
    t = prepare_train_dict(jnp.ones((2, 64, 3)), 1, ds_type="UNet",
                           spatial_rank=1)
    assert t["level1"].shape == (2, 32, 3)
