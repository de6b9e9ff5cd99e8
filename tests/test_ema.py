"""EMA weight-shadow tests: recurrence correctness, eval/predict routing,
checkpoint round-trips in both mismatch directions, and INI wiring.

The EMA shadow is a new capability over the reference (the Keras
pipelines have no weight averaging); these tests pin its semantics.
"""
import os

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tf_1d_2d_segmentation_end2endpipelines_tpu.models import SegModel
from tf_1d_2d_segmentation_end2endpipelines_tpu.data import (
    batches, synthetic_signals)
from tf_1d_2d_segmentation_end2endpipelines_tpu.train import (
    CheckpointManager, Trainer, create_train_state, get_loss,
    make_optimizer)
from tf_1d_2d_segmentation_end2endpipelines_tpu.train.state import (
    make_train_step)


class _TinyNet(nn.Module):
    @nn.compact
    def __call__(self, x, train=False):
        h = nn.relu(nn.Conv(4, (3,))(x))
        return {"out": nn.sigmoid(nn.Conv(1, (1,))(h))}


def _data(n=8, length=32):
    rng = np.random.default_rng(0)
    x = rng.normal(size=(n, length, 1)).astype(np.float32)
    y = (rng.uniform(size=(n, length, 1)) > 0.5).astype(np.float32)
    return x, y


def test_ema_matches_manual_recurrence():
    """The fused in-step EMA must equal the hand-rolled recurrence
    e_t = d*e_{t-1} + (1-d)*p_t seeded from the initial params."""
    d = 0.5
    x, y = _data()
    model = _TinyNet()
    opt = make_optimizer("Adam", 1e-2)
    state = create_train_state(model, jax.random.PRNGKey(0), x[:1], opt,
                               ema=True)
    step = jax.jit(make_train_step(model, opt,
                                   get_loss("BinaryCrossentropy"),
                                   ema_decay=d))
    expected = jax.tree.map(np.asarray, state.params)
    for _ in range(3):
        state, _, _ = step(state, x, y, ())
        p = jax.tree.map(np.asarray, state.params)
        expected = jax.tree.map(lambda e, q: d * e + (1 - d) * q,
                                expected, p)
    jax.tree.map(
        lambda e, a: np.testing.assert_allclose(e, a, atol=1e-6),
        expected, jax.tree.map(np.asarray, state.ema_params))
    # and the shadow genuinely lags the raw params after updates
    diffs = jax.tree.leaves(jax.tree.map(
        lambda p, e: float(np.abs(p - e).max()),
        jax.device_get(state.params), jax.device_get(state.ema_params)))
    assert max(diffs) > 0


def test_eval_and_predict_run_on_the_shadow():
    """predict/eval must use eval_params (the shadow when present): with
    the shadow forced to different weights the outputs must change."""
    x, y = _data()
    model = _TinyNet()
    tr = Trainer(model, loss="BinaryCrossentropy", learning_rate=1e-2,
                 ema_decay=0.9)
    tr.init_state(x[:4])
    tr.fit(batches(x, y, 4), epochs=2, verbose=0)
    pred_ema = np.asarray(tr.predict(x)["out"])
    raw_state = tr.state.replace(ema_params=None)
    pred_raw = np.asarray(
        model.apply({"params": raw_state.params}, jnp.asarray(x),
                    train=False)["out"])
    assert not np.allclose(pred_ema, pred_raw)
    # eval_params property: None -> raw params, pytree -> shadow
    assert raw_state.eval_params is raw_state.params
    assert tr.state.eval_params is tr.state.ema_params


def test_ema_checkpoint_roundtrip(tmp_path):
    x, y = _data()
    model = _TinyNet()
    tr = Trainer(model, loss="BinaryCrossentropy", learning_rate=1e-2,
                 ema_decay=0.9)
    tr.init_state(x[:4])
    tr.fit(batches(x, y, 4), epochs=2, verbose=0)
    ckpt = CheckpointManager(str(tmp_path))
    ckpt.save(tr.state, "best")

    tr2 = Trainer(model, loss="BinaryCrossentropy", ema_decay=0.9)
    tr2.init_state(x[:4])
    restored = ckpt.restore(tr2.state, "best")
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b),
        jax.device_get(tr.state.ema_params),
        jax.device_get(restored.ema_params))


def test_ema_checkpoint_into_plain_trainer(tmp_path):
    """test/export/serve build plain Trainers; restoring an EMA
    checkpoint into one must still load (and serve) the shadow."""
    x, y = _data()
    model = _TinyNet()
    tr = Trainer(model, loss="BinaryCrossentropy", learning_rate=1e-2,
                 ema_decay=0.9)
    tr.init_state(x[:4])
    tr.fit(batches(x, y, 4), epochs=2, verbose=0)
    ckpt = CheckpointManager(str(tmp_path))
    ckpt.save(tr.state, "best")

    plain = Trainer(model, loss="BinaryCrossentropy")
    plain.init_state(x[:4])
    restored = ckpt.restore(plain.state, "best")
    assert restored.ema_params is not None
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b),
        jax.device_get(tr.state.ema_params),
        jax.device_get(restored.ema_params))


def test_plain_checkpoint_into_ema_trainer(tmp_path):
    """Resuming a pre-EMA checkpoint under ema_decay>0 seeds the shadow
    from the restored params (not from the fresh-init ones)."""
    x, y = _data()
    model = _TinyNet()
    tr = Trainer(model, loss="BinaryCrossentropy", learning_rate=1e-2)
    tr.init_state(x[:4])
    tr.fit(batches(x, y, 4), epochs=2, verbose=0)
    ckpt = CheckpointManager(str(tmp_path))
    ckpt.save(tr.state, "best")

    tr2 = Trainer(model, loss="BinaryCrossentropy", ema_decay=0.9)
    tr2.init_state(x[:4])
    restored = ckpt.restore(tr2.state, "best")
    assert restored.ema_params is not None
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b),
        jax.device_get(restored.params),
        jax.device_get(restored.ema_params))


def test_trainer_rejects_bad_ema_decay():
    model = _TinyNet()
    with pytest.raises(ValueError, match="ema_decay"):
        Trainer(model, ema_decay=1.0)
    with pytest.raises(ValueError, match="ema_decay"):
        Trainer(model, ema_decay=-0.1)


def test_ema_ini_key_round_trip(tmp_path):
    from tf_1d_2d_segmentation_end2endpipelines_tpu.utils.config import (
        load_train_config, save_train_config, TrainConfig)
    cfg = TrainConfig(ema_decay=0.99)
    path = os.path.join(str(tmp_path), "cfg.ini")
    save_train_config(cfg, path)
    assert load_train_config(path).ema_decay == pytest.approx(0.99)


def test_ema_trains_segmodel_end_to_end():
    """Full Trainer path on a real zoo model: loss decreases and the
    monitored val metric is computed on the shadow weights."""
    x, y = synthetic_signals(16, length=64)
    model = SegModel(decoder_name="UNet", model_width=4, model_depth=2,
                     output_nums=1, final_activation="sigmoid")
    tr = Trainer(model, loss="BinaryCrossentropy", learning_rate=1e-3,
                 ema_decay=0.8)
    tr.init_state(x[:8])
    hist = tr.fit(batches(x, y, 8),
                  val_data=batches(x, y, 8, shuffle=False),
                  epochs=4, verbose=0)
    assert hist["loss"][-1] < hist["loss"][0]
    assert "val_loss" in hist and np.isfinite(hist["val_loss"]).all()
