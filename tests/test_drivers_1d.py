"""End-to-end 1D driver test: .pt signal set -> train_1d -> checkpoint ->
test_1d -> NILM metric report (the reference's notebook-only 1D flow,
1D_Segmentation.ipynb cells 29-63, as the INI-driven L6 surface)."""
import json
import os

import numpy as np
import pytest

from tf_1d_2d_segmentation_end2endpipelines_tpu.data import (
    save_pt, synthetic_signals)
from tf_1d_2d_segmentation_end2endpipelines_tpu.drivers_1d import \
    test_1d as run_test_1d  # alias: pytest must not collect it
from tf_1d_2d_segmentation_end2endpipelines_tpu.drivers_1d import (
    train_1d)
from tf_1d_2d_segmentation_end2endpipelines_tpu.utils.config import (
    Signal1DConfig, load_signal_config, save_signal_config)


def _make_cfg(tmp_path, **over):
    x, y = synthetic_signals(12, length=64)
    y = np.abs(y)  # NILM power signals are nonnegative (notebook cell 29)
    save_pt({"samples": x, "labels": y}, str(tmp_path / "Train_Set.pt"))
    save_pt({"samples": x[:4], "labels": y[:4]},
            str(tmp_path / "Test_Set.pt"))
    kw = dict(
        train_set=str(tmp_path / "Train_Set.pt"),
        test_set=str(tmp_path / "Test_Set.pt"),
        signal_length=64, num_channel=1, model_name="UNet",
        model_depth=2, model_width=4, kernel_size=3, d_s=1,
        batch_size=4, num_epochs=2, learning_rate=1e-3,
        loss_function="MeanAbsoluteError",
        metric_list=("MeanSquaredError",), monitor_param="loss",
        save_dir=str(tmp_path / "Results_1D"), load_weights=False,
    )
    kw.update(over)
    return Signal1DConfig(**kw)


def test_signal_config_ini_roundtrip(tmp_path):
    cfg = _make_cfg(tmp_path, model_name="BCDUNet", lstm=1)
    ini = tmp_path / "Signal_Configs.ini"
    save_signal_config(cfg, str(ini))
    cfg2 = load_signal_config(str(ini))
    assert cfg2.model_name == "BCDUNet" and cfg2.lstm == 1
    assert cfg2.model_width == 4 and cfg2.d_s == 1
    assert cfg2.metric_list == ("MeanSquaredError",)


def test_train_and_test_1d_drivers(tmp_path):
    cfg = _make_cfg(tmp_path)
    hist = train_1d(config=cfg)
    assert len(hist["loss"]) == 2
    assert os.path.isdir(os.path.join(cfg.save_dir, "best"))
    assert os.path.exists(os.path.join(cfg.save_dir, "history.png"))
    # the model-defining config is persisted with the artifacts
    assert os.path.exists(os.path.join(cfg.save_dir, "Signal_Configs.ini"))

    metrics = run_test_1d(config=cfg)
    for key in ("MAE", "MSE", "RMSE", "SAE", "EA", "JEOI", "DEOI"):
        assert key in metrics, key
    assert metrics["restored_checkpoint"] is True
    with open(os.path.join(cfg.save_dir, "test_metrics_1d.json")) as f:
        assert json.load(f)["MAE"] == metrics["MAE"]


def test_test_1d_warns_without_checkpoint(tmp_path, capsys):
    cfg = _make_cfg(tmp_path, save_dir=str(tmp_path / "Empty"))
    metrics = run_test_1d(config=cfg)
    assert metrics["restored_checkpoint"] is False
    assert "WARNING: no 'best' checkpoint" in capsys.readouterr().out


def test_summary_1d(tmp_path, capsys):
    from tf_1d_2d_segmentation_end2endpipelines_tpu.drivers_1d import (
        summary_1d)
    cfg = _make_cfg(tmp_path, model_name="SEDUNet", se_ratio=4)
    info = summary_1d(config=cfg)
    assert info["params"] > 0
    assert info["outputs"]["out"] == (1, 64, 1)
    assert "Trainable params" in capsys.readouterr().out


def test_batches_reshuffle_per_epoch():
    from tf_1d_2d_segmentation_end2endpipelines_tpu.data import batches
    x = np.arange(32, dtype=np.float32).reshape(32, 1, 1)
    it = batches(x, x, 8, shuffle=True, seed=0)
    e1 = np.concatenate([bx for bx, _ in it()]).ravel()
    e2 = np.concatenate([bx for bx, _ in it()]).ravel()
    assert not np.array_equal(e1, e2)  # fresh order per epoch
    # a NEW factory with the same seed reproduces epoch 1 (determinism
    # across separately-built loaders, e.g. mesh-size comparisons)
    it2 = batches(x, x, 8, shuffle=True, seed=0)
    assert np.array_equal(
        e1, np.concatenate([bx for bx, _ in it2()]).ravel())


def test_train_1d_smaller_than_batch(tmp_path):
    # len(train)=6 < batch_size=8 must still train (partial batches kept),
    # not silently run 0 steps/epoch
    cfg = _make_cfg(tmp_path, batch_size=8)
    x, y = synthetic_signals(6, length=64)
    save_pt({"samples": x, "labels": np.abs(y)},
            str(tmp_path / "Train_Set.pt"))
    hist = train_1d(config=cfg)
    assert len(hist["loss"]) == 2 and np.isfinite(hist["loss"][0])


def test_test_1d_zero_energy_window(tmp_path):
    # one all-off window (sum(ground)=0) must not poison EA with inf
    cfg = _make_cfg(tmp_path)
    x, y = synthetic_signals(4, length=64)
    y = np.abs(y)
    y[0] = 0.0
    save_pt({"samples": x, "labels": y}, str(tmp_path / "Test_Set.pt"))
    train_1d(config=cfg)
    metrics = run_test_1d(config=cfg)
    assert np.isfinite(metrics["EA"]) and np.isfinite(metrics["SAE"])


def test_train_1d_missing_val_set_warns(tmp_path, capsys):
    cfg = _make_cfg(tmp_path, val_set=str(tmp_path / "nope.pt"),
                    monitor_param="val_loss")
    train_1d(config=cfg)
    assert "WARNING: val_set" in capsys.readouterr().out


def test_selector_1d_near_miss_names_raise():
    from tf_1d_2d_segmentation_end2endpipelines_tpu.models import (
        model_selector_1d)
    for bad in ("TernausNet14", "AlbUNetXL", "NotALinkNet", "LinkNetX"):
        with pytest.raises(ValueError, match="unknown 1D architecture"):
            model_selector_1d(bad, 32, 2, 1, 4, 3)


def test_config_t_reaches_recurrent_blocks(tmp_path):
    import jax
    import jax.numpy as jnp
    from tf_1d_2d_segmentation_end2endpipelines_tpu.drivers_1d import (
        _build_model_1d)
    x = jnp.ones((1, 32, 1))
    outs = []
    for t in (1, 3):
        cfg = _make_cfg(tmp_path, model_name="R2UNet", d_s=0, t=t)
        m = _build_model_1d(cfg)
        v = jax.jit(m.init)(jax.random.PRNGKey(0), x)
        outs.append(jax.jit(lambda v, x, m=m: m.apply(v, x))(v, x)["out"])
    assert not jnp.allclose(outs[0], outs[1])


def test_export_1d_roundtrip(tmp_path):
    from tf_1d_2d_segmentation_end2endpipelines_tpu.drivers_1d import (
        export_1d)
    from tf_1d_2d_segmentation_end2endpipelines_tpu.serve import (
        load_exported)
    cfg = _make_cfg(tmp_path, d_s=0)
    train_1d(config=cfg)
    out = str(tmp_path / "model_1d.stablehlo")
    export_1d(config=cfg, out_path=out, batch=2)
    fn = load_exported(out)
    assert fn.input_shape == (2, 64, 1)
    x = np.random.default_rng(3).normal(size=(2, 64, 1)).astype(np.float32)
    # the artifact must reproduce the in-framework prediction
    from tf_1d_2d_segmentation_end2endpipelines_tpu.drivers_1d import (
        _build_model_1d)
    from tf_1d_2d_segmentation_end2endpipelines_tpu.train import (
        CheckpointManager, Trainer)
    model = _build_model_1d(cfg)
    tr = Trainer(model, loss=cfg.loss_function, seed=cfg.seed)
    tr.init_state(x)
    tr.state = CheckpointManager(cfg.save_dir).restore(tr.state, "best")
    ref = tr.predict(x)["out"]
    np.testing.assert_allclose(np.asarray(fn(x)), ref, atol=1e-5)


def test_predict_1d_unlabeled(tmp_path):
    from tf_1d_2d_segmentation_end2endpipelines_tpu.drivers_1d import (
        predict_1d)
    cfg = _make_cfg(tmp_path, d_s=0)
    train_1d(config=cfg)
    # an UNLABELED container: samples only
    x, _ = synthetic_signals(5, length=64, seed=7)
    save_pt({"samples": x}, str(tmp_path / "Unlabeled.pt"))
    out = predict_1d(config=cfg,
                     input_path=str(tmp_path / "Unlabeled.pt"),
                     out_path=str(tmp_path / "preds.npz"))
    arrays = np.load(out)
    assert arrays["output"].shape == (5, 64, 1)


def test_predict_1d_channel_first_and_empty(tmp_path):
    """predict_1d must apply the same layout normalization as the other
    .pt readers — a channel-first (B, C, L) container predicts fine —
    and an empty container errors instead of writing a garbage .npz."""
    from tf_1d_2d_segmentation_end2endpipelines_tpu.drivers_1d import (
        predict_1d)
    cfg = _make_cfg(tmp_path, d_s=0)
    train_1d(config=cfg)
    x, _ = synthetic_signals(3, length=64, seed=9)
    save_pt({"samples": np.moveaxis(x, 2, 1)},  # (B, 1, 64) channel-first
            str(tmp_path / "CF.pt"))
    out = predict_1d(config=cfg, input_path=str(tmp_path / "CF.pt"),
                     out_path=str(tmp_path / "cf.npz"))
    assert np.load(out)["output"].shape == (3, 64, 1)

    save_pt({"samples": np.zeros((0, 64, 1), np.float32)},
            str(tmp_path / "Empty.pt"))
    with pytest.raises(ValueError, match="empty input set"):
        predict_1d(config=cfg, input_path=str(tmp_path / "Empty.pt"),
                   out_path=str(tmp_path / "e.npz"))
