"""tpuseg tune: the on-device batch/remat autotuner (CPU, tiny shapes)."""
import configparser

import pytest

from tf_1d_2d_segmentation_end2endpipelines_tpu.tune import tune
from tf_1d_2d_segmentation_end2endpipelines_tpu.utils.config import (
    Signal1DConfig, TrainConfig, save_signal_config, save_train_config)


def _ini_2d(tmp_path, **kw):
    cfg = TrainConfig(imlength=32, imwidth=32, model_width=4, model_depth=2,
                      decoder_name="UNet", model_genre="UNet",
                      batch_size=2, loss_function="BCEDiceLoss",
                      save_dir=str(tmp_path / "R"), **kw)
    path = tmp_path / "Train_Configs.ini"
    save_train_config(cfg, str(path))
    return str(path)


def test_tune_2d_picks_winner_and_writes_back(tmp_path):
    path = _ini_2d(tmp_path)
    report = tune(path, batches=(2, 4), steps=2, warmup=1, write=True)
    ok = [r for r in report["results"] if "ips" in r]
    assert len(ok) == 2 and all(r["mode"] == "plain" for r in ok)
    assert report["winner"] == max(ok, key=lambda r: r["ips"])

    parser = configparser.ConfigParser()
    parser.read(path)
    assert int(parser["TRAIN"]["batch_size"]) == report["winner"]["batch"]
    assert parser["TRAIN"]["remat"] == ""
    # the rest of the INI survives the in-place update
    assert parser["TRAIN"]["loss_function"] == "BCEDiceLoss"


def test_tune_explicit_modes_forces_combos(tmp_path):
    path = _ini_2d(tmp_path)
    report = tune(path, batches=(2,), modes=("plain", "dots"),
                  steps=1, warmup=1)
    assert [r["mode"] for r in report["results"]] == ["plain", "dots"]
    assert all("ips" in r for r in report["results"])


def test_tune_records_failures_and_continues(tmp_path, monkeypatch):
    # fail the plain step at batch 2 only: the heuristic must then try
    # 'dots' for that batch, and batch 4 still wins
    path = _ini_2d(tmp_path)
    import tf_1d_2d_segmentation_end2endpipelines_tpu.tune as tune_mod
    real = tune_mod._measure

    def flaky(cfg, batch, mode, signal, steps, warmup):
        if batch == 2 and mode == "plain":
            raise RuntimeError("simulated remote-compiler rejection")
        return real(cfg, batch, mode, signal, steps, warmup)

    monkeypatch.setattr(tune_mod, "_measure", flaky)
    report = tune(path, batches=(2, 4), steps=1, warmup=1)
    errs = [r for r in report["results"] if "error" in r]
    assert len(errs) == 1 and errs[0]["batch"] == 2
    dots = [r for r in report["results"]
            if r["batch"] == 2 and r["mode"] == "dots"]
    assert len(dots) == 1 and "ips" in dots[0]
    assert report["winner"] is not None


def test_tune_1d_signal_config(tmp_path):
    cfg = Signal1DConfig(signal_length=64, model_width=4, model_depth=2,
                         model_name="UNet", batch_size=2,
                         save_dir=str(tmp_path / "R1"))
    path = tmp_path / "Signal_Configs.ini"
    save_signal_config(cfg, str(path))
    report = tune(str(path), batches=(2, 4), steps=2, warmup=1, write=True)
    assert report["signal"] is True and report["winner"] is not None

    parser = configparser.ConfigParser()
    parser.read(str(path))
    assert int(parser["SIGNAL1D"]["batch_size"]) == \
        report["winner"]["batch"]


def test_signal_config_remat_key_reaches_trainer(tmp_path):
    # the new [SIGNAL1D] remat/accumulation_steps keys round-trip
    cfg = Signal1DConfig(remat="dots", accumulation_steps=2)
    path = tmp_path / "S.ini"
    save_signal_config(cfg, str(path))
    from tf_1d_2d_segmentation_end2endpipelines_tpu.utils.config import \
        load_signal_config
    cfg2 = load_signal_config(str(path))
    assert cfg2.remat == "dots" and cfg2.accumulation_steps == 2
