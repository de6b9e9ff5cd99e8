"""End-to-end driver test: INI config -> fold training -> checkpoint ->
test driver -> metric report (the reference's Train.py/Test.py round trip,
on a tiny on-disk synthetic dataset)."""
import os

import numpy as np
import pytest
from PIL import Image

from tf_1d_2d_segmentation_end2endpipelines_tpu.drivers import test as run_test
from tf_1d_2d_segmentation_end2endpipelines_tpu.drivers import train as run_train
from tf_1d_2d_segmentation_end2endpipelines_tpu.utils.config import (
    TrainConfig, load_train_config, save_train_config)
from tf_1d_2d_segmentation_end2endpipelines_tpu.utils.config import \
    TestConfig as EvalConfig  # alias: pytest must not collect it


def _write_dataset(root, n=6, size=32):
    rng = np.random.default_rng(0)
    for sub in ("images", "masks"):
        os.makedirs(os.path.join(root, sub), exist_ok=True)
    for i in range(n):
        img = (rng.uniform(0, 255, (size, size, 3))).astype(np.uint8)
        msk = np.zeros((size, size), np.uint8)
        msk[8:20, 8:20] = 255
        Image.fromarray(img).save(os.path.join(root, "images", f"{i}.png"))
        Image.fromarray(msk).save(os.path.join(root, "masks", f"{i}.png"))


def test_train_and_test_drivers(tmp_path):
    data = tmp_path / "Data"
    _write_dataset(str(data / "Train"))
    _write_dataset(str(data / "Val"), n=2)
    _write_dataset(str(data / "Test"), n=2)
    cfg = TrainConfig(
        train_dir=str(data / "Train"), val_dir=str(data / "Val"),
        imlength=32, imwidth=32, model_width=4, model_depth=2,
        decoder_name="UNet", model_genre="UNet",
        batch_size=2, num_epochs=2, learning_rate=1e-3,
        loss_function="BCEDiceLoss", metric_list=("BinaryAccuracy",),
        monitor_param="val_loss", save_dir=str(tmp_path / "Results"),
        start_fold=1, end_fold=1, save_history=True, load_weights=False,
    )
    ini = tmp_path / "Train_Configs.ini"
    save_train_config(cfg, str(ini))
    cfg2 = load_train_config(str(ini))  # INI round-trip
    assert cfg2.model_width == 4 and cfg2.loss_function == "BCEDiceLoss"

    hist = run_train(config=cfg2)
    assert 1 in hist and len(hist[1]["loss"]) == 2
    assert os.path.isdir(os.path.join(cfg.save_dir, "Fold_1", "best"))
    assert os.path.exists(os.path.join(cfg.save_dir, "Fold_1",
                                       "history.png"))
    # the reference's h5 history format too (Train.py:425-430)
    import h5py
    with h5py.File(os.path.join(cfg.save_dir, "Fold_1",
                                "history.h5")) as hf:
        assert len(hf["loss"]) == 2

    tcfg = EvalConfig(
        test_dir=str(data / "Test"), imheight=32, imwidth=32,
        decoder_name="UNet", class_number=1, threshold=0.5,
        start_fold=1, end_fold=1, save_dir=str(tmp_path / "Results"))
    reports = run_test(config=tcfg, train_config=cfg2)
    rep = reports[1]
    assert rep["per_class"].shape == (2, 7)
    assert 0 <= rep["overall_accuracy"] <= 100
    assert rep["checkpoint_restored"] is True
    results_dir = os.path.join(cfg.save_dir, "test_results", "fold_1")
    assert os.path.exists(os.path.join(results_dir, "confusion_matrix.png"))
    assert os.path.exists(os.path.join(results_dir, "masks", "pred_0.png"))
    # notebook-parity qualitative reports (2D nb cells 72-78)
    assert os.path.exists(os.path.join(results_dir,
                                       "prediction_distributions.png"))
    assert os.path.exists(os.path.join(results_dir, "sample_grid.png"))


def test_validation_portion_split(tmp_path):
    data = tmp_path / "Data"
    _write_dataset(str(data / "Train"), n=8)
    cfg = TrainConfig(
        train_dir=str(data / "Train"), independent_val_set=False,
        validation_portion=0.25, imlength=32, imwidth=32, model_width=4,
        model_depth=2, decoder_name="UNet", batch_size=2, num_epochs=1,
        save_dir=str(tmp_path / "R"), load_weights=False,
        monitor_param="val_loss")
    hist = run_train(config=cfg)
    assert "val_loss" in hist[1]


def test_cli_module_entry(tmp_path):
    """`python -m <pkg> train <ini>` end-to-end in a subprocess."""
    import subprocess
    import sys as _sys
    data = tmp_path / "Data"
    _write_dataset(str(data / "Train"), n=4)
    cfg = TrainConfig(
        train_dir=str(data / "Train"), independent_val_set=False,
        imlength=32, imwidth=32, model_width=4, model_depth=2,
        decoder_name="UNet", batch_size=2, num_epochs=1,
        monitor_param="loss", save_dir=str(tmp_path / "R"),
        load_weights=False)
    ini = tmp_path / "cfg.ini"
    save_train_config(cfg, str(ini))
    # hand the subprocess the same persistent compile cache the suite
    # uses (conftest configures it in-process only): without it the
    # fresh interpreter recompiles ~70s of XLA programs every run and
    # has been observed to blow the 900s bound under full-sweep load
    from conftest import _cache
    env = dict(os.environ,
               JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=8",
               JAX_COMPILATION_CACHE_DIR=_cache,
               JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS="0.5",
               JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES="0")
    proc = subprocess.run(
        [_sys.executable, "-m",
         "tf_1d_2d_segmentation_end2endpipelines_tpu", "train", str(ini)],
        capture_output=True, text=True, timeout=900,  # fresh-process
        # compile takes ~70s alone but >300s under full-sweep CPU load
        # (observed 600s exceeded when another compile shares the core)
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert os.path.isdir(os.path.join(cfg.save_dir, "Fold_1", "best"))


def test_train_test_with_patchify_and_ds(tmp_path):
    data = tmp_path / "Data"
    _write_dataset(str(data / "Train"), n=4, size=64)
    _write_dataset(str(data / "Test"), n=2, size=64)
    cfg = TrainConfig(
        train_dir=str(data / "Train"), independent_val_set=False,
        imlength=64, imwidth=64, model_width=4, model_depth=2,
        decoder_name="UNetPP", batch_size=1, num_epochs=1,
        patchify=True, patch_width=32, patch_height=32, overlap_ratio=0.5,
        d_s=1, ds_type="UNetPP", monitor_param="loss",
        save_dir=str(tmp_path / "R"), load_weights=False)
    hist = run_train(config=cfg)
    assert len(hist[1]["loss"]) == 1
    tcfg = EvalConfig(
        test_dir=str(data / "Test"), imheight=64, imwidth=64,
        decoder_name="UNetPP", class_number=1, patchify=True,
        patch_width=32, patch_height=32, overlap_ratio=0.5, d_s=1,
        start_fold=1, end_fold=1, save_dir=str(tmp_path / "R"))
    reports = run_test(config=tcfg, train_config=cfg)
    assert 0 <= reports[1]["overall_accuracy"] <= 100


def _write_multiclass_dataset(root, n=3, size=32, n_fg=2):
    """Ordinal masks: class-k region painted with pixel value k."""
    rng = np.random.default_rng(0)
    for sub in ("images", "masks"):
        os.makedirs(os.path.join(root, sub), exist_ok=True)
    for i in range(n):
        img = (rng.uniform(0, 255, (size, size, 3))).astype(np.uint8)
        msk = np.zeros((size, size), np.uint8)
        msk[4:24, 4:24] = 1      # class 1 (e.g. kidney)
        msk[10:16, 10:16] = 2    # class 2 inside it (e.g. tumor)
        Image.fromarray(img).save(os.path.join(root, "images", f"{i}.png"))
        Image.fromarray(msk).save(os.path.join(root, "masks", f"{i}.png"))


def test_multiclass_test_driver(tmp_path, capsys):
    """class_number=2: predictions map into the SAME 0..2 ordinal label
    space as the masks (reference Test.py:169-175 sum-of-binarized rule);
    every row/col of the 3x3 report is reachable.  Also exercises: the
    missing-checkpoint warning (no train run happened), and score-based
    ROC/PRC (roc_from_scores=True uses probability maps)."""
    data = tmp_path / "Data"
    _write_multiclass_dataset(str(data / "Test"), n=2)
    cfg = TrainConfig(
        imlength=32, imwidth=32, model_width=4, model_depth=2,
        decoder_name="UNet", output_nums=2, class_number=2,
        final_activation="sigmoid", save_dir=str(tmp_path / "R"))
    tcfg = EvalConfig(
        test_dir=str(data / "Test"), imheight=32, imwidth=32,
        decoder_name="UNet", class_number=2, threshold=0.5,
        normalizing_factor_msk=1.0, roc_from_scores=True,
        start_fold=1, end_fold=1, save_dir=str(tmp_path / "R"))
    reports = run_test(config=tcfg, train_config=cfg)
    rep = reports[1]
    assert rep["confusion_matrix"].shape == (3, 3)
    assert rep["per_class"].shape == (3, 7)
    # ground-truth rows must show all three ordinal labels
    assert (rep["confusion_matrix"].sum(axis=1) > 0).all()
    # no checkpoint existed: the report flags it and a warning printed
    # (drivers.test previously evaluated fresh weights silently)
    assert rep["checkpoint_restored"] is False
    assert "no 'best' checkpoint" in capsys.readouterr().out
    results_dir = os.path.join(str(tmp_path / "R"), "test_results",
                               "fold_1")
    assert os.path.exists(os.path.join(results_dir, "roc.png"))
    assert os.path.exists(os.path.join(results_dir, "prc.png"))


def test_summary_subcommand(tmp_path, capsys):
    """`tpuseg summary <ini>` prints param counts + output heads
    (reference Train.py:354-359 model.summary)."""
    from tf_1d_2d_segmentation_end2endpipelines_tpu.drivers import summary
    cfg = TrainConfig(imlength=32, imwidth=32, model_width=4, model_depth=2,
                      decoder_name="UNetPP", d_s=1)
    info = summary(config=cfg)
    assert info["params"] > 0
    assert set(info["outputs"]) == {"out", "level1", "level2"}
    out = capsys.readouterr().out
    assert "Trainable params" in out


def test_compute_dtype_ini_key(tmp_path):
    """compute_dtype = bfloat16 builds a bf16-activation model from the
    INI (params stay float32 — the TPU mixed-precision contract)."""
    import jax
    import jax.numpy as jnp

    from tf_1d_2d_segmentation_end2endpipelines_tpu.drivers import (
        _build_model)
    cfg = TrainConfig(imlength=16, imwidth=16, decoder_name="UNet",
                      model_width=4, model_depth=2,
                      compute_dtype="bfloat16")
    model = _build_model(cfg)
    v = model.init(jax.random.PRNGKey(0),
                   jnp.zeros((1, 16, 16, 3)), train=False)
    out = model.apply(v, jnp.zeros((1, 16, 16, 3)), train=False)["out"]
    assert out.dtype == jnp.bfloat16
    leaves = jax.tree.leaves(v["params"])
    assert all(l.dtype == jnp.float32 for l in leaves)
    with pytest.raises(ValueError, match="unknown compute_dtype"):
        _build_model(TrainConfig(compute_dtype="float16"))


def test_folds_cli(tmp_path):
    """`tpuseg folds` splits an image/mask pair into the reference's
    Data/{Train,Test,Val}/fold_i layout."""
    from tf_1d_2d_segmentation_end2endpipelines_tpu.drivers import main
    src = tmp_path / "raw"
    _write_dataset(str(src), n=10)
    out = tmp_path / "Data"
    main(["folds", "--images", str(src / "images"),
          "--masks", str(src / "masks"), "--out", str(out),
          "--folds", "2", "--test-portion", "0.2", "--val-portion", "0.1"])
    for split, n in (("Train", 7), ("Test", 2), ("Val", 1)):
        for fold in (1, 2):
            d = out / split / f"fold_{fold}" / "images"
            assert d.is_dir() and len(list(d.iterdir())) == n, (split, fold)


def test_train_with_all_perf_ini_keys(tmp_path):
    """remat + accumulation_steps + compute_dtype all at once through the
    real driver: the performance knobs must compose."""
    data = tmp_path / "Data"
    _write_dataset(str(data / "Train"), n=4)
    cfg = TrainConfig(
        train_dir=str(data / "Train"), independent_val_set=False,
        imlength=32, imwidth=32, model_width=4, model_depth=2,
        decoder_name="UNet", batch_size=4, num_epochs=2,
        monitor_param="loss", save_dir=str(tmp_path / "R"),
        load_weights=False,
        remat="dots", accumulation_steps=2, compute_dtype="bfloat16")
    ini = tmp_path / "cfg.ini"
    save_train_config(cfg, str(ini))
    hist = run_train(config=load_train_config(str(ini)))
    assert len(hist[1]["loss"]) == 2
    assert all(np.isfinite(v) for v in hist[1]["loss"])


def test_ema_and_tta_through_the_drivers(tmp_path):
    """INI `ema_decay` trains with an EMA shadow (checkpoint carries it),
    and INI `tta` runs the test driver's predictions TTA-averaged —
    the full quality-stack round trip."""
    data = tmp_path / "Data"
    _write_dataset(str(data / "Train"), n=4)
    _write_dataset(str(data / "Test"), n=2)
    cfg = TrainConfig(
        train_dir=str(data / "Train"), independent_val_set=False,
        imlength=32, imwidth=32, model_width=4, model_depth=2,
        decoder_name="UNet", batch_size=4, num_epochs=2,
        monitor_param="loss", save_dir=str(tmp_path / "R"),
        load_weights=False, ema_decay=0.9)
    ini = tmp_path / "cfg.ini"
    save_train_config(cfg, str(ini))
    hist = run_train(config=load_train_config(str(ini)))
    assert all(np.isfinite(v) for v in hist[1]["loss"])

    # the saved checkpoint must carry the EMA shadow
    from tf_1d_2d_segmentation_end2endpipelines_tpu.drivers import (
        _build_model)
    from tf_1d_2d_segmentation_end2endpipelines_tpu.train import (
        CheckpointManager, Trainer)
    tr = Trainer(_build_model(cfg))
    tr.init_state(np.zeros((1, 32, 32, 3), np.float32))
    restored = CheckpointManager(
        os.path.join(cfg.save_dir, "Fold_1")).restore(tr.state, "best")
    assert restored.ema_params is not None

    tcfg = EvalConfig(
        test_dir=str(data / "Test"), imheight=32, imwidth=32,
        decoder_name="UNet", class_number=1,
        start_fold=1, end_fold=1, save_dir=cfg.save_dir,
        tta="hflip,vflip")
    reports = run_test(config=tcfg, train_config=cfg)
    rep = reports[1]
    assert rep["checkpoint_restored"] is True
    assert 0 <= rep["overall_accuracy"] <= 100


def test_predict_cli(tmp_path):
    """`tpuseg predict` segments an unlabeled image folder with a trained
    checkpoint and writes one PNG mask per input."""
    from PIL import Image as PImage

    from tf_1d_2d_segmentation_end2endpipelines_tpu.drivers import main
    data = tmp_path / "Data"
    _write_dataset(str(data / "Train"), n=4)
    cfg = TrainConfig(
        train_dir=str(data / "Train"), independent_val_set=False,
        imlength=32, imwidth=32, model_width=4, model_depth=2,
        decoder_name="UNet", batch_size=2, num_epochs=1,
        monitor_param="loss", save_dir=str(tmp_path / "R"),
        load_weights=False)
    run_train(config=cfg)
    # unlabeled inputs: images only, no masks directory at all
    raw = tmp_path / "unlabeled"
    os.makedirs(raw)
    rng = np.random.default_rng(1)
    for i in range(3):
        PImage.fromarray((rng.uniform(0, 255, (48, 48, 3))
                          ).astype(np.uint8)).save(str(raw / f"u{i}.png"))
    out = tmp_path / "masks"
    main(["predict", str(tmp_path / "R" / "Train_Configs.ini"),
          "--input", str(raw), "--out", str(out), "--batch", "2"])
    files = sorted(os.listdir(out))
    assert files == ["u0_mask.png", "u1_mask.png", "u2_mask.png"]
    m = PImage.open(str(out / files[0]))
    assert m.size == (32, 32)


def test_predict_cli_patchify(tmp_path):
    """predict honors the config's patchify mode (patch grid ->
    overlap-averaged unpatchify, same as the test driver)."""
    from PIL import Image as PImage

    from tf_1d_2d_segmentation_end2endpipelines_tpu.drivers import predict
    data = tmp_path / "Data"
    _write_dataset(str(data / "Train"), n=2, size=64)
    cfg = TrainConfig(
        train_dir=str(data / "Train"), independent_val_set=False,
        imlength=64, imwidth=64, model_width=4, model_depth=2,
        decoder_name="UNet", batch_size=1, num_epochs=1,
        patchify=True, patch_width=32, patch_height=32, overlap_ratio=0.5,
        monitor_param="loss", save_dir=str(tmp_path / "R"),
        load_weights=False)
    run_train(config=cfg)
    raw = tmp_path / "unlabeled"
    os.makedirs(raw)
    PImage.fromarray((np.random.default_rng(0).uniform(0, 255, (64, 64, 3))
                      ).astype(np.uint8)).save(str(raw / "a.png"))
    out = tmp_path / "masks"
    written = predict(cfg, input_path=str(raw), out_dir=str(out))
    assert len(written) == 1
    assert PImage.open(written[0]).size == (64, 64)


def test_doctor_cli(capsys):
    """`tpuseg doctor` reports the environment without crashing and all
    required dependencies are present in CI."""
    from tf_1d_2d_segmentation_end2endpipelines_tpu.drivers import doctor
    report = doctor()
    out = capsys.readouterr().out
    for key in ("jax", "backend", "flax", "native_patcher",
                "native_imgio", "smoke_compile"):
        assert key in report and key in out
    assert "MISSING" not in out
    assert report["smoke_compile"].startswith("ok")
