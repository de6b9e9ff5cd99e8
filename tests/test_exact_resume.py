"""Exact resume + preemption-safe training.

The reference has no equivalent: a killed Keras run keeps only
ModelCheckpoint weights (Train.py:361-379) — the optimizer moments, epoch
position, LR schedule state, and patience counters are all lost, so a
"resumed" run is a different run.  Here ``Trainer.fit(exact_resume=True)``
makes an interrupted-and-resumed run numerically IDENTICAL to an
uninterrupted one:

- every epoch ends with a full-state 'last' checkpoint (weights +
  optimizer moments + step counter) plus a JSON meta sidecar (epoch,
  history, lr_scale, callback counters),
- a SIGTERM (pod preemption / scheduler kill) triggers one final save at
  the next step boundary and a clean exit,
- data order is replayed exactly: the loaders' shuffles are
  (seed, epoch)-keyed and expose ``set_epoch``.
"""
import json
import os
import signal

import numpy as np
import pytest

import jax

from tf_1d_2d_segmentation_end2endpipelines_tpu.data import batches
from tf_1d_2d_segmentation_end2endpipelines_tpu.models import SegModel
from tf_1d_2d_segmentation_end2endpipelines_tpu.train import (
    CheckpointManager, EarlyStopping, ReduceLROnPlateau, Trainer)


def _data(seed=0, n=8, length=32):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, length, 1)).astype(np.float32)
    y = (rng.uniform(size=(n, length, 1)) > 0.5).astype(np.float32)
    return x, y


def _model():
    return SegModel(decoder_name="UNet", model_width=4, model_depth=2,
                    final_activation="sigmoid")


def _trainer(**kw):
    return Trainer(_model(), loss="BCEDiceLoss", learning_rate=1e-2,
                   metrics=("BinaryAccuracy",), **kw)


def _train_keys(history):
    """Numeric trajectory keys (timing keys differ between runs)."""
    return {k: v for k, v in history.items()
            if k not in ("steps_per_sec", "epoch_time")}


def test_full_checkpoint_roundtrip(tmp_path):
    """save_full stores weights + optimizer moments + step + meta; a fresh
    trainer restores ALL of it (optimizer state included — the
    weights-only path resets Adam's moments by design)."""
    x, y = _data()
    tr = _trainer()
    tr.init_state(x)
    ckpt = CheckpointManager(str(tmp_path))
    tr.fit(batches(x, y, 4, seed=3), epochs=2, verbose=0)
    ckpt.save_full(tr.state, "last", meta={"epoch": 2, "note": "hi"})
    assert ckpt.has_full("last")
    assert not ckpt.has_full("best")

    tr2 = _trainer()
    tr2.init_state(x)
    restored, meta = ckpt.restore_full(tr2.state, "last")
    assert meta["epoch"] == 2 and meta["note"] == "hi"
    jax.tree.map(np.testing.assert_array_equal, restored.params,
                 tr.state.params)
    jax.tree.map(np.testing.assert_array_equal, restored.opt_state,
                 tr.state.opt_state)
    assert int(restored.step) == int(tr.state.step)


def test_interrupted_fit_matches_uninterrupted(tmp_path):
    """fit 2 epochs -> new process (fresh Trainer) -> fit to 4: the full
    4-epoch history equals a straight 4-epoch run exactly (optimizer
    moments, LR, and data order all carried across the boundary)."""
    x, y = _data()

    def run(dirname, epoch_plan):
        ckpt = CheckpointManager(str(tmp_path / dirname))
        history = None
        for epochs in epoch_plan:
            tr = _trainer()
            tr.init_state(x)
            history = tr.fit(batches(x, y, 4, seed=7), epochs=epochs,
                             checkpoint=ckpt, monitor="loss", verbose=0,
                             exact_resume=True)
        return history

    straight = run("a", [4])
    resumed = run("b", [2, 4])
    assert len(resumed["loss"]) == 4
    for k, v in _train_keys(straight).items():
        np.testing.assert_allclose(resumed[k], v, rtol=0, atol=0,
                                   err_msg=k)


def test_weights_only_resume_differs(tmp_path):
    """Negative control: the reference-semantics load_weights path (best
    weights, fresh optimizer) does NOT reproduce the straight run —
    that's exactly the gap exact_resume closes."""
    x, y = _data()
    ckpt = CheckpointManager(str(tmp_path))
    tr = _trainer()
    tr.init_state(x)
    straight = tr.fit(batches(x, y, 4, seed=7), epochs=4, verbose=0)

    tr1 = _trainer()
    tr1.init_state(x)
    tr1.fit(batches(x, y, 4, seed=7), epochs=2, verbose=0)
    ckpt.save(tr1.state, "best")
    tr2 = _trainer()
    tr2.init_state(x)
    tr2.state = ckpt.restore(tr2.state, "best")
    cont = tr2.fit(batches(x, y, 4, seed=7), epochs=2, verbose=0)
    # Adam moments were reset: the continuation diverges from the
    # uninterrupted trajectory
    assert not np.allclose(cont["loss"], straight["loss"][2:], atol=1e-7)


def test_sigterm_preemption_saves_and_resumes(tmp_path):
    """A SIGTERM mid-epoch stops at the next step boundary, saves a full
    'last' checkpoint recording THIS epoch, and fit returns cleanly; a
    later fit resumes from that epoch."""
    x, y = _data()
    ckpt = CheckpointManager(str(tmp_path))
    tr = _trainer()
    tr.init_state(x)

    fired = {"n": 0}
    prev_handler = signal.getsignal(signal.SIGTERM)

    def preempting_loader():
        for i in range(0, len(x), 4):
            if fired["n"] == 3:  # mid-epoch-1 (2 steps/epoch)
                signal.raise_signal(signal.SIGTERM)
            fired["n"] += 1
            yield x[i:i + 4], y[i:i + 4]

    history = tr.fit(preempting_loader, epochs=10, checkpoint=ckpt,
                     monitor="loss", verbose=0, exact_resume=True)
    # epoch 0 completed; epoch 1 was preempted after 1 step
    assert len(history["loss"]) == 1
    assert tr.preempted  # drivers stop their fold loop on this flag
    assert ckpt.has_full("last")
    meta = ckpt.read_meta("last")
    assert meta["epoch"] == 1  # resume restarts the preempted epoch
    # the previous SIGTERM handler was restored on exit
    assert signal.getsignal(signal.SIGTERM) == prev_handler

    tr2 = _trainer()
    tr2.init_state(x)
    history2 = tr2.fit(batches(x, y, 4, seed=7), epochs=3, checkpoint=ckpt,
                       monitor="loss", verbose=0, exact_resume=True)
    assert len(history2["loss"]) == 3  # epoch 0 history + epochs 1-2
    assert not tr2.preempted
    assert ckpt.read_meta("last")["epoch"] == 3


def test_sigterm_during_validation(tmp_path):
    """A SIGTERM landing in the validation pass exits promptly: the
    partial validation is discarded, meta records THIS epoch (resume
    re-runs it in full), and the truncated val metrics never reach
    history — the resumed run's history stays identical to an
    uninterrupted one."""
    x, y = _data()
    ckpt = CheckpointManager(str(tmp_path))
    tr = _trainer()
    tr.init_state(x)

    def val_loader():
        signal.raise_signal(signal.SIGTERM)
        for i in range(0, len(x), 4):
            yield x[i:i + 4], y[i:i + 4]

    history = tr.fit(batches(x, y, 4, seed=7), val_data=val_loader,
                     epochs=5, checkpoint=ckpt, monitor="loss",
                     verbose=0, exact_resume=True)
    assert tr.preempted
    assert history.get("loss", []) == []  # epoch 0 discarded entirely
    assert "val_loss" not in history
    assert ckpt.read_meta("last")["epoch"] == 0  # re-run epoch 0


def test_meta_pairing_survives_kill_between_swap_and_finalize(tmp_path):
    """A kill between the arrays swap and the meta finalize leaves NEW
    arrays with the OLD meta in place and the RIGHT meta in .staging;
    restore_full must adopt the staged meta via the step token instead
    of resuming one epoch behind (which would silently double-train)."""
    import shutil
    x, y = _data()
    ckpt = CheckpointManager(str(tmp_path))
    tr = _trainer()
    tr.init_state(x)
    tr.fit(batches(x, y, 4, seed=7), epochs=1, checkpoint=ckpt,
           monitor="loss", verbose=0, exact_resume=True)
    meta1 = ckpt.read_meta("last")
    tr2 = _trainer()
    tr2.init_state(x)
    tr2.fit(batches(x, y, 4, seed=7), epochs=2, checkpoint=ckpt,
            monitor="loss", verbose=0, exact_resume=True)
    meta2 = ckpt.read_meta("last")
    assert meta2["epoch"] == 2 and meta2["step"] > meta1["step"]
    # simulate the kill window: arrays are epoch-2's, final meta reverted
    # to epoch-1's, epoch-2's meta still staged
    mpath = ckpt._meta_path("last")
    with open(mpath + ".staging", "w") as f:
        json.dump(meta2, f)
    with open(mpath, "w") as f:
        json.dump(meta1, f)
    tr3 = _trainer()
    tr3.init_state(x)
    restored, meta = ckpt.restore_full(tr3.state, "last")
    assert meta["epoch"] == 2  # adopted the staged meta (token match)
    assert int(restored.step) == meta2["step"]
    assert not os.path.exists(mpath + ".staging")  # promoted to final
    assert ckpt.read_meta("last")["epoch"] == 2

    # unrecoverable variant: the staged meta is gone too — restore falls
    # back to the stale meta with a loud warning (documented double-train)
    with open(mpath, "w") as f:
        json.dump(meta1, f)
    tr4 = _trainer()
    tr4.init_state(x)
    _, meta = ckpt.restore_full(tr4.state, "last")
    assert meta["epoch"] == 1


def test_callback_state_resumes(tmp_path):
    """EarlyStopping patience counters and a recorded stop survive the
    boundary: a run that early-stopped does not train further when
    re-launched with more epochs."""
    x, y = _data()
    ckpt = CheckpointManager(str(tmp_path))

    def fit(epochs):
        tr = _trainer()
        tr.init_state(x)
        return tr.fit(
            batches(x, y, 4, seed=7), epochs=epochs,
            callbacks=[EarlyStopping(monitor="loss", patience=1,
                                     min_delta=10.0)],  # stops at epoch 2
            checkpoint=ckpt, monitor="loss", verbose=0, exact_resume=True)

    first = fit(10)
    stopped_at = len(first["loss"])
    assert stopped_at < 10
    assert ckpt.read_meta("last")["stopped"] is True
    again = fit(20)
    assert len(again["loss"]) == stopped_at  # no further epochs ran


def test_rlrop_counter_resumes(tmp_path):
    """ReduceLROnPlateau's wait counter crosses the boundary: the LR drop
    lands at the same global epoch as in an uninterrupted run."""
    x, y = _data()

    def run(dirname, epoch_plan):
        ckpt = CheckpointManager(str(tmp_path / dirname))
        history = None
        for epochs in epoch_plan:
            tr = _trainer()
            tr.init_state(x)
            history = tr.fit(
                batches(x, y, 4, seed=7), epochs=epochs,
                callbacks=[ReduceLROnPlateau(monitor="loss", factor=0.5,
                                             patience=2, min_delta=10.0)],
                checkpoint=ckpt, monitor="loss", verbose=0,
                exact_resume=True)
        return history

    straight = run("a", [5])
    resumed = run("b", [3, 5])
    np.testing.assert_allclose(resumed["lr"], straight["lr"], rtol=0,
                               atol=0)
    np.testing.assert_allclose(resumed["loss"], straight["loss"], rtol=0,
                               atol=0)


def test_zero1_exact_resume(tmp_path):
    """Full-state restore places leaves by the target's shardings: a
    ZeRO-1 run (moments sharded over 'data') resumes exactly."""
    from tf_1d_2d_segmentation_end2endpipelines_tpu.parallel import (
        make_mesh)
    x, y = _data()
    mesh = make_mesh(jax.devices(), data=8)

    def run(dirname, epoch_plan):
        ckpt = CheckpointManager(str(tmp_path / dirname))
        history = None
        for epochs in epoch_plan:
            tr = _trainer(mesh=mesh, zero1=True)
            tr.init_state(x)
            history = tr.fit(batches(x, y, 8, seed=5), epochs=epochs,
                             checkpoint=ckpt, monitor="loss", verbose=0,
                             exact_resume=True)
        return history

    straight = run("a", [3])
    resumed = run("b", [1, 3])
    np.testing.assert_allclose(resumed["loss"], straight["loss"], rtol=0,
                               atol=2e-7)


def test_weights_only_save_clears_stale_meta(tmp_path):
    """A weights-only save over an earlier full checkpoint must drop the
    meta sidecar — otherwise a resume would pair a new-weights dir with a
    stale epoch/optimizer claim."""
    x, y = _data()
    tr = _trainer()
    tr.init_state(x)
    ckpt = CheckpointManager(str(tmp_path))
    ckpt.save_full(tr.state, "best", meta={"epoch": 5})
    assert ckpt.has_full("best")
    ckpt.save(tr.state, "best")
    assert not ckpt.has_full("best")
    assert ckpt.exists("best")


def test_ema_mismatch_raises(tmp_path):
    x, y = _data()
    tr = _trainer(ema_decay=0.9)
    tr.init_state(x)
    ckpt = CheckpointManager(str(tmp_path))
    ckpt.save_full(tr.state, "last", meta={"epoch": 1})
    plain = _trainer()
    plain.init_state(x)
    with pytest.raises(ValueError, match="ema"):
        ckpt.restore_full(plain.state, "last")


def test_exact_resume_requires_checkpoint():
    x, y = _data()
    tr = _trainer()
    tr.init_state(x)
    with pytest.raises(ValueError, match="checkpoint"):
        tr.fit(batches(x, y, 4), epochs=1, verbose=0, exact_resume=True)


def test_driver_exact_resume_ini(tmp_path):
    """INI-level exact resume through the 2D driver: run 2 epochs, re-run
    the same config at 4 epochs — the second run continues from epoch 2
    and the combined history equals a straight 4-epoch run."""
    from PIL import Image

    from tf_1d_2d_segmentation_end2endpipelines_tpu.drivers import (
        train as run_train)
    from tf_1d_2d_segmentation_end2endpipelines_tpu.utils.config import (
        TrainConfig, load_train_config, save_train_config)

    root = tmp_path / "Data" / "Train"
    rng = np.random.default_rng(0)
    for sub in ("images", "masks"):
        os.makedirs(root / sub, exist_ok=True)
    for i in range(8):
        img = rng.uniform(0, 255, (32, 32, 3)).astype(np.uint8)
        msk = np.zeros((32, 32), np.uint8)
        msk[4 + i:20, 8:20] = 255
        Image.fromarray(img).save(root / "images" / f"{i}.png")
        Image.fromarray(msk).save(root / "masks" / f"{i}.png")

    def cfg(epochs, save):
        return TrainConfig(
            train_dir=str(root), independent_val_set=False,
            validation_portion=0.0, imlength=32, imwidth=32, model_width=4,
            model_depth=2, decoder_name="UNet", batch_size=4,
            num_epochs=epochs, learning_rate=1e-3, monitor_param="loss",
            save_dir=str(tmp_path / save), load_weights=False,
            exact_resume=True)

    # the key round-trips through the reference INI format
    ini = tmp_path / "Train_Configs.ini"
    save_train_config(cfg(4, "R"), str(ini))
    assert load_train_config(str(ini)).exact_resume is True

    straight = run_train(config=cfg(4, "A"))[1]
    run_train(config=cfg(2, "B"))
    resumed = run_train(config=cfg(4, "B"))[1]
    assert len(resumed["loss"]) == 4
    np.testing.assert_allclose(resumed["loss"], straight["loss"],
                               rtol=0, atol=0)

    # the driver artifacts carry the meta sidecar
    fold_dir = tmp_path / "B" / "Fold_1"
    assert os.path.isfile(fold_dir / "last.meta.json")
    with open(fold_dir / "last.meta.json") as f:
        assert json.load(f)["epoch"] == 4


def test_exact_resume_with_device_augment_and_cache(tmp_path):
    """The strongest data-order guarantee: exact resume under
    augment_device + cache_data.  The augmentation stream is keyed by
    (seed, epoch, step) through the loader's epoch counter, so an
    interrupted-and-resumed driver run reproduces the straight run's
    losses exactly, augmentations included."""
    from PIL import Image
    from tf_1d_2d_segmentation_end2endpipelines_tpu.drivers import \
        train as run_train
    from tf_1d_2d_segmentation_end2endpipelines_tpu.utils.config import \
        TrainConfig

    root = tmp_path / "Train"
    rng = np.random.default_rng(0)
    for sub in ("images", "masks"):
        os.makedirs(root / sub, exist_ok=True)
    for i in range(4):
        img = rng.uniform(0, 255, (32, 32, 3)).astype(np.uint8)
        msk = np.zeros((32, 32), np.uint8)
        msk[8:20, 8:20] = 255
        Image.fromarray(img).save(str(root / "images" / f"{i}.png"))
        Image.fromarray(msk).save(str(root / "masks" / f"{i}.png"))

    def cfg(save, epochs):
        return TrainConfig(
            train_dir=str(root), imlength=32, imwidth=32, model_width=4,
            model_depth=2, decoder_name="UNet", model_genre="UNet",
            batch_size=2, num_epochs=epochs, learning_rate=1e-2,
            loss_function="BCEDiceLoss", metric_list=(),
            monitor_param="loss", save_dir=str(tmp_path / save),
            start_fold=1, end_fold=1, save_history=False,
            load_weights=False, independent_val_set=False,
            validation_portion=0.0, exact_resume=True,
            augment_device=True, cache_data=True)

    straight = run_train(config=cfg("A", 4))[1]
    run_train(config=cfg("B", 2))
    resumed = run_train(config=cfg("B", 4))[1]
    assert len(resumed["loss"]) == 4
    np.testing.assert_allclose(resumed["loss"], straight["loss"],
                               rtol=0, atol=0)


def test_finetune_stage_not_swallowed_by_exact_resume(tmp_path):
    """The reference's fine-tune flow re-runs train into the SAME
    save_dir with a changed config (lower LR, notebook cells 53-55).
    With exact_resume on, stage 1's completed 'last' checkpoint must NOT
    make stage 2 think its epochs are already trained — the config
    token detects the change and the stage starts fresh; re-running the
    SAME stage-2 config afterwards resumes normally."""
    from PIL import Image
    from tf_1d_2d_segmentation_end2endpipelines_tpu.drivers import \
        train as run_train
    from tf_1d_2d_segmentation_end2endpipelines_tpu.utils.config import \
        TrainConfig

    root = tmp_path / "Train"
    rng = np.random.default_rng(0)
    for sub in ("images", "masks"):
        os.makedirs(root / sub, exist_ok=True)
    for i in range(4):
        img = rng.uniform(0, 255, (32, 32, 3)).astype(np.uint8)
        msk = np.zeros((32, 32), np.uint8)
        msk[8:20, 8:20] = 255
        Image.fromarray(img).save(str(root / "images" / f"{i}.png"))
        Image.fromarray(msk).save(str(root / "masks" / f"{i}.png"))

    def cfg(lr, load):
        return TrainConfig(
            train_dir=str(root), imlength=32, imwidth=32, model_width=4,
            model_depth=2, decoder_name="UNet", model_genre="UNet",
            batch_size=2, num_epochs=2, learning_rate=lr,
            loss_function="BCEDiceLoss", metric_list=(),
            monitor_param="loss", save_dir=str(tmp_path / "R"),
            start_fold=1, end_fold=1, save_history=False,
            load_weights=load, independent_val_set=False,
            validation_portion=0.0, exact_resume=True)

    h1 = run_train(config=cfg(1e-2, False))
    assert len(h1[1]["loss"]) == 2  # stage 1 complete
    # stage 2: changed LR (the fine-tune stage), same save_dir
    h2 = run_train(config=cfg(5e-5, True))
    assert len(h2[1]["loss"]) == 2, \
        "fine-tune stage was swallowed by stage 1's resume state"
    assert h2[1]["loss"] != h1[1]["loss"]
    # unchanged stage-2 config re-run: already complete -> history is
    # restored intact and 0 new epochs train
    h3 = run_train(config=cfg(5e-5, True))
    assert "loss" in h3[1]
    assert h3[1]["loss"] == h2[1]["loss"]

    # innocuous bookkeeping edits must NOT invalidate the resume state
    from tf_1d_2d_segmentation_end2endpipelines_tpu.utils.config import \
        resume_token as _token
    base = cfg(5e-5, True)
    edited = cfg(5e-5, True)
    edited.num_epochs = 50
    edited.tensorboard_dir = "/tmp/tb"
    edited.save_history = True
    edited.start_fold = 3
    assert _token(base) == _token(edited)
    changed = cfg(5e-5, True)
    changed.learning_rate = 1e-3
    assert _token(base) != _token(changed)


def test_tokenless_checkpoint_still_resumes(tmp_path):
    """Back-compat: a 'last' checkpoint whose meta has no config token
    (pre-token release) must still resume when the new code passes one —
    unknown provenance must not discard a long run's progress."""
    x, y = _data()
    ckpt = CheckpointManager(str(tmp_path))
    tr = _trainer()
    tr.init_state(x)
    tr.fit(batches(x, y, 4, seed=7), epochs=2, checkpoint=ckpt,
           monitor="loss", verbose=0, exact_resume=True)
    # strip the token from the sidecar (simulate the older format)
    meta = ckpt.read_meta("last")
    meta.pop("config", None)
    with open(ckpt._meta_path("last"), "w") as f:
        json.dump(meta, f)
    tr2 = _trainer()
    tr2.init_state(x)
    h = tr2.fit(batches(x, y, 4, seed=7), epochs=4, checkpoint=ckpt,
                monitor="loss", verbose=0, exact_resume=True,
                resume_token="brand-new-token")
    assert len(h["loss"]) == 4  # resumed the 2 old epochs + trained 2
