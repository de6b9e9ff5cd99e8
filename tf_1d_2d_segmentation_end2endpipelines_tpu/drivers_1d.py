"""1D signal train/test drivers.

The reference's 1D pipeline is notebook-driven with no entry script
(1D_Segmentation.ipynb: cells 29-35 load .pt sets, 35-49 build + fit,
51-63 NILM evaluation).  These drivers give it the same L6 INI surface
the 2D tree has (``drivers.train``/``drivers.test``):

- ``train_1d``: Signal_Configs.ini -> model_selector_1d -> DS pyramid ->
  compiled train/eval steps -> callbacks -> best-checkpoint -> history
- ``test_1d``: restore checkpoint -> batched jitted prediction -> the
  notebook's NILM metric suite (MAE/MSE/RMSE/PCC, SAE, EA, JEOI, DEOI)
  -> console table + json

TPU-first notes: prediction runs batched through one jitted step (the
notebook predicts whole 21600-sample sequences at batch 1); metrics are
host-side numpy over fetched outputs, matching the notebook formulas
exactly (eval/nilm.py).
"""
from __future__ import annotations

import json
import os
import typing as tp

import numpy as np

from .data.pyramid import prepare_train_dict
from .data.pt_io import load_signal_dataset
from .data.synthetic import batches
from .eval import (
    calculate_deoi,
    calculate_ea,
    calculate_jeoi,
    calculate_sae,
    construction_error,
    plot_history,
)
from .drivers import _resolve_dtype, summarize_model
from .models import model_selector_1d
from .train import (
    CheckpointManager,
    EarlyStopping,
    ReduceLROnPlateau,
    Trainer,
    default_ds_weights,
)
from .utils.config import (Signal1DConfig, load_signal_config,
                           resume_token, save_signal_config)


def _build_model_1d(cfg: Signal1DConfig, dtype=None):
    return model_selector_1d(
        cfg.model_name, cfg.signal_length, cfg.model_depth,
        cfg.num_channel, cfg.model_width, cfg.kernel_size,
        problem_type=cfg.problem_type, output_nums=cfg.output_nums,
        ds=cfg.d_s, ae=cfg.a_e, ag=cfg.a_g, lstm=cfg.lstm,
        alpha=cfg.alpha, q=cfg.q_onn, dense_loop=cfg.dense_loop,
        feature_number=cfg.feature_number, is_transconv=cfg.is_transconv,
        cardinality=cfg.cardinality, pooling_type=cfg.pooling_type,
        se_ratio=cfg.se_ratio, block_size=cfg.block_size,
        t=cfg.t, keep_prob=cfg.keep_prob,
        dtype=_resolve_dtype(cfg, dtype))


def _wrap_targets_1d(y: np.ndarray, cfg: Signal1DConfig):
    if cfg.d_s == 1:
        import jax.numpy as jnp
        return {k: np.asarray(v) for k, v in prepare_train_dict(
            jnp.asarray(y), cfg.model_depth, cfg.ds_type,
            spatial_rank=1).items()}
    return y


def _restore_trainer_1d(cfg: Signal1DConfig, action: str, dtype=None):
    """Build the 1D model + Trainer, init state, restore the 'best'
    checkpoint under ``cfg.save_dir`` (warn when absent).  Shared by
    test_1d, export_1d, predict_1d, and the 1D HTTP server (the 1D
    analog of ``drivers._restore_trainer``)."""
    model = _build_model_1d(cfg, dtype=dtype)
    trainer = Trainer(model, loss=cfg.loss_function, seed=cfg.seed)
    trainer.init_state(np.zeros((1, cfg.signal_length, cfg.num_channel),
                                np.float32))
    ckpt = CheckpointManager(cfg.save_dir) if cfg.save_dir else None
    restored = ckpt is not None and ckpt.exists("best")
    if restored:
        trainer.state = ckpt.restore(trainer.state, "best")
    else:
        print(f"WARNING: no 'best' checkpoint under {cfg.save_dir!r}; "
              f"{action} freshly initialized weights", flush=True)
    return model, trainer, restored


def import_keras_1d(ckpt_path: str,
                    config_path: str = "Signal_Configs.ini",
                    config: tp.Optional[Signal1DConfig] = None,
                    verify: bool = True) -> str:
    """Import a trained reference 1D checkpoint (the notebook's
    ``trained_models/<name>/..._D_S.h5`` full-model file, cell 35) as the
    orbax 'best' checkpoint under ``cfg.save_dir``, after which
    ``tpuseg test1d/serve1d/export1d/predict1d`` consume it.  The 2D
    analog (``drivers.import_keras``) documents the mechanism."""
    cfg = config if config is not None else load_signal_config(config_path)
    import keras
    import numpy as _np
    kmodel = keras.saving.load_model(ckpt_path, compile=False)
    model = _build_model_1d(cfg)
    sample = _np.zeros((1, cfg.signal_length, cfg.num_channel),
                       _np.float32)
    from .utils.keras_compat import convert_loaded_keras
    variables = convert_loaded_keras(kmodel, model, sample)
    trainer = Trainer(model, loss=cfg.loss_function, seed=cfg.seed)
    trainer.init_state(sample)
    from .drivers import _merge_converted
    state = trainer.state
    state = state.replace(
        params=_merge_converted(state.params, variables["params"]),
        batch_stats=_merge_converted(state.batch_stats,
                                     variables.get("batch_stats", {}))
        if state.batch_stats else state.batch_stats)
    if verify:
        import jax
        x = _np.random.default_rng(0).normal(
            size=sample.shape).astype(_np.float32)
        ref = kmodel(x, training=False)
        if isinstance(ref, (list, tuple)):
            ref = ref[0]
        with jax.default_matmul_precision("highest"):
            got = _np.asarray(jax.jit(
                lambda v, x: model.apply(v, x, train=False))(
                    {"params": state.params,
                     "batch_stats": state.batch_stats}, x)["out"])
        diff = float(_np.max(_np.abs(got - _np.asarray(ref))))
        if diff > 2e-2:  # threshold rationale: drivers.import_keras
            raise ValueError(
                f"import verification FAILED: max output deviation "
                f"{diff:.2e} vs the Keras checkpoint (expected <2e-2); "
                f"the config likely does not match the checkpoint")
        print(f"verified: max output deviation {diff:.2e} vs Keras",
              flush=True)
    trainer.state = state
    if not cfg.save_dir:
        raise ValueError("import-keras1d needs save_dir in the config "
                         "(destination for the imported checkpoint)")
    os.makedirs(cfg.save_dir, exist_ok=True)
    CheckpointManager(cfg.save_dir).save(trainer.state, "best")
    save_signal_config(cfg, os.path.join(cfg.save_dir,
                                         "Signal_Configs.ini"))
    print(f"imported {ckpt_path} -> {cfg.save_dir}/best", flush=True)
    return cfg.save_dir


def train_1d(config_path: str = "Signal_Configs.ini",
             config: tp.Optional[Signal1DConfig] = None,
             dtype=None) -> tp.Dict[str, tp.List[float]]:
    """Train on a .pt signal set (notebook cells 35-49).  Returns the
    history dict."""
    cfg = config if config is not None else load_signal_config(config_path)
    # validate before any artifact is written (mirrors drivers.train)
    from .drivers import _check_pipeline_parallel
    _check_pipeline_parallel(cfg)
    if cfg.remat == "blocks":
        raise ValueError(
            "remat = blocks is 2D-only (SegModel block_remat); for 1D use "
            "remat = conv_outs, which saves the same set of conv outputs "
            "via a whole-step jax.checkpoint")
    if cfg.save_dir:
        os.makedirs(cfg.save_dir, exist_ok=True)
        # persist the model-defining config with the artifacts so a
        # standalone test_1d run can rebuild the exact architecture
        save_signal_config(cfg, os.path.join(cfg.save_dir,
                                             "Signal_Configs.ini"))
    x, y = load_signal_dataset(cfg.train_set, cfg.x_key, cfg.y_key)
    targets = _wrap_targets_1d(y, cfg)

    if len(x) == 0:
        raise ValueError(f"empty training set {cfg.train_set!r}")
    val_data = None
    if cfg.val_set:
        if os.path.exists(cfg.val_set):
            xv, yv = load_signal_dataset(cfg.val_set, cfg.x_key, cfg.y_key)
            val_data = batches(xv, _wrap_targets_1d(yv, cfg),
                               cfg.batch_size, shuffle=False,
                               drop_remainder=False)
        else:
            # otherwise the monitor silently falls back to train loss and
            # the "best" checkpoint is train-loss-selected
            print(f"WARNING: val_set {cfg.val_set!r} does not exist; "
                  "training without validation (monitor falls back to "
                  "train loss)", flush=True)

    from .drivers import _training_mesh
    model = _build_model_1d(cfg, dtype=dtype)
    mesh = _training_mesh(cfg)
    trainer = Trainer(
        model,
        loss=cfg.loss_function,
        optimizer=cfg.optimizer_function,
        learning_rate=cfg.learning_rate,
        metrics=tuple(cfg.metric_list),
        loss_weights=(default_ds_weights(cfg.model_depth)
                      if cfg.d_s == 1 else None),
        mesh=mesh,
        seed=cfg.seed,
        remat=cfg.remat or None,
        accum_steps=cfg.accumulation_steps,
        ema_decay=cfg.ema_decay,
        zero1=cfg.zero1,
        clipnorm=cfg.clipnorm,
        clipvalue=cfg.clipvalue,
        global_clipnorm=cfg.global_clipnorm,
    )
    trainer.init_state(x[: min(len(x), cfg.batch_size)])

    ckpt = CheckpointManager(cfg.save_dir, async_save=True) \
        if cfg.save_dir else None
    if ckpt is not None and cfg.load_weights and ckpt.exists("best"):
        trainer.state = ckpt.restore(trainer.state, "best")
        print(f"resumed from {cfg.save_dir}/best", flush=True)
    monitor = cfg.monitor_param
    if monitor.startswith("val_") and val_data is None:
        monitor = monitor[len("val_"):] or "loss"
    history = trainer.fit(
        # keep partial batches: dropping the remainder would silently
        # train 0 steps/epoch whenever len(x) < batch_size
        batches(x, targets, cfg.batch_size, shuffle=True, seed=cfg.seed,
                drop_remainder=False),
        val_data=val_data,
        epochs=cfg.num_epochs,
        callbacks=[
            EarlyStopping(monitor=monitor, patience=cfg.patience_amount,
                          mode=cfg.patience_mode),
            ReduceLROnPlateau(monitor=monitor, factor=cfg.rlronp_factor,
                              patience=cfg.patience_amount_rlronp,
                              mode=cfg.patience_mode),
        ],
        checkpoint=ckpt,
        monitor=monitor,
        tensorboard_dir=cfg.tensorboard_dir or None,
        exact_resume=cfg.exact_resume,
        resume_token=resume_token(cfg),
    )
    if cfg.save_history and cfg.save_dir:
        with open(os.path.join(cfg.save_dir, "history.json"), "w") as f:
            json.dump(history, f)
        metric = cfg.metric_list[0] if cfg.metric_list else None
        plot_history(history, os.path.join(cfg.save_dir, "history.png"),
                     metric_name=metric)
    return history


def summary_1d(config_path: str = "Signal_Configs.ini",
               config: tp.Optional[Signal1DConfig] = None
               ) -> tp.Dict[str, tp.Any]:
    """Model summary from a signal config (abstract shapes only — no
    compile; mirrors ``drivers.summary`` for the 1D zoo)."""
    import jax.numpy as jnp

    cfg = config if config is not None else load_signal_config(config_path)
    model = _build_model_1d(cfg)
    sample = jnp.zeros((1, cfg.signal_length, cfg.num_channel),
                       jnp.float32)
    return summarize_model(model, sample, cfg.model_name)


def export_1d(config_path: str = "Signal_Configs.ini",
              config: tp.Optional[Signal1DConfig] = None,
              out_path: str = "model_1d.stablehlo", batch: int = 1,
              dtype=None) -> str:
    """AOT-export the trained 1D checkpoint as a portable StableHLO
    inference artifact (same contract as the 2D ``export`` verb: weights
    baked in, reloads with jax alone via ``serve.load_exported``)."""
    from .serve import export_model

    cfg = config if config is not None else load_signal_config(config_path)
    model, trainer, _ = _restore_trainer_1d(cfg, "exporting", dtype=dtype)
    return export_model(
        model, trainer.state,
        (batch, cfg.signal_length, cfg.num_channel), out_path)


def predict_1d(config_path: str = "Signal_Configs.ini",
               config: tp.Optional[Signal1DConfig] = None,
               input_path: tp.Optional[str] = None,
               out_path: str = "predictions_1d.npz",
               dtype=None) -> str:
    """Pure inference on UNLABELED signals (the 1D analog of the 2D
    ``predict`` verb; the notebook's evaluation path always needs ground
    truth).  Reads a .pt container holding only ``x_key`` (labels, if
    present, are ignored), writes an ``.npz`` with ``output`` (and any
    DS heads) arrays.  Returns the output path."""
    from .data.pt_io import load_signal_inputs

    cfg = config if config is not None else load_signal_config(config_path)
    path = input_path or cfg.test_set
    x = load_signal_inputs(path, cfg.x_key)
    if len(x) == 0:
        raise ValueError(f"empty input set {path!r}")
    _, trainer, _ = _restore_trainer_1d(cfg, "predicting with",
                                        dtype=dtype)

    from .eval.tta import parse_tta
    tta_names = parse_tta(cfg.tta, rank=1)
    chunks: tp.Dict[str, tp.List[np.ndarray]] = {}
    for start in range(0, len(x), cfg.batch_size):
        out = trainer.predict(x[start:start + cfg.batch_size],
                              tta=tta_names)
        for k, v in out.items():
            chunks.setdefault(k, []).append(np.asarray(v))
    arrays = {("output" if k == "out" else k): np.concatenate(v)
              for k, v in chunks.items()}
    np.savez(out_path, **arrays)
    print(f"wrote {len(x)} predictions to {out_path}", flush=True)
    return out_path


def test_1d(config_path: str = "Signal_Configs.ini",
            config: tp.Optional[Signal1DConfig] = None,
            dtype=None) -> tp.Dict[str, tp.Any]:
    """Evaluate on a .pt signal set with the notebook's NILM metric
    suite (cells 51-63).  Returns the metrics dict (also written to
    ``{save_dir}/test_metrics_1d.json``)."""
    cfg = config if config is not None else load_signal_config(config_path)
    x, y = load_signal_dataset(cfg.test_set, cfg.x_key, cfg.y_key)

    _, trainer, restored = _restore_trainer_1d(cfg, "evaluating",
                                               dtype=dtype)

    from .eval.tta import parse_tta
    tta_names = parse_tta(cfg.tta, rank=1)
    preds = []
    for s in range(0, len(x), cfg.batch_size):
        preds.append(trainer.predict(x[s:s + cfg.batch_size],
                                     tta=tta_names)["out"])
    pred = np.concatenate(preds, axis=0)

    metrics: tp.Dict[str, tp.Any] = dict(construction_error(y, pred))
    # SAE/EA divide by sum(ground) — the notebook evaluates nonnegative
    # power signals (cells 54-57).  Per-sample EA divides by EACH
    # window's own sum (eval/nilm.py:56), so all-off windows (sum 0)
    # would poison the mean with inf; restrict both to windows with
    # positive ground energy and keep the keys present (None) otherwise
    pos = y.reshape(len(y), -1).sum(axis=1) > 0
    if pos.any():
        metrics["SAE"] = calculate_sae(y[pos], pred[pos])
        metrics["EA"] = calculate_ea(y[pos], pred[pos])
    else:
        metrics["SAE"] = metrics["EA"] = None
    metrics["JEOI"] = calculate_jeoi(y, pred)
    metrics["DEOI"] = calculate_deoi(y, pred)
    metrics["restored_checkpoint"] = bool(restored)
    for k, v in metrics.items():
        print(f"{k}: {v}", flush=True)
    if cfg.save_dir:
        os.makedirs(cfg.save_dir, exist_ok=True)
        with open(os.path.join(cfg.save_dir, "test_metrics_1d.json"),
                  "w") as f:
            json.dump(metrics, f)
    return metrics
