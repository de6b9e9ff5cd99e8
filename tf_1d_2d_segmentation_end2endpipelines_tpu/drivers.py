"""Train / Test drivers (the framework's L6).

Functional equivalents of the reference's entry scripts:
- ``train``: 2DCNN/Train.py:1-439 -- fold loop: config -> model -> loader
  -> compiled train/eval steps -> callbacks -> best-checkpoint -> history
  (json + plots)
- ``test``: 2DCNN/Test.py:1-396 -- fold loop: restore checkpoint -> batch
  prediction (whole-image or patchify), threshold, save masks, confusion
  matrix + per-class metric report + figures + spreadsheet

Differences (TPU-first): inference runs batched through one jitted predict
step (the reference calls model.predict per image, Test.py:161); metrics
accumulate on device; checkpoints are orbax trees instead of .keras files;
the multiclass path works (the reference's crashes, Test.py:173).
"""
from __future__ import annotations

import json
import os
import typing as tp

import jax.numpy as jnp
import numpy as np

from .data.generators import PrefetchLoader, SegmentationFolderDataset
from .data.patch import create_patches, unpatchify
from .data.pyramid import prepare_train_dict
from .eval import (
    confusion_matrix_update,
    label_from_pred,
    evaluation_table,
    export_results_sheet,
    init_confusion_matrix,
    plot_conf_mat,
    plot_history,
    plot_multiclass_precision_recall_curves,
    plot_multiclass_roc,
    plot_prediction_distributions,
    plot_sample_grid,
)
from .models import model_selector
from .train import (
    CheckpointManager,
    EarlyStopping,
    ReduceLROnPlateau,
    Trainer,
    default_ds_weights,
)
from .utils.config import (TestConfig, TrainConfig, load_test_config,
                           load_train_config, resume_token,
                           save_train_config)


def _resolve_dtype(cfg: TrainConfig, dtype):
    """``dtype=None`` means "use the INI ``compute_dtype``"; an explicit
    dtype (including jnp.float32) always wins, so programmatic callers
    can force reference-numerics f32 against a bfloat16 config."""
    if dtype is not None:
        return dtype
    name = getattr(cfg, "compute_dtype", "float32").strip().lower()
    if name in ("", "float32", "f32"):
        return jnp.float32
    if name in ("bfloat16", "bf16"):
        return jnp.bfloat16
    raise ValueError(f"unknown compute_dtype {name!r} "
                     "(expected float32 or bfloat16)")


def _build_model(cfg: TrainConfig, dtype=None):
    dtype = _resolve_dtype(cfg, dtype)
    return model_selector(
        model_genre=cfg.model_genre,
        encoder_name=cfg.encoder_name,
        decoder_name=cfg.decoder_name,
        length=cfg.imlength,
        width=cfg.imwidth,
        model_width=cfg.model_width,
        model_depth=cfg.model_depth,
        num_channels=cfg.num_channels,
        output_nums=cfg.output_nums,
        ds=cfg.d_s, ae=cfg.a_e, ag=cfg.a_g, lstm=cfg.lstm,
        dense_loop=cfg.dense_loop,
        feature_number=cfg.feature_number,
        is_transconv=cfg.is_transconv,
        alpha=cfg.alpha, q=cfg.q_onn,
        final_activation=cfg.final_activation,
        train_mode=cfg.train_mode,
        is_base_model_trainable=cfg.encoder_trainable,
        block_remat=cfg.remat == "blocks",
        dtype=dtype,
    )


def _encoder_init_variables(cfg: TrainConfig, model, sample, resuming: bool):
    """Converted ImageNet (or local .h5) encoder weights for a fresh
    pretrained-encoder fold, or None to use random init.

    The reference hardcodes ``weights='imagenet'`` in every
    keras.applications ctor (unet_variants.py:1057 etc.); here the INI key
    ``encoder_weights`` selects 'imagenet' (default), a local .h5 path, or
    'none'.  Resuming folds skip the load — the checkpoint carries the
    trained weights.
    """
    spec = (cfg.encoder_weights or "none").strip()
    if (cfg.train_mode != "pretrained_encoder" or resuming
            or spec.lower() == "none"):
        return None
    from .utils.pretrained_init import init_segmodel_with_imagenet
    weights = "imagenet" if spec.lower() == "imagenet" else spec
    try:
        return init_segmodel_with_imagenet(model, jnp.asarray(sample),
                                           weights=weights)
    except Exception as e:
        raise RuntimeError(
            f"encoder_weights = {spec!r} could not be loaded for "
            f"{cfg.encoder_name}: {e}\nOn a network-less host, pre-cache "
            "the keras.applications .h5 files under $KERAS_HOME/models "
            "(see MIGRATION.md 'Offline ImageNet weights') or set "
            "encoder_weights = none to train from random init.") from e


def _restore_trainer(cfg: TrainConfig, ckpt_dir: str, action: str,
                     dtype=None):
    """Build the model + Trainer, init state, restore the 'best'
    checkpoint under ``ckpt_dir`` (warn when absent).  Shared by export,
    predict, and the HTTP server."""
    from .train import Trainer
    model = _build_model(cfg, dtype=dtype)
    trainer = Trainer(model)
    trainer.init_state(np.zeros(
        (1, cfg.imlength, cfg.imwidth, cfg.num_channels), np.float32))
    ckpt = CheckpointManager(ckpt_dir)
    if ckpt.exists("best"):
        trainer.state = ckpt.restore(trainer.state, "best")
    else:
        print(f"WARNING: no 'best' checkpoint under {ckpt_dir}; "
              f"{action} freshly initialized weights", flush=True)
    return model, trainer


def _check_pipeline_parallel(cfg):
    """Reject ``pipeline_parallel > 1`` loudly (the key is API-only).

    Called from ``_training_mesh`` (library users) AND from the drivers'
    pre-artifact validation blocks, so a CLI user sees this before any
    dataset scan or persisted config — not after the fold loop starts."""
    if getattr(cfg, "pipeline_parallel", 1) > 1:
        raise ValueError(
            "pipeline_parallel > 1: GPipe pipeline parallelism is "
            "API-only in this framework.  It fits HOMOGENEOUS block "
            "stacks (repeated same-shape blocks), and no INI-reachable "
            "model has one long enough to beat the (S-1)/(M+S-1) "
            "pipeline bubble: the dense_loop bottleneck and ConvMixer "
            "nodes repeat only 1-3 blocks, and the U-decoders' skip "
            "connections cross every would-be stage boundary.  Scale "
            "with model_parallel (tensor), spatial_parallel "
            "(sequence/halo), and zero1 instead — they compose "
            "(docs/SCALING.md).  For custom homogeneous stacks, use "
            "tf_1d_2d_segmentation_end2endpipelines_tpu.parallel."
            "pipeline.pipeline_apply directly "
            "(examples/pipeline_parallel.py).")


def _training_mesh(cfg):
    """The mesh the INI requests: None (Trainer's dp-over-all-devices
    default) unless ``model_parallel`` > 1 (tensor-parallel 'model' axis)
    or ``spatial_parallel`` > 1 (GSPMD H/L-axis partitioning, 'spatial'
    axis); shared by the 2D and 1D train drivers."""
    _check_pipeline_parallel(cfg)
    model = getattr(cfg, "model_parallel", 1)
    spatial = getattr(cfg, "spatial_parallel", 1)
    if model > 1 or spatial > 1:
        from .parallel import make_mesh
        return make_mesh(model=model, spatial=spatial)
    return None


def _fold_dir(cfg, fold: int) -> str:
    task = "" if cfg.save_dir is None else cfg.save_dir
    return os.path.join(task, f"Fold_{fold}")


def _wrap_targets(y, cfg: TrainConfig, keep_device: bool = False):
    if cfg.d_s == 1:
        # the INI driver is the 2D pipeline (spatial_rank=2).  keep_device
        # (augment_device path): y is already a device array — leave the
        # pyramid on device instead of a blocking device->host->device
        # round trip per step
        targets = prepare_train_dict(jnp.asarray(y), cfg.model_depth,
                                     cfg.ds_type, spatial_rank=2)
        if keep_device:
            return dict(targets)
        return {k: np.asarray(v) for k, v in targets.items()}
    return y


def train(config_path: str = "Train_Configs.ini",
          config: tp.Optional[TrainConfig] = None,
          dtype=None) -> tp.Dict[int, tp.Dict[str, tp.List[float]]]:
    """Fold-loop training driver.  Returns {fold: history}."""
    cfg = config if config is not None else load_train_config(config_path)
    histories: tp.Dict[int, tp.Dict[str, tp.List[float]]] = {}
    # validate BEFORE any artifact is written: a run that can never
    # start must not leave a persisted config for a later `test` to
    # rebuild from
    _check_pipeline_parallel(cfg)
    if cfg.augment_device and cfg.patchify:
        # the host path augments the WHOLE image before patchify
        # (PrefetchLoader._load_one); after the loader, only patches
        # exist — augmenting them independently would silently diverge
        # from the documented semantics
        raise ValueError(
            "augment_device does not compose with patchify (patches "
            "of one image would augment independently); use the host "
            "path: augment = 1")
    if cfg.augment_device and cfg.augment:
        raise ValueError(
            "augment and augment_device are ALTERNATIVES (the same op "
            "set on host vs accelerator); enabling both would "
            "double-augment every sample — pick one")
    # persist the model-defining config with the artifacts so a standalone
    # `test` run can rebuild the exact architecture (the reference instead
    # reloads the full .keras graph, Test.py:110-116 — weights-only orbax
    # checkpoints need the config to reconstruct)
    if cfg.save_dir:
        os.makedirs(cfg.save_dir, exist_ok=True)
        save_train_config(cfg, os.path.join(cfg.save_dir,
                                            "Train_Configs.ini"))
    dev_aug = None
    if cfg.augment_device:
        from .data.device_augment import (augment_stream_key,
                                          make_device_augment)
        # hoisted out of the fold loop so the jitted program compiles
        # once; value_range follows the normalization (raw 0-255 inputs
        # keep their range, like the host augment_pair's hi detection)
        dev_aug = make_device_augment(
            value_range=255.0 / cfg.normalizing_factor_img)
    for fold in range(cfg.start_fold, cfg.end_fold + 1):
        model = _build_model(cfg, dtype=dtype)
        size = (cfg.imlength, cfg.imwidth)
        train_ds = SegmentationFolderDataset(
            os.path.join(cfg.train_dir, f"fold_{fold}")
            if os.path.isdir(os.path.join(cfg.train_dir, f"fold_{fold}"))
            else cfg.train_dir,
            size, cfg.image_color_mode, cfg.mask_color_mode,
            cfg.normalizing_factor_img, cfg.normalizing_factor_msk)
        split_val_ds = None
        if not cfg.independent_val_set and cfg.validation_portion > 0:
            from .data.generators import split_dataset
            train_ds, split_val_ds = split_dataset(
                train_ds, cfg.validation_portion, seed=cfg.seed)
        loader = PrefetchLoader(
            train_ds, cfg.batch_size, shuffle=True, seed=cfg.seed,
            patchify=cfg.patchify,
            patch_shape=(cfg.patch_width, cfg.patch_height),
            overlap_ratio=cfg.overlap_ratio,
            augment=cfg.augment,
            cache=cfg.cache_data,
            # accumulation splits each batch into accum microbatches; a
            # partial trailing batch would not divide, so drop it
            drop_remainder=cfg.accumulation_steps > 1)
        val_loader = None
        if split_val_ds is not None and len(split_val_ds):
            raw_val = PrefetchLoader(split_val_ds, cfg.batch_size,
                                     shuffle=False, patchify=cfg.patchify,
                                     patch_shape=(cfg.patch_width,
                                                  cfg.patch_height),
                                     overlap_ratio=cfg.overlap_ratio,
                                     cache=cfg.cache_data)

            def val_loader():
                for x, y in raw_val():
                    yield x, _wrap_targets(y, cfg)
        elif cfg.independent_val_set and os.path.isdir(cfg.val_dir):
            val_dir = (os.path.join(cfg.val_dir, f"fold_{fold}")
                       if os.path.isdir(os.path.join(cfg.val_dir,
                                                     f"fold_{fold}"))
                       else cfg.val_dir)
            val_ds = SegmentationFolderDataset(
                val_dir, size, cfg.image_color_mode, cfg.mask_color_mode,
                cfg.normalizing_factor_img, cfg.normalizing_factor_msk)
            raw_val = PrefetchLoader(val_ds, cfg.batch_size, shuffle=False,
                                     patchify=cfg.patchify,
                                     patch_shape=(cfg.patch_width,
                                                  cfg.patch_height),
                                     overlap_ratio=cfg.overlap_ratio,
                                     cache=cfg.cache_data)

            def val_loader():
                for x, y in raw_val():
                    yield x, _wrap_targets(y, cfg)

        def train_iter():
            # the loader's _epoch advances lazily on first next(); read
            # it here so the device-augment stream is keyed by the SAME
            # epoch counter (and replayed identically on exact resume)
            e = loader._epoch
            for i, (x, y) in enumerate(loader()):
                if dev_aug is not None:
                    x, y = dev_aug(augment_stream_key(cfg.seed, e, i),
                                   x, y)
                yield x, _wrap_targets(y, cfg,
                                       keep_device=dev_aug is not None)
        # exact resume reproduces the interrupted run's data order: the
        # loader's shuffle is (seed, epoch)-keyed, so fast-forwarding its
        # epoch counter replays the epochs the run would have seen
        train_iter.set_epoch = loader.set_epoch

        if cfg.accumulation_steps > 1 and \
                cfg.batch_size % cfg.accumulation_steps:
            raise ValueError(
                f"batch_size={cfg.batch_size} must be divisible by "
                f"accumulation_steps={cfg.accumulation_steps}")
        loss_weights = (default_ds_weights(cfg.model_depth)
                        if cfg.d_s == 1 else None)
        mesh = _training_mesh(cfg)
        trainer = Trainer(
            model,
            loss=cfg.loss_function,
            optimizer=cfg.optimizer_function,
            learning_rate=cfg.learning_rate,
            metrics=tuple(cfg.metric_list),
            loss_weights=loss_weights,
            num_classes=max(cfg.class_number + 1, 2),
            mesh=mesh,
            seed=cfg.seed,
            # 'blocks' remats inside the model (block_remat above), so the
            # step itself runs un-rematted
            remat=(cfg.remat or None) if cfg.remat != "blocks" else None,
            accum_steps=cfg.accumulation_steps,
            ema_decay=cfg.ema_decay,
            zero1=cfg.zero1,
            clipnorm=cfg.clipnorm,
            clipvalue=cfg.clipvalue,
            global_clipnorm=cfg.global_clipnorm,
        )
        sample = np.zeros((1, cfg.imlength if not cfg.patchify
                           else cfg.patch_width,
                           cfg.imwidth if not cfg.patchify
                           else cfg.patch_height,
                           cfg.num_channels), np.float32)
        ckpt_dir = _fold_dir(cfg, fold)
        ckpt = CheckpointManager(ckpt_dir, async_save=True)
        resuming = cfg.load_weights and ckpt.exists("best")
        trainer.init_state(
            sample, variables=_encoder_init_variables(cfg, model, sample,
                                                      resuming))
        if resuming:
            # resume (Train.py:361-369)
            trainer.state = ckpt.restore(trainer.state, "best")
            print(f"Fold {fold}: resumed from {ckpt_dir}/best", flush=True)
        monitor = cfg.monitor_param
        if monitor.startswith("val_") and val_loader is None:
            monitor = monitor[len("val_"):] or "loss"
        history = trainer.fit(
            train_iter,
            val_data=val_loader,
            epochs=cfg.num_epochs,
            callbacks=[
                EarlyStopping(monitor=monitor,
                              patience=cfg.patience_amount,
                              mode=cfg.patience_mode),
                ReduceLROnPlateau(monitor=monitor,
                                  factor=cfg.rlronp_factor,
                                  patience=cfg.patience_amount_rlronp,
                                  mode=cfg.patience_mode),
            ],
            checkpoint=ckpt,
            monitor=monitor,
            tensorboard_dir=(os.path.join(cfg.tensorboard_dir,
                                          f"Fold_{fold}")
                             if cfg.tensorboard_dir else None),
            exact_resume=cfg.exact_resume,
            resume_token=resume_token(cfg),
        )
        histories[fold] = history
        if cfg.save_history:
            os.makedirs(ckpt_dir, exist_ok=True)
            with open(os.path.join(ckpt_dir, "history.json"), "w") as f:
                json.dump(history, f)
            try:  # the reference's h5 history format (Train.py:425-430:
                # one dataset per metric) for tooling that reads it —
                # a convenience artifact: ANY failure (h5py absent, file
                # locked, disk full) must not abort the remaining folds
                import h5py
                with h5py.File(os.path.join(ckpt_dir, "history.h5"),
                               "w") as hf:
                    for k, v in history.items():
                        hf.create_dataset(k, data=np.asarray(v))
            except Exception as e:  # noqa: BLE001
                print(f"WARNING: could not write history.h5 ({e})",
                      flush=True)
            metric = cfg.metric_list[0] if cfg.metric_list else None
            plot_history(history, os.path.join(ckpt_dir, "history.png"),
                         metric_name=metric)
        if getattr(trainer, "preempted", False):
            # SIGTERM already triggered a resumable save for THIS fold;
            # starting the next fold would burn the remaining grace
            # window training work that cannot be saved again
            print(f"Preemption: stopping after fold {fold}; re-run the "
                  "same config to resume", flush=True)
            break
    return histories


def test(config_path: str = "Test_Configs.ini",
         config: tp.Optional[TestConfig] = None,
         train_config: tp.Optional[TrainConfig] = None,
         dtype=None) -> tp.Dict[int, tp.Dict[str, tp.Any]]:
    """Fold-loop evaluation driver.  Returns {fold: report dict}."""
    cfg = config if config is not None else load_test_config(config_path)
    tcfg = train_config
    if tcfg is None:
        saved = os.path.join(cfg.save_dir or ".", "Train_Configs.ini")
        if os.path.exists(saved):
            # architecture persisted by the train driver (exact rebuild);
            # artifacts live where the TEST config points, so its save_dir
            # wins over the possibly-stale persisted one
            import dataclasses
            tcfg = dataclasses.replace(load_train_config(saved),
                                       save_dir=cfg.save_dir)
        else:
            tcfg = TrainConfig(
                imlength=cfg.imheight, imwidth=cfg.imwidth,
                num_channels=cfg.num_channels,
                encoder_mode=cfg.encoder_mode, encoder_name=cfg.encoder_name,
                decoder_name=cfg.decoder_name, d_s=cfg.d_s,
                output_nums=max(cfg.class_number, 1),
                save_dir=cfg.save_dir)
    labels = list(cfg.labels) or [f"class_{i}"
                                  for i in range(cfg.class_number + 1)]
    n_classes = len(labels)
    reports: tp.Dict[int, tp.Dict[str, tp.Any]] = {}
    cm_total = np.zeros((n_classes, n_classes), np.int64)
    for fold in range(cfg.start_fold, cfg.end_fold + 1):
        model = _build_model(tcfg, dtype=dtype)
        trainer = Trainer(model)
        sample = np.zeros((1, cfg.imheight if not cfg.patchify
                           else cfg.patch_width,
                           cfg.imwidth if not cfg.patchify
                           else cfg.patch_height,
                           cfg.num_channels), np.float32)
        trainer.init_state(sample)
        fold_dir = _fold_dir(tcfg, fold)
        ckpt = CheckpointManager(fold_dir)
        restored = ckpt.exists("best")
        if restored:
            trainer.state = ckpt.restore(trainer.state, "best")
        else:
            # same guard as _restore_trainer: a mispointed save_dir must
            # not silently produce garbage metrics from fresh weights
            print(f"WARNING: no 'best' checkpoint under {fold_dir}; "
                  f"evaluating freshly initialized weights", flush=True)
        test_root = (os.path.join(cfg.test_dir, f"fold_{fold}")
                     if os.path.isdir(os.path.join(cfg.test_dir,
                                                   f"fold_{fold}"))
                     else cfg.test_dir)
        ds = SegmentationFolderDataset(
            test_root, (cfg.imheight, cfg.imwidth), cfg.image_color_mode,
            cfg.mask_color_mode, cfg.normalizing_factor_img,
            cfg.normalizing_factor_msk)
        results_dir = os.path.join(tcfg.save_dir or ".", "test_results",
                                   f"fold_{fold}")
        os.makedirs(os.path.join(results_dir, "masks"), exist_ok=True)
        cm = init_confusion_matrix(n_classes)
        y_true_all, y_pred_all, y_score_all = [], [], []
        samples = []  # (image, mask, pred_label) for the sample grid
        from .eval.tta import parse_tta
        square = ((cfg.patch_width == cfg.patch_height) if cfg.patchify
                  else (cfg.imheight == cfg.imwidth))
        tta_names = parse_tta(cfg.tta, rank=2, square=square)

        def _prediction_stream():
            """Yield (idx, pred, msk).  Whole-image mode batches
            ``batch_size`` images into ONE padded jitted predict call
            (the reference predicts one image per call, Test.py:161 —
            single-image batches waste the MXU); patchify mode already
            batches all patches of an image."""
            if cfg.patchify:
                for idx in range(len(ds)):
                    img, msk = ds.load_pair(idx)
                    patches, _ = create_patches(
                        img, (cfg.patch_width, cfg.patch_height),
                        cfg.overlap_ratio)
                    pred = unpatchify(
                        np.asarray(trainer.predict(
                            patches, tta=tta_names)["out"]),
                        (cfg.imheight, cfg.imwidth), cfg.overlap_ratio)
                    yield idx, pred, msk
                return
            bs = max(cfg.batch_size, 1)
            for start in range(0, len(ds), bs):
                idxs = range(start, min(start + bs, len(ds)))
                pairs = [ds.load_pair(i) for i in idxs]
                batch = np.stack([p[0] for p in pairs])
                pad = bs - batch.shape[0]
                if pad:  # pad to the compiled batch shape (one compile)
                    batch = np.concatenate(
                        [batch, np.zeros((pad, *batch.shape[1:]),
                                         batch.dtype)])
                preds = np.asarray(trainer.predict(batch,
                                                   tta=tta_names)["out"])
                for k, i in enumerate(idxs):
                    yield i, preds[k], pairs[k][1]

        for idx, pred, msk in _prediction_stream():
            # shared rule (eval.label_from_pred = Test.py:169-175
            # semantics): binary threshold, or sum-of-binarized foreground
            # channels so ordinal mask encodings (tumor-within-kidney)
            # yield labels 0..class_number matching the report size
            pred_lbl = label_from_pred(pred, cfg.class_number,
                                       cfg.threshold)
            if cfg.class_number <= 1:
                true_lbl = (msk[..., 0] > cfg.threshold).astype(np.int32)
            else:
                true_lbl = msk[..., 0].astype(np.int32)
            cm = confusion_matrix_update(cm, jnp.asarray(true_lbl),
                                         jnp.asarray(pred_lbl))
            y_true_all.append(true_lbl.ravel())
            y_pred_all.append(pred_lbl.ravel())
            if cfg.roc_from_scores:
                # per-class probability scores for real swept ROC/PRC:
                # foreground channels 0..class_number-1 score classes
                # 1..class_number (the label_from_pred channel
                # convention); background scores 1 - max foreground
                p = np.asarray(pred, np.float32).reshape(-1, pred.shape[-1])
                fg = p[:, :max(cfg.class_number, 1)]
                y_score_all.append(np.concatenate(
                    [1.0 - fg.max(axis=1, keepdims=True), fg], axis=1))
            if len(samples) < 4:
                samples.append((ds.load_pair(idx)[0], msk, pred_lbl))
            try:
                from PIL import Image
                Image.fromarray((pred_lbl * (255 // max(n_classes - 1, 1))
                                 ).astype(np.uint8)).save(
                    os.path.join(results_dir, "masks", f"pred_{idx}.png"))
            except Exception:
                pass
        cm_np = np.asarray(cm)
        cm_total += cm_np
        report = evaluation_table(cm_np, labels)
        report["checkpoint_restored"] = restored
        reports[fold] = report
        yt = np.concatenate(y_true_all)
        yp = np.concatenate(y_pred_all)
        ys = np.concatenate(y_score_all) if y_score_all else None
        plot_conf_mat(cm_np, labels,
                      os.path.join(results_dir, "confusion_matrix.png"))
        plot_multiclass_roc(yt, yp, n_classes,
                            os.path.join(results_dir, "roc.png"),
                            y_score=ys)
        plot_multiclass_precision_recall_curves(
            yt, yp, n_classes, os.path.join(results_dir, "prc.png"),
            y_score=ys)
        # notebook-parity qualitative reports (2D_Segmentation_TF.ipynb
        # cells 72-78): GT-vs-pred value distributions + sample grid
        plot_prediction_distributions(
            yt, yp, os.path.join(results_dir,
                                 "prediction_distributions.png"))
        if samples:
            plot_sample_grid(
                [s[0] for s in samples], [s[1] for s in samples],
                [s[2] for s in samples],
                os.path.join(results_dir, "sample_grid.png"))
        export_results_sheet(report,
                             os.path.join(results_dir, "results.xlsx"))
        print(f"Fold {fold}: overall accuracy "
              f"{report['overall_accuracy']:.2f}%", flush=True)
    reports["cumulative"] = evaluation_table(cm_total, labels)
    return reports


def summarize_model(model, sample, name: str) -> tp.Dict[str, tp.Any]:
    """Parameter/output summary via abstract shapes only (eval_shape —
    no compile).  Shared by the 2D ``summary`` and 1D ``summary1d``
    verbs."""
    import jax

    def _build():
        v = model.init(jax.random.PRNGKey(0), sample, train=False)
        return v, model.apply(v, sample, train=False)

    variables, outputs = jax.eval_shape(_build)
    n_params = sum(int(np.prod(l.shape))
                   for l in jax.tree.leaves(variables.get("params", {})))
    n_stats = sum(int(np.prod(l.shape))
                  for l in jax.tree.leaves(variables.get("batch_stats", {})))
    info = {
        "model": name,
        "params": n_params,
        "batch_stats": n_stats,
        "outputs": {k: tuple(v.shape) for k, v in outputs.items()},
    }
    print(f"Model: {info['model']}")
    print(f"Trainable params:     {n_params:,}")
    print(f"BatchNorm statistics: {n_stats:,}")
    for k, shape in sorted(info["outputs"].items()):
        print(f"  output {k}: {shape}")
    return info


def _merge_converted(init_tree, converted) -> tp.Any:
    """Overwrite ``init_tree`` leaves with the converted Keras values,
    requiring the key sets to agree exactly (a converted tree that is
    missing leaves — or carries extras — means the config does not
    describe the checkpoint's architecture)."""
    from flax import traverse_util
    flat_init = traverse_util.flatten_dict(init_tree)
    flat_new = traverse_util.flatten_dict(converted)
    missing = sorted(set(flat_init) - set(flat_new))
    extra = sorted(set(flat_new) - set(flat_init))
    if missing or extra:
        raise ValueError(
            f"import produced a mismatched parameter tree; missing "
            f"{['/'.join(k) for k in missing][:5]}, extra "
            f"{['/'.join(k) for k in extra][:5]}")
    for key, val in flat_new.items():
        if tuple(flat_init[key].shape) != tuple(val.shape):
            raise ValueError(
                f"import shape mismatch at {'/'.join(key)}: model "
                f"{tuple(flat_init[key].shape)} vs checkpoint "
                f"{tuple(val.shape)}")
        flat_init[key] = jnp.asarray(val, flat_init[key].dtype)
    return traverse_util.unflatten_dict(flat_init)


def import_keras(ckpt_path: str, config_path: str = "Train_Configs.ini",
                 config: tp.Optional[TrainConfig] = None, fold: int = 1,
                 verify: bool = True, dtype=None) -> str:
    """Import a trained reference checkpoint as this framework's artifact.

    The reference's artifact of record is a full Keras model file — 2D:
    ``ModelCheckpoint(...model_name_imwidth_Fold_i.keras)``
    (Train.py:375-379), reloaded by Test.py:110-116; 1D notebook cell 35
    writes a legacy ``.h5``.  This verb loads it, converts the weights by
    reconstructed creation order (utils/keras_compat.py:
    ``convert_loaded_keras``), and writes the orbax 'best' checkpoint into
    the config's ``Fold_{fold}`` dir plus the persisted ``Train_Configs.ini``
    — after which ``tpuseg test/serve/export/predict`` consume the trained
    model natively.

    ``verify``: run the Keras model and the imported Flax model on one
    random batch and report the max output deviation.  Aborts > 2e-2:
    mis-wired weights decorrelate outputs (deviations >0.1), while
    platform numerics (TF oneDNN reductions ~1e-3, XLA:CPU conv
    truncation ~2.5e-3 relative) stay well under it; the import tests
    pin deterministic numerics and hold the parity bar (<1e-4).

    Limitation: Self-ONN checkpoints cannot deserialize without the
    reference's custom ``Oper2D`` classes on the Python path (Keras
    refuses unknown layer classes); retrain those or export from a live
    reference process.
    """
    cfg = config if config is not None else load_train_config(config_path)
    import keras
    kmodel = keras.saving.load_model(ckpt_path, compile=False)
    model = _build_model(cfg, dtype=dtype)
    sample = np.zeros((1, cfg.imlength, cfg.imwidth, cfg.num_channels),
                      np.float32)
    backbone_names = None
    if cfg.train_mode == "pretrained_encoder":
        from .models.backbones.pretrained import backbone_creation_names
        backbone_names = backbone_creation_names(
            cfg.encoder_name, tuple(sample.shape[1:]))
    from .utils.keras_compat import convert_loaded_keras
    variables = convert_loaded_keras(kmodel, model, sample,
                                     backbone_names=backbone_names)
    trainer = Trainer(model)
    trainer.init_state(sample)
    state = trainer.state
    state = state.replace(
        params=_merge_converted(state.params, variables["params"]),
        batch_stats=_merge_converted(state.batch_stats,
                                     variables.get("batch_stats", {}))
        if state.batch_stats else state.batch_stats)
    if verify:
        import jax
        x = np.random.default_rng(0).normal(
            size=sample.shape).astype(np.float32)
        ref = kmodel(x, training=False)
        if isinstance(ref, (list, tuple)):
            ref = ref[0]
        with jax.default_matmul_precision("highest"):
            got = np.asarray(jax.jit(
                lambda v, x: model.apply(v, x, train=False))(
                    {"params": state.params,
                     "batch_stats": state.batch_stats}, x)["out"])
        diff = float(np.max(np.abs(got - np.asarray(ref))))
        if diff > 2e-2:
            raise ValueError(
                f"import verification FAILED: max output deviation "
                f"{diff:.2e} vs the Keras checkpoint (expected <2e-2); "
                f"the config likely does not match the checkpoint")
        print(f"verified: max output deviation {diff:.2e} vs Keras",
              flush=True)
    trainer.state = state
    fold_dir = _fold_dir(cfg, fold)
    ckpt = CheckpointManager(fold_dir)
    ckpt.save(trainer.state, "best")
    if cfg.save_dir:
        os.makedirs(cfg.save_dir, exist_ok=True)
        save_train_config(cfg, os.path.join(cfg.save_dir,
                                            "Train_Configs.ini"))
    print(f"imported {ckpt_path} -> {fold_dir}/best", flush=True)
    return fold_dir


def summary(config_path: str = "Train_Configs.ini",
            config: tp.Optional[TrainConfig] = None) -> tp.Dict[str, tp.Any]:
    """Model summary from a train config (the reference prints Keras
    ``model.summary()`` + param counts, Train.py:354-359): parameter
    count, per-collection breakdown, and output heads/shapes."""
    cfg = config if config is not None else load_train_config(config_path)
    model = _build_model(cfg)
    sample = jnp.zeros((1, cfg.imlength, cfg.imwidth, cfg.num_channels),
                       jnp.float32)
    return summarize_model(model, sample,
                           f"{cfg.encoder_name}_{cfg.decoder_name}")


def export(config_path: str = "Train_Configs.ini",
           config: tp.Optional[TrainConfig] = None,
           out_path: str = "model.stablehlo", fold: int = 1,
           batch: int = 1) -> str:
    """Export the trained fold checkpoint as a portable AOT StableHLO
    inference artifact (see ``serve.export_model``).  No reference
    equivalent — the reference redeploys by reloading the whole Keras
    session (Test.py:110-116)."""
    from .serve import export_model

    cfg = config if config is not None else load_train_config(config_path)
    shape = (batch, cfg.imlength, cfg.imwidth, cfg.num_channels)
    model, trainer = _restore_trainer(cfg, _fold_dir(cfg, fold),
                                      "exporting")
    path = export_model(model, trainer.state, shape, out_path)
    print(f"exported {cfg.encoder_name}_{cfg.decoder_name} "
          f"(input {shape}) -> {path}", flush=True)
    return path


def predict(config_path: str = "Train_Configs.ini",
            input_path: str = ".", out_dir: str = "predicted_masks",
            fold: int = 1, threshold: float = 0.5,
            batch: int = 8, tta: str = "") -> tp.List[str]:
    """Pure inference on UNLABELED images: restore the fold checkpoint,
    segment every image under ``input_path`` (file or folder), write PNG
    label masks named after the inputs.  Honors the config's patchify
    mode (patch grid -> predict -> overlap-averaged unpatchify, exactly
    like the test driver).  No reference equivalent — the reference's
    only inference path (Test.py) requires ground-truth masks to run."""
    import concurrent.futures as cf

    from .data.generators import _list_images, load_image
    from .serve import Predictor

    if batch < 1:
        raise ValueError(f"batch must be >= 1, got {batch}")
    cfg = load_train_config(config_path) if isinstance(config_path, str) \
        else config_path
    size = (cfg.imlength, cfg.imwidth)
    paths = ([input_path] if os.path.isfile(input_path)
             else _list_images(input_path))
    if not paths:
        raise FileNotFoundError(f"no images under {input_path!r}")
    model, trainer = _restore_trainer(cfg, _fold_dir(cfg, fold),
                                      "predicting with")
    os.makedirs(out_dir, exist_ok=True)
    n_fg = max(cfg.class_number, 1)
    written = []
    from .eval.tta import parse_tta
    square = ((cfg.patch_width == cfg.patch_height) if cfg.patchify
              else (size[0] == size[1]))
    tta_names = parse_tta(tta, rank=2, square=square)

    def decode(p):
        return load_image(p, size, cfg.image_color_mode,
                          "lanczos") / cfg.normalizing_factor_img

    if cfg.patchify:
        # per-image patch grid, like the test driver (drivers.test)
        for p in paths:
            patches, _ = create_patches(
                decode(p), (cfg.patch_width, cfg.patch_height),
                cfg.overlap_ratio)
            pred = unpatchify(
                np.asarray(trainer.predict(patches,
                                           tta=tta_names)["out"]),
                size, cfg.overlap_ratio)
            written.append(_write_mask(pred, p, out_dir, cfg.class_number,
                                       threshold, n_fg))
    else:
        predictor = Predictor(model, trainer.state,
                              (*size, cfg.num_channels),
                              max_batch=min(batch, len(paths)),
                              tta=tta_names)
        chunks = [paths[s:s + predictor.max_batch]
                  for s in range(0, len(paths), predictor.max_batch)]

        def make(c):
            return np.stack([decode(p) for p in c])

        with cf.ThreadPoolExecutor(max_workers=2) as pool:
            # double-buffer: decode chunk i+1 while the device runs i
            # (bounded one chunk ahead, so huge folders don't pile up)
            nxt = pool.submit(make, chunks[0])
            for i, chunk in enumerate(chunks):
                x = nxt.result()
                if i + 1 < len(chunks):
                    nxt = pool.submit(make, chunks[i + 1])
                preds = predictor(x)
                for p, pred in zip(chunk, preds):
                    written.append(_write_mask(pred, p, out_dir,
                                               cfg.class_number,
                                               threshold, n_fg))
    print(f"wrote {len(written)} masks to {out_dir}/", flush=True)
    return written


def _write_mask(pred, src_path, out_dir, class_number, threshold, n_fg):
    from .eval import label_from_pred
    from .serve import _mask_to_png
    label = label_from_pred(pred, class_number, threshold)
    name = os.path.splitext(os.path.basename(src_path))[0] + "_mask.png"
    dst = os.path.join(out_dir, name)
    with open(dst, "wb") as f:
        f.write(_mask_to_png(label, n_fg + 1))
    return dst


def doctor() -> dict:
    """Environment diagnostics (`tpuseg doctor`): versions, devices, the
    native fast paths' status, optional-dependency availability, and a
    tiny compile smoke — the first thing to run on a new host."""
    import importlib
    import time

    import jax

    report: tp.Dict[str, tp.Any] = {}
    report["jax"] = jax.__version__
    try:
        devs = jax.devices()
        report["backend"] = devs[0].platform
        report["devices"] = len(devs)
        report["device_kind"] = devs[0].device_kind
    except Exception as e:  # noqa: BLE001 — diagnose, don't crash
        report["backend"] = f"UNAVAILABLE ({e})"
    for mod in ("flax", "optax", "orbax.checkpoint", "numpy"):
        try:
            m = importlib.import_module(mod)
            report[mod] = getattr(m, "__version__", "present")
        except ImportError:
            report[mod] = "MISSING (required)"
    for mod, why in (("tensorflow", "Keras parity fixtures + pretrained "
                      "ImageNet weight conversion"),
                     ("PIL", "image IO fallback"),
                     ("h5py", "h5 history/CheXNet weights"),
                     ("pandas", "xlsx reports"),
                     ("matplotlib", "plots"),
                     ("cv2", "augmentation warps (host path)"),
                     ("sklearn", "ROC/PRC curves")):
        try:
            importlib.import_module(mod)
            report[mod] = "ok"
        except Exception:  # noqa: BLE001
            report[mod] = f"absent ({why} unavailable)"
    from .native import get_lib as patcher_lib
    from .native import imgio
    report["native_patcher"] = "built" if patcher_lib() else \
        "unavailable (numpy fallback active)"
    if imgio.get_lib():
        report["native_imgio"] = "built" + (
            "" if imgio._jpeg_ok else
            " (JPEG self-check failed -> PIL decodes JPEGs)")
    else:
        report["native_imgio"] = "unavailable (PIL fallback active)"
    report["compile_cache"] = os.environ.get("TPUSEG_COMPILE_CACHE",
                                             "(unset)")
    report["multihost"] = os.environ.get("TPUSEG_MULTIHOST", "(unset)")
    try:
        import jax.numpy as _jnp
        t0 = time.time()
        v = jax.jit(lambda a: (a * 2 + 1).sum())(_jnp.ones((128, 128)))
        report["smoke_compile"] = (f"ok ({float(v):.0f} in "
                                   f"{time.time() - t0:.2f}s)")
    except Exception as e:  # noqa: BLE001
        report["smoke_compile"] = f"FAILED ({e})"
    width = max(len(k) for k in report)
    for k, v in report.items():
        print(f"{k:<{width}}  {v}", flush=True)
    return report


def main(argv: tp.Optional[tp.Sequence[str]] = None) -> None:
    import argparse
    parser = argparse.ArgumentParser(prog="tpuseg")
    sub = parser.add_subparsers(dest="cmd", required=True)
    p_train = sub.add_parser("train")
    p_train.add_argument("config", nargs="?", default="Train_Configs.ini")
    p_test = sub.add_parser("test")
    p_test.add_argument("config", nargs="?", default="Test_Configs.ini")
    p_t1d = sub.add_parser(
        "train1d", help="train on a .pt signal set (the reference's "
        "notebook-only 1D pipeline, 1D_Segmentation.ipynb cells 29-49, "
        "as an INI-driven verb)")
    p_t1d.add_argument("config", nargs="?", default="Signal_Configs.ini")
    p_e1d = sub.add_parser(
        "test1d", help="NILM evaluation of a trained 1D model on a .pt "
        "signal set (notebook cells 51-63)")
    p_e1d.add_argument("config", nargs="?", default="Signal_Configs.ini")
    p_s1d = sub.add_parser("summary1d", help="param/output summary for a "
                           "[SIGNAL1D] config (abstract shapes, no compile)")
    p_s1d.add_argument("config", nargs="?", default="Signal_Configs.ini")
    p_x1d = sub.add_parser(
        "export1d", help="AOT-export the trained 1D checkpoint as a "
        "portable StableHLO artifact (reloads with jax alone)")
    p_x1d.add_argument("config", nargs="?", default="Signal_Configs.ini")
    p_x1d.add_argument("--out", default="model_1d.stablehlo")
    p_x1d.add_argument("--batch", type=int, default=1)
    p_v1d = sub.add_parser(
        "serve1d", help="HTTP serving for a trained 1D model (JSON or "
        "raw-float32 signals in, JSON predictions out)")
    p_v1d.add_argument("config", nargs="?", default="Signal_Configs.ini")
    p_v1d.add_argument("--host", default="127.0.0.1")
    p_v1d.add_argument("--port", type=int, default=8000)
    p_v1d.add_argument("--max-batch", type=int, default=1)
    p_p1d = sub.add_parser(
        "predict1d", help="pure inference on unlabeled .pt signals "
        "(writes an .npz of predictions)")
    p_p1d.add_argument("config", nargs="?", default="Signal_Configs.ini")
    p_p1d.add_argument("--input", default=None,
                       help="input .pt (defaults to the config test_set)")
    p_p1d.add_argument("--out", default="predictions_1d.npz")
    p_sum = sub.add_parser("summary")
    p_sum.add_argument("config", nargs="?", default="Train_Configs.ini")
    p_srv = sub.add_parser("serve")
    p_srv.add_argument("config", nargs="?", default="Train_Configs.ini")
    p_srv.add_argument("--host", default="127.0.0.1")
    p_srv.add_argument("--port", type=int, default=8000)
    p_srv.add_argument("--fold", type=int, default=1)
    p_srv.add_argument("--max-batch", type=int, default=1)
    p_srv.add_argument("--threshold", type=float, default=0.5)
    p_srv.add_argument("--int8", action="store_true",
                       help="serve with int8-quantized convolutions "
                       "(quant.py; wins only for MXU-bound wide models "
                       "- measured a LOSS at stock-zoo widths, see "
                       "docs/SCALING.md)")
    p_srv.add_argument("--calib-dir", default=None,
                       help="calibration images for --int8 (defaults to "
                       "the config's train_dir)")
    p_exp = sub.add_parser("export")
    p_exp.add_argument("config", nargs="?", default="Train_Configs.ini")
    p_exp.add_argument("--out", default="model.stablehlo")
    p_exp.add_argument("--fold", type=int, default=1)
    p_exp.add_argument("--batch", type=int, default=1)
    p_prd = sub.add_parser(
        "predict", help="segment unlabeled images (file or folder) with a "
        "trained fold checkpoint; writes PNG masks")
    p_prd.add_argument("config", nargs="?", default="Train_Configs.ini")
    p_prd.add_argument("--input", required=True)
    p_prd.add_argument("--out", default="predicted_masks")
    p_prd.add_argument("--fold", type=int, default=1)
    p_prd.add_argument("--threshold", type=float, default=0.5)
    p_prd.add_argument("--batch", type=int, default=8)
    p_prd.add_argument("--tta", default="",
                       help="test-time augmentation: comma list of "
                       "invertible views to average (hflip,vflip,hvflip"
                       "[,rot90,rot180,rot270 if square]; 'all'); every "
                       "view runs in one compiled program")
    p_aug = sub.add_parser(
        "augment", help="offline augmentation: write N augmented copies "
        "of every image/mask pair back into the same folders "
        "(reference augment stage, helper_functions.py:480-501); pass "
        "either --images/--masks or --data with fold_i subdirs")
    p_aug.add_argument("--images")
    p_aug.add_argument("--masks")
    p_aug.add_argument("--data", help="root containing fold_i/{images,"
                       "masks} (e.g. Data/Train)")
    p_aug.add_argument("--num", type=int, default=3,
                       help="augmented copies per image")
    p_aug.add_argument("--seed", type=int, default=1)
    p_fld = sub.add_parser(
        "folds", help="split an image/mask folder pair into "
        "Data/{Train,Test,Val}/fold_i (reference create_folds, "
        "helper_functions.py:443-477)")
    p_fld.add_argument("--images", required=True)
    p_fld.add_argument("--masks", required=True)
    p_fld.add_argument("--out", default="Data")
    p_fld.add_argument("--folds", type=int, default=5)
    p_fld.add_argument("--test-portion", type=float, default=0.2)
    p_fld.add_argument("--val-portion", type=float, default=0.1)
    p_fld.add_argument("--seed", type=int, default=1)
    p_imp = sub.add_parser(
        "import-keras", help="import a trained reference checkpoint "
        "(full-model .keras from Train.py:375-379, or legacy .h5) as the "
        "orbax 'best' checkpoint for the config's fold — migrates "
        "trained reference models into tpuseg test/serve/export/predict")
    p_imp.add_argument("checkpoint", help="path to the .keras/.h5 file")
    p_imp.add_argument("config", nargs="?", default="Train_Configs.ini",
                       help="[TRAIN] INI describing the checkpoint's "
                       "architecture (the reference's own Train config)")
    p_imp.add_argument("--fold", type=int, default=1)
    p_imp.add_argument("--no-verify", action="store_true",
                       help="skip the one-batch Keras-vs-imported output "
                       "comparison")
    p_i1d = sub.add_parser(
        "import-keras1d", help="import a trained reference 1D checkpoint "
        "(the notebook's trained_models/*.h5, cell 35) as the orbax "
        "'best' checkpoint under the [SIGNAL1D] config's save_dir")
    p_i1d.add_argument("checkpoint")
    p_i1d.add_argument("config", nargs="?", default="Signal_Configs.ini")
    p_i1d.add_argument("--no-verify", action="store_true")
    sub.add_parser("doctor", help="environment diagnostics: versions, "
                   "devices, native fast-path status, optional deps, "
                   "compile smoke")
    p_tun = sub.add_parser(
        "tune", help="on-device batch-size/remat autotuner: sweep the "
        "shipped train step at aligned batches on synthetic data at the "
        "config's shapes (plain first, remat='dots' only to unlock "
        "batches whose plain step fails — the measured rule, "
        "docs/SCALING.md); --write puts the winner back into the INI. "
        "Works on [TRAIN] and [SIGNAL1D] configs")
    p_tun.add_argument("config", nargs="?", default="Train_Configs.ini")
    p_tun.add_argument("--batches", default="",
                       help="comma list (default: 32,64,96,128 for 2D / "
                       "128,256,512,1024 for 1D)")
    p_tun.add_argument("--modes", default="",
                       help="force modes (comma list of plain,dots,full) "
                       "for every batch instead of the heuristic")
    p_tun.add_argument("--steps", type=int, default=20,
                       help="timed steady-state steps per candidate")
    p_tun.add_argument("--warmup", type=int, default=3)
    p_tun.add_argument("--write", action="store_true",
                       help="write the winning batch_size/remat back "
                       "into the config INI")
    args = parser.parse_args(argv)
    # production launch plumbing (both opt-in via env, utils/multihost.py):
    # TPUSEG_MULTIHOST=1 -> jax.distributed.initialize() for pod runs;
    # TPUSEG_COMPILE_CACHE=dir -> persistent XLA compile cache
    from .utils.multihost import (maybe_enable_compile_cache,
                                  maybe_initialize_distributed)
    maybe_initialize_distributed()
    maybe_enable_compile_cache()
    if args.cmd == "train":
        train(args.config)
    elif args.cmd == "train1d":
        from .drivers_1d import train_1d
        train_1d(args.config)
    elif args.cmd == "test1d":
        from .drivers_1d import test_1d
        test_1d(args.config)
    elif args.cmd == "summary1d":
        from .drivers_1d import summary_1d
        summary_1d(args.config)
    elif args.cmd == "export1d":
        from .drivers_1d import export_1d
        export_1d(args.config, out_path=args.out, batch=args.batch)
    elif args.cmd == "serve1d":
        from .serve import serve_1d
        serve_1d(args.config, host=args.host, port=args.port,
                 max_batch=args.max_batch)
    elif args.cmd == "predict1d":
        from .drivers_1d import predict_1d
        predict_1d(args.config, input_path=args.input, out_path=args.out)
    elif args.cmd == "summary":
        summary(args.config)
    elif args.cmd == "serve":
        from .serve import serve as _serve
        _serve(args.config, host=args.host, port=args.port, fold=args.fold,
               max_batch=args.max_batch, threshold=args.threshold,
               int8=args.int8, calib_dir=args.calib_dir)
    elif args.cmd == "export":
        export(args.config, out_path=args.out, fold=args.fold,
               batch=args.batch)
    elif args.cmd == "predict":
        predict(args.config, input_path=args.input, out_dir=args.out,
                fold=args.fold, threshold=args.threshold, batch=args.batch,
                tta=args.tta)
    elif args.cmd == "augment":
        import glob as _glob
        from .data.generators import augment_dataset
        targets = []
        if args.data:
            for fold_dir in sorted(_glob.glob(
                    os.path.join(args.data, "fold_*"))):
                for sub_i, sub_m in (("images", "masks"), ("img", "msk")):
                    i_dir = os.path.join(fold_dir, sub_i)
                    m_dir = os.path.join(fold_dir, sub_m)
                    if os.path.isdir(i_dir) and os.path.isdir(m_dir):
                        targets.append((i_dir, m_dir))
                        break
        elif args.images and args.masks:
            targets.append((args.images, args.masks))
        if not targets:
            raise SystemExit("augment: pass --images AND --masks, or "
                             "--data with fold_i/{images,masks} subdirs")
        total = 0
        for i_dir, m_dir in targets:
            total += len(augment_dataset(i_dir, m_dir, args.num,
                                         seed=args.seed))
        print(f"wrote {total} augmented image/mask pairs", flush=True)
    elif args.cmd == "folds":
        from .data.generators import create_folds
        create_folds(args.images, args.masks, args.out,
                     num_folds=args.folds, test_portion=args.test_portion,
                     val_portion=args.val_portion, seed=args.seed)
        print(f"wrote {args.folds} folds under {args.out}/", flush=True)
    elif args.cmd == "import-keras":
        import_keras(args.checkpoint, args.config, fold=args.fold,
                     verify=not args.no_verify)
    elif args.cmd == "import-keras1d":
        from .drivers_1d import import_keras_1d
        import_keras_1d(args.checkpoint, args.config,
                        verify=not args.no_verify)
    elif args.cmd == "doctor":
        doctor()
    elif args.cmd == "tune":
        from .tune import tune_main
        tune_main(args)
    else:
        test(args.config)


if __name__ == "__main__":
    main()
