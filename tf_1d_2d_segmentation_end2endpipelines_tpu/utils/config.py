"""Typed config system, loadable from the reference's INI schema.

The reference drives training/testing with flat ``configparser`` INI files
(Train_Configs.ini 56 keys / Test_Configs.ini 27 keys; parsing at
Train.py:21-82, Test.py:16-53).  Here the same keys populate typed
dataclasses -- an existing reference INI file loads unchanged.
"""
from __future__ import annotations

import configparser
import dataclasses as dc
import typing as tp


def _to_bool(v: str) -> bool:
    return str(v).strip().lower() in ("1", "true", "yes", "on")


@dc.dataclass
class TrainConfig:
    # data
    train_dir: str = "Data/Train"
    val_dir: str = "Data/Val"
    data_loading_mode: str = "Custom_DataLoader"
    independent_val_set: bool = True
    validation_portion: float = 0.0
    imlength: int = 512
    imwidth: int = 512
    image_color_mode: str = "rgb"
    mask_color_mode: str = "grayscale"
    num_channels: int = 3
    normalizing_factor_img: float = 255.0
    normalizing_factor_msk: float = 255.0
    # model
    model_genre: str = "UNet"
    encoder_mode: str = "from_scratch"   # reference: train_mode
    encoder_name: str = "ResNet50"
    encoder_trainable: bool = False
    #: pretrained-encoder initial weights: 'imagenet' (keras.applications
    #: download or local KERAS_HOME cache — the reference hardcodes this,
    #: unet_variants.py:1057), a local .h5 path, or 'none' (random init).
    #: Only consulted when encoder_mode = pretrained_encoder and the fold
    #: is not resuming from a checkpoint.
    encoder_weights: str = "imagenet"
    decoder_name: str = "UNet"
    model_width: int = 16
    model_depth: int = 5
    output_nums: int = 1
    a_e: int = 0
    a_g: int = 0
    lstm: int = 0
    dense_loop: int = 2
    feature_number: int = 1024
    is_transconv: bool = True
    alpha: float = 1.0
    q_onn: int = 3
    final_activation: str = "sigmoid"
    class_number: int = 1
    # training
    batch_size: int = 4
    learning_rate: float = 2e-4
    start_fold: int = 1
    end_fold: int = 1
    monitor_param: str = "val_loss"
    patience_amount: int = 20
    patience_amount_rlronp: int = 10
    patience_mode: str = "min"
    rlronp_factor: float = 0.1
    num_epochs: int = 200
    loss_function: str = "BinaryCrossentropy"
    optimizer_function: str = "Adam"
    metric_list: tp.Tuple[str, ...] = ("MeanSquaredError",)
    save_history: bool = True
    load_weights: bool = True
    save_dir: str = "Results"
    task_name: str = "None"
    seed: int = 1
    # computation dtype for the model ('float32' | 'bfloat16'): bf16 is
    # the TPU performance mode (activations bf16, params/BN stats f32 —
    # see docs/SCALING.md); float32 matches the reference's numerics
    compute_dtype: str = "float32"
    # remat ('', 'dots', 'conv_outs', 'full', 'blocks'): rematerialize
    # the forward — exact same numbers, less activation memory, larger
    # feasible batches (new capability).  'dots'/'conv_outs'/'full' wrap
    # the whole forward in jax.checkpoint with that policy
    # (train.state.REMAT_POLICIES); 'blocks' instead wraps each hot block
    # module in flax remat with the conv_outs policy (2D only —
    # ops.blocks.remat_block; see its docstring for the measured
    # compile-helper limits on the axon tunnel)
    remat: str = ""
    # gradient accumulation: each loader batch of `batch_size` is split
    # into `accumulation_steps` microbatches of batch_size/steps, with ONE
    # optimizer update per loader batch — batch_size stays the TOTAL
    # effective batch.  Raise batch_size together with accumulation_steps
    # to grow the effective batch past the device/compiler memory ceiling
    # (only batch_size/steps examples are live at once); composes with
    # remat.  See train.state.make_train_step.
    accumulation_steps: int = 1
    # tensor parallelism: size of the mesh 'model' axis.  Conv kernels
    # shard their output-channel axis over 'model'
    # (parallel.sharding_rules); devices must be divisible.  1 = pure
    # data parallelism over all devices (the default)
    model_parallel: int = 1
    # spatial parallelism: size of the mesh 'spatial' axis.  The image's
    # H axis shards over it (params replicated); GSPMD partitions every
    # conv/pool/norm along H, inserting the halo exchanges itself — same
    # numbers as pure dp (tests/test_spatial_train.py), for images too
    # tall for one chip's HBM.  Composes with model_parallel
    spatial_parallel: int = 1
    # pipeline parallelism (GPipe, parallel.pipeline) is API-ONLY: it
    # fits homogeneous block stacks, and no model this INI can request
    # has one long enough to beat its (S-1)/(M+S-1) bubble — the zoo's
    # repeated chains are 1-3 blocks (dense_loop bottleneck, ConvMixer's
    # 2-block nodes) and the U-decoders' stage interfaces are
    # heterogeneous (skips cross every would-be stage boundary).  Any
    # value > 1 is a loud error at mesh build naming the supported
    # shapes; scale with model_parallel / spatial_parallel / zero1
    # instead.  See docs/SCALING.md and examples/pipeline_parallel.py.
    pipeline_parallel: int = 1
    # exact resume: every epoch ends with a full-state 'last' checkpoint
    # (weights + optimizer moments + epoch + history + callback
    # counters) and a SIGTERM (pod preemption / scheduler kill) saves
    # one at the next step boundary; re-running the same INI continues
    # from the recorded epoch with numerics identical to an
    # uninterrupted run.  Distinct from load_weights (which restores
    # 'best' weights only and restarts the schedule from epoch 0)
    exact_resume: bool = False
    # ZeRO-1 optimizer-state sharding: shard optax moments over the
    # 'data' axis (per-device optimizer memory / data-axis size); exact
    # same numbers as replicated dp — XLA derives the reduce-scatter
    # pattern from the sharding annotations (parallel.sharding_rules.
    # zero1_state_shardings).  Composes with model_parallel.
    zero1: bool = False
    # gradient clipping (0 = off), Keras optimizer-kwarg semantics the
    # reference's registry doesn't expose: clipnorm = per-variable L2,
    # clipvalue = elementwise, global_clipnorm = whole-gradient L2
    clipnorm: float = 0.0
    clipvalue: float = 0.0
    global_clipnorm: float = 0.0
    # TensorBoard scalar logging ('' = off): per-epoch loss/metrics/LR
    # event files under {tensorboard_dir}/Fold_i (new observability
    # surface; the reference has only Keras progress bars + h5 history)
    tensorboard_dir: str = ""
    # on-the-fly training augmentation (flips/rot90/shift-scale-rotate/
    # brightness via data.generators.augment_pair — the reference instead
    # pre-writes augmented copies offline, helper_functions.py:480-501;
    # that offline mode is the `tpuseg augment` CLI verb)
    augment: bool = False
    # device-compiled augmentation: the same op set as `augment`, but as
    # ONE jitted program over the whole batch on the accelerator
    # (data/device_augment.py), keyed by (seed, epoch, step) so runs
    # reproduce and exact resume replays the stream.  The warp runs as
    # shears + per-axis matmuls (TPU-fast) with batch-shared warp params
    # per step: ~40 ms per 128x256^2 batch measured on v5e (~15% of the
    # b128 train step); flips/rot90/jitter stay per-sample.  Does not
    # compose with `patchify` (the host path augments whole images
    # before patching; use `augment` there), and the augment program
    # runs on the default device before the batch is distributed —
    # intended for single-host meshes
    augment_device: bool = False
    # cache decoded images in RAM after epoch 1 (bulk-loader analog of
    # the reference's get_datasets, helper_functions.py:231-260, without
    # its up-front decode stall); augmentation/patchify still run
    # per-epoch on the cached decode
    cache_data: bool = False
    # exponential moving average of the weights (0 = off).  > 0 tracks an
    # EMA shadow inside the compiled train step; validation, the 'best'
    # checkpoint, test/predict/export/serve all use the shadow weights.
    # New capability over the reference (Keras has no EMA here).  Typical
    # values 0.99-0.999; see train.state.make_train_step.
    ema_decay: float = 0.0
    # patching / deep supervision
    patchify: bool = False
    patch_width: int = 64
    patch_height: int = 64
    overlap_ratio: float = 0.0
    d_s: int = 0
    ds_type: str = "UNet"

    @property
    def train_mode(self) -> str:
        return ("pretrained_encoder" if self.encoder_mode
                == "pretrained_encoder" else "from_scratch")


@dc.dataclass
class TestConfig:
    test_dir: str = "Data/Test"
    imheight: int = 512
    imwidth: int = 512
    image_color_mode: str = "rgb"
    mask_color_mode: str = "grayscale"
    num_channels: int = 3
    class_number: int = 1
    labels: tp.Tuple[str, ...] = ()
    encoder_mode: str = "from_scratch"
    encoder_name: str = "ResNet50"
    decoder_name: str = "UNetPP"
    batch_size: int = 4
    normalizing_factor_img: float = 255.0
    normalizing_factor_msk: float = 255.0
    start_fold: int = 1
    end_fold: int = 1
    num_iter: int = 1
    threshold: float = 0.5
    seed: int = 1
    save_dir: str = "Results"
    patchify: bool = False
    patch_width: int = 64
    patch_height: int = 64
    overlap_ratio: float = 0.0
    d_s: int = 0
    # ROC/PRC from probability scores instead of hard labels.  Default
    # False reproduces the reference's curves, which are degenerate
    # two-point sweeps because Test.py:226-228 feeds binarized int8
    # predictions into sklearn's roc_curve; True uses the probability
    # maps the predict step already computes (real swept curves)
    roc_from_scores: bool = False
    # test-time augmentation: comma list of invertible view transforms
    # averaged per prediction ('hflip,vflip,hvflip', plus rot90/rot180/
    # rot270 for square inputs; 'all' = every applicable; '' = off).
    # All views run in one compiled program (eval.tta).  New capability
    # over the reference (Test.py predicts each image exactly once).
    tta: str = ""


@dc.dataclass
class Signal1DConfig:
    """Config for the 1D signal pipeline (section [SIGNAL1D]).

    The reference's 1D pipeline has no entry script or INI — the notebook
    (1D_Segmentation.ipynb cells 29-64) hard-codes everything inline.
    This gives it the same typed-INI L6 surface the 2D tree has; field
    names mirror TrainConfig where the concepts coincide."""
    # data: .pt signal containers (notebook cells 29-35)
    train_set: str = "Data/Train_Set.pt"
    val_set: str = ""
    test_set: str = "Data/Test_Set.pt"
    x_key: str = "samples"
    y_key: str = "labels"
    signal_length: int = 1024
    num_channel: int = 1
    # model: any name model_selector_1d accepts (UNet1D archs + specials)
    model_name: str = "UNet"
    model_depth: int = 3
    model_width: int = 16
    kernel_size: int = 3
    problem_type: str = "Regression"
    output_nums: int = 1
    d_s: int = 0
    a_e: int = 0
    a_g: int = 0
    lstm: int = 0
    alpha: float = 1.0
    q_onn: int = 3
    t: int = 2          # recurrent iterations (RUNet/R2UNet families)
    dense_loop: int = 2
    feature_number: int = 1024
    is_transconv: bool = True
    cardinality: int = 5
    pooling_type: str = "avg"
    se_ratio: int = 16
    block_size: int = 7
    keep_prob: float = 0.9
    ds_type: str = "UNet"
    # training
    batch_size: int = 8
    learning_rate: float = 3e-4
    num_epochs: int = 50
    loss_function: str = "MeanAbsoluteError"
    optimizer_function: str = "Adam"
    metric_list: tp.Tuple[str, ...] = ("MeanSquaredError",)
    monitor_param: str = "val_loss"
    patience_amount: int = 20
    patience_amount_rlronp: int = 10
    patience_mode: str = "min"
    rlronp_factor: float = 0.5
    save_history: bool = True
    load_weights: bool = True
    save_dir: str = "Results_1D"
    seed: int = 1
    compute_dtype: str = "float32"
    remat: str = ""          # '', 'dots', 'conv_outs', 'full' (see
    # TrainConfig.remat; 'blocks' is 2D-only and rejected here)
    accumulation_steps: int = 1  # microbatch split of batch_size
    # (batch_size stays the TOTAL effective batch; see TrainConfig)
    model_parallel: int = 1  # mesh 'model' axis size (see TrainConfig)
    spatial_parallel: int = 1  # mesh 'spatial' axis: shard the signal's
    # L axis over devices — sequence parallelism for signals too long for
    # one chip (GSPMD partitions the convs; same numbers as pure dp)
    zero1: bool = False      # ZeRO-1 opt-state sharding (see TrainConfig)
    pipeline_parallel: int = 1  # API-only; >1 errors loudly (see
    # TrainConfig.pipeline_parallel and docs/SCALING.md)
    exact_resume: bool = False   # preemption-safe exact resume
    # (per-epoch full-state 'last' checkpoint + SIGTERM save; see
    # TrainConfig.exact_resume)
    clipnorm: float = 0.0        # gradient clipping (see TrainConfig)
    clipvalue: float = 0.0
    global_clipnorm: float = 0.0
    tensorboard_dir: str = ""    # TensorBoard scalars (see TrainConfig)
    ema_decay: float = 0.0   # EMA weight shadow (see TrainConfig)
    tta: str = ""            # test-time augmentation ('flip'|'all'|'');
    #                          applied by test1d/predict1d (see TestConfig)


_T = tp.TypeVar("_T")


def _coerce(field: dc.Field, raw: str):
    t = field.type
    if t in (bool, "bool"):
        return _to_bool(raw)
    if t in (int, "int"):
        return int(float(raw))
    if t in (float, "float"):
        return float(raw)
    if "Tuple" in str(t):
        parts = [p.strip() for p in str(raw).split(",") if p.strip()]
        return tuple(parts)
    return str(raw)


def _load_section(cls: tp.Type[_T], section: tp.Mapping[str, str]) -> _T:
    fields = {f.name: f for f in dc.fields(cls)}
    kwargs = {}
    for key, raw in section.items():
        name = key.lower()
        if name in fields:
            kwargs[name] = _coerce(fields[name], raw)
    return cls(**kwargs)


def load_train_config(path: str) -> TrainConfig:
    """Load a reference-format Train_Configs.ini (section [TRAIN])."""
    parser = configparser.ConfigParser()
    with open(path) as f:
        parser.read_file(f)
    return _load_section(TrainConfig, parser["TRAIN"])


def load_test_config(path: str) -> TestConfig:
    """Load a reference-format Test_Configs.ini (section [TEST])."""
    parser = configparser.ConfigParser()
    with open(path) as f:
        parser.read_file(f)
    return _load_section(TestConfig, parser["TEST"])


def load_signal_config(path: str) -> Signal1DConfig:
    """Load a Signal_Configs.ini (section [SIGNAL1D])."""
    parser = configparser.ConfigParser()
    with open(path) as f:
        parser.read_file(f)
    return _load_section(Signal1DConfig, parser["SIGNAL1D"])


def save_signal_config(cfg: Signal1DConfig, path: str) -> None:
    parser = configparser.ConfigParser()
    parser["SIGNAL1D"] = {
        k: (",".join(v) if isinstance(v, tuple) else str(v))
        for k, v in dc.asdict(cfg).items()}
    with open(path, "w") as f:
        parser.write(f)


def save_train_config(cfg: TrainConfig, path: str) -> None:
    parser = configparser.ConfigParser()
    parser["TRAIN"] = {
        k: (",".join(v) if isinstance(v, tuple) else str(v))
        for k, v in dc.asdict(cfg).items()}
    with open(path, "w") as f:
        parser.write(f)


def save_test_config(cfg: TestConfig, path: str) -> None:
    parser = configparser.ConfigParser()
    parser["TEST"] = {
        k: (",".join(v) if isinstance(v, tuple) else str(v))
        for k, v in dc.asdict(cfg).items()}
    with open(path, "w") as f:
        parser.write(f)


#: fields that do NOT define the training trajectory: bookkeeping,
#: output locations, fold/epoch selection, restore directives, and
#: test-only keys.  Editing any of these between a preemption and the
#: relaunch must not invalidate the resume state.
_RESUME_TOKEN_EXCLUDE = frozenset({
    "num_epochs",          # extending a run is the documented pattern
    "start_fold", "end_fold",  # fold selection; ckpts are per-fold
    "save_dir", "save_history", "tensorboard_dir", "task_name",
    "load_weights",        # a restore directive, not a trajectory input
    "test_set", "tta", "threshold",  # test-time only
})


def resume_token(cfg) -> str:
    """Fingerprint of the TRAINING-defining config fields, stored in
    exact-resume checkpoints: re-running the SAME config resumes, while
    a changed config (the fine-tune stage drops the LR and unfreezes the
    encoder into the same save_dir, reference notebook cells 53-55)
    starts its stage fresh instead of silently skipping it as
    "already-trained epochs".  Bookkeeping/output/test-only fields are
    excluded (``_RESUME_TOKEN_EXCLUDE``) so innocuous edits — more
    epochs, a TensorBoard dir, a different fold range — never discard
    training progress."""
    import hashlib
    items = sorted((k, v) for k, v in dc.asdict(cfg).items()
                   if k not in _RESUME_TOKEN_EXCLUDE)
    return hashlib.sha256(repr(items).encode()).hexdigest()[:16]
