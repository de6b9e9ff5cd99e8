"""Trainer: the pjit-sharded replacement for Keras ``compile``/``fit``/
``predict`` (reference 2DCNN/Train.py:322-415, Test.py:161).

Design:
- ONE compiled train step (forward + DS loss + backward + optimizer +
  metric accumulation); state replicated, batch sharded over the mesh's
  'data' axis; XLA inserts the ICI psum for gradients.
- Metrics accumulate in additive on-device states; only per-epoch scalars
  cross to the host.
- Callbacks (EarlyStopping / ReduceLROnPlateau / best-checkpoint) are
  host-side control flow between epochs, like the Keras originals.
"""
from __future__ import annotations

import time
import typing as tp

import jax
import jax.numpy as jnp
import numpy as np

from ..parallel import local_mesh, replicated, shard_batch
from .callbacks import (BestTracker, EarlyStopping, LearningRateScheduler,
                        NaNGuard, ReduceLROnPlateau)
from .checkpoint import CheckpointManager
from .losses import get_loss
from .metrics import Metric, make_metric
from .optimizers import get_learning_rate, make_optimizer
from .state import (TrainState, create_train_state, make_eval_step,
                    make_predict_step, make_train_step)

BatchIter = tp.Callable[[], tp.Iterable[tp.Tuple[np.ndarray, tp.Any]]]


class _PreemptionWatch:
    """SIGTERM watch for preemption-safe training: the handler only sets a
    flag; the fit loop checks it at step boundaries and saves a full
    'last' checkpoint before returning cleanly.  TPU pod preemptions and
    cluster schedulers deliver SIGTERM with a grace window — this turns
    that window into a resumable checkpoint instead of a lost run.
    Signal handlers require the main thread; elsewhere (e.g. a fit inside
    a test worker thread) the watch degrades to a no-op."""

    def __init__(self, signals=None):
        import signal as _signal
        self._signal = _signal
        self.triggered = False
        self._prev: tp.Dict[int, tp.Any] = {}
        for s in signals if signals is not None else (_signal.SIGTERM,):
            try:
                self._prev[s] = _signal.signal(s, self._handler)
            except ValueError:  # not the main thread
                pass

    def _handler(self, signum, frame):
        self.triggered = True

    def restore(self):
        for s, h in self._prev.items():
            self._signal.signal(s, h)


def _as_batch(x):
    """Host batches become numpy; global jax.Arrays (DistributedLoader /
    multi-host pipelines) pass through — a pod host cannot materialize
    the global batch, and shard_batch leaves committed arrays alone."""
    return x if isinstance(x, jax.Array) else np.asarray(x)


class Trainer:
    def __init__(
        self,
        model,
        loss: str = "BinaryCrossentropy",
        optimizer: str = "Adam",
        learning_rate: float = 3e-4,
        metrics: tp.Sequence[str] = (),
        loss_weights: tp.Optional[tp.Dict[str, float]] = None,
        num_classes: int = 2,
        mesh=None,
        seed: int = 42,
        frozen_tokens: tp.Sequence[str] = (),
        remat: tp.Optional[str] = None,
        accum_steps: int = 1,
        ema_decay: float = 0.0,
        zero1: bool = False,
        clipnorm: float = 0.0,
        clipvalue: float = 0.0,
        global_clipnorm: float = 0.0,
    ):
        if not 0.0 <= ema_decay < 1.0:
            raise ValueError(f"ema_decay must be in [0, 1), got {ema_decay}")
        self.model = model
        self.mesh = mesh if mesh is not None else local_mesh()
        self.loss_name = loss
        self.loss_fn = get_loss(loss)
        self.loss_weights = loss_weights
        self.optimizer = make_optimizer(
            optimizer, learning_rate, clipnorm=clipnorm,
            clipvalue=clipvalue, global_clipnorm=global_clipnorm)
        if frozen_tokens:
            from .optimizers import freeze_subtrees
            self.optimizer = freeze_subtrees(self.optimizer, frozen_tokens)
        self.metric_defs: tp.List[Metric] = [
            make_metric(m, num_classes=num_classes) for m in metrics]
        self.remat = remat
        self.accum_steps = accum_steps
        # ema_decay > 0 tracks an EMA shadow of the params inside the train
        # step; validation/predict/export then run on the shadow weights
        # (so the monitored val metric and the 'best' checkpoint select on
        # EMA quality).  New capability over the reference (no Keras EMA).
        self.ema_decay = ema_decay
        # zero1=True shards the optimizer state over the 'data' axis
        # (ZeRO-1): per-device optimizer memory drops by ~the data-axis
        # size; XLA derives the reduce-scatter/gather pattern from the
        # sharding annotations inside the one jitted step.
        self.zero1 = zero1
        self.seed = seed
        self.state: tp.Optional[TrainState] = None
        self._train_step = None
        self._eval_step = None
        self._predict_step = None
        self._tta_steps: tp.Dict[tp.Tuple[str, ...], tp.Callable] = {}
        self.history: tp.Dict[str, tp.List[float]] = {}

    # ------------------------------------------------------------ plumbing
    def init_state(self, sample_input: np.ndarray,
                   variables: tp.Optional[dict] = None) -> TrainState:
        """``variables`` (optional) seeds the state with pre-initialized
        weights instead of model.init — the pretrained-encoder path
        (reference hardcodes weights='imagenet', unet_variants.py:1057)."""
        rng = jax.random.PRNGKey(self.seed)
        x = jnp.asarray(sample_input)
        self._sample_input = x[:1]  # kept for NaNGuard re-initialization
        self.state = create_train_state(self.model, rng, x, self.optimizer,
                                        ema=self.ema_decay > 0,
                                        variables=variables)
        return self.state

    def _build_steps(self):
        if self._train_step is None:
            rep = replicated(self.mesh)
            step = make_train_step(self.model, self.optimizer, self.loss_fn,
                                   self.loss_weights, self.metric_defs,
                                   seed=self.seed, remat=self.remat,
                                   accum_steps=self.accum_steps,
                                   ema_decay=self.ema_decay)
            if self.zero1:
                # pin the OUTPUT state to the ZeRO-1 placement: without the
                # constraint GSPMD propagates the moments' 'data' sharding
                # onto the updated params, silently drifting into a
                # ZeRO-3-like layout (params re-gathered every forward)
                from ..parallel import zero1_state_shardings
                base_step, mesh = step, self.mesh

                def step(state, x, y, mstates, _base=base_step):
                    new_state, loss, ms = _base(state, x, y, mstates)
                    new_state = jax.lax.with_sharding_constraint(
                        new_state, zero1_state_shardings(mesh, new_state))
                    return new_state, loss, ms
            self._train_step = jax.jit(step, donate_argnums=(0,))
            self._eval_step = jax.jit(
                make_eval_step(self.model, self.loss_fn, self.loss_weights,
                               self.metric_defs))
            self._predict_step = jax.jit(make_predict_step(self.model))
            self._rep_sharding = rep

    def _ensure_state_placement(self):
        """Place the state over the mesh (restored checkpoints arrive
        committed to a single device, which conflicts with sharded
        batches): replicated for a pure-dp mesh; on a mesh with a
        'model' axis > 1, conv kernels (and their optimizer moments)
        shard their output-channel axis over 'model'
        (parallel.state_shardings) — tensor parallelism through the
        plain Trainer/driver surface."""
        import jax as _jax
        if self.zero1:
            from ..parallel import zero1_state_shardings
            self.state = _jax.device_put(
                self.state, zero1_state_shardings(self.mesh, self.state))
        elif self.mesh.shape.get("model", 1) > 1:
            from ..parallel import state_shardings
            self.state = _jax.device_put(
                self.state, state_shardings(self.mesh, self.state))
        else:
            self.state = _jax.device_put(self.state, replicated(self.mesh))

    def _metric_init(self):
        return tuple(m.init() for m in self.metric_defs)

    def _metric_results(self, states, prefix: str = ""):
        out = {}
        for m, s in zip(self.metric_defs, states):
            out[prefix + m.name] = float(jax.device_get(m.result(s)))
        return out

    # ---------------------------------------------------------------- fit
    def fit(
        self,
        train_data: BatchIter,
        val_data: tp.Optional[BatchIter] = None,
        epochs: int = 1,
        callbacks: tp.Sequence = (),
        checkpoint: tp.Optional[CheckpointManager] = None,
        monitor: str = "val_loss",
        verbose: int = 1,
        profile_dir: tp.Optional[str] = None,
        profile_epoch: int = 1,
        tensorboard_dir: tp.Optional[str] = None,
        exact_resume: bool = False,
        resume_token: tp.Optional[str] = None,
    ) -> tp.Dict[str, tp.List[float]]:
        """``exact_resume=True`` (requires ``checkpoint``) makes the run
        preemption-safe and exactly resumable: every epoch ends with a
        full-state 'last' checkpoint (weights + optimizer moments + epoch
        + history + callback counters), a SIGTERM triggers one final such
        save at the next step boundary, and a later fit() with the same
        configuration continues from the recorded epoch with numerics
        identical to an uninterrupted run (tests/test_exact_resume.py).
        Data order matches too when the train loader exposes
        ``set_epoch`` (PrefetchLoader does; its shuffle is (seed, epoch)-
        keyed).  A mid-epoch preemption restarts that epoch on resume.
        The reference has no equivalent: a killed Keras run keeps only
        load_weights-style weights (Train.py:361-379)."""
        assert self.state is not None, "call init_state(sample) first"
        # optional TensorBoard scalars (new observability surface; the
        # reference logs only Keras progress bars + an h5 history,
        # Train.py:397/425-430).  TF is imported lazily — only the epoch
        # boundary touches it, never the compiled step.
        tb_writer = None
        if tensorboard_dir:
            import tensorflow as _tf
            tb_writer = _tf.summary.create_file_writer(tensorboard_dir)
        self._build_steps()
        self._ensure_state_placement()
        early = next((c for c in callbacks if isinstance(c, EarlyStopping)),
                     None)
        rlrop = next((c for c in callbacks
                      if isinstance(c, ReduceLROnPlateau)), None)
        guard = next((c for c in callbacks if isinstance(c, NaNGuard)), None)
        sched = next((c for c in callbacks
                      if isinstance(c, LearningRateScheduler)), None)
        best = BestTracker(monitor) if checkpoint is not None else None

        # NaNGuard backoffs persist under a scheduler: the guard's factor
        # accumulates into lr_scale, which scales every scheduled LR (a
        # plain override would reinstate the diverging LR next epoch)
        lr_scale = 1.0
        # ---- exact resume (full-state 'last' checkpoint + meta sidecar)
        # drivers check `trainer.preempted` after fit() to stop outer
        # loops (a fold loop must not burn the SIGTERM grace window
        # training the next fold)
        self.preempted = False
        named_cbs = {"early": early, "rlrop": rlrop, "nan_guard": guard,
                     "best": best}
        start_epoch = 0
        watch = None
        if exact_resume and checkpoint is None:
            raise ValueError("exact_resume=True requires a checkpoint")
        if exact_resume:
            watch = _PreemptionWatch()
            last_meta = checkpoint.read_meta("last")
            resumable = bool(last_meta and last_meta.get("full")) and \
                checkpoint.has_full("last")
            if resumable and resume_token is not None:
                # the fine-tune stage re-runs into the SAME save_dir with
                # a changed config (new LR, unfrozen encoder — notebook
                # cells 53-55); resuming ITS epoch counter would silently
                # skip the whole stage.  The token fingerprints the
                # training-defining config: mismatch -> fresh stage.
                # A TOKENLESS meta (pre-token checkpoint) stays
                # resumable — unknown provenance must not discard a
                # long run's progress on upgrade
                stored = last_meta.get("config")
                if stored is not None and stored != resume_token:
                    resumable = False
                    # abandoning resumable state is destructive: always
                    # say so, independent of verbosity
                    print("Exact resume: existing 'last' checkpoint "
                          "was saved by a DIFFERENT training config; "
                          "starting this stage fresh", flush=True)
            if resumable:
                # restore AFTER placement so sharded targets (zero1/tp)
                # restore straight into their shardings
                self.state, meta = checkpoint.restore_full(self.state,
                                                           "last")
                start_epoch = int(meta.get("epoch", 0))
                self.history = {k: list(v) for k, v in
                                meta.get("history", {}).items()}
                lr_scale = float(meta.get("lr_scale", 1.0))
                for key, cb in named_cbs.items():
                    if cb is not None and key in meta.get("callbacks", {}):
                        cb.load_state_dict(meta["callbacks"][key])
                if meta.get("stopped"):
                    start_epoch = epochs  # run had already early-stopped
                if hasattr(train_data, "set_epoch"):
                    # (seed, epoch)-keyed loaders reproduce the exact
                    # data order the uninterrupted run would have seen
                    train_data.set_epoch(start_epoch)
                if verbose:
                    print(f"Exact resume: continuing from epoch "
                          f"{start_epoch}", flush=True)

        def _save_last(next_epoch: int, stopped: bool = False) -> None:
            # closure reads lr_scale at call time, so NaNGuard backoffs
            # applied mid-run are persisted
            if not exact_resume:
                return
            checkpoint.save_full(self.state, "last", meta={
                "epoch": next_epoch, "history": self.history,
                "lr_scale": lr_scale, "stopped": stopped,
                "config": resume_token,
                "callbacks": {k: cb.state_dict()
                              for k, cb in named_cbs.items()
                              if cb is not None}})

        try:
            for epoch in range(start_epoch, epochs):
                t0 = time.time()
                if sched is not None:
                    self.state = self.state.replace_lr(
                        sched.on_epoch_begin(epoch) * lr_scale)
                # profiling hook (new aux subsystem; the reference has none,
                # SURVEY.md §5): capture one epoch's device trace
                profiling = profile_dir is not None and epoch == profile_epoch
                if profiling:
                    jax.profiler.start_trace(profile_dir)
                # -------- train epoch --------
                mstates = self._metric_init()
                losses = []
                nbatch = 0
                for x, y in train_data():
                    batch = shard_batch(self.mesh, {"x": _as_batch(x), "y": y})
                    self.state, loss, mstates = self._train_step(
                        self.state, batch["x"], batch["y"], mstates)
                    losses.append(loss)
                    nbatch += 1
                    if watch is not None and watch.triggered:
                        break  # preemption: stop at a step boundary
                if profiling:
                    jax.block_until_ready(self.state.params)
                    jax.profiler.stop_trace()
                if watch is not None and watch.triggered:
                    # preemption grace window: persist a resumable full
                    # checkpoint and return cleanly.  The partial epoch's
                    # steps are kept in the weights; meta records THIS epoch
                    # so resume restarts it (documented in fit's docstring)
                    jax.block_until_ready(self.state.params)
                    _save_last(epoch)
                    if verbose:
                        print(f"Preemption signal: saved full checkpoint at "
                              f"epoch {epoch} (step {nbatch}); exiting",
                              flush=True)
                    self.preempted = True
                    break
                logs: tp.Dict[str, float] = {}
                if losses:
                    logs["loss"] = float(jnp.mean(jnp.stack(losses)))
                if nbatch:
                    logs["steps_per_sec"] = nbatch / max(time.time() - t0, 1e-9)
                logs.update(self._metric_results(mstates))
                # -------- validation epoch --------
                if val_data is not None:
                    vstates = self._metric_init()
                    vlosses = []
                    for x, y in val_data():
                        if watch is not None and watch.triggered:
                            break  # preemption: abandon the partial pass
                        batch = shard_batch(self.mesh,
                                            {"x": _as_batch(x), "y": y})
                        vloss, _, vstates = self._eval_step(
                            self.state, batch["x"], batch["y"], vstates)
                        vlosses.append(vloss)
                    if vlosses:
                        logs["val_loss"] = float(jnp.mean(jnp.stack(vlosses)))
                    logs.update(self._metric_results(vstates, prefix="val_"))
                if watch is not None and watch.triggered:
                    # SIGTERM landed during/after validation: this epoch's
                    # logs never reach history, and meta records THIS epoch
                    # — resume re-runs it in full (the mid-epoch contract),
                    # so a truncated validation pass can't leak into the
                    # resumed run's history
                    jax.block_until_ready(self.state.params)
                    _save_last(epoch)
                    if verbose:
                        print(f"Preemption signal during validation: saved "
                              f"full checkpoint at epoch {epoch}; exiting",
                              flush=True)
                    self.preempted = True
                    break
                logs["lr"] = get_learning_rate(self.state.opt_state)
                logs["epoch_time"] = time.time() - t0
                for k, v in logs.items():
                    self.history.setdefault(k, []).append(v)
                if tb_writer is not None:
                    import tensorflow as _tf
                    with tb_writer.as_default():
                        for k, v in logs.items():
                            _tf.summary.scalar(k, v, step=epoch)
                    tb_writer.flush()
                if verbose:
                    msg = " - ".join(f"{k}: {v:.5g}" for k, v in logs.items())
                    print(f"Epoch {epoch + 1}/{epochs} [{nbatch} steps] {msg}",
                          flush=True)
                # -------- callbacks --------
                if guard is not None and guard.check(logs):
                    if not guard.on_failure():
                        print("NaNGuard: abort after repeated non-finite loss",
                              flush=True)
                        break
                    if checkpoint is not None and checkpoint.exists("best"):
                        self.state = checkpoint.restore(self.state, "best")
                        recovery = "restored best"
                    else:
                        # no checkpoint to fall back on: LR backoff cannot heal
                        # non-finite params, so re-initialize from a fresh seed
                        rng = jax.random.fold_in(
                            jax.random.PRNGKey(self.seed), epoch + 1)
                        self.state = create_train_state(
                            self.model, rng, self._sample_input, self.optimizer,
                            ema=self.ema_decay > 0)
                        recovery = "re-initialized params"
                    self._ensure_state_placement()
                    lr_scale *= guard.lr_factor
                    new_lr = logs["lr"] * guard.lr_factor
                    self.state = self.state.replace_lr(new_lr)
                    if verbose:
                        print(f"NaNGuard: non-finite loss; {recovery} and "
                              f"reduced lr to {new_lr:.3g}", flush=True)
                    _save_last(epoch + 1)
                    if watch is not None and watch.triggered:
                        self.preempted = True
                        break
                    continue
                if best is not None and best.is_best(logs):
                    checkpoint.save(self.state, "best")
                if rlrop is not None:
                    new_lr = rlrop.on_epoch_end(epoch, logs, logs["lr"])
                    if new_lr != logs["lr"]:
                        self.state = self.state.replace_lr(new_lr)
                if early is not None:
                    early.on_epoch_end(epoch, logs)
                    if early.stopped:
                        if verbose:
                            print(f"Early stopping at epoch {epoch + 1}",
                                  flush=True)
                        _save_last(epoch + 1, stopped=True)
                        break
                _save_last(epoch + 1)
                if watch is not None and watch.triggered:
                    # SIGTERM during epoch-end bookkeeping: the epoch is
                    # complete and saved — exit now instead of starting
                    # another epoch inside the grace window
                    if verbose:
                        print(f"Preemption signal: epoch {epoch + 1} "
                              "complete and saved; exiting", flush=True)
                    self.preempted = True
                    break
        finally:
            if watch is not None:
                watch.restore()
        if checkpoint is not None:
            checkpoint.wait()  # async best-save must be durable before fit returns
        return self.history

    # ------------------------------------------------------------ evaluate
    def evaluate(self, data: BatchIter) -> tp.Dict[str, float]:
        assert self.state is not None
        self._build_steps()
        self._ensure_state_placement()
        mstates = self._metric_init()
        losses = []
        for x, y in data():
            batch = shard_batch(self.mesh, {"x": _as_batch(x), "y": y})
            loss, _, mstates = self._eval_step(self.state, batch["x"],
                                               batch["y"], mstates)
            losses.append(loss)
        logs = {"loss": float(jnp.mean(jnp.stack(losses)))} if losses else {}
        logs.update(self._metric_results(mstates))
        return logs

    # ------------------------------------------------------------- predict
    def predict(self, x: np.ndarray,
                tta: tp.Sequence[str] = ()) -> tp.Dict[str, np.ndarray]:
        """Batched inference on the eval weights (EMA shadow when
        tracked).  ``tta``: invertible view transforms to average over
        (eval.tta) — all views run in ONE compiled program."""
        assert self.state is not None
        self._build_steps()
        self._ensure_state_placement()
        step = self._predict_step
        if tta:
            tta = tuple(tta)
            if tta not in self._tta_steps:
                from ..eval.tta import make_tta_fn
                from .state import make_predict_step
                rank = np.asarray(x).ndim - 2  # (B, *spatial, C)
                base = make_predict_step(self.model)

                def tta_step(state, xb):
                    return make_tta_fn(lambda v: base(state, v),
                                       tta, rank=rank)(xb)
                self._tta_steps[tta] = jax.jit(tta_step)
            step = self._tta_steps[tta]
        xb = shard_batch(self.mesh, np.asarray(x))
        out = step(self.state, xb)
        return jax.tree.map(np.asarray, jax.device_get(out))
