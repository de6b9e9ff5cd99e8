"""Orbax checkpointing (replaces Keras ``.keras`` save / ``load_weights``,
reference Train.py:361-379, Test.py:110-116).

Layout mirrors the reference's artifact tree:
``{save_dir}/{task}/Fold_{i}/...`` with best-only saving driven by the
monitored metric (callbacks.BestTracker).

Two checkpoint flavors:

- ``save``/``restore`` — weights-only (params + batch_stats + EMA
  shadow), matching the reference's ModelCheckpoint/load_weights
  semantics: the optimizer resets on resume and fine-tune stages can
  swap optimizers/freezing freely.
- ``save_full``/``restore_full`` — the COMPLETE training state
  (weights + optimizer moments + step counter) plus a JSON meta sidecar
  (epoch, history, callback state), enabling EXACT resume after a crash
  or preemption: the continued run is bit-identical to an uninterrupted
  one (``Trainer.fit(exact_resume=True)``, tests/test_exact_resume.py).
  The reference has no equivalent — a killed Keras run loses its
  optimizer state and epoch position.
"""
from __future__ import annotations

import json
import os
import shutil
import typing as tp

import orbax.checkpoint as ocp

from .state import TrainState


class CheckpointManager:
    def __init__(self, directory: str, async_save: bool = False):
        # no retention policy: each named checkpoint ("best", "last", ...)
        # overwrites in place, matching Keras ModelCheckpoint(save_best_only)
        #
        # async_save=True overlaps the checkpoint commit (host gather +
        # disk write) with subsequent training steps.  Durability: the
        # commit targets a ``{name}.staging`` sibling (orbax renames its
        # tmpdir onto that path only when COMPLETE), and the previous
        # final dir is replaced only at the next join — so a kill at any
        # point leaves a consistent checkpoint on disk (the old one until
        # the new one has fully landed; a plain force=True overwrite
        # would instead delete the old tree up front and widen the
        # no-checkpoint crash window to a whole epoch).  ``wait`` /
        # ``restore`` / ``exists`` / a following ``save`` all join +
        # swap first; a FRESH manager adopts an orphaned staging dir
        # from a killed process.  The Trainer joins before fit returns.
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()
        self.async_save = async_save
        self._pending: set = set()

    def _path(self, name: str) -> str:
        return os.path.join(self.directory, name)

    def _finalize(self, name: str) -> None:
        """Swap a fully-committed staging dir into place; recover from a
        kill at any intermediate point (staging presence == complete,
        because orbax's own tmpdir rename onto it is atomic).

        Multi-host: exactly ONE process may perform the renames on the
        shared filesystem (concurrent swaps would race); orbax itself
        already routes the commit through the primary, and
        wait_until_finished() has synchronized all hosts by the time
        this runs, so non-primary processes simply skip."""
        import jax
        if jax.process_index() != 0:
            return
        final = self._path(name)
        staging = final + ".staging"
        old = final + ".old"
        if not os.path.isdir(staging):
            if not os.path.isdir(final) and os.path.isdir(old):
                os.rename(old, final)  # killed mid-swap last time
            # an orphaned meta staging WITHOUT its arrays staging is
            # ambiguous: either the arrays never landed (kill before the
            # orbax commit — the meta is junk) or the kill hit BETWEEN
            # the arrays swap and _finalize_meta (the meta belongs to the
            # arrays now in `final`).  It is kept on disk; restore_full
            # disambiguates with the step token recorded in every meta
            # (meta["step"] must equal the restored state's step).
            return
        if os.path.isdir(old):
            shutil.rmtree(old)
        if os.path.isdir(final):
            os.rename(final, old)
        os.rename(staging, final)
        if os.path.isdir(old):
            shutil.rmtree(old)
        self._finalize_meta(name)

    def _meta_path(self, name: str) -> str:
        return self._path(name) + ".meta.json"

    def _finalize_meta(self, name: str) -> None:
        """The meta sidecar lands only together with (or after) its
        checkpoint dir: os.replace is atomic, so a reader never sees a
        meta newer than the arrays it describes without the arrays."""
        staging = self._meta_path(name) + ".staging"
        if os.path.isfile(staging) and os.path.isdir(self._path(name)):
            os.replace(staging, self._meta_path(name))

    def wait(self) -> None:
        """Join any in-flight async save and swap it into place
        (idempotent)."""
        self._ckptr.wait_until_finished()
        for name in list(self._pending):
            self._finalize(name)
        self._pending.clear()

    def save(self, state: TrainState, name: str = "best") -> str:
        """Save model weights (params + batch_stats).

        Weights-only matches the reference's ModelCheckpoint/load_weights
        semantics (Train.py:361-379): the optimizer state resets on resume
        and fine-tune stages can swap optimizers/freezing freely.
        """
        path = self._path(name)
        payload = {"params": state.params, "batch_stats": state.batch_stats}
        if state.ema_params is not None:
            # the EMA shadow ships with the weights so a later test/serve/
            # export run (which may build a plain Trainer) still gets the
            # weights the training run selected on
            payload["ema_params"] = state.ema_params
        # join + swap the previous async commit before starting a new one
        # (orbax also joins internally, but the staging->final swap is
        # this manager's responsibility)
        self.wait()
        # a weights-only save over an earlier FULL checkpoint must not
        # leave the stale meta sidecar claiming resumability
        self._write_meta(name, None)
        if self.async_save:
            self._ckptr.save(path + ".staging", payload, force=True)
            self._pending.add(name)
        else:
            # overwrite semantics: Keras ModelCheckpoint replaces the file
            self._ckptr.save(path, payload, force=True)
            self.wait()
        return path

    # ---------------------------------------------------- full checkpoints
    def _write_meta(self, name: str, meta: tp.Optional[dict]) -> None:
        """Stage (async) or atomically place (sync) the JSON sidecar;
        ``None`` removes any existing sidecar.  Single-writer: only the
        primary process touches the shared filesystem."""
        import jax
        if jax.process_index() != 0:
            return
        mpath = self._meta_path(name)
        staging = mpath + ".staging"
        for stale in (staging,) + (() if meta is not None else (mpath,)):
            if os.path.isfile(stale):
                os.remove(stale)
        if meta is None:
            return
        if self.async_save:
            # lands via _finalize_meta only after the arrays dir swap
            with open(staging, "w") as f:
                json.dump(meta, f)
        else:
            tmp = mpath + ".tmp"
            with open(tmp, "w") as f:
                json.dump(meta, f)
            os.replace(tmp, mpath)

    def save_full(self, state: TrainState, name: str = "last",
                  meta: tp.Optional[dict] = None) -> str:
        """Save the COMPLETE training state (weights + optimizer moments +
        step counter) plus a JSON ``meta`` sidecar (epoch, history,
        callback state) for exact resume.  The meta becomes visible only
        together with its arrays (staged through the same swap), so a kill
        at any point leaves a consistent (checkpoint, meta) pair.
        """
        import jax
        path = self._path(name)
        payload = {"params": state.params, "batch_stats": state.batch_stats,
                   "opt_state": state.opt_state, "step": state.step}
        if state.ema_params is not None:
            payload["ema_params"] = state.ema_params
        meta = dict(meta or {})
        meta["full"] = True
        meta["has_ema"] = state.ema_params is not None
        # pairing token: restore_full verifies the meta describes the
        # arrays actually on disk (a kill between the arrays swap and the
        # meta finalize would otherwise pair new arrays with a stale meta)
        meta["step"] = int(jax.device_get(state.step))
        self.wait()
        if self.async_save:
            self._write_meta(name, meta)
            self._ckptr.save(path + ".staging", payload, force=True)
            self._pending.add(name)
        else:
            self._ckptr.save(path, payload, force=True)
            self.wait()
            self._write_meta(name, meta)
        return path

    def _read_json(self, path: str) -> tp.Optional[dict]:
        if not os.path.isfile(path):
            return None
        try:
            with open(path) as f:
                return json.load(f)
        except (OSError, ValueError):
            return None  # torn write from a kill mid-json — unusable

    def read_meta(self, name: str = "last") -> tp.Optional[dict]:
        """The JSON sidecar of a full checkpoint (None when absent).
        Falls back to an orphaned STAGED sidecar when the final one is
        missing but the arrays dir exists (kill between the arrays swap
        and the meta finalize on a first-ever save); restore_full
        validates either against the arrays' step token."""
        self.wait()
        self._finalize(name)
        meta = self._read_json(self._meta_path(name))
        if meta is None and os.path.isdir(self._path(name)):
            meta = self._read_json(self._meta_path(name) + ".staging")
        return meta

    def has_full(self, name: str = "last") -> bool:
        """True when ``name`` is a resumable FULL checkpoint (arrays dir
        present and its meta sidecar marks it full)."""
        meta = self.read_meta(name)
        return bool(meta and meta.get("full")) and \
            os.path.isdir(self._path(name))

    def restore_full(self, state: TrainState, name: str = "last"
                     ) -> tp.Tuple[TrainState, dict]:
        """Restore a full checkpoint into ``state`` (same model AND same
        optimizer configuration as the saving run) and return
        ``(state, meta)``.  Leaf placement follows the target's shardings,
        so a ZeRO-1/tp-sharded state restores sharded."""
        self.wait()
        self._finalize(name)
        meta = self.read_meta(name)
        if not meta or not meta.get("full"):
            raise FileNotFoundError(
                f"{self._path(name)} is not a full checkpoint (no meta "
                "sidecar); was it saved with save_full()?")
        target = {"params": state.params, "batch_stats": state.batch_stats,
                  "opt_state": state.opt_state, "step": state.step}
        if meta.get("has_ema"):
            if state.ema_params is None:
                raise ValueError(
                    "checkpoint tracks EMA but the trainer does not; "
                    "exact resume requires the same ema_decay setting")
            target["ema_params"] = state.ema_params
        elif state.ema_params is not None:
            raise ValueError(
                "trainer tracks EMA but the checkpoint does not; "
                "exact resume requires the same ema_decay setting")
        try:
            payload = self._ckptr.restore(self._path(name), target=target)
        except Exception as e:
            raise ValueError(
                "full-checkpoint restore failed — exact resume requires "
                "the SAME model and optimizer configuration as the saving "
                f"run ({e})") from e
        meta = self._reconcile_meta(name, meta, payload["step"])
        return state.replace(
            params=payload["params"], batch_stats=payload["batch_stats"],
            opt_state=payload["opt_state"], step=payload["step"],
            ema_params=payload.get("ema_params", state.ema_params)), meta

    def _reconcile_meta(self, name: str, meta: dict, step) -> dict:
        """Verify the meta sidecar describes the restored arrays via the
        step token; a kill between the arrays swap and the meta finalize
        can leave new arrays paired with the previous meta, with the
        RIGHT meta still in ``.staging`` — adopt it when its token
        matches.  Tokenless metas (pre-token checkpoints) pass through."""
        import jax
        restored_step = int(jax.device_get(step))
        if meta.get("step") in (None, restored_step):
            return meta
        staging = self._meta_path(name) + ".staging"
        staged = self._read_json(staging)
        if staged and staged.get("step") == restored_step:
            if jax.process_index() == 0:
                os.replace(staging, self._meta_path(name))
            return staged
        # no matching sidecar survives: resume from the stale meta's
        # epoch (arrays newer than meta → the re-run epoch double-trains,
        # the same contract as a documented mid-epoch preemption), loudly
        print(f"WARNING: checkpoint '{name}' meta sidecar does not match "
              f"its arrays (arrays step {restored_step}, meta step "
              f"{meta.get('step')}); resuming from the recorded epoch — "
              "the resumed trajectory may repeat one epoch", flush=True)
        return meta

    def restore(self, state: TrainState, name: str = "best") -> TrainState:
        """Restore weights into ``state``, tolerating an EMA mismatch in
        either direction: a pre-EMA checkpoint restored into an EMA-tracking
        trainer seeds the shadow from the restored params; an EMA checkpoint
        restored into a plain trainer still loads (and serves) the shadow."""
        import jax
        import jax.numpy as jnp

        self.wait()  # a mid-flight async save must land before reading
        self._finalize(name)  # adopt an orphaned staging (killed process)
        path = self._path(name)
        target = {"params": state.params, "batch_stats": state.batch_stats}
        if state.ema_params is not None:
            target["ema_params"] = state.ema_params
        try:
            payload = self._ckptr.restore(path, target=target)
        except BaseException:
            # structure mismatch: retry with the opposite EMA assumption
            # (a genuinely corrupt checkpoint fails this attempt too)
            alt = {"params": state.params,
                   "batch_stats": state.batch_stats}
            if state.ema_params is None:
                alt["ema_params"] = jax.tree.map(jnp.zeros_like,
                                                 state.params)
            payload = self._ckptr.restore(path, target=alt)
            if state.ema_params is not None:  # pre-EMA checkpoint
                payload["ema_params"] = jax.tree.map(jnp.copy,
                                                     payload["params"])
        return state.replace(params=payload["params"],
                             batch_stats=payload["batch_stats"],
                             ema_params=payload.get("ema_params"))

    def exists(self, name: str = "best") -> bool:
        self.wait()  # an in-flight commit hasn't finalized its dir yet
        self._finalize(name)  # adopt an orphaned staging (killed process)
        return os.path.isdir(self._path(name))
