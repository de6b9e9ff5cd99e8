"""Orbax checkpointing (replaces Keras ``.keras`` save / ``load_weights``,
reference Train.py:361-379, Test.py:110-116).

Layout mirrors the reference's artifact tree:
``{save_dir}/{task}/Fold_{i}/...`` with best-only saving driven by the
monitored metric (callbacks.BestTracker).
"""
from __future__ import annotations

import os
import shutil

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
            return
        if os.path.isdir(old):
            shutil.rmtree(old)
        if os.path.isdir(final):
            os.rename(final, old)
        os.rename(staging, final)
        if os.path.isdir(old):
            shutil.rmtree(old)

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
        if self.async_save:
            self._ckptr.save(path + ".staging", payload, force=True)
            self._pending.add(name)
        else:
            # overwrite semantics: Keras ModelCheckpoint replaces the file
            self._ckptr.save(path, payload, force=True)
            self.wait()
        return path

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
