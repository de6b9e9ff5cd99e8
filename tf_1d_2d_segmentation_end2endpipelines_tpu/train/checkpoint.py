"""Orbax checkpointing (replaces Keras ``.keras`` save / ``load_weights``,
reference Train.py:361-379, Test.py:110-116).

Layout mirrors the reference's artifact tree:
``{save_dir}/{task}/Fold_{i}/...`` with best-only saving driven by the
monitored metric (callbacks.BestTracker).
"""
from __future__ import annotations

import os

import orbax.checkpoint as ocp

from .state import TrainState


class CheckpointManager:
    def __init__(self, directory: str, async_save: bool = False):
        # no retention policy: each named checkpoint ("best", "last", ...)
        # overwrites in place, matching Keras ModelCheckpoint(save_best_only)
        #
        # async_save=True overlaps the checkpoint commit (host gather +
        # disk write) with subsequent training steps: ``save`` returns as
        # soon as orbax has snapshotted the device arrays, and the write
        # completes on orbax's background thread.  ``wait``/``restore``/
        # a following ``save`` join the in-flight commit first, so the
        # on-disk artifact is always consistent.  The Trainer enables this
        # for best-checkpoint saves during fit and joins before returning.
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()
        self.async_save = async_save

    def _path(self, name: str) -> str:
        return os.path.join(self.directory, name)

    def wait(self) -> None:
        """Join any in-flight async save (idempotent)."""
        self._ckptr.wait_until_finished()

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
        # join the previous async commit before overwriting the same tree
        self.wait()
        # overwrite semantics: Keras ModelCheckpoint replaces the file
        self._ckptr.save(path, payload, force=True)
        if not self.async_save:
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
        return os.path.isdir(self._path(name))
