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
    def __init__(self, directory: str):
        # no retention policy: each named checkpoint ("best", "last", ...)
        # overwrites in place, matching Keras ModelCheckpoint(save_best_only)
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    def _path(self, name: str) -> str:
        return os.path.join(self.directory, name)

    def save(self, state: TrainState, name: str = "best") -> str:
        """Save model weights (params + batch_stats).

        Weights-only matches the reference's ModelCheckpoint/load_weights
        semantics (Train.py:361-379): the optimizer state resets on resume
        and fine-tune stages can swap optimizers/freezing freely.
        """
        path = self._path(name)
        payload = {"params": state.params, "batch_stats": state.batch_stats}
        # overwrite semantics: Keras ModelCheckpoint replaces the file
        self._ckptr.save(path, payload, force=True)
        self._ckptr.wait_until_finished()
        return path

    def restore(self, state: TrainState, name: str = "best") -> TrainState:
        path = self._path(name)
        target = {"params": state.params, "batch_stats": state.batch_stats}
        payload = self._ckptr.restore(path, target=target)
        return state.replace(params=payload["params"],
                             batch_stats=payload["batch_stats"])

    def exists(self, name: str = "best") -> bool:
        return os.path.isdir(self._path(name))
