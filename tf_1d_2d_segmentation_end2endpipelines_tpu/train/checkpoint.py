"""Orbax checkpointing (replaces Keras ``.keras`` save / ``load_weights``,
reference Train.py:361-379, Test.py:110-116).

Layout mirrors the reference's artifact tree:
``{save_dir}/{task}/Fold_{i}/...`` with best-only saving driven by the
monitored metric (callbacks.BestTracker).
"""
from __future__ import annotations

import os
import typing as tp

import jax
import orbax.checkpoint as ocp

from .state import TrainState


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 1):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    def _path(self, name: str) -> str:
        return os.path.join(self.directory, name)

    def save(self, state: TrainState, name: str = "best") -> str:
        path = self._path(name)
        # overwrite semantics: Keras ModelCheckpoint replaces the file
        self._ckptr.save(path, state, force=True)
        self._ckptr.wait_until_finished()
        return path

    def restore(self, state: TrainState, name: str = "best") -> TrainState:
        path = self._path(name)
        return self._ckptr.restore(path, target=state)

    def exists(self, name: str = "best") -> bool:
        return os.path.isdir(self._path(name))
