"""Multi-host (pod-scale) input pipeline.

On a TPU pod each host process sees only its local devices, so the input
pipeline must do two things the single-host path doesn't:

1. **Partition the dataset across processes** so each host decodes only
   its shard (``process_shard_indices`` / ``shard_dataset_for_process``).
2. **Assemble per-host numpy batches into one global ``jax.Array``**
   whose shards live on each host's local devices — no host ever
   materializes the global batch (``global_batch``, built on
   ``jax.make_array_from_process_local_data``).

``DistributedLoader`` composes both around any existing loader: wrap the
per-process ``PrefetchLoader`` (built on the process's dataset shard) and
feed the Trainer unchanged — ``shard_batch`` passes already-global arrays
through untouched.

This is a new component with no reference counterpart (the reference is
single-GPU ``model.fit``, SURVEY.md §2.3); it is exercised here on a
single process (where the global batch equals the local one, verified
against the ``shard_batch`` path) — the partition math and the
process-local assembly are exactly what a multi-host launch uses.
"""
from __future__ import annotations

import typing as tp

import jax
import numpy as np

from .mesh import Mesh, batch_sharding


def process_shard_indices(n: int,
                          process_index: tp.Optional[int] = None,
                          process_count: tp.Optional[int] = None
                          ) -> np.ndarray:
    """Strided partition of ``range(n)`` for this process: process ``p``
    of ``P`` takes ``p, p+P, p+2P, ...``, truncated to ``floor(n/P)``
    entries so EVERY process gets exactly the same count.

    Equal counts are load-bearing, not cosmetic: each process drives its
    own loader, and a process with one extra example would run one more
    step — its collectives would wait forever on peers that already
    finished the epoch.  Equal shard lengths (with a shared batch size)
    also make every remainder batch the same shape on every host, which
    ``jax.make_array_from_process_local_data`` requires.  The cost is
    dropping ``n mod P`` examples per epoch (shuffle seeds rotate which
    ones across epochs when the caller reshuffles).

    Shards are disjoint and stable under growth (appending files never
    reshuffles earlier assignments).
    """
    p = jax.process_index() if process_index is None else process_index
    c = jax.process_count() if process_count is None else process_count
    if not 0 <= p < c:
        raise ValueError(f"process_index {p} not in [0, {c})")
    return np.arange(p, n, c)[: n // c]


def shard_dataset_for_process(dataset,
                              process_index: tp.Optional[int] = None,
                              process_count: tp.Optional[int] = None):
    """This process's shard of a ``SegmentationFolderDataset`` (or any
    object with ``__len__``/``load_pair``) as a ``SubsetDataset``.
    With one process this is the identity view."""
    from ..data.generators import SubsetDataset
    idx = process_shard_indices(len(dataset), process_index, process_count)
    return SubsetDataset(dataset, idx.tolist())


def global_batch(mesh: Mesh, batch):
    """Assemble a tree of per-process numpy batches into global
    ``jax.Array``s sharded over the mesh's batch axes.

    Each process passes its LOCAL batch (its shard of the global one);
    the result's global batch axis is the concatenation over processes.
    Under a single process this equals ``shard_batch`` on the full batch.
    Scalars/0-d leaves are rejected — the batch axis must exist.
    """
    def _one(x):
        x = np.asarray(x)
        if x.ndim < 1:
            raise ValueError("global_batch leaves need a batch axis")
        sharding = batch_sharding(mesh, x.ndim)
        return jax.make_array_from_process_local_data(sharding, x)

    return jax.tree.map(_one, batch)


class DistributedLoader:
    """Wrap any per-process batch iterable (``PrefetchLoader``,
    ``data.batches``, ...) so it yields GLOBAL device arrays.

    The wrapped loader should be built over this process's dataset shard
    (``shard_dataset_for_process``) with the per-process batch size
    (global batch / process_count).  The Trainer consumes the result
    directly: ``shard_batch`` leaves committed ``jax.Array``s untouched.
    """

    def __init__(self, loader, mesh: Mesh):
        self.loader = loader
        self.mesh = mesh

    def __call__(self):
        for x, y in self.loader():
            yield global_batch(self.mesh, x), global_batch(self.mesh, y)
