"""Parameter sharding rules for the 'model' (tensor-parallel) mesh axis.

The reference has no parallelism at all (SURVEY.md §2.3); this is the
TPU-native scaling design: conv kernels shard their OUTPUT-channel axis
over 'model' (each device computes a channel slice of every feature map;
XLA propagates the channel sharding through elementwise/BN ops and inserts
all-gathers only where a following op needs full channels, e.g. channel
concats and the 1-channel heads).  Batch stays sharded over 'data', grads
psum over both axes automatically.

Channel width must be divisible by the model-axis size to shard; leaves
that don't divide are replicated (correct, just not distributed).
"""
from __future__ import annotations

import typing as tp

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _kernel_rule(mesh: Mesh, model_size: int):
    """Path rule shared by params and full-state trees: leaves whose path
    ends in 'kernel' with a divisible output-channel axis shard over
    'model'; everything else replicates."""
    def rule(path, leaf) -> NamedSharding:
        name = str(path[-1].key) if hasattr(path[-1], "key") else ""
        shape = np.shape(leaf)
        if (model_size > 1 and name == "kernel" and len(shape) >= 2
                and shape[-1] % model_size == 0):
            spec = [None] * (len(shape) - 1) + ["model"]
            return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())
    return rule


def param_shardings(mesh: Mesh, params) -> tp.Any:
    """NamedSharding tree for a params pytree: kernels output-sharded over
    'model' where divisible, everything else replicated."""
    model_size = mesh.shape.get("model", 1)
    return jax.tree_util.tree_map_with_path(
        _kernel_rule(mesh, model_size), params)


def state_shardings(mesh: Mesh, state) -> tp.Any:
    """Shardings for a full TrainState.  Optax moments mirror the params
    tree, so their paths also end in '.../kernel' and the same path-based
    rule shards them; matching by path (not shape coincidence) keeps
    non-kernel leaves that happen to share a kernel's shape replicated."""
    model_size = mesh.shape.get("model", 1)
    return jax.tree_util.tree_map_with_path(
        _kernel_rule(mesh, model_size), state)


def zero1_state_shardings(mesh: Mesh, state) -> tp.Any:
    """ZeRO-1: shard the OPTIMIZER state over the 'data' axis.

    Params/batch-stats keep the base placement (replicated, or
    TP-sharded kernels when the mesh has a 'model' axis); each optimizer
    moment leaf additionally shards one divisible axis over 'data', so
    per-device optimizer memory drops by ~the data-axis size.  Inside the
    single jitted train step XLA partitions the elementwise moment update
    along that axis and gathers only the final param update — the ZeRO-1
    recipe falls out of sharding annotations, with no hand-written
    reduce-scatter (a new capability; the reference is single-device,
    SURVEY.md §2.3).

    The moment axis is chosen last-to-first (output channels preferred),
    skipping any axis already sharded over 'model'; indivisible leaves
    (and scalars like Adam's step count) stay replicated — correct, just
    not distributed.
    """
    data_size = mesh.shape.get("data", 1)
    model_size = mesh.shape.get("model", 1)
    tp_rule = _kernel_rule(mesh, model_size)

    def opt_rule(path, leaf) -> NamedSharding:
        spec = list(tp_rule(path, leaf).spec)
        shape = np.shape(leaf)
        spec += [None] * (len(shape) - len(spec))
        if data_size > 1:
            for ax in range(len(shape) - 1, -1, -1):
                # nonzero + divisible implies shape[ax] >= data_size
                if spec[ax] is None and shape[ax] \
                        and shape[ax] % data_size == 0:
                    spec[ax] = "data"
                    break
        return NamedSharding(mesh, P(*spec))

    base = state_shardings(mesh, state)
    return base.replace(opt_state=jax.tree_util.tree_map_with_path(
        opt_rule, state.opt_state))
