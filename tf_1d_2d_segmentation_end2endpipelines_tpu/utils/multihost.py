"""Production launch plumbing for the CLI: multi-host initialization and
the persistent XLA compile cache.

Both are opt-in via environment variables so the single-host developer
flow (and the reference-parity INI surface) stays untouched; new
capability with no reference counterpart (single-GPU Keras scripts,
SURVEY.md §2.3).
"""
from __future__ import annotations

import os
import typing as tp


def maybe_initialize_distributed() -> bool:
    """Initialize JAX's multi-host runtime when ``TPUSEG_MULTIHOST=1``.

    On a TPU pod every host runs the same CLI command;
    ``jax.distributed.initialize()`` auto-discovers the coordinator from
    the TPU metadata (or the standard ``COORDINATOR_ADDRESS`` /
    ``JAX_PROCESS_COUNT`` / ``JAX_PROCESS_ID`` env vars elsewhere).
    After it, ``jax.process_count() > 1`` and the multi-host input
    pipeline (``parallel.distributed``) sees its real process grid.

    Returns True when initialization actually ran; no-op (False) when
    the env var is unset or the runtime is already initialized.
    """
    if os.environ.get("TPUSEG_MULTIHOST", "") != "1":
        return False
    import jax

    # NB: must not touch the backend first — jax.process_count()/
    # jax.devices() initialize XLA, after which initialize() raises
    # ("must be called before any JAX calls").  Probe the distributed
    # client state directly instead.
    if jax.distributed.is_initialized():
        return False  # launcher already initialized it
    jax.distributed.initialize()
    return True


def maybe_enable_compile_cache() -> tp.Optional[str]:
    """Point XLA's persistent compile cache at ``$TPUSEG_COMPILE_CACHE``.

    Compiled executables (the ~20-40 s first-compile of a train/predict
    step) are reloaded from disk on later runs of the same program —
    production restarts and repeated fold loops skip straight to
    execution.  Returns the cache dir when enabled, else None.
    """
    cache_dir = os.environ.get("TPUSEG_COMPILE_CACHE", "")
    if not cache_dir:
        return None
    import jax

    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return cache_dir
