"""Test configuration: force an 8-virtual-device CPU mesh so sharding tests
run without TPUs (SURVEY.md §4 test strategy, item c)."""
import os

# TF's oneDNN kernels reorder float reductions (~1e-3 deviations); parity
# fixtures need deterministic reference numerics
os.environ["TF_ENABLE_ONEDNN_OPTS"] = "0"

# the session environment pins JAX_PLATFORMS=axon (the real-TPU tunnel) and a
# sitecustomize registers the plugin at interpreter start; tests must run on
# the virtual CPU mesh, so override and reset any already-initialized backend
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
# XLA:CPU's default conv/matmul precision truncates (~2.5e-3 relative);
# parity fixtures need full f32 accumulation
jax.config.update("jax_default_matmul_precision", "highest")
# persistent compile cache: the zoo tests compile ~40 small models; on the
# single-core CI host recompiling every run would dominate test time.
# Keyed by host-CPU fingerprint: XLA:CPU AOT results replayed on a different
# machine can SIGILL (observed across round hosts).
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tf_1d_2d_segmentation_end2endpipelines_tpu.utils.hostkey import (
    machine_key)

_cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      f".jax_cache-{machine_key()}")
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
try:  # drop any backend the sitecustomize already initialized
    import jax.extend.backend
    jax.extend.backend.clear_backends()
except Exception:
    pass
