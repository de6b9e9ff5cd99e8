"""Shared benchmark fencing helpers for the axon-tunnel timing model.

Under the tunnel, ``block_until_ready`` does not wait for remote
execution — every timing fence must be a host fetch of a dependent
scalar, which costs one tunnel round-trip.  These helpers keep the
methodology identical across ``bench.py`` and
``benchmarks/serving_bench.py``:

- :func:`measure_rtt` — the round-trip on a trivial jitted op.
- :func:`chained_device_time` — K data-dependent applications of a
  function inside ONE jit (``lax.scan`` body perturbs the carry by
  ``mean*1e-6`` so CSE cannot collapse the chain), fetched once;
  device time per application = (total - rtt) / K.
"""
from __future__ import annotations

import time
import typing as tp

import numpy as np


def measure_rtt(samples: int = 30) -> float:
    """Median host->device->host round-trip (seconds) on a trivial op."""
    import jax
    import jax.numpy as jnp

    tiny = jax.jit(lambda v: v + 1.0)
    float(tiny(jnp.float32(0)))  # compile
    rtts = []
    for _ in range(samples):
        t0 = time.perf_counter()
        float(tiny(jnp.float32(0)))
        rtts.append(time.perf_counter() - t0)
    return float(np.median(rtts))


def chained_device_time(fn: tp.Callable, x, K: int, reps: int,
                        rtt_s: tp.Optional[float] = None) -> float:
    """Pure device seconds per application of ``fn`` (see module doc)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def chained(xi):
        def body(c, _):
            m = fn(c).mean().astype(c.dtype)
            return c + m * jnp.asarray(1e-6, c.dtype), m
        _, ms = jax.lax.scan(body, xi, None, length=K)
        return ms.sum()

    float(chained(x))  # compile
    if rtt_s is None:
        rtt_s = measure_rtt()
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(chained(x))
        times.append(time.perf_counter() - t0)
    return max(float(np.median(times)) - rtt_s, 1e-9) / K
