"""Micro-benchmark: BatchNorm batch-statistics variants on a flagship-
sized activation (r2 verdict lead 1a — the b128 profile charged 67 ms of
a 283 ms step to the BN-statistics convert_reduce block).

Candidates, all computing per-channel (mean, var) of a bf16
(B, H, W, C) tensor:
  flax      — nn.BatchNorm's path: promote to f32, fused fast-variance
              reduce (Var = E[x^2] - E[x]^2)
  sum_bf16  — jnp.sum(x)/jnp.sum(x*x) with f32 accumulators, square in
              bf16 (halves the read width if XLA wasn't already fusing
              the convert)
  gram      — ONE MXU matmul: [x|1]^T [x|1] on the reshaped (N, C+1)
              matrix gives sums, sums-of-squares and count in a single
              bf16 read (trades a VPU reduce for an MXU pass)

Prints ms per call (axon tunnel: timed by fetching a dependent scalar).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _enable_compile_cache
    _enable_compile_cache()

    B, H, W, C = (int(a) for a in (sys.argv[1:5] or [128, 128, 128, 32]))
    reps = 20
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32)
                    ).astype(jnp.bfloat16)

    def flax_stats(x):
        from flax.linen.normalization import _compute_stats
        return _compute_stats(x, (0, 1, 2), jnp.bfloat16)

    def sum_bf16(x):
        n = x.shape[0] * x.shape[1] * x.shape[2]
        s = jnp.sum(x, (0, 1, 2), dtype=jnp.float32)
        ss = jnp.sum(x * x, (0, 1, 2), dtype=jnp.float32)
        mu = s / n
        return mu, jnp.maximum(ss / n - mu * mu, 0.0)

    def gram(x):
        n = x.shape[0] * x.shape[1] * x.shape[2]
        xm = x.reshape(n, x.shape[-1])
        g = jnp.concatenate(
            [xm, jnp.ones((n, 1), x.dtype)], axis=1)
        m = jax.lax.dot_general(
            g, g, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        mu = m[-1, :-1] / n
        return mu, jnp.maximum(jnp.diagonal(m)[:-1] / n - mu * mu, 0.0)

    for name, fn in (("flax", flax_stats), ("sum_bf16", sum_bf16),
                     ("gram", gram)):
        f = jax.jit(fn)
        mu, var = f(x)  # compile + warm
        float(jnp.asarray(mu, jnp.float32).sum())
        t0 = time.perf_counter()
        for _ in range(reps):
            mu, var = f(x)
        fence = float(jnp.asarray(mu, jnp.float32).sum()
                      + jnp.asarray(var, jnp.float32).sum())
        dt = (time.perf_counter() - t0) / reps * 1e3
        print(f"{name:9s} {dt:7.3f} ms  (fence {fence:.4f})")


if __name__ == "__main__":
    main()
