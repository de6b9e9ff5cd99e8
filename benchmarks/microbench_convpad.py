"""Micro-benchmark: lane-padding the W=32 decoder convs (r2 verdict lead
1b — the b128 profile showed C_out=32 convs at ~8% MXU: output-lane
underuse).

Times a flagship-shaped decoder conv (3x3, C_in -> C_out) four ways:
  base       — conv as the model runs it (C_out = 32)
  pad_out    — kernel zero-padded to C_out = 128, output sliced back
  pad_inout  — input channels zero-padded to 128 too (pad -> conv ->
               slice; exactness asserted)
  wide       — a TRUE 128-channel conv (the ceiling if lanes were the
               only limit; not semantics-preserving, context only)

Prints ms per call (axon tunnel: dependent-scalar fencing).
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

    B, H, W, CIN, COUT = (int(a) for a in
                          (sys.argv[1:6] or [128, 128, 128, 64, 32]))
    PAD = 128
    reps = 20
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, H, W, CIN)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(3, 3, CIN, COUT)).astype(np.float32)
                    * 0.05).astype(jnp.bfloat16)
    dn = ("NHWC", "HWIO", "NHWC")

    def conv(x, k):
        return jax.lax.conv_general_dilated(x, k, (1, 1), "SAME",
                                            dimension_numbers=dn)

    def base(x, k):
        return conv(x, k)

    def pad_out(x, k):
        kp = jnp.pad(k, ((0, 0), (0, 0), (0, 0), (0, PAD - COUT)))
        return conv(x, kp)[..., :COUT]

    def pad_inout(x, k):
        xp = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, PAD - CIN)))
        kp = jnp.pad(k, ((0, 0), (0, 0), (0, PAD - CIN), (0, PAD - COUT)))
        return conv(xp, kp)[..., :COUT]

    kw = jnp.asarray(rng.normal(size=(3, 3, CIN, PAD)).astype(np.float32)
                     * 0.05).astype(jnp.bfloat16)

    def wide(x, k):
        return conv(x, kw)

    ref = np.asarray(jax.jit(base)(x, k), np.float32)
    for name, fn in (("base", base), ("pad_out", pad_out),
                     ("pad_inout", pad_inout), ("wide", wide)):
        f = jax.jit(fn)
        y = f(x, k)
        if name in ("pad_out", "pad_inout"):  # exactness: pad->conv->slice
            np.testing.assert_allclose(np.asarray(y, np.float32), ref,
                                       atol=1e-2, rtol=1e-2)
        float(jnp.asarray(y, jnp.float32).sum())
        t0 = time.perf_counter()
        for _ in range(reps):
            y = f(x, k)
        fence = float(jnp.asarray(y, jnp.float32).sum())
        dt = (time.perf_counter() - t0) / reps * 1e3
        print(f"{name:10s} {dt:7.3f} ms  (fence {fence:.1f})")


if __name__ == "__main__":
    main()
