"""Halo exchange for spatially-sharded convolution (shard_map + ppermute).

For megapixel single-image inference the patch-grid path
(`parallel/spatial.py`) reproduces the reference's patchify semantics; this
module is the XLA-collective alternative: shard the image's H axis over the
mesh, exchange k//2 boundary rows with ring neighbors over ICI
(``ppermute``), and convolve each shard locally — numerically identical to
the unsharded SAME convolution, with no patch-seam effects.
"""
from __future__ import annotations


import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map


def _exchange_rows(x: jax.Array, halo: int, axis_name: str) -> jax.Array:
    """Append neighbors' boundary rows: returns (rows + 2*halo, ...) with
    zero padding at the global edges (SAME-conv semantics)."""
    n = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)
    # send top rows to the previous shard, bottom rows to the next
    top = x[:halo]
    bottom = x[-halo:]
    fwd = [(i, (i + 1) % n) for i in range(n)]
    bwd = [(i, (i - 1) % n) for i in range(n)]
    from_prev = jax.lax.ppermute(bottom, axis_name, fwd)   # prev's bottom
    from_next = jax.lax.ppermute(top, axis_name, bwd)      # next's top
    # zero halos at the global boundary
    from_prev = jnp.where(idx == 0, jnp.zeros_like(from_prev), from_prev)
    from_next = jnp.where(idx == n - 1, jnp.zeros_like(from_next),
                          from_next)
    return jnp.concatenate([from_prev, x, from_next], axis=0)


def halo_conv2d(x: jax.Array, kernel: jax.Array, mesh: Mesh,
                axis: str = "data") -> jax.Array:
    """SAME 2D convolution with the H axis sharded over ``axis``.

    ``x``: (B, H, W, C) with H divisible by the axis size;
    ``kernel``: (kh, kw, C, F), odd kh/kw.  Equivalent to
    ``lax.conv_general_dilated(x, kernel, SAME)`` (validated in tests).
    """
    kh, kw = kernel.shape[0], kernel.shape[1]
    if kh % 2 == 0 or kw % 2 == 0:
        raise ValueError(f"halo_conv2d needs odd kernel dims, got {kh}x{kw}")
    halo = kh // 2
    if halo == 0:
        # kh == 1: no rows cross shard boundaries — a 1xkw conv is local to
        # each H shard (and x[-0:] would wrongly take the whole shard below)
        return jax.lax.conv_general_dilated(
            x, kernel, (1, 1), [(0, 0), (kw // 2, kw // 2)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def local(xs: jax.Array, k: jax.Array) -> jax.Array:
        # xs: (B, H/n, W, C) local shard with batch leading; operate on H
        xs = jnp.swapaxes(xs, 0, 1)              # (H/n, B, W, C)
        xs = _exchange_rows(xs, halo, axis)
        xs = jnp.swapaxes(xs, 0, 1)              # (B, H/n + 2h, W, C)
        out = jax.lax.conv_general_dilated(
            xs, k, (1, 1), [(0, 0), (kw // 2, kw // 2)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return out

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P(None, axis, None, None), P()),
        out_specs=P(None, axis, None, None))
    return fn(x, kernel)


def halo_sharded_inference(model, variables, image, mesh,
                           axis: str = "data", halo: int = 64,
                           out_key: str = "out"):
    """Full-model single-image inference with the H axis sharded over the
    mesh — the XLA-collective alternative to host patchify with NO seams.

    Overlap-tile strategy (the original U-Net paper's inference scheme):
    the image is zero-extended by ``halo`` rows top and bottom, each device
    receives its H-shard plus ``halo`` boundary rows from its ring
    neighbors (ONE up-front ppermute exchange), runs the ENTIRE model on
    the padded shard, and crops the halo rows back off.  As long as
    ``halo`` is a multiple of 2**model_depth (pooling-grid alignment) and
    at least half the network's receptive field, every retained output row
    depends only on rows present locally, so the result equals the
    unsharded model applied to the zero-extended image EXACTLY — verified
    in tests/test_parallel.py::test_halo_sharded_full_model_inference.

    ``image``: (H, W, C) or (1, H, W, C); (H + 2*halo) must divide the
    axis size and each shard must be at least ``halo`` rows tall.
    """
    if halo <= 0:
        raise ValueError("halo must be positive (x[0:-0] slices are empty)")
    x = jnp.asarray(image, jnp.float32)
    if x.ndim == 3:
        x = x[None]
    n = mesh.shape[axis]
    x = jnp.pad(x, ((0, 0), (halo, halo), (0, 0), (0, 0)))
    H = x.shape[1]
    if H % n or (H // n) < halo:
        raise ValueError(
            f"padded height {H} must divide {n} shards of >= {halo} rows")

    def local(xs: jax.Array) -> jax.Array:
        hs = jnp.swapaxes(xs, 0, 1)            # (rows, B, W, C)
        hs = _exchange_rows(hs, halo, axis)
        hs = jnp.swapaxes(hs, 0, 1)            # (B, rows + 2*halo, W, C)
        out = model.apply(variables, hs, train=False)[out_key]
        return out[:, halo:-halo]

    fn = shard_map(
        local, mesh=mesh,
        in_specs=P(None, axis, None, None),
        out_specs=P(None, axis, None, None),
        check_vma=False)
    out = fn(x)
    return out[:, halo:-halo]
