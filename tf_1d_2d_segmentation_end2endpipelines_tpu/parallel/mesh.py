"""Mesh + sharding layer (a new component; the reference has no distributed
story at all -- single-GPU ``model.fit``, SURVEY.md §2.3).

TPU-native scaling design:
- one ``jax.sharding.Mesh`` over ICI with axes ``('data', 'model')``
- batches are sharded over ``data`` (data parallelism); gradients are
  reduced by XLA-inserted ``psum`` over ICI when the train step is jitted
  with these shardings -- no explicit collectives in user code
- the ``model`` axis is reserved for channel-sharded convolutions of very
  wide models (width-sharded kernels; XLA inserts all-gathers on the halo)
- spatial partitioning for megapixel inference shards the *patch grid*, not
  the convolution, mirroring the reference's patchify semantics
  (utils/helper_functions.py:18-28) without halo exchange.
"""
from __future__ import annotations

import typing as tp

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices: tp.Optional[tp.Sequence[jax.Device]] = None,
              data: int = -1, model: int = 1, spatial: int = 1,
              axis_names: tp.Optional[tp.Tuple[str, ...]] = None) -> Mesh:
    """Build a ('data', 'model') mesh — or ('data', 'spatial', 'model')
    when ``spatial > 1``.  ``data=-1`` consumes all devices not used by
    the other axes.

    The 'spatial' axis shards the H axis of image batches (the L axis of
    signal batches): params stay replicated over it while GSPMD partitions
    every conv/pool/norm along the sharded dimension, inserting the halo
    exchanges and partial-reduction collectives itself — the XLA-native
    generalization of the hand-written overlap-tile path in
    ``parallel/halo.py``, and it trains (gradients flow through the
    partitioned ops).  Numerically identical to pure dp (see
    tests/test_spatial_train.py); use it when one image/sequence shard is
    too tall for a chip's HBM at a useful batch size.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data == -1:
        if n % (model * spatial):
            raise ValueError(
                f"{n} devices not divisible by model={model}*spatial={spatial}")
        data = n // (model * spatial)
    if data * model * spatial != n:
        raise ValueError(f"mesh {data}x{spatial}x{model} != {n} devices")
    if spatial > 1:
        arr = np.asarray(devices).reshape(data, spatial, model)
        return Mesh(arr, axis_names or ("data", "spatial", "model"))
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, axis_names or ("data", "model"))


def local_mesh() -> Mesh:
    """Mesh over all local devices, data-parallel only."""
    return make_mesh()


def make_multislice_mesh(devices: tp.Optional[tp.Sequence[jax.Device]] = None,
                         slices: int = 1, data: int = -1,
                         model: int = 1) -> Mesh:
    """Multi-slice mesh ('slice', 'data', 'model').

    The leading 'slice' axis models the DCN boundary between pod slices:
    batches shard over ('slice', 'data'), so XLA's gradient psum
    decomposes into an ICI reduce within each slice plus an all-reduce of
    the per-slice partials over 'slice' — the standard multi-slice recipe
    (keep 'model' inside a slice so its collectives ride ICI only).
    Validated here on virtual devices (no multi-slice hardware in this
    environment); on real deployments pass the device list slice-major.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if n % slices:
        raise ValueError(f"{n} devices not divisible by slices={slices}")
    per = n // slices
    if data == -1:
        if per % model:
            raise ValueError(f"{per}/slice not divisible by model={model}")
        data = per // model
    if slices * data * model != n:
        raise ValueError(f"mesh {slices}x{data}x{model} != {n} devices")
    arr = np.asarray(devices).reshape(slices, data, model)
    return Mesh(arr, ("slice", "data", "model"))


def _batch_axes(mesh: Mesh):
    return (("slice", "data") if "slice" in mesh.axis_names else "data")


def _spatial_size(mesh: Mesh) -> int:
    return mesh.shape["spatial"] if "spatial" in mesh.axis_names else 1


def batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard the leading (batch) axis over 'data' (and 'slice' when the
    mesh has one); on a mesh with a 'spatial' axis, additionally shard
    axis 1 — H of (B, H, W, C) images, L of (B, L, C) signals — over it;
    replicate the rest."""
    spec = [None] * ndim
    spec[0] = _batch_axes(mesh)
    if ndim >= 3 and _spatial_size(mesh) > 1:
        spec[1] = "spatial"
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device-put a host batch with the batch axis sharded over 'data'.

    Batches whose leading axis is not divisible by the data-axis size are
    replicated instead (correct but slower -- matches Keras's
    any-batch-size semantics; hot paths should use divisible batches).
    """
    data_size = mesh.shape["data"] * mesh.shape.get("slice", 1)

    spatial = _spatial_size(mesh)

    def _put(x):
        if isinstance(x, jax.Array) and x.committed:
            # already globally placed (e.g. DistributedLoader output, or a
            # multi-host global batch no single host could materialize)
            return x
        nd, shape = np.ndim(x), np.shape(x)
        if nd >= 1 and shape[0] % data_size == 0:
            if nd >= 3 and spatial > 1 and shape[1] % spatial == 0:
                return jax.device_put(x, batch_sharding(mesh, nd))
            # spatial-indivisible leaf (e.g. an odd-height DS pyramid
            # level): keep the batch axis sharded, replicate over 'spatial'
            spec = [None] * nd
            spec[0] = _batch_axes(mesh)
            return jax.device_put(x, NamedSharding(mesh, P(*spec)))
        return jax.device_put(x, replicated(mesh))

    return jax.tree.map(_put, batch)


def data_parallel_shardings(mesh: Mesh, state, batch):
    """(in_shardings, out_shardings)-style helpers for a jitted step:
    replicated state, batch-sharded data."""
    rep = replicated(mesh)
    state_sh = jax.tree.map(lambda _: rep, state)
    batch_sh = jax.tree.map(lambda x: batch_sharding(mesh, np.ndim(x)), batch)
    return state_sh, batch_sh
