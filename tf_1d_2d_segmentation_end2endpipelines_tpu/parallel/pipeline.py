"""GPipe-style pipeline parallelism over a ('pipe',) mesh axis.

A NEW component with no reference counterpart (the reference is single-GPU
``model.fit``, SURVEY.md §2.3; pipeline parallelism was previously scoped
out for the skip-connected decoders).  This module provides the one shape
pipeline parallelism genuinely fits in this workload: HOMOGENEOUS block
stacks — repeated blocks whose input and output shapes match, e.g. the
ConvMixer mixing chain (reference 1DCNN/Models/convmixer_unet.py:6-18,
applied `mixer_loop` times per level), the dense bottleneck's
``dense_loop`` conv chain (2DCNN/models/unet_variants.py:51-57), or the
recurrent conv chains.  Skip-connected U-decoders stay on dp/tp/spatial
sharding (COMPONENTS.md) — their stage interfaces are heterogeneous and a
forced pipeline split would serialize the skip traffic.

Design (the standard SPMD collective pipeline; see the public scaling-book
recipe): stage ``s`` of ``S`` holds slice ``s`` of a stacked parameter
pytree (leading axis sharded over 'pipe').  The batch is split into ``M``
microbatches; at tick ``t`` (of ``M + S - 1``) every device runs the SAME
program: stage 0 feeds microbatch ``t``, stage ``s`` processes the
activation ``ppermute``'d from stage ``s-1`` at tick ``t-1``, the last
stage records microbatch ``t - (S-1)``.  Bubble fraction is
``(S-1)/(M+S-1)``.  The whole schedule is one ``lax.scan`` over ticks, so
it jits once and is differentiable end-to-end (``ppermute`` transposes to
the reverse shift), making pipelined TRAINING work with no extra code.
"""
from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map


def make_pipeline_mesh(
        devices: tp.Optional[tp.Sequence[jax.Device]] = None,
        stages: int = -1) -> Mesh:
    """1D ('pipe',) mesh over ``stages`` devices (default: all)."""
    if devices is None:
        devices = jax.devices()
    if stages == -1:
        stages = len(devices)
    if stages > len(devices):
        raise ValueError(f"stages={stages} > {len(devices)} devices")
    return Mesh(np.asarray(devices[:stages]), ("pipe",))


def stack_stage_params(params_list: tp.Sequence[tp.Any]) -> tp.Any:
    """Stack S per-stage parameter pytrees along a new leading axis.

    The result is what ``pipeline_apply`` consumes: leaf shapes
    ``(S, *leaf.shape)``, leading axis sharded over 'pipe'.
    """
    return jax.tree.map(lambda *xs: jnp.stack(xs), *params_list)


def unstack_stage_params(stacked: tp.Any) -> tp.List[tp.Any]:
    """Inverse of :func:`stack_stage_params` (host-side, for tests)."""
    n = jax.tree.leaves(stacked)[0].shape[0]
    return [jax.tree.map(lambda a: a[i], stacked) for i in range(n)]


def pipeline_apply(stage_fn: tp.Callable[[tp.Any, jax.Array], jax.Array],
                   stage_params: tp.Any, x: jax.Array, mesh: Mesh,
                   microbatches: int, axis: str = "pipe") -> jax.Array:
    """Apply ``S`` chained stages ``stage_fn(params_s, x)`` with GPipe
    microbatch pipelining over the mesh's ``axis``.

    - ``stage_params``: pytree with leading axis ``S == mesh.shape[axis]``
      (see :func:`stack_stage_params`); sharded one slice per device.
    - ``x``: global batch ``(B, ...)`` with ``B % microbatches == 0``.
    - ``stage_fn`` must map a microbatch to the SAME shape/dtype
      (homogeneous stages) — checked abstractly up front.

    Returns the final stage's outputs, batch order preserved, replicated
    over the mesh.  Differentiable in both ``stage_params`` and ``x``.
    """
    S = mesh.shape[axis]
    M = int(microbatches)
    if M < 1:
        raise ValueError(f"microbatches={M} must be >= 1")
    B = x.shape[0]
    if B % M:
        raise ValueError(f"batch {B} not divisible by microbatches={M}")
    n_stage = jax.tree.leaves(stage_params)[0].shape[0]
    if n_stage != S:
        raise ValueError(
            f"stage_params leading axis {n_stage} != pipe axis size {S}")
    xm = x.reshape(M, B // M, *x.shape[1:])

    p0 = jax.tree.map(lambda a: jax.eval_shape(lambda v: v[0], a),
                      stage_params)
    out_aval = jax.eval_shape(stage_fn, p0, jax.eval_shape(
        lambda v: v[0], xm))
    if (out_aval.shape, out_aval.dtype) != (xm.shape[1:], xm.dtype):
        raise ValueError(
            "pipeline stages must be homogeneous: stage_fn maps "
            f"{xm.shape[1:]}/{xm.dtype} -> {out_aval.shape}/"
            f"{out_aval.dtype}")

    if S == 1:  # degenerate mesh: plain microbatched sequential apply
        p = jax.tree.map(lambda a: a[0], stage_params)
        return jax.lax.map(lambda m: stage_fn(p, m), xm).reshape(x.shape)

    fwd = [(i, i + 1) for i in range(S - 1)]

    def local(params_local: tp.Any, xm: jax.Array) -> jax.Array:
        p = jax.tree.map(lambda a: a[0], params_local)
        s = jax.lax.axis_index(axis)

        def tick(carry, t):
            state, outputs = carry
            inp = jax.lax.dynamic_index_in_dim(
                xm, jnp.clip(t, 0, M - 1), 0, keepdims=False)
            y = stage_fn(p, jnp.where(s == 0, inp, state))
            # last stage banks microbatch t-(S-1); other ticks/stages
            # rewrite the clamped slot with its current value (no-op)
            oidx = jnp.clip(t - (S - 1), 0, M - 1)
            cur = jax.lax.dynamic_index_in_dim(outputs, oidx, 0,
                                               keepdims=False)
            outputs = jax.lax.dynamic_update_index_in_dim(
                outputs, jnp.where(t >= S - 1, y, cur), oidx, 0)
            # shift activations one stage down the ring (stage 0
            # receives zeros -- it reads fresh microbatches instead)
            return (jax.lax.ppermute(y, axis, fwd), outputs), None

        carry0 = (jnp.zeros_like(xm[0]), jnp.zeros_like(xm))
        (_, outputs), _ = jax.lax.scan(tick, carry0,
                                       jnp.arange(M + S - 1))
        # only the last stage's buffer is real; psum replicates it
        outputs = jnp.where(s == S - 1, outputs, jnp.zeros_like(outputs))
        return jax.lax.psum(outputs, axis)

    fn = shard_map(local, mesh=mesh, in_specs=(P(axis), P()),
                   out_specs=P(), check_vma=False)
    return fn(stage_params, xm).reshape(B, *out_aval.shape[1:])
