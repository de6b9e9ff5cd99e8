"""Pipeline-parallel training of a homogeneous block stack (GPipe).

The reference has no distributed story at all (single-GPU ``model.fit``,
SURVEY.md §2.3).  This framework scales skip-connected U-decoders with
dp/tp/spatial sharding; for HOMOGENEOUS block chains — the shape pipeline
parallelism genuinely fits — `parallel/pipeline.py` provides a GPipe
microbatch schedule over a ('pipe',) mesh axis: one `lax.scan` over ticks,
`ppermute` stage shifts, differentiable end-to-end, so pipelined TRAINING
is just `jax.grad` through `pipeline_apply`.

Demonstrated here on a ConvMixer mixing chain (the reference applies the
same block `mixer_loop` times per level, 1DCNN/Models/convmixer_unet.py)
with each stage's parameters resident on its own device.

Runs anywhere: `JAX_PLATFORMS=cpu
XLA_FLAGS=--xla_force_host_platform_device_count=8
python examples/pipeline_parallel.py`
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

if len(jax.devices()) < 4:  # self-provision a virtual CPU mesh (the
    # session env may pin a single-chip backend before XLA_FLAGS is read)
    from __graft_entry__ import _ensure_devices
    _ensure_devices(8)

from tf_1d_2d_segmentation_end2endpipelines_tpu.ops.blocks import (
    ConvMixerBlock)
from tf_1d_2d_segmentation_end2endpipelines_tpu.parallel import (
    make_pipeline_mesh, pipeline_apply, stack_stage_params)


def main():
    stages = min(4, len(jax.devices()))
    mesh = make_pipeline_mesh(stages=stages)
    print(f"pipeline mesh: {stages} stages over "
          f"{[d.id for d in mesh.devices.flat]}")

    block = ConvMixerBlock(features=16, kernel=3)
    x = jax.random.normal(jax.random.PRNGKey(0), (16, 64, 16))
    target = jnp.tanh(x).sum(-1, keepdims=True) * jnp.ones_like(x)
    stacked = stack_stage_params(
        [block.init(jax.random.PRNGKey(1 + i), x[:1])
         for i in range(stages)])

    def stage_fn(p, m):
        return block.apply(p, m, train=False)

    @jax.jit
    def step(params):
        def loss_fn(p):
            out = pipeline_apply(stage_fn, p, x, mesh, microbatches=4)
            return jnp.mean((out - target) ** 2)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        return loss, jax.tree.map(lambda a, g: a - 0.05 * g, params, grads)

    for i in range(10):
        loss, stacked = step(stacked)
        if i % 3 == 0 or i == 9:
            print(f"step {i}: loss {float(loss):.5f}")
    print("pipelined training OK (loss decreased through the "
          f"{stages}-stage GPipe schedule)")


if __name__ == "__main__":
    main()
