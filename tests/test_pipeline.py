"""Pipeline parallelism (parallel/pipeline.py): GPipe microbatch schedule
over a ('pipe',) mesh must equal sequential stage chaining exactly — forward
AND gradients — on the 8-virtual-device CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tf_1d_2d_segmentation_end2endpipelines_tpu.ops.blocks import (
    ConvMixerBlock)
from tf_1d_2d_segmentation_end2endpipelines_tpu.parallel.pipeline import (
    make_pipeline_mesh,
    pipeline_apply,
    stack_stage_params,
    unstack_stage_params,
)


def _toy_stages(n_stages, feat=6, seed=0):
    """n_stages independently-initialized ConvMixer blocks (feat -> feat:
    homogeneous) + an input batch."""
    block = ConvMixerBlock(features=feat, kernel=3)
    x = jax.random.normal(jax.random.PRNGKey(seed), (8, 16, feat),
                          jnp.float32)
    params = [block.init(jax.random.PRNGKey(100 + i), x[:1])
              for i in range(n_stages)]

    def stage_fn(p, m):
        return block.apply(p, m, train=False)

    return stage_fn, params, x


def _sequential(stage_fn, params_list, x):
    for p in params_list:
        x = stage_fn(p, x)
    return x


@pytest.mark.parametrize("stages,microbatches", [(8, 8), (4, 2), (2, 8)])
def test_pipeline_forward_equals_sequential(stages, microbatches):
    stage_fn, params, x = _toy_stages(stages)
    mesh = make_pipeline_mesh(stages=stages)
    stacked = stack_stage_params(params)
    got = pipeline_apply(stage_fn, stacked, x, mesh, microbatches)
    want = _sequential(stage_fn, params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-6, rtol=1e-6)


def test_pipeline_single_stage_degenerates_to_sequential():
    stage_fn, params, x = _toy_stages(1)
    mesh = make_pipeline_mesh(stages=1)
    got = pipeline_apply(stage_fn, stack_stage_params(params), x, mesh, 4)
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(_sequential(stage_fn, params, x)),
                               atol=1e-6, rtol=1e-6)


def test_pipeline_gradients_equal_sequential():
    """Differentiating THROUGH the scan+ppermute schedule must give the
    same parameter gradients as the unpipelined chain — this is what makes
    pipelined training a one-liner."""
    stages, microbatches = 4, 4
    stage_fn, params, x = _toy_stages(stages)
    mesh = make_pipeline_mesh(stages=stages)
    stacked = stack_stage_params(params)
    target = jnp.ones_like(x)

    def loss_pipe(stacked_p):
        out = pipeline_apply(stage_fn, stacked_p, x, mesh, microbatches)
        return jnp.mean((out - target) ** 2)

    def loss_seq(params_list):
        return jnp.mean((_sequential(stage_fn, params_list, x)
                         - target) ** 2)

    g_pipe = jax.grad(loss_pipe)(stacked)
    g_seq = jax.grad(loss_seq)(params)
    for i, gp in enumerate(unstack_stage_params(g_pipe)):
        flat_p = jax.tree.leaves(gp)
        flat_s = jax.tree.leaves(g_seq[i])
        for a, b in zip(flat_p, flat_s):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5, rtol=1e-4)


def test_pipeline_train_step_reduces_loss():
    """One SGD step through the pipelined stack on the 8-device mesh."""
    stages = 4
    stage_fn, params, x = _toy_stages(stages)
    mesh = make_pipeline_mesh(stages=stages)
    stacked = stack_stage_params(params)
    target = jnp.zeros_like(x)

    @jax.jit
    def step(p):
        def loss(p):
            out = pipeline_apply(stage_fn, p, x, mesh, microbatches=4)
            return jnp.mean((out - target) ** 2)
        l, g = jax.value_and_grad(loss)(p)
        return l, jax.tree.map(lambda a, b: a - 0.05 * b, p, g)

    l0, stacked = step(stacked)
    for _ in range(3):
        l1, stacked = step(stacked)
    assert np.isfinite(float(l0)) and float(l1) < float(l0)


def test_pipeline_validates_shapes():
    stage_fn, params, x = _toy_stages(2)
    mesh = make_pipeline_mesh(stages=2)
    stacked = stack_stage_params(params)
    with pytest.raises(ValueError, match="not divisible"):
        pipeline_apply(stage_fn, stacked, x, mesh, microbatches=3)
    with pytest.raises(ValueError, match="leading axis"):
        pipeline_apply(stage_fn, stack_stage_params(params[:1] * 4), x,
                       mesh, 4)

    def bad_fn(p, m):  # heterogeneous: halves the length
        return stage_fn(p, m)[:, ::2]

    with pytest.raises(ValueError, match="homogeneous"):
        pipeline_apply(bad_fn, stacked, x, mesh, 4)
