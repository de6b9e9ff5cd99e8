"""Train state + jitted train/eval step factories.

Replaces the reference's Keras compile/fit pair (2DCNN/Train.py:322-415)
with explicit pjit-compiled pure steps:

- state (params, batch_stats, opt_state) is replicated over the mesh
- the batch is sharded over the 'data' axis; XLA inserts the psum gradient
  all-reduce over ICI automatically
- deep-supervision multi-head weighted losses are computed fused inside the
  step (no per-head host sync)
- loss math runs in float32 while the network computes in bf16 on TPU
"""
from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict

from .losses import LossFn, deep_supervision_loss
from .metrics import Metric


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: tp.Any
    batch_stats: tp.Any
    opt_state: tp.Any

    def replace_lr(self, lr: float) -> "TrainState":
        from .optimizers import set_learning_rate
        return self.replace(opt_state=set_learning_rate(self.opt_state, lr))


def create_train_state(model, rng: jax.Array, sample_input: jax.Array,
                       optimizer: optax.GradientTransformation) -> TrainState:
    variables = model.init(rng, sample_input, train=False)
    params = variables.get("params", {})
    batch_stats = variables.get("batch_stats", {})
    opt_state = optimizer.init(params)
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      batch_stats=batch_stats, opt_state=opt_state)


def _as_target_dict(y) -> tp.Dict[str, jax.Array]:
    if isinstance(y, (dict, FrozenDict)):
        return dict(y)
    return {"out": y}


#: remat policies by name: 'dots' saves only MXU (conv/matmul) results and
#: recomputes everything else in the backward pass; 'full' saves nothing.
#: On v5e, 'dots' shrinks live activation memory enough to raise the
#: flagship UNet++ 256² bf16 batch from 56 to 128 — 270 -> 450 img/s/chip
#: (benchmarks/batch_remat_sweep.py) — because step time plateaus with
#: batch while throughput keeps scaling.
REMAT_POLICIES = {"dots": "checkpoint_dots", "full": "nothing_saveable"}


def _remat_policy(name: tp.Optional[str]):
    if not name:
        return None
    try:
        return getattr(jax.checkpoint_policies, REMAT_POLICIES[name])
    except KeyError:
        raise ValueError(f"unknown remat policy {name!r}; "
                         f"expected one of {sorted(REMAT_POLICIES)}")


def make_train_step(
    model,
    optimizer: optax.GradientTransformation,
    loss_fn: LossFn,
    loss_weights: tp.Optional[tp.Dict[str, float]] = None,
    metrics: tp.Sequence[Metric] = (),
    seed: int = 0,
    remat: tp.Optional[str] = None,
) -> tp.Callable:
    """Build the fused train step: forward + DS loss + backward + update +
    metric accumulation, one compiled program.  ``remat`` ('dots'/'full')
    rematerializes the forward under ``jax.checkpoint`` — numerically
    identical, trades recompute FLOPs for activation memory (larger
    batches)."""
    policy = _remat_policy(remat)

    def train_step(state: TrainState, x: jax.Array, y,
                   metric_states: tp.Tuple = ()):
        targets = _as_target_dict(y)

        # dropout/DropBlock rngs: deterministic per step, derived from the
        # trainer seed so different seeds/folds draw different noise
        # (SAUNet's DropBlock and AlbuNet's MLP dropout use this stream)
        rngs = {"dropout": jax.random.fold_in(jax.random.PRNGKey(seed),
                                              state.step)}

        def loss_inner(params):
            variables = {"params": params}
            mutable: tp.List[str] = []
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
                mutable = ["batch_stats"]
            if mutable:
                outputs, updated = model.apply(variables, x, train=True,
                                               mutable=mutable, rngs=rngs)
                new_bs = updated["batch_stats"]
            else:
                outputs = model.apply(variables, x, train=True, rngs=rngs)
                new_bs = state.batch_stats
            outputs32 = jax.tree.map(lambda t: t.astype(jnp.float32), outputs)
            loss = deep_supervision_loss(loss_fn, outputs32, targets,
                                         loss_weights)
            return loss, (outputs32, new_bs)

        inner = (jax.checkpoint(loss_inner, policy=policy)
                 if policy is not None else loss_inner)
        grad_fn = jax.value_and_grad(inner, has_aux=True)
        (loss, (outputs, new_bs)), grads = grad_fn(state.params)
        updates, new_opt = optimizer.update(grads, state.opt_state,
                                            state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=new_params,
                                  batch_stats=new_bs, opt_state=new_opt)
        new_metric_states = tuple(
            m.update(s, targets["out"], outputs["out"])
            for m, s in zip(metrics, metric_states))
        return new_state, loss, new_metric_states

    return train_step


def make_eval_step(
    model,
    loss_fn: tp.Optional[LossFn] = None,
    loss_weights: tp.Optional[tp.Dict[str, float]] = None,
    metrics: tp.Sequence[Metric] = (),
) -> tp.Callable:
    def eval_step(state: TrainState, x: jax.Array, y,
                  metric_states: tp.Tuple = ()):
        targets = _as_target_dict(y)
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        outputs = model.apply(variables, x, train=False)
        outputs = jax.tree.map(lambda t: t.astype(jnp.float32), outputs)
        loss = jnp.zeros((), jnp.float32)
        if loss_fn is not None:
            loss = deep_supervision_loss(loss_fn, outputs, targets,
                                         loss_weights)
        new_metric_states = tuple(
            m.update(s, targets["out"], outputs["out"])
            for m, s in zip(metrics, metric_states))
        return loss, outputs, new_metric_states

    return eval_step


def make_predict_step(model) -> tp.Callable:
    def predict_step(state: TrainState, x: jax.Array):
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        return model.apply(variables, x, train=False)

    return predict_step
