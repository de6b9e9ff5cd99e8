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
    #: exponential moving average of ``params`` (``None`` when EMA tracking
    #: is off).  A new capability over the reference (which has no EMA);
    #: standard practice for segmentation deployment — eval/predict/export
    #: use these shadow weights when present (``eval_params``).
    ema_params: tp.Any = None

    @property
    def eval_params(self) -> tp.Any:
        """Parameters for inference: the EMA shadow when tracked, else the
        raw optimized params.  ``None`` vs pytree is a structural (trace-
        time) difference, so jitted eval/predict steps specialize on it."""
        return self.params if self.ema_params is None else self.ema_params

    def replace_lr(self, lr: float) -> "TrainState":
        from .optimizers import set_learning_rate
        return self.replace(opt_state=set_learning_rate(self.opt_state, lr))


def create_train_state(model, rng: jax.Array, sample_input: jax.Array,
                       optimizer: optax.GradientTransformation,
                       ema: bool = False,
                       variables: tp.Optional[dict] = None) -> TrainState:
    # ``variables`` overrides model.init for pre-initialized weights (the
    # driver's encoder_weights='imagenet' path): EMA/opt-state then start
    # from the converted params, not a random init
    if variables is None:
        variables = model.init(rng, sample_input, train=False)
    params = variables.get("params", {})
    batch_stats = variables.get("batch_stats", {})
    opt_state = optimizer.init(params)
    # fresh buffers (not aliases of params): the train step donates the
    # state, and two leaves sharing one donated buffer would alias
    ema_params = jax.tree.map(jnp.copy, params) if ema else None
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      batch_stats=batch_stats, opt_state=opt_state,
                      ema_params=ema_params)


def _as_target_dict(y) -> tp.Dict[str, jax.Array]:
    if isinstance(y, (dict, FrozenDict)):
        return dict(y)
    return {"out": y}


#: remat policies by name:
#: - 'dots' saves only dot_general results — in a conv net (convolutions are
#:   NOT dots) that is essentially nothing, so the whole forward is
#:   recomputed in the backward pass.  On v5e it shrinks live activation
#:   memory enough to raise the flagship UNet++ 256² bf16 batch from 56 to
#:   128 — 270 -> 450 img/s/chip (benchmarks/batch_remat_sweep.py).
#: - 'conv_outs' saves exactly the MXU results (every ConvBlock/TransConv
#:   output carries ``checkpoint_name(x, 'conv_out')``, ops/blocks.py) and
#:   recomputes the cheap elementwise tail (BN-apply, activations, concats,
#:   pooling) in the backward pass — the true dots-equivalent for conv nets.
#: - 'full' saves nothing.
REMAT_POLICIES = {"dots": "checkpoint_dots", "full": "nothing_saveable",
                  "conv_outs": ("save_only_these_names", ("conv_out",))}


def _remat_policy(name: tp.Optional[str]):
    if not name:
        return None
    try:
        attr = REMAT_POLICIES[name]
    except KeyError:
        raise ValueError(f"unknown remat policy {name!r}; "
                         f"expected one of {sorted(REMAT_POLICIES)}")
    attr, factory_args = attr if isinstance(attr, tuple) else (attr, None)
    try:
        policy = getattr(jax.checkpoint_policies, attr)
    except AttributeError:
        raise ValueError(
            f"this jax version ({jax.__version__}) has no "
            f"jax.checkpoint_policies.{attr}; remat policy {name!r} "
            f"is unavailable here")
    return policy(*factory_args) if factory_args is not None else policy


def make_train_step(
    model,
    optimizer: optax.GradientTransformation,
    loss_fn: LossFn,
    loss_weights: tp.Optional[tp.Dict[str, float]] = None,
    metrics: tp.Sequence[Metric] = (),
    seed: int = 0,
    remat: tp.Optional[str] = None,
    accum_steps: int = 1,
    ema_decay: float = 0.0,
) -> tp.Callable:
    """Build the fused train step: forward + DS loss + backward + update +
    metric accumulation, one compiled program.

    ``remat`` ('dots'/'full') rematerializes the forward under
    ``jax.checkpoint`` — numerically identical, trades recompute FLOPs for
    activation memory (larger batches).

    ``accum_steps`` > 1 splits the incoming batch into that many
    microbatches, runs them through a ``lax.scan`` accumulating gradients
    (averaged — identical to the full-batch mean-loss gradient for
    BN-free models; with BatchNorm the running stats advance once per
    microbatch, like N successive small steps), and applies the optimizer
    ONCE.  This is how effective batches grow past the device/compiler
    memory ceiling — e.g. effective 512 = 4 x 128 on v5e where 136+
    fails to compile.  Composes with ``remat``.

    ``ema_decay`` > 0 (with a state created under ``ema=True``) maintains
    an exponential moving average of the params inside the same compiled
    step; eval/predict then run on the EMA shadow (``state.eval_params``)."""
    policy = _remat_policy(remat)
    if accum_steps < 1:
        raise ValueError(f"accum_steps must be >= 1, got {accum_steps}")

    def loss_for(params, batch_stats, xi, targets_i, rngs):
        variables = {"params": params}
        mutable: tp.List[str] = []
        if batch_stats:
            variables["batch_stats"] = batch_stats
            mutable = ["batch_stats"]
        if mutable:
            outputs, updated = model.apply(variables, xi, train=True,
                                           mutable=mutable, rngs=rngs)
            new_bs = updated["batch_stats"]
        else:
            outputs = model.apply(variables, xi, train=True, rngs=rngs)
            new_bs = batch_stats
        outputs32 = jax.tree.map(lambda t: t.astype(jnp.float32), outputs)
        loss = deep_supervision_loss(loss_fn, outputs32, targets_i,
                                     loss_weights)
        return loss, (outputs32, new_bs)

    def train_step(state: TrainState, x: jax.Array, y,
                   metric_states: tp.Tuple = ()):
        targets = _as_target_dict(y)

        # dropout/DropBlock rngs: deterministic per step, derived from the
        # trainer seed so different seeds/folds draw different noise
        # (SAUNet's DropBlock and AlbuNet's MLP dropout use this stream)
        base_rng = jax.random.fold_in(jax.random.PRNGKey(seed), state.step)

        if accum_steps == 1:
            def loss_inner(params):
                return loss_for(params, state.batch_stats, x, targets,
                                {"dropout": base_rng})

            inner = (jax.checkpoint(loss_inner, policy=policy)
                     if policy is not None else loss_inner)
            (loss, (outputs, new_bs)), grads = jax.value_and_grad(
                inner, has_aux=True)(state.params)
            new_metric_states = tuple(
                m.update(s, targets["out"], outputs["out"])
                for m, s in zip(metrics, metric_states))
        else:
            if x.shape[0] % accum_steps:
                raise ValueError(
                    f"batch {x.shape[0]} not divisible by "
                    f"accum_steps={accum_steps}")
            mb = x.shape[0] // accum_steps

            def split(t):
                return t.reshape((accum_steps, mb) + t.shape[1:])

            xs = split(x)
            ts = jax.tree.map(split, targets)

            def loss_mb(params, bs, xi, ti, rng):
                return loss_for(params, bs, xi, ti, {"dropout": rng})

            grad_mb = jax.value_and_grad(
                jax.checkpoint(loss_mb, policy=policy)
                if policy is not None else loss_mb, has_aux=True)

            zero_grads = jax.tree.map(jnp.zeros_like, state.params)

            def body(carry, inp):
                bs, acc, msts, loss_sum = carry
                i, xi, ti = inp
                rng = jax.random.fold_in(base_rng, i)
                (loss_i, (outs, new_bs)), g = grad_mb(state.params, bs,
                                                      xi, ti, rng)
                acc = jax.tree.map(jnp.add, acc, g)
                msts = tuple(m.update(s, ti["out"], outs["out"])
                             for m, s in zip(metrics, msts))
                return (new_bs, acc, msts, loss_sum + loss_i), None

            carry0 = (state.batch_stats, zero_grads, tuple(metric_states),
                      jnp.zeros((), jnp.float32))
            (new_bs, acc, new_metric_states, loss_sum), _ = jax.lax.scan(
                body, carry0, (jnp.arange(accum_steps), xs, ts))
            grads = jax.tree.map(lambda g: g / accum_steps, acc)
            loss = loss_sum / accum_steps

        updates, new_opt = optimizer.update(grads, state.opt_state,
                                            state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=new_params,
                                  batch_stats=new_bs, opt_state=new_opt)
        if state.ema_params is not None and ema_decay > 0.0:
            # fused into the same compiled step: one multiply-add per
            # param — negligible next to the conv work
            d = jnp.asarray(ema_decay, jnp.float32)
            new_ema = jax.tree.map(
                lambda e, p: (e * d + p.astype(jnp.float32) * (1.0 - d)
                              ).astype(e.dtype),
                state.ema_params, new_params)
            new_state = new_state.replace(ema_params=new_ema)
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
        variables = {"params": state.eval_params}
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
        variables = {"params": state.eval_params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        return model.apply(variables, x, train=False)

    return predict_step
