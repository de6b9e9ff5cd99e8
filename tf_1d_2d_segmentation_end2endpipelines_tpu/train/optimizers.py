"""Optimizer registry (reference: 2DCNN/utils/tf_optimizers.py:10-28).

Eight optimizers by the reference's exact name strings, with the reference's
hyperparameters, built on optax.  The learning rate is injected as an optax
schedule or float so ReduceLROnPlateau can rescale it at runtime via
``optax.inject_hyperparams`` (the train loop mutates
``opt_state.hyperparams['learning_rate']``).
"""
from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
import optax


def _ftrl(learning_rate: float, learning_rate_power: float = -0.5,
          initial_accumulator_value: float = 0.1,
          l1: float = 0.0, l2: float = 0.0) -> optax.GradientTransformation:
    """FTRL-proximal (optax has no built-in; Keras-default hyperparams)."""

    def init_fn(params):
        accum = jax.tree.map(
            lambda p: jnp.full_like(p, initial_accumulator_value), params)
        linear = jax.tree.map(jnp.zeros_like, params)
        return (accum, linear)

    def update_fn(grads, state, params):
        if params is None:
            raise ValueError("FTRL requires params")
        accum, linear = state
        new_accum = jax.tree.map(lambda n, g: n + g * g, accum, grads)

        def _lin(l, g, n_new, n_old, p):
            sigma = (jnp.power(n_new, -learning_rate_power)
                     - jnp.power(n_old, -learning_rate_power)) / learning_rate
            return l + g - sigma * p

        new_linear = jax.tree.map(_lin, linear, grads, new_accum, accum, params)

        def _new_p(l, n_new):
            quad = jnp.power(n_new, -learning_rate_power) / learning_rate + 2 * l2
            pre = jnp.clip(l, -l1, l1) - l if l1 > 0 else -l
            return pre / quad

        new_params = jax.tree.map(_new_p, new_linear, new_accum)
        updates = jax.tree.map(lambda np_, p: np_ - p, new_params, params)
        return updates, (new_accum, new_linear)

    return optax.GradientTransformation(init_fn, update_fn)


def _clip_by_per_variable_norm(max_norm: float
                               ) -> optax.GradientTransformation:
    """Keras ``clipnorm`` semantics: clip each variable's gradient to
    ``max_norm`` by ITS OWN L2 norm (optax's built-in clips the global
    norm, which is Keras ``global_clipnorm``)."""

    def update_fn(updates, state, params=None):
        del params

        def _clip(g):
            norm = jnp.sqrt(jnp.sum(jnp.square(g)))
            scale = jnp.minimum(1.0, max_norm / jnp.maximum(norm, 1e-12))
            return g * scale

        return jax.tree.map(_clip, updates), state

    return optax.GradientTransformation(lambda params: optax.EmptyState(),
                                        update_fn)


def make_optimizer(name: str, learning_rate: float,
                   clipnorm: float = 0.0, clipvalue: float = 0.0,
                   global_clipnorm: float = 0.0
                   ) -> optax.GradientTransformation:
    """Build an optimizer by the reference's name string, wrapped in
    ``inject_hyperparams`` so the LR is runtime-adjustable (RLRoP).

    Gradient clipping (0 = off) follows the Keras optimizer kwargs the
    reference's registry doesn't expose but production training needs:
    ``clipnorm`` (per-variable L2), ``clipvalue`` (elementwise),
    ``global_clipnorm`` (whole-gradient L2, optax clip_by_global_norm).
    Clips apply to the raw gradients BEFORE the optimizer statistics,
    matching Keras's base-optimizer order.
    """
    key = name

    if key == "Adam":
        fac = lambda learning_rate: optax.adam(
            learning_rate, b1=0.9, b2=0.999, eps=1e-7)
    elif key == "Adadelta":
        fac = lambda learning_rate: optax.adadelta(
            learning_rate, rho=0.95, eps=1e-7)
    elif key == "Adagrad":
        fac = lambda learning_rate: optax.adagrad(
            learning_rate, initial_accumulator_value=0.1, eps=1e-7)
    elif key == "Adamax":
        fac = lambda learning_rate: optax.adamax(
            learning_rate, b1=0.9, b2=0.999, eps=1e-7)
    elif key == "FTRL":
        fac = lambda learning_rate: _ftrl(learning_rate)
    elif key == "Nadam":
        fac = lambda learning_rate: optax.nadam(
            learning_rate, b1=0.9, b2=0.999, eps=1e-7)
    elif key == "RMSprop":
        fac = lambda learning_rate: optax.rmsprop(
            learning_rate, decay=0.9, eps=1e-7, centered=False, momentum=None)
    elif key == "SGD":
        fac = lambda learning_rate: optax.sgd(learning_rate, momentum=None,
                                              nesterov=False)
    else:
        raise ValueError(
            "Please select a valid optimizer. Check for spelling mistakes, "
            f"capital/small letters, etc. (got {name!r})")

    clips = []
    if global_clipnorm:
        clips.append(optax.clip_by_global_norm(global_clipnorm))
    if clipnorm:
        clips.append(_clip_by_per_variable_norm(clipnorm))
    if clipvalue:
        clips.append(optax.clip(clipvalue))
    if clips:
        # chain inside the injected factory so the InjectHyperparams
        # state (the runtime-LR hook) stays the outermost state
        base_fac = fac
        fac = lambda learning_rate: optax.chain(
            *clips, base_fac(learning_rate))
    return optax.inject_hyperparams(fac)(learning_rate=learning_rate)


OPTIMIZER_NAMES = ("Adam", "Adadelta", "Adagrad", "Adamax", "FTRL", "Nadam",
                   "RMSprop", "SGD")


def freeze_subtrees(optimizer: optax.GradientTransformation,
                    frozen_prefixes: tp.Sequence[str]
                    ) -> optax.GradientTransformation:
    """Freeze parameter subtrees whose path contains any given token.

    The reference's pretrained-encoder mode sets
    ``Base_Model.trainable = is_base_model_trainable``
    (unet_variants.py:1058) and the fine-tune stage unfreezes it with a
    lower LR (2D notebook cells 53-55).  Here freezing is an optax
    partition: frozen subtrees get ``set_to_zero`` (e.g. token
    'Backbone' freezes every encoder-backbone submodule).
    """
    if not frozen_prefixes:
        return optimizer

    def label_fn(params):
        def mark(path, tree):
            if isinstance(tree, dict):
                return {k: mark(f"{path}/{k}" if path else k, v)
                        for k, v in tree.items()}
            frozen = any(tok in path for tok in frozen_prefixes)
            return "frozen" if frozen else "trainable"

        return mark("", params)

    return optax.multi_transform(
        {"trainable": optimizer, "frozen": optax.set_to_zero()}, label_fn)


def _find_hyperparams(opt_state):
    """Locate the InjectHyperparams state (walks through multi_transform /
    masked wrappers used by freeze_subtrees)."""
    if hasattr(opt_state, "hyperparams"):
        return opt_state
    if hasattr(opt_state, "inner_states"):
        return _find_hyperparams(opt_state.inner_states["trainable"])
    if hasattr(opt_state, "inner_state"):
        return _find_hyperparams(opt_state.inner_state)
    raise ValueError("no InjectHyperparams state found")


def set_learning_rate(opt_state, lr: float):
    """Return opt_state with a new injected learning rate (RLRoP hook)."""
    hp = _find_hyperparams(opt_state)
    hp.hyperparams["learning_rate"] = jnp.asarray(
        lr, dtype=hp.hyperparams["learning_rate"].dtype)
    return opt_state


def get_learning_rate(opt_state) -> float:
    return float(_find_hyperparams(opt_state).hyperparams["learning_rate"])
