"""Gradient clipping (clipnorm / clipvalue / global_clipnorm) — Keras
optimizer-kwarg semantics the reference's registry never exposed
(utils/tf_optimizers.py:10-28 passes only the LR), applied to the raw
gradients before the optimizer statistics."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tf_1d_2d_segmentation_end2endpipelines_tpu.train import make_optimizer
from tf_1d_2d_segmentation_end2endpipelines_tpu.train.optimizers import (
    get_learning_rate, set_learning_rate)


def _apply(tx, grads, params):
    state = tx.init(params)
    updates, _ = tx.update(grads, state, params)
    return updates


_PARAMS = {"a": jnp.zeros(3), "b": jnp.zeros(2)}
_GRADS = {"a": jnp.array([3.0, 4.0, 0.0]),   # ||a|| = 5
          "b": jnp.array([0.3, -0.4])}       # ||b|| = 0.5


def test_clipnorm_clips_each_variable_to_its_own_norm():
    tx = make_optimizer("SGD", 1.0, clipnorm=1.0)
    upd = _apply(tx, _GRADS, _PARAMS)
    # 'a' (norm 5) is rescaled to norm 1; 'b' (norm 0.5) is untouched
    np.testing.assert_allclose(np.asarray(upd["a"]),
                               -np.array([0.6, 0.8, 0.0]), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(upd["b"]),
                               -np.array([0.3, -0.4]), rtol=1e-6)


def test_global_clipnorm_clips_the_whole_gradient():
    tx = make_optimizer("SGD", 1.0, global_clipnorm=1.0)
    upd = _apply(tx, _GRADS, _PARAMS)
    gnorm = float(np.sqrt(sum(
        float(jnp.sum(v ** 2)) for v in upd.values())))
    assert gnorm == pytest.approx(1.0, rel=1e-5)
    # direction preserved: every leaf scaled by the same global factor
    scale = 1.0 / np.sqrt(25.0 + 0.25)
    np.testing.assert_allclose(np.asarray(upd["a"]),
                               -np.asarray(_GRADS["a"]) * scale, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(upd["b"]),
                               -np.asarray(_GRADS["b"]) * scale, rtol=1e-5)


def test_clipvalue_clips_elementwise():
    tx = make_optimizer("SGD", 1.0, clipvalue=0.35)
    upd = _apply(tx, _GRADS, _PARAMS)
    np.testing.assert_allclose(np.asarray(upd["a"]),
                               -np.array([0.35, 0.35, 0.0]), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(upd["b"]),
                               -np.array([0.3, -0.35]), rtol=1e-6)


def test_zero_means_off():
    tx = make_optimizer("SGD", 1.0)
    upd = _apply(tx, _GRADS, _PARAMS)
    np.testing.assert_allclose(np.asarray(upd["a"]),
                               -np.asarray(_GRADS["a"]), rtol=1e-6)


def test_runtime_lr_hook_survives_clipping():
    """RLRoP mutates the injected LR at runtime; the clip chain must not
    bury the InjectHyperparams state."""
    tx = make_optimizer("Adam", 1e-3, clipnorm=1.0, clipvalue=1.0,
                        global_clipnorm=5.0)
    state = tx.init(_PARAMS)
    assert get_learning_rate(state) == pytest.approx(1e-3)
    state = set_learning_rate(state, 5e-4)
    assert get_learning_rate(state) == pytest.approx(5e-4)
    upd, _ = tx.update(_GRADS, state, _PARAMS)
    assert all(np.isfinite(np.asarray(v)).all() for v in upd.values())


def test_clipping_ini_round_trip(tmp_path):
    from tf_1d_2d_segmentation_end2endpipelines_tpu.utils.config import (
        TrainConfig, load_train_config, save_train_config)
    path = str(tmp_path / "cfg.ini")
    save_train_config(TrainConfig(clipnorm=1.5, clipvalue=0.5,
                                  global_clipnorm=10.0), path)
    cfg = load_train_config(path)
    assert cfg.clipnorm == pytest.approx(1.5)
    assert cfg.clipvalue == pytest.approx(0.5)
    assert cfg.global_clipnorm == pytest.approx(10.0)
