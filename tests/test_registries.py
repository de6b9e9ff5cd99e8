"""Loss / metric / optimizer registries: every reference name resolves and
computes finite values (registry parity with tf_losses.py / tf_metrics.py /
tf_optimizers.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tf_1d_2d_segmentation_end2endpipelines_tpu.train import (
    LOSSES, METRIC_NAMES, OPTIMIZER_NAMES, default_ds_weights,
    deep_supervision_loss, get_loss, make_metric, make_optimizer)
from tf_1d_2d_segmentation_end2endpipelines_tpu.train.optimizers import (
    get_learning_rate, set_learning_rate)

rng = np.random.default_rng(0)
Y_TRUE = jnp.asarray((rng.uniform(size=(4, 16, 2)) > 0.5).astype(np.float32))
Y_PRED = jnp.asarray(rng.uniform(0.01, 0.99, size=(4, 16, 2)).astype(
    np.float32))


@pytest.mark.parametrize("name", sorted(LOSSES))
def test_every_loss_computes(name):
    fn = get_loss(name)
    if name == "SparseCategoricalCrossentropy":
        val = fn(jnp.argmax(Y_TRUE, -1), Y_PRED / Y_PRED.sum(-1,
                                                             keepdims=True))
    else:
        val = fn(Y_TRUE, Y_PRED)
    assert np.isfinite(float(val)), name


def test_loss_values_match_keras_formulas():
    # spot values: BCE on known inputs
    t = jnp.asarray([[1.0, 0.0]])
    p = jnp.asarray([[0.8, 0.2]])
    bce = float(get_loss("BinaryCrossentropy")(t, p))
    assert abs(bce - (-np.log(0.8))) < 1e-5
    mse = float(get_loss("MeanSquaredError")(t, p))
    assert abs(mse - np.mean((np.array([1, 0]) - np.array([.8, .2]))**2)) \
        < 1e-6


@pytest.mark.parametrize("name", METRIC_NAMES)
def test_every_metric_streams(name):
    m = make_metric(name, num_classes=2)
    state = m.init()
    if name in ("IoU", "MeanIoU"):
        state = m.update(state, jnp.argmax(Y_TRUE, -1), jnp.argmax(Y_PRED,
                                                                   -1))
    elif "Sparse" in name:
        state = m.update(state, jnp.argmax(Y_TRUE, -1), Y_PRED)
    else:
        state = m.update(state, Y_TRUE, Y_PRED)
    assert np.isfinite(float(m.result(state))), name


def test_metric_states_merge_additively():
    m = make_metric("BinaryAccuracy")
    s1 = m.update(m.init(), Y_TRUE[:2], Y_PRED[:2])
    s2 = m.update(m.init(), Y_TRUE[2:], Y_PRED[2:])
    merged = jax.tree.map(jnp.add, s1, s2)
    full = m.update(m.init(), Y_TRUE, Y_PRED)
    assert abs(float(m.result(merged)) - float(m.result(full))) < 1e-6


@pytest.mark.parametrize("name", OPTIMIZER_NAMES)
def test_every_optimizer_steps(name):
    opt = make_optimizer(name, 1e-3)
    params = {"w": jnp.ones((4, 4)), "b": jnp.zeros((4,))}
    state = opt.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, state = opt.update(grads, state, params)
    assert all(np.isfinite(np.asarray(u)).all()
               for u in jax.tree.leaves(updates)), name
    # runtime LR adjustment (ReduceLROnPlateau hook)
    state = set_learning_rate(state, 5e-4)
    assert abs(get_learning_rate(state) - 5e-4) < 1e-9


def test_ds_weights_and_multihead_loss():
    w = default_ds_weights(3)
    assert w == {"out": 1.0, "level1": 0.9, "level2": 0.8, "level3": 0.7}
    fn = get_loss("MeanAbsoluteError")
    outputs = {"out": Y_PRED, "level1": Y_PRED}
    targets = {"out": Y_TRUE, "level1": Y_TRUE}
    total = float(deep_supervision_loss(fn, outputs, targets, w))
    single = float(fn(Y_TRUE, Y_PRED))
    assert abs(total - 1.9 * single) < 1e-5
