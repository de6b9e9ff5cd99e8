"""Evaluation: confusion-matrix table vs sklearn, NILM metric values."""
import numpy as np
import jax.numpy as jnp

from tf_1d_2d_segmentation_end2endpipelines_tpu.eval import (
    calculate_deoi, calculate_ea, calculate_jeoi, calculate_sae,
    confusion_matrix_update, construction_error, dice, evaluation_table,
    init_confusion_matrix, one_hot_encoding, per_class_binary_counts,
    reverse_one_hot_encoding)


def test_confusion_matrix_vs_sklearn():
    from sklearn.metrics import confusion_matrix, multilabel_confusion_matrix
    rng = np.random.default_rng(0)
    y_true = rng.integers(0, 3, 1000)
    y_pred = rng.integers(0, 3, 1000)
    cm = confusion_matrix_update(init_confusion_matrix(3),
                                 jnp.asarray(y_true), jnp.asarray(y_pred))
    np.testing.assert_array_equal(np.asarray(cm),
                                  confusion_matrix(y_true, y_pred,
                                                   labels=[0, 1, 2]))
    per = per_class_binary_counts(np.asarray(cm))
    np.testing.assert_array_equal(
        per, multilabel_confusion_matrix(y_true, y_pred, labels=[0, 1, 2]))


def test_evaluation_table_formulas():
    # hand-checkable 2-class case (Test.py:232-262 formulas)
    cm = np.array([[80.0, 20.0], [10.0, 90.0]])
    rep = evaluation_table(cm, ["bg", "fg"])
    # class fg: TP=90 FN=10 FP=20 TN=80
    acc, prec, sens, f1, spec, dsc, iou = rep["per_class"][1]
    assert acc == round(100 * 170 / 200, 2)
    assert prec == round(100 * 90 / 110, 2)
    assert sens == round(100 * 90 / 100, 2)
    assert dsc == round(100 * 180 / (180 + 20 + 10), 2)
    assert iou == round(100 * 90 / 120, 2)
    assert rep["overall_accuracy"] == round(100 * 170 / 200, 2)


def test_one_hot_roundtrip_and_dice():
    labels = np.array([[0, 1], [2, 1]])
    oh = one_hot_encoding(labels, 3)
    assert oh.shape == (2, 2, 3)
    np.testing.assert_array_equal(reverse_one_hot_encoding(oh), labels)
    assert abs(dice(np.ones(10), np.ones(10)) - 1.0) < 1e-6


def test_nilm_metrics():
    g = np.array([[0.0, 1.0, 2.0, 1.0]])
    p = np.array([[0.0, 1.0, 2.0, 1.0]])
    assert calculate_sae(g, p) == 0.0
    assert calculate_ea(g, p) == 1.0
    assert calculate_jeoi(g, p) == 1.0
    assert calculate_deoi(g, p) == 1.0
    p2 = np.array([[0.0, 0.5, 2.0, 1.0]])
    # EO=3.5, EE=0, EM=0.5 -> JEOI=3.5/4, DEOI=7/7.5
    assert abs(calculate_jeoi(g, p2) - round(3.5 / 4.0, 4)) < 1e-9
    assert abs(calculate_deoi(g, p2) - round(7.0 / 7.5, 4)) < 1e-9
    err = construction_error(g + 1, p2 + 1)  # +1 avoids zero-variance skip
    assert np.isfinite(err["MAE"]) and np.isfinite(err["PCC"])


def test_confusion_matrix_int64_exact_above_2_24():
    """Counts past 2**24 must stay integer-exact (float32 accumulation
    silently rounds: 2**24 + 1 == 2**24 in f32)."""
    cm = init_confusion_matrix(2)
    assert cm.dtype == np.int64
    cm[0, 0] = 2 ** 24
    cm = confusion_matrix_update(cm, np.zeros(3, np.int32),
                                 np.zeros(3, np.int32))
    assert cm[0, 0] == 2 ** 24 + 3
