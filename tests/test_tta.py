"""Test-time augmentation: invertibility, equivariance exactness, driver
and serving wiring.

New capability over the reference (Test.py:161 predicts each image
exactly once); semantics pinned here: predictions from each view are
inverse-transformed back and the probability maps averaged.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tf_1d_2d_segmentation_end2endpipelines_tpu.eval.tta import (
    TTA_1D, TTA_2D, make_tta_fn, parse_tta)


@pytest.mark.parametrize("name", sorted(TTA_2D))
def test_2d_transforms_invert_exactly(name):
    fwd, inv = TTA_2D[name]
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 6, 6, 3)))
    np.testing.assert_array_equal(np.asarray(inv(fwd(x))), np.asarray(x))


def test_1d_flip_inverts_exactly():
    fwd, inv = TTA_1D["flip"]
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 9, 2)))
    np.testing.assert_array_equal(np.asarray(inv(fwd(x))), np.asarray(x))


def test_equivariant_fn_gives_identical_mean():
    """For a perfectly equivariant predictor (elementwise map), TTA must
    return EXACTLY the plain prediction — averaging adds nothing and
    the inverse mapping is bit-consistent."""
    def predict(x):
        return jax.nn.sigmoid(x[..., :1])

    x = jnp.asarray(np.random.default_rng(1).normal(size=(2, 8, 8, 3)),
                    jnp.float32)
    out = jax.jit(make_tta_fn(predict, ("hflip", "vflip", "hvflip",
                                        "rot90", "rot180", "rot270")))(x)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(predict(x)), atol=1e-6)


def test_non_equivariant_fn_changes_and_averages():
    """A position-dependent predictor must yield the hand-computed mean
    of the inverse-transformed views."""
    bias = jnp.arange(8.0).reshape(1, 1, 8, 1)

    def predict(x):
        return x[..., :1] + bias  # breaks hflip symmetry

    x = jnp.asarray(np.random.default_rng(2).normal(size=(1, 4, 8, 1)),
                    jnp.float32)
    got = make_tta_fn(predict, ("hflip",))(x)
    manual = (predict(x) + jnp.flip(predict(jnp.flip(x, 2)), 2)) / 2.0
    np.testing.assert_allclose(np.asarray(got), np.asarray(manual),
                               atol=1e-6)
    assert not np.allclose(np.asarray(got), np.asarray(predict(x)))


def test_tta_applies_per_leaf_on_head_dicts():
    """DS-style dict outputs: each head is inverse-transformed and
    averaged independently (lower-resolution heads included)."""
    def predict(x):
        return {"out": x, "level1": x[:, ::2, ::2, :]}

    x = jnp.asarray(np.random.default_rng(3).normal(size=(1, 8, 8, 2)),
                    jnp.float32)
    got = make_tta_fn(predict, ("vflip", "hvflip"))(x)
    assert set(got) == {"out", "level1"}
    np.testing.assert_allclose(np.asarray(got["out"]), np.asarray(x),
                               atol=1e-6)
    assert got["level1"].shape == (1, 4, 4, 2)


def test_parse_tta():
    assert parse_tta("") == ()
    assert parse_tta("none") == ()
    assert parse_tta("hflip, vflip") == ("hflip", "vflip")
    assert set(parse_tta("all")) == set(TTA_2D)
    assert set(parse_tta("all", square=False)) == {
        "hflip", "vflip", "hvflip"}
    assert parse_tta("flip", rank=1) == ("flip",)
    with pytest.raises(ValueError, match="unknown TTA"):
        parse_tta("sepia")
    with pytest.raises(ValueError, match="square"):
        parse_tta("rot90", square=False)
    # rot180 keeps the (H, W) shape, so non-square inputs are fine
    assert parse_tta("rot180", square=False) == ("rot180",)


def test_trainer_predict_tta_matches_manual():
    """Trainer.predict(tta=...) equals manually averaging the flipped
    predictions of the same trained model."""
    from tf_1d_2d_segmentation_end2endpipelines_tpu.data import (
        batches, synthetic_images)
    from tf_1d_2d_segmentation_end2endpipelines_tpu.models import SegModel
    from tf_1d_2d_segmentation_end2endpipelines_tpu.train import Trainer

    x, y = synthetic_images(8, size=16, channels=1)
    model = SegModel(decoder_name="UNet", model_width=4, model_depth=2,
                     output_nums=1, final_activation="sigmoid")
    tr = Trainer(model, loss="BinaryCrossentropy", learning_rate=1e-3)
    tr.init_state(x[:4])
    tr.fit(batches(x, y, 4), epochs=1, verbose=0)
    plain = tr.predict(x[:4])["out"]
    manual = (plain + np.flip(tr.predict(np.flip(x[:4], 2))["out"], 2)) / 2
    got = tr.predict(x[:4], tta=("hflip",))["out"]
    np.testing.assert_allclose(got, manual, atol=1e-5)


def test_predictor_tta_serving_path():
    """serve.Predictor(tta=...) runs and equals the manual average."""
    import flax.linen as nn
    from tf_1d_2d_segmentation_end2endpipelines_tpu.serve import Predictor

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            h = nn.Conv(4, (3, 3))(x)
            return {"out": nn.sigmoid(nn.Conv(1, (1, 1))(h))}

    model = Tiny()
    rng = np.random.default_rng(4)
    x = rng.normal(size=(2, 16, 16, 1)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x[:1]))

    class _State:
        params = variables["params"]
        batch_stats = {}

    plain = Predictor(model, _State(), (16, 16, 1), max_batch=2)
    ttap = Predictor(model, _State(), (16, 16, 1), max_batch=2,
                     tta=("hflip", "vflip"))
    base = plain(x)
    manual = (base
              + np.flip(plain(np.flip(x, 2)), 2)
              + np.flip(plain(np.flip(x, 1)), 1)) / 3.0
    np.testing.assert_allclose(ttap(x), manual, atol=1e-5)


def test_test_config_tta_ini_round_trip(tmp_path):
    import os
    from tf_1d_2d_segmentation_end2endpipelines_tpu.utils.config import (
        TestConfig, load_test_config, save_test_config)
    cfg = TestConfig(tta="hflip,vflip")
    path = os.path.join(str(tmp_path), "t.ini")
    save_test_config(cfg, path)
    assert load_test_config(path).tta == "hflip,vflip"
