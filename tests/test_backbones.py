"""Backbone zoo: tap pyramid shapes + encoder-model integration."""
import jax
import jax.numpy as jnp
import pytest

from tf_1d_2d_segmentation_end2endpipelines_tpu.models import SegModel
from tf_1d_2d_segmentation_end2endpipelines_tpu.models.backbones import (
    BACKBONE_NAMES, get_backbone)

FAST = ["ResNet50", "VGG16", "DenseNet121", "MobileNetV2",
        "EfficientNetB0"]


def test_registry_covers_reference_encoders():
    # the 28 encoder names of model_selector.py:76-716 (+5 EfficientNetV2
    # mid sizes / CheXNet variants counted in the 33)
    assert len(BACKBONE_NAMES) == 33
    for name in ("ResNet152V2", "InceptionResNetV2", "EfficientNetB7",
                 "EfficientNetV2L", "CheXNet", "MobileNetV3Small"):
        assert name in BACKBONE_NAMES


@pytest.mark.parametrize("name", FAST)
def test_backbone_tap_pyramid(name):
    bb = get_backbone(name)
    x = jnp.ones((1, 64, 64, 3))
    taps = jax.eval_shape(
        lambda: bb.init_with_output(jax.random.PRNGKey(0), x)[0])
    sizes = [tuple(t.shape)[1:3] for t in taps]
    assert sizes == [(64, 64), (32, 32), (16, 16), (8, 8), (4, 4), (2, 2)]


def test_pretrained_encoder_unet():
    x = jnp.ones((1, 32, 32, 3))
    m = SegModel(decoder_name="UNet", model_width=4, model_depth=4,
                 train_mode="pretrained_encoder", backbone="MobileNetV2")
    vs = jax.jit(m.init)(jax.random.PRNGKey(0), x)
    out = jax.jit(lambda v, x: m.apply(v, x))(vs, x)
    assert out["out"].shape == (1, 32, 32, 1)


def test_all_backbones_shape_only():
    x = jnp.ones((1, 64, 64, 3))
    for name in BACKBONE_NAMES:
        bb = get_backbone(name)
        taps = jax.eval_shape(
            lambda bb=bb: bb.init_with_output(jax.random.PRNGKey(0), x)[0])
        assert len(taps) == 6, name
        assert tuple(taps[5].shape)[1:3] == (2, 2), name
