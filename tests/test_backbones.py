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


tf_mod = None
try:
    import tensorflow as tf_mod
except Exception:
    pass


@pytest.mark.skipif(tf_mod is None, reason="needs tensorflow")
def test_reference_mobilenetv3_taps_broken():
    """The reference's MobileNetV3 pretrained path (unet_variants.py:
    2049-2079) taps auto-numbered layer names (re_lu_22, re_lu_31) that do
    NOT exist under the installed Keras 3, and the names that do resolve
    include 1x1 squeeze-excite tensors — the reference's own encoder path
    is unbuildable here, so this framework implements the documented
    intent taps instead (models/backbones/convnets.py)."""
    # keras auto-numbering is a process-global counter — itself the
    # fragility at issue; reset it so the reference's fresh-process
    # numbering is reproduced
    tf_mod.keras.backend.clear_session()
    m = tf_mod.keras.applications.MobileNetV3Small(
        include_top=False, weights=None, input_shape=(224, 224, 3))
    with pytest.raises(ValueError):
        m.get_layer("re_lu_22")
    with pytest.raises(ValueError):
        m.get_layer("re_lu_31")
    # 're_lu_7' resolves but is a 1x1 squeeze-excite map — spatially
    # unusable as the reference's (w/8, h/8) level-4 skip
    assert m.get_layer("re_lu_7").output.shape[1] == 1


@pytest.mark.skipif(tf_mod is None, reason="needs tensorflow")
def test_reference_inception_taps_broken():
    """InceptionV3: the reference's taps (unet_variants.py:2203-2221)
    resolve but are VALID-stem sizes (125/60/29/14 at 256²) — its decoder's
    transposed-conv upsample (2x) of the 14px tap gives 28px which cannot
    concat with the 29px skip, so the reference's own InceptionV3+UNet
    crashes.  InceptionResNetV2's tap names (:2286-2304) do not even
    resolve under Keras 3."""
    tf_mod.keras.backend.clear_session()
    m = tf_mod.keras.applications.InceptionV3(
        include_top=False, weights=None, input_shape=(256, 256, 3))
    shapes = [m.get_layer(n).output.shape[1]
              for n in ("activation_2", "activation_4", "activation_28",
                        "activation_67")]
    assert shapes == [125, 60, 29, 14]  # 2*14 == 28 != 29: concat crash
    m2 = tf_mod.keras.applications.InceptionResNetV2(
        include_top=False, weights=None, input_shape=(256, 256, 3))
    with pytest.raises(ValueError):
        m2.get_layer("activation_74")
