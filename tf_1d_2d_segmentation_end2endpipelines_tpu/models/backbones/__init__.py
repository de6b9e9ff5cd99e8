"""Pretrained-encoder backbone zoo (the reference's 28 encoder options,
2DCNN/models/unet_variants.py:1045-3502).

Every backbone is a Flax module returning the reference's 6 skip taps:
``taps[i]`` at stride ``2**i`` for i in 0..5 (tap 0 is the input itself,
matching ``layers[0].output``; tap 5 is the stride-32 bottleneck used when
model_depth == 5).

ImageNet weights: the reference downloads them through
``tf.keras.applications``; this environment has no network egress, so
backbones initialize randomly here and ``utils.keras_compat`` provides the
conversion path for checkpoints supplied on disk.  CheXNet additionally
expects a local ``CheXNet_TF_Weights.h5`` (unet_variants.py:3428-3502) --
same gating.
"""
from __future__ import annotations

import typing as tp

import jax.numpy as jnp

from .convnets import (
    DenseNetBackbone,
    MobileNetBackbone,
    MobileNetV2Backbone,
    MobileNetV3Backbone,
    ResNetBackbone,
    ResNetV2Backbone,
    VGGBackbone,
)
from .efficientnet import EfficientNetBackbone, EfficientNetV2Backbone
from .inception import InceptionResNetV2Backbone, InceptionV3Backbone

#: name -> zero-arg factory kwargs; mirrors the reference's encoder-name
#: dispatch table (models/model_selector.py:76-716)
_REGISTRY: tp.Dict[str, tp.Callable[..., tp.Any]] = {
    "ResNet50": lambda **kw: ResNetBackbone(blocks=(3, 4, 6, 3), **kw),
    "ResNet101": lambda **kw: ResNetBackbone(blocks=(3, 4, 23, 3), **kw),
    "ResNet152": lambda **kw: ResNetBackbone(blocks=(3, 8, 36, 3), **kw),
    "ResNet50V2": lambda **kw: ResNetV2Backbone(blocks=(3, 4, 6, 3), **kw),
    "ResNet101V2": lambda **kw: ResNetV2Backbone(blocks=(3, 4, 23, 3), **kw),
    "ResNet152V2": lambda **kw: ResNetV2Backbone(blocks=(3, 8, 36, 3), **kw),
    "VGG16": lambda **kw: VGGBackbone(convs=(2, 2, 3, 3, 3), **kw),
    "VGG19": lambda **kw: VGGBackbone(convs=(2, 2, 4, 4, 4), **kw),
    "DenseNet121": lambda **kw: DenseNetBackbone(blocks=(6, 12, 24, 16), **kw),
    "DenseNet169": lambda **kw: DenseNetBackbone(blocks=(6, 12, 32, 32), **kw),
    "DenseNet201": lambda **kw: DenseNetBackbone(blocks=(6, 12, 48, 32), **kw),
    "CheXNet": lambda **kw: DenseNetBackbone(blocks=(6, 12, 24, 16), **kw),
    "MobileNet": lambda **kw: MobileNetBackbone(**kw),
    "MobileNetV2": lambda **kw: MobileNetV2Backbone(**kw),
    "MobileNetV3Small": lambda **kw: MobileNetV3Backbone(size="small", **kw),
    "MobileNetV3Large": lambda **kw: MobileNetV3Backbone(size="large", **kw),
    "InceptionV3": lambda **kw: InceptionV3Backbone(**kw),
    "InceptionResNetV2": lambda **kw: InceptionResNetV2Backbone(**kw),
    "EfficientNetB0": lambda **kw: EfficientNetBackbone(width=1.0, depth=1.0, **kw),
    "EfficientNetB1": lambda **kw: EfficientNetBackbone(width=1.0, depth=1.1, **kw),
    "EfficientNetB2": lambda **kw: EfficientNetBackbone(width=1.1, depth=1.2, **kw),
    "EfficientNetB3": lambda **kw: EfficientNetBackbone(width=1.2, depth=1.4, **kw),
    "EfficientNetB4": lambda **kw: EfficientNetBackbone(width=1.4, depth=1.8, **kw),
    "EfficientNetB5": lambda **kw: EfficientNetBackbone(width=1.6, depth=2.2, **kw),
    "EfficientNetB6": lambda **kw: EfficientNetBackbone(width=1.8, depth=2.6, **kw),
    "EfficientNetB7": lambda **kw: EfficientNetBackbone(width=2.0, depth=3.1, **kw),
    "EfficientNetV2B0": lambda **kw: EfficientNetV2Backbone(size="b0", **kw),
    "EfficientNetV2B1": lambda **kw: EfficientNetV2Backbone(size="b1", **kw),
    "EfficientNetV2B2": lambda **kw: EfficientNetV2Backbone(size="b2", **kw),
    "EfficientNetV2B3": lambda **kw: EfficientNetV2Backbone(size="b3", **kw),
    "EfficientNetV2S": lambda **kw: EfficientNetV2Backbone(size="s", **kw),
    "EfficientNetV2M": lambda **kw: EfficientNetV2Backbone(size="m", **kw),
    "EfficientNetV2L": lambda **kw: EfficientNetV2Backbone(size="l", **kw),
}

BACKBONE_NAMES = tuple(_REGISTRY)


def get_backbone(name: str, dtype=jnp.float32, max_tap: int = 5):
    """``max_tap``: deepest tap index to compute (taps[0..max_tap]).  At
    model_depth < 5 the reference's Keras graphs prune the encoder stages
    unreachable from the used taps; passing the matching ``max_tap`` keeps
    params, compute, and converted checkpoints identical (see
    ResNetBackbone docstring)."""
    if name not in _REGISTRY:
        raise ValueError(
            f"Unknown backbone {name!r}; available: {BACKBONE_NAMES}")
    return _REGISTRY[name](dtype=dtype, max_tap=max_tap)
