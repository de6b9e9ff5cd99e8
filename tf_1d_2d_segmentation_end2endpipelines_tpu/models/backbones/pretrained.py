"""Pretrained-weight loading for backbones via Keras interop.

The reference downloads ImageNet weights through ``tf.keras.applications``
(e.g. unet_variants.py:1057).  This environment has no network egress, so
the path here is: build the matching ``keras.applications`` model (from a
local ``.h5`` when provided, else ``weights=None``), then convert by call
order (``utils.keras_compat``).

Exactness status: all 33 registry entries convert keras.applications
weights exactly (fixtures in tests/test_backbone_weights.py; compare with
jax_default_matmul_precision='highest' -- XLA:CPU's default conv precision
truncates at ~2.5e-3 relative).  For MobileNetV3 and InceptionV3/IRV2 the
conversion is exact but the TAPS implement the documented intent: the
reference's own tap names are broken or spatially unusable under the
installed Keras 3 (demonstrated in tests/test_backbones.py::
test_reference_mobilenetv3_taps_broken / test_reference_inception_taps_
broken); Inception backbones take pad='VALID' to mirror keras exactly for
fixtures and default to pad='SAME' so taps land on the power-of-two grid
the decoders need.
"""
from __future__ import annotations

import typing as tp

import jax


KERAS_BUILDERS = {
    "VGG16": ("tensorflow.keras.applications", "VGG16"),
    "VGG19": ("tensorflow.keras.applications", "VGG19"),
    "DenseNet121": ("tensorflow.keras.applications", "DenseNet121"),
    "DenseNet169": ("tensorflow.keras.applications", "DenseNet169"),
    "DenseNet201": ("tensorflow.keras.applications", "DenseNet201"),
    "ResNet50": ("tensorflow.keras.applications", "ResNet50"),
    "ResNet101": ("tensorflow.keras.applications", "ResNet101"),
    "ResNet152": ("tensorflow.keras.applications", "ResNet152"),
    "ResNet50V2": ("tensorflow.keras.applications", "ResNet50V2"),
    "ResNet101V2": ("tensorflow.keras.applications", "ResNet101V2"),
    "ResNet152V2": ("tensorflow.keras.applications", "ResNet152V2"),
    "MobileNet": ("tensorflow.keras.applications", "MobileNet"),
    "MobileNetV2": ("tensorflow.keras.applications", "MobileNetV2"),
    "MobileNetV3Small": ("tensorflow.keras.applications", "MobileNetV3Small"),
    "MobileNetV3Large": ("tensorflow.keras.applications", "MobileNetV3Large"),
    "InceptionV3": ("tensorflow.keras.applications", "InceptionV3"),
    "InceptionResNetV2": ("tensorflow.keras.applications",
                          "InceptionResNetV2"),
    "EfficientNetB0": ("tensorflow.keras.applications", "EfficientNetB0"),
    "EfficientNetB1": ("tensorflow.keras.applications", "EfficientNetB1"),
    "EfficientNetB2": ("tensorflow.keras.applications", "EfficientNetB2"),
    "EfficientNetB3": ("tensorflow.keras.applications", "EfficientNetB3"),
    "EfficientNetB4": ("tensorflow.keras.applications", "EfficientNetB4"),
    "EfficientNetB5": ("tensorflow.keras.applications", "EfficientNetB5"),
    "EfficientNetB6": ("tensorflow.keras.applications", "EfficientNetB6"),
    "EfficientNetB7": ("tensorflow.keras.applications", "EfficientNetB7"),
    "EfficientNetV2B0": ("tensorflow.keras.applications", "EfficientNetV2B0"),
    "EfficientNetV2B1": ("tensorflow.keras.applications", "EfficientNetV2B1"),
    "EfficientNetV2B2": ("tensorflow.keras.applications", "EfficientNetV2B2"),
    "EfficientNetV2B3": ("tensorflow.keras.applications", "EfficientNetV2B3"),
    "EfficientNetV2S": ("tensorflow.keras.applications", "EfficientNetV2S"),
    "EfficientNetV2M": ("tensorflow.keras.applications", "EfficientNetV2M"),
    "EfficientNetV2L": ("tensorflow.keras.applications", "EfficientNetV2L"),
}

EXACT_FAMILIES = ("VGG16", "VGG19", "DenseNet121", "DenseNet169",
                  "DenseNet201", "ResNet50", "ResNet101", "ResNet152",
                  "ResNet50V2", "ResNet101V2", "ResNet152V2", "MobileNet",
                  "MobileNetV2", "MobileNetV3Small", "MobileNetV3Large",
                  "InceptionV3", "InceptionResNetV2",
                  "EfficientNetB0", "EfficientNetB1", "EfficientNetB2",
                  "EfficientNetB3", "EfficientNetB4", "EfficientNetB5",
                  "EfficientNetB6", "EfficientNetB7", "EfficientNetV2B0",
                  "EfficientNetV2B1", "EfficientNetV2B2", "EfficientNetV2B3",
                  "EfficientNetV2S", "EfficientNetV2M", "EfficientNetV2L")


def load_backbone_weights(name: str, flax_backbone, sample: jax.Array,
                          weights: tp.Optional[str] = None) -> dict:
    """Return Flax variables for ``flax_backbone`` carrying Keras weights.

    ``weights``: None (random -- structure/parity testing), 'imagenet'
    (requires network or keras cache), or a local .h5 path.
    """
    if name == "CheXNet":
        # DenseNet121 arch + local CheXNet_TF_Weights.h5 (pass the .h5
        # path as ``weights``; reference unet_variants.py:3439-3445)
        return load_chexnet_weights(flax_backbone, sample, weights)
    if name not in KERAS_BUILDERS:
        raise NotImplementedError(
            f"exact keras.applications conversion implemented for "
            f"{EXACT_FAMILIES} plus CheXNet; unknown backbone {name!r}")
    import importlib
    from ...utils.keras_compat import (KerasCreationRecorder,
                                       convert_keras_weights)
    module_name, attr = KERAS_BUILDERS[name]
    mod = importlib.import_module(module_name)
    builder = getattr(mod, attr)
    with KerasCreationRecorder() as rec:
        kmodel = builder(include_top=False, weights=weights,
                         input_shape=tuple(sample.shape[1:]))
    # a truncated backbone (max_tap < 5) is a strict prefix of the full
    # keras.applications model in the shared creation order
    prefix = getattr(flax_backbone, "max_tap", 5) < 5
    return convert_keras_weights(kmodel, flax_backbone, sample,
                                 creation_order=rec.order,
                                 allow_prefix=prefix), kmodel


def backbone_creation_names(name: str, input_shape: tp.Tuple[int, ...]
                            ) -> tp.List[str]:
    """Weighted-layer NAMES of a fresh ``keras.applications`` backbone in
    creation order.  Used by ``tpuseg import-keras`` to rank the
    hand-named backbone layers inside a deserialized pretrained-encoder
    checkpoint (keras.applications names are fixed strings, so name
    equality pairs the fresh build with the loaded graph;
    utils/keras_compat.py::infer_creation_order)."""
    import importlib
    from ...utils.keras_compat import KerasCreationRecorder
    if name == "CheXNet":
        module_name, attr = "tensorflow.keras.applications", "DenseNet121"
    elif name in KERAS_BUILDERS:
        module_name, attr = KERAS_BUILDERS[name]
    else:
        raise NotImplementedError(
            f"import for pretrained backbone {name!r} not implemented "
            f"(known: {EXACT_FAMILIES} plus CheXNet)")
    builder = getattr(importlib.import_module(module_name), attr)
    with KerasCreationRecorder() as rec:
        kmodel = builder(include_top=False, weights=None,
                         input_shape=tuple(input_shape))
    members = set(id(l) for l in kmodel.layers)
    return [l.name for l in rec.order
            if id(l) in members and l.get_weights()]


def load_chexnet_weights(flax_backbone, sample: jax.Array,
                         weights: tp.Optional[str] = None):
    """CheXNet: DenseNet121 + Dense(14, softmax, name='predictions') head,
    weights from a local ``CheXNet_TF_Weights.h5`` (reference
    unet_variants.py:3439-3445).  The head model shares layers with the
    base, so ``load_weights`` on it populates the base, which then converts
    by call order exactly like DenseNet121."""
    import tensorflow as tf
    from ...utils.keras_compat import (KerasCreationRecorder,
                                       convert_keras_weights)
    with KerasCreationRecorder() as rec:
        base = tf.keras.applications.DenseNet121(
            include_top=False, weights=None,
            input_shape=tuple(sample.shape[1:]))
        pred = tf.keras.layers.Dense(14, activation="softmax",
                                     name="predictions")(base.output)
        full = tf.keras.Model(base.input, pred)
    if weights:
        full.load_weights(weights)
    prefix = getattr(flax_backbone, "max_tap", 5) < 5
    return convert_keras_weights(base, flax_backbone, sample,
                                 creation_order=rec.order,
                                 allow_prefix=prefix), base
