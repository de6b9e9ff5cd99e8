"""Numerical parity fixtures vs the Keras reference (BASELINE.md north
star: <1e-4 logit deviation on CPU).

Builds the actual reference models from /root/reference, converts their
weights by call order (utils/keras_compat.py), and compares inference
outputs.  The reference targets Keras 2; under the installed Keras 3 its
``Activation('LeakyReLU')`` literal raises, so that lookup is patched to
the LeakyReLU layer (the Keras-2 resolution, negative_slope 0.3).
"""
import os
import sys

import numpy as np
import pytest

REF_2D = "/root/reference/TensorFlow/2DCNN"
REF_1D = "/root/reference/TensorFlow/1DCNN"

tf = pytest.importorskip("tensorflow")

if not os.path.isdir(REF_2D):
    pytest.skip("reference tree not mounted", allow_module_level=True)


@pytest.fixture(scope="module")
def ref_modules():
    # Keras-2 compat: Activation('LeakyReLU') resolved to the LeakyReLU
    # layer in the versions the reference targets
    orig_activation = tf.keras.layers.Activation

    def patched(activation, **kw):
        if activation == "LeakyReLU":
            return tf.keras.layers.LeakyReLU()
        if isinstance(activation, str):
            try:
                tf.keras.activations.get(activation)
            except ValueError:
                activation = activation.lower()  # 'ReLU' -> 'relu' etc.
        return orig_activation(activation, **kw)

    tf.keras.layers.Activation = patched
    sys.path.insert(0, REF_2D)
    sys.path.insert(0, REF_1D)
    import importlib
    unet2d = importlib.import_module("models.unet_variants")
    unet1d = importlib.import_module("Models.unet_variants")
    yield {"2d": unet2d, "1d": unet1d}
    tf.keras.layers.Activation = orig_activation


def _compare(kmodel, fmodel, x, tol=1e-4, creation_order=None,
             **apply_kwargs):
    import jax
    from tf_1d_2d_segmentation_end2endpipelines_tpu.utils.keras_compat import (
        convert_keras_weights)
    variables = convert_keras_weights(kmodel, fmodel, x,
                                      creation_order=creation_order,
                                      **apply_kwargs)
    ref = kmodel(x, training=False)
    if isinstance(ref, (list, tuple)):
        ref = ref[0]
    ref = np.asarray(ref)
    out = jax.jit(lambda v, x: fmodel.apply(v, x, train=False))(variables,
                                                               x)
    got = np.asarray(out["out"])
    diff = float(np.max(np.abs(got - ref)))
    assert diff < tol, f"max deviation {diff} >= {tol}"
    return diff


@pytest.mark.parametrize("decoder", ["UNet", "UNetPP", "UNet3P"])
def test_2d_decoder_parity(ref_modules, decoder):
    from tf_1d_2d_segmentation_end2endpipelines_tpu.models import SegModel
    builder = ref_modules["2d"].unet_model_builder(
        decoder, 32, 32, 4, 2, num_channels=3, output_nums=1,
        ds=0, ae=0, ag=0, lstm=0, dense_loop=1, is_transconv=True,
        final_activation="sigmoid", train_mode="from_scratch")
    from tf_1d_2d_segmentation_end2endpipelines_tpu.utils.keras_compat import (
        KerasCreationRecorder)
    with KerasCreationRecorder() as rec:
        kmodel = builder.ResNet50()  # encoder branch unused when
        # train_mode='from_scratch' (unet_variants.py:1089-1091)
    fmodel = SegModel(decoder_name=decoder, model_width=4, model_depth=2,
                      output_nums=1, final_activation="sigmoid",
                      dense_loop=1)
    x = np.random.default_rng(0).normal(size=(2, 32, 32, 3)).astype(
        np.float32)
    _compare(kmodel, fmodel, x, creation_order=rec.order)


def test_2d_attention_gate_parity(ref_modules):
    from tf_1d_2d_segmentation_end2endpipelines_tpu.models import SegModel
    builder = ref_modules["2d"].unet_model_builder(
        "UNet", 32, 32, 4, 2, num_channels=3, output_nums=1,
        ds=0, ag=1, train_mode="from_scratch")
    from tf_1d_2d_segmentation_end2endpipelines_tpu.utils.keras_compat import (
        KerasCreationRecorder)
    with KerasCreationRecorder() as rec:
        kmodel = builder.ResNet50()
    fmodel = SegModel(decoder_name="UNet", model_width=4, model_depth=2,
                      ag=1, dense_loop=1)
    x = np.random.default_rng(1).normal(size=(1, 32, 32, 3)).astype(
        np.float32)
    _compare(kmodel, fmodel, x, creation_order=rec.order)


def test_1d_unet_parity(ref_modules):
    from tf_1d_2d_segmentation_end2endpipelines_tpu.models import UNet1D
    kbuilder = ref_modules["1d"].UNet(64, 2, 1, 4, 3,
                                      problem_type="Regression",
                                      output_nums=1, ds=0, ae=0, ag=0,
                                      lstm=0, is_transconv=True)
    from tf_1d_2d_segmentation_end2endpipelines_tpu.utils.keras_compat import (
        KerasCreationRecorder)
    with KerasCreationRecorder() as rec:
        kmodel = kbuilder.UNet()
    fmodel = getattr(UNet1D(64, 2, 1, 4, 3, ds=0), "UNet")()
    x = np.random.default_rng(2).normal(size=(2, 64, 1)).astype(np.float32)
    _compare(kmodel, fmodel, x, creation_order=rec.order)


def test_1d_unet_lstm_ag_parity(ref_modules):
    from tf_1d_2d_segmentation_end2endpipelines_tpu.models import UNet1D
    kbuilder = ref_modules["1d"].UNet(64, 2, 1, 8, 3,
                                      problem_type="Regression",
                                      output_nums=1, ds=0, ae=0, ag=1,
                                      lstm=1, is_transconv=True)
    from tf_1d_2d_segmentation_end2endpipelines_tpu.utils.keras_compat import (
        KerasCreationRecorder)
    with KerasCreationRecorder() as rec:
        kmodel = kbuilder.UNet()
    fmodel = getattr(UNet1D(64, 2, 1, 8, 3, ds=0, ag=1, lstm=1), "UNet")()
    x = np.random.default_rng(3).normal(size=(2, 64, 1)).astype(np.float32)
    _compare(kmodel, fmodel, x, creation_order=rec.order)


def _compare_all_heads(kmodel, fmodel, x, tol=1e-4, creation_order=None):
    """Deep-supervision parity: EVERY named head (out + level{i}) must
    match, not just outputs[0] (VERDICT r1 item 5 — the DS wiring,
    level naming and UNet3P's stride-2 heads are exactly the subtle part;
    reference head assembly unet_variants.py:1109-1114)."""
    import jax
    from tf_1d_2d_segmentation_end2endpipelines_tpu.utils.keras_compat import (
        convert_keras_weights)
    variables = convert_keras_weights(kmodel, fmodel, x,
                                      creation_order=creation_order)
    out = jax.jit(lambda v, x: fmodel.apply(v, x, train=False))(variables, x)
    assert "out" in out and any(k.startswith("level") for k in out), out.keys()
    kref = tf.keras.Model(
        kmodel.input, {name: kmodel.get_layer(name).output for name in out})
    refs = kref(x, training=False)
    for name in out:
        got = np.asarray(out[name])
        ref = np.asarray(refs[name])
        assert got.shape == ref.shape, (name, got.shape, ref.shape)
        diff = float(np.max(np.abs(got - ref)))
        assert diff < tol, f"head {name}: max deviation {diff} >= {tol}"


@pytest.mark.parametrize("decoder", ["UNet", "UNetPP", "UNet3P"])
def test_2d_deep_supervision_head_parity(ref_modules, decoder):
    """All DS heads of the 2D decoders match the reference (UNet3P's are
    stride-2 half-resolution, unet_variants.py:374)."""
    from tf_1d_2d_segmentation_end2endpipelines_tpu.models import SegModel
    builder = ref_modules["2d"].unet_model_builder(
        decoder, 32, 32, 4, 3, num_channels=3, output_nums=1,
        ds=1, ae=0, ag=0, lstm=0, dense_loop=1, is_transconv=True,
        final_activation="sigmoid", train_mode="from_scratch")
    from tf_1d_2d_segmentation_end2endpipelines_tpu.utils.keras_compat import (
        KerasCreationRecorder)
    with KerasCreationRecorder() as rec:
        kmodel = builder.ResNet50()
    fmodel = SegModel(decoder_name=decoder, model_width=4, model_depth=3,
                      output_nums=1, final_activation="sigmoid",
                      dense_loop=1, ds=1)
    x = np.random.default_rng(7).normal(size=(1, 32, 32, 3)).astype(
        np.float32)
    _compare_all_heads(kmodel, fmodel, x, creation_order=rec.order)


@pytest.mark.parametrize("arch", ["UNet", "UNetPP", "UNet3P"])
def test_1d_deep_supervision_head_parity(ref_modules, arch):
    """All DS heads of the 1D architectures match the reference
    (Models/unet_variants.py:314-317 head assembly)."""
    from tf_1d_2d_segmentation_end2endpipelines_tpu.models import UNet1D
    kbuilder = ref_modules["1d"].UNet(64, 3, 1, 4, 3,
                                      problem_type="Regression",
                                      output_nums=1, ds=1, ae=0, ag=0,
                                      lstm=0, is_transconv=True)
    from tf_1d_2d_segmentation_end2endpipelines_tpu.utils.keras_compat import (
        KerasCreationRecorder)
    with KerasCreationRecorder() as rec:
        kmodel = getattr(kbuilder, arch)()
    fmodel = getattr(UNet1D(64, 3, 1, 4, 3, ds=1), arch)()
    x = np.random.default_rng(8).normal(size=(1, 64, 1)).astype(np.float32)
    _compare_all_heads(kmodel, fmodel, x, creation_order=rec.order)
