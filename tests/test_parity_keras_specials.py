"""Numerical parity fixtures for the last 8 families without one
(r2 verdict "Close the parity tail"): MLMRSNet/LDNet, SAUNet,
ConvMixerUNet, Dense-Inception, AlbuNet, 1D FPN, the 2D ConvLSTM
fusion branch, and the A_E Feature_Extraction path.  <1e-4 vs the
actual Keras reference, default-on."""
import importlib
import os
import sys

import numpy as np
import pytest

from test_parity_keras import REF_1D, REF_2D, _compare, ref_modules  # noqa

tf = pytest.importorskip("tensorflow")

# regression-frozen proof fixtures (full Keras graph builds): out of the
# default lane, run with TPUSEG_FULL_TESTS=1 at session boundaries
pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not os.environ.get("TPUSEG_FULL_TESTS"),
                       reason="Keras-build parity fixture "
                              "(set TPUSEG_FULL_TESTS=1)"),
]


def _rec():
    from tf_1d_2d_segmentation_end2endpipelines_tpu.utils.keras_compat import (
        KerasCreationRecorder)
    return KerasCreationRecorder()


def _ref_1d(name):
    sys.path.insert(0, REF_1D)
    return importlib.import_module(f"Models.{name}")


@pytest.mark.parametrize("meth", ["MLMRSNet", "MLMRSNet_V2", "LDNet"])
def test_mlmrsnet_parity(ref_modules, meth):
    """mix-pool / MSP / MRP wiring (reference Models/MLMRSNet.py:57-366)."""
    from tf_1d_2d_segmentation_end2endpipelines_tpu.models.mlmrsnet import (
        MLMRSNet)
    mod = _ref_1d("MLMRSNet")
    with _rec() as rec:
        kmodel = getattr(mod.MLMRSNet(
            64, 2, 1, 8, 3, problem_type="Regression", output_nums=1,
            ds=0, cardinality=2, pooling_type="mix"), meth)()
    fmodel = getattr(MLMRSNet(64, 2, 1, 8, 3, ds=0, cardinality=2,
                              pooling_type="mix"), meth)()
    x = np.random.default_rng(20).normal(size=(1, 64, 1)).astype(np.float32)
    _compare(kmodel, fmodel, x, creation_order=rec.order)


@pytest.mark.parametrize("meth", ["SAUNet", "SAMultiResUNet",
                                  "SelfSAUNet"])
def test_saunet_parity(ref_modules, monkeypatch, meth):
    """DropBlock (inference identity) + CBAM-style spatial attention
    (reference Models/saunet_variants.py:53-121, :234-247, :329-491).

    The reference's spatial_attention closes with a RAW
    ``tf.math.multiply`` on KerasTensors (:247) — a crash under the
    installed Keras 3; patched to the semantically identical Multiply
    layer (no weights, no stream impact) so the reference builds."""
    from tf_1d_2d_segmentation_end2endpipelines_tpu.models.saunet import (
        SAUNet)
    mod = _ref_1d("saunet_variants")
    monkeypatch.setattr(
        tf.math, "multiply",
        lambda a, b: tf.keras.layers.Multiply()([a, b]))
    # Keras 3 removed backend.in_train_phase (DropBlock1D.call, :121);
    # restore the Keras-2 semantics: training branch lazily, else alt
    monkeypatch.setattr(
        tf.keras.backend, "in_train_phase",
        lambda x, alt, training=None: (x() if callable(x) else x)
        if training else alt,
        raising=False)
    with _rec() as rec:
        kmodel = getattr(mod.SAUNet(64, 2, 1, 8, 3, output_nums=1, ds=0,
                                    block_size=3, keep_prob=0.9,
                                    alpha=1, q=3), meth)()
    fmodel = getattr(SAUNet(64, 2, 1, 8, 3, ds=0, block_size=3,
                            keep_prob=0.9, alpha=1, q=3), meth)()
    x = np.random.default_rng(21).normal(size=(1, 64, 1)).astype(np.float32)
    _compare(kmodel, fmodel, x, creation_order=rec.order)


@pytest.mark.parametrize("kmeth", ["UNet", "UNetPP"])
def test_convmixer_unet_parity(ref_modules, kmeth):
    """ConvMixer block chain (reference Models/convmixer_unet.py:6-18,
    :164-241, :453-548): depthwise conv -> gelu -> BN -> residual ->
    pointwise; UNetPP = the same units on the nested topology."""
    from tf_1d_2d_segmentation_end2endpipelines_tpu.models import (
        ConvMixerUNet)
    mod = _ref_1d("convmixer_unet")
    with _rec() as rec:
        kmodel = getattr(mod.ConvMixer_UNet(
            64, 2, 1, 8, 3, problem_type="Regression",
            output_nums=1, ds=0), kmeth)()
    fmodel = getattr(ConvMixerUNet(64, 2, 1, 8, 3, ds=0), kmeth)()
    x = np.random.default_rng(22).normal(size=(1, 64, 1)).astype(np.float32)
    _compare(kmodel, fmodel, x, creation_order=rec.order)


def test_dense_inception_parity(ref_modules, monkeypatch):
    """Inception up/downsampling + dense IRB concatenation (reference
    Models/Dense_Inception_UNet.py:73-165, :167-249).

    The reference's closing Inception_Res_Block uses multiplier 0.5
    (:214) -> Conv1D(width*0.5) FLOAT filters — Keras 2 coerced, Keras 3
    raises; patched to int(filters) (the Keras-2 behavior)."""
    from tf_1d_2d_segmentation_end2endpipelines_tpu.models import (
        Dense_Inception_UNet)
    mod = _ref_1d("Dense_Inception_UNet")
    for cls_name in ("Conv1D", "Conv1DTranspose"):
        orig = getattr(tf.keras.layers, cls_name)
        monkeypatch.setattr(
            tf.keras.layers, cls_name,
            (lambda o: lambda filters, *a, **k: o(int(filters), *a, **k)
             )(orig))
    with _rec() as rec:
        kmodel = mod.Dense_Inception_UNet(
            64, 2, 1, 8, 3, problem_type="Regression", output_nums=1,
            ds=0).Dense_Inception_UNet()
    fmodel = Dense_Inception_UNet(64, 2, 1, 8, 3,
                                  ds=0).Dense_Inception_UNet()
    x = np.random.default_rng(23).normal(size=(1, 64, 1)).astype(np.float32)
    _compare(kmodel, fmodel, x, creation_order=rec.order)


def test_albunet_reference_crashes(ref_modules):
    """Committed crash demonstration (the repo's MobileNetV3/Inception
    pattern): the reference AlbuNet CANNOT build at any input length —
    decoder_block projects each skip with stride shape[1]+1
    (Models/AlbuNet.py:203,211,219), collapsing it to length 1, so the
    concatenate with the 2x-upsampled decode path always mismatches.
    Every AlbUNet variant (and the file's own __main__ demo at
    length=1024) dies here, under Keras 2 semantics too (shape
    mismatch, not an API change).  extra_1d.AlbUNetModel implements the
    documented intent (stride-1 skip projection, taps at group
    resolution) and is numerically exercised by the default zoo +
    training tests."""
    mod = _ref_1d("AlbuNet")
    for length in (64, 1024):
        with pytest.raises(ValueError, match="Concatenate"):
            mod.AlbUNet(length, 1, 8, problem_type="Regression",
                        output_nums=1, ds=0).AlbUNet18()


def test_fpn_1d_parity(ref_modules):
    """1D FPN incl. the 1-filter lateral quirk (reference
    Models/FPN.py:106-191)."""
    from tf_1d_2d_segmentation_end2endpipelines_tpu.models import FPN
    mod = _ref_1d("FPN")
    with _rec() as rec:
        kmodel = mod.FPN(64, 2, 1, 8, 3, problem_type="Regression",
                         output_nums=1, ds=0).FPN()
    fmodel = FPN(64, 2, 1, 8, 3, ds=0).FPN()
    x = np.random.default_rng(25).normal(size=(1, 64, 1)).astype(np.float32)
    _compare(kmodel, fmodel, x, creation_order=rec.order)


def test_2d_lstm_fusion_parity(ref_modules):
    """2D ConvLSTM2D skip-fusion branch (reference
    models/unet_variants.py:309-338) — only the 1D LSTM path had a
    fixture before."""
    from tf_1d_2d_segmentation_end2endpipelines_tpu.models import SegModel
    builder = ref_modules["2d"].unet_model_builder(
        "UNet", 32, 32, 8, 2, num_channels=3, output_nums=1,
        ds=0, lstm=1, dense_loop=1, train_mode="from_scratch")
    with _rec() as rec:
        kmodel = builder.ResNet50()
    fmodel = SegModel(decoder_name="UNet", model_width=8, model_depth=2,
                      lstm=1, dense_loop=1)
    x = np.random.default_rng(26).normal(size=(1, 32, 32, 3)).astype(
        np.float32)
    _compare(kmodel, fmodel, x, creation_order=rec.order)


def test_2d_ae_feature_extraction_parity(ref_modules):
    """A_E path: flatten -> Dense(features, name='features') -> Dense ->
    reshape at the bottleneck (reference models/unet_variants.py:41-48)
    — previously only shape-tested (test_model_zoo.py)."""
    from tf_1d_2d_segmentation_end2endpipelines_tpu.models import SegModel
    builder = ref_modules["2d"].unet_model_builder(
        "UNet", 32, 32, 4, 2, num_channels=3, output_nums=1,
        ds=0, ae=1, feature_number=32, dense_loop=1,
        train_mode="from_scratch")
    with _rec() as rec:
        kmodel = builder.ResNet50()
    fmodel = SegModel(decoder_name="UNet", model_width=4, model_depth=2,
                      ae=1, feature_number=32, dense_loop=1)
    x = np.random.default_rng(27).normal(size=(1, 32, 32, 3)).astype(
        np.float32)
    _compare(kmodel, fmodel, x, creation_order=rec.order)
