"""Extended Keras parity fixtures: the remaining model families
(BASELINE.md north star: all 10 families <1e-4).

Default-on for one representative of each family; builds the actual
reference models from /root/reference with converted weights.
"""
import importlib
import os
import sys

import numpy as np
import pytest

from test_parity_keras import REF_1D, REF_2D, _compare, ref_modules  # noqa

tf = pytest.importorskip("tensorflow")

# regression-frozen proof fixtures (full Keras graph builds, ~minutes of TF
# compile each): out of the default lane, run with TPUSEG_FULL_TESTS=1 at
# session boundaries (see PROGRESS.md runbook)
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


@pytest.mark.parametrize("decoder", ["UNetE", "UNetP", "UNet4P",
                                     "UNet4PV2", "MultiResUNet",
                                     "MultiResUNet3P", "AHNet", "KSSNet"])
def test_2d_more_decoders_parity(ref_modules, decoder):
    from tf_1d_2d_segmentation_end2endpipelines_tpu.models import SegModel
    builder = ref_modules["2d"].unet_model_builder(
        decoder, 32, 32, 8, 2, num_channels=3, output_nums=1,
        ds=0, dense_loop=1, train_mode="from_scratch")
    with _rec() as rec:
        kmodel = builder.ResNet50()
    fmodel = SegModel(decoder_name=decoder, model_width=8, model_depth=2,
                      dense_loop=1)
    x = np.random.default_rng(0).normal(size=(1, 32, 32, 3)).astype(
        np.float32)
    _compare(kmodel, fmodel, x, creation_order=rec.order)


def test_2d_self_onn_parity(ref_modules):
    """Validates the fused-Oper formulation against the reference's
    q-branch power-series convs."""
    from tf_1d_2d_segmentation_end2endpipelines_tpu.models import SegModel
    builder = ref_modules["2d"].unet_model_builder(
        "SelfUNet", 32, 32, 4, 2, num_channels=3, output_nums=1,
        ds=0, q=3, dense_loop=1, train_mode="from_scratch")
    with _rec() as rec:
        kmodel = builder.ResNet50()
    fmodel = SegModel(decoder_name="SelfUNet", model_width=4, model_depth=2,
                      q=3, dense_loop=1)
    # small inputs: the q=3 power series through un-normalized Oper chains
    # overflows to NaN at unit scale in the reference itself
    x = np.random.default_rng(4).normal(
        size=(1, 32, 32, 3)).astype(np.float32) * 0.05
    assert np.isfinite(np.asarray(kmodel(x, training=False))).all()
    _compare(kmodel, fmodel, x, creation_order=rec.order)


@pytest.mark.parametrize("decoder", ["FPN", "SelfFPN"])
def test_2d_fpn_genre_parity(ref_modules, decoder):
    sys.path.insert(0, REF_2D)
    fpn_mod = importlib.import_module("models.fpn_variants")
    from tf_1d_2d_segmentation_end2endpipelines_tpu.models import SegModel
    builder = fpn_mod.fpn_model_builder(
        decoder, 32, 32, 8, 3, num_channels=3, output_nums=1, ds=0,
        train_mode="from_scratch")
    with _rec() as rec:
        kmodel = builder.ResNet50()
    fmodel = SegModel(decoder_name=decoder, genre="FPN", model_width=8,
                      model_depth=3)
    # SelfFPN's q=3 ONN powers overflow to NaN at unit-scale random
    # input IN THE REFERENCE TOO (un-normalized FPN head); a 0.1-scale
    # probe keeps both sides finite while still exercising every weight
    scale = 0.1 if decoder == "SelfFPN" else 1.0
    x = (scale * np.random.default_rng(5).normal(
        size=(1, 32, 32, 3))).astype(np.float32)
    _compare(kmodel, fmodel, x, creation_order=rec.order)


@pytest.mark.parametrize("arch", ["UNetPP", "UNet3P", "MultiResUNet",
                                  "RUNet", "R2UNet", "UNetE", "UNetP",
                                  "UNet4P", "MultiResUNet3P", "R2UNetPP",
                                  "R2UNet3P", "SelfR2UNetPP",
                                  "SelfUNetPP", "SelfUNet3P"])
def test_1d_more_archs_parity(ref_modules, arch):
    from tf_1d_2d_segmentation_end2endpipelines_tpu.models import UNet1D
    kbuilder = ref_modules["1d"].UNet(64, 2, 1, 8, 3,
                                      problem_type="Regression",
                                      output_nums=1, ds=0, t=2)
    with _rec() as rec:
        kmodel = getattr(kbuilder, arch)()
    fmodel = getattr(UNet1D(64, 2, 1, 8, 3, ds=0, t=2), arch)()
    # Self-ONN q=3 cubes overflow to NaN at unit-scale random input in
    # the reference too (no normalization between power terms); probe
    # those archs at 0.1 scale — every weight still participates
    scale = 0.1 if arch.startswith("Self") else 1.0
    x = (scale * np.random.default_rng(6).normal(
        size=(1, 64, 1))).astype(np.float32)
    _compare(kmodel, fmodel, x, creation_order=rec.order)


@pytest.mark.parametrize("lstm", [1, 0])
def test_bcdunet_parity(ref_modules, lstm):
    """lstm=1: skip fusion through BiConvLSTM; lstm=0: dense-concat-only
    fusion (BCDUNet.py:129-151) — both paths fixtured."""
    sys.path.insert(0, REF_1D)
    mod = importlib.import_module("Models.BCDUNet")
    from tf_1d_2d_segmentation_end2endpipelines_tpu.models import BCDUNet
    with _rec() as rec:
        kmodel = mod.BCDUNet(64, 2, 1, 8, 3, problem_type="Regression",
                             output_nums=1, ds=0, lstm=lstm,
                             dense_loop=2).BCDUNet()
    fmodel = BCDUNet(model_width=8, model_depth=2, kernel_size=3,
                     lstm=lstm, dense_loop=2)
    x = np.random.default_rng(7).normal(size=(1, 64, 1)).astype(np.float32)
    _compare(kmodel, fmodel, x, creation_order=rec.order)


def test_sedunet_parity(ref_modules):
    sys.path.insert(0, REF_1D)
    mod = importlib.import_module("Models.SEDUNet")
    from tf_1d_2d_segmentation_end2endpipelines_tpu.models import SEDUNet
    with _rec() as rec:
        kmodel = mod.SEDUNet(64, 2, 1, 16, 3, problem_type="Regression",
                             output_nums=1, ds=0, lstm=0, dense_loop=2,
                             se_ratio=4).SEDUNet()
    fmodel = SEDUNet(model_width=16, model_depth=2, kernel_size=3,
                     lstm=0, dense_loop=2, se_ratio=4)
    x = np.random.default_rng(8).normal(size=(1, 64, 1)).astype(np.float32)
    _compare(kmodel, fmodel, x, creation_order=rec.order)


def test_ibaunet_parity(ref_modules):
    sys.path.insert(0, REF_1D)
    mod = importlib.import_module("Models.IBAUNet")
    from tf_1d_2d_segmentation_end2endpipelines_tpu.models import IBAUNet
    with _rec() as rec:
        kmodel = mod.IBAUNet(64, 2, 1, 12, problem_type="Regression",
                             output_nums=1, ds=0, ag=0).IBAUNet()
    fmodel = IBAUNet(model_width=12, model_depth=2)
    x = np.random.default_rng(9).normal(size=(1, 64, 1)).astype(np.float32)
    _compare(kmodel, fmodel, x, creation_order=rec.order)


@pytest.mark.parametrize("meth", ["LinkNet", "LinkNetE", "LinkNetP",
                                  "LinkNetPP", "MultiResLinkNet"])
def test_linknet_parity(ref_modules, meth):
    sys.path.insert(0, REF_1D)
    mod = importlib.import_module("Models.linknet")
    from tf_1d_2d_segmentation_end2endpipelines_tpu.models import LinkNet
    with _rec() as rec:
        kmodel = getattr(mod.LinkNet(
            64, 2, 1, 8, 3, problem_type="Regression",
            output_nums=1, ds=0), meth)()
    fmodel = getattr(LinkNet(64, 2, 1, 8, 3, ds=0), meth)()
    x = np.random.default_rng(10).normal(size=(1, 64, 1)).astype(np.float32)
    _compare(kmodel, fmodel, x, creation_order=rec.order)


@pytest.mark.parametrize("meth", ["TernausNet11", "TernausNet16"])
def test_ternausnet_parity(ref_modules, meth):
    sys.path.insert(0, REF_1D)
    mod = importlib.import_module("Models.TernausNet")
    from tf_1d_2d_segmentation_end2endpipelines_tpu.models import TernausNet
    with _rec() as rec:
        kmodel = getattr(mod.TernausNet(
            64, 1, 4, problem_type="Regression",
            output_nums=1, ds=0), meth)()
    fmodel = getattr(TernausNet(64, 1, 4, ds=0), meth)()
    x = np.random.default_rng(11).normal(size=(1, 64, 1)).astype(np.float32)
    _compare(kmodel, fmodel, x, creation_order=rec.order)
