"""Full model-zoo sweep + special families (slow; run with -m slow)."""
import jax
import jax.numpy as jnp
import pytest

from tf_1d_2d_segmentation_end2endpipelines_tpu.models import SegModel, UNet1D
from tf_1d_2d_segmentation_end2endpipelines_tpu.models.mlmrsnet import MLMRSNet
from tf_1d_2d_segmentation_end2endpipelines_tpu.models.saunet import SAUNet
from tf_1d_2d_segmentation_end2endpipelines_tpu.models.specials_1d import (
    BCDUNet, IBAUNet, NABNet, SEDUNet)

from test_model_zoo import ARCHS_1D_FULL, DECODERS_2D_FULL, _run

import os

# opt-in: the full sweep costs ~15 min of compiles on the single-core CI
# host; enable with TPUSEG_FULL_TESTS=1
pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not os.environ.get("TPUSEG_FULL_TESTS"),
                       reason="full-zoo sweep (set TPUSEG_FULL_TESTS=1)"),
]


@pytest.mark.parametrize("dec", DECODERS_2D_FULL)
def test_2d_decoder_builds_full(dec):
    x = jnp.ones((1, 32, 32, 3))
    model = SegModel(decoder_name=dec, model_width=4, model_depth=2, ds=1)
    out, _ = _run(model, x)
    assert out["out"].shape == (1, 32, 32, 1)


@pytest.mark.parametrize("arch", ARCHS_1D_FULL)
def test_1d_arch_builds_full(arch):
    x = jnp.ones((1, 32, 1))
    model = getattr(UNet1D(32, 2, 1, 4, 3, ds=1), arch)()
    out, _ = _run(model, x)
    assert out["out"].shape == (1, 32, 1)


@pytest.mark.parametrize("cls,kw", [
    (BCDUNet, dict(lstm=1, ag=1, dense_loop=2)),
    (SEDUNet, dict(lstm=1, se_ratio=4)),
    (IBAUNet, dict(ag=1)),
    (NABNet, dict(dense_loop=2)),
])
def test_1d_specials(cls, kw):
    x = jnp.ones((1, 32, 1))
    model = cls(model_width=8, model_depth=2, ds=1, **kw)
    out, _ = _run(model, x)
    assert out["out"].shape == (1, 32, 1)


@pytest.mark.parametrize("meth", ["MLMRSNet", "MLMRSNet_V2", "LDNet"])
def test_mlmrsnet_topologies(meth):
    x = jnp.ones((1, 32, 1))
    model = getattr(MLMRSNet(32, 2, 1, 4, 3, ds=1, cardinality=2,
                             pooling_type="mix"), meth)()
    out, _ = _run(model, x)
    assert out["out"].shape == (1, 32, 1)


@pytest.mark.parametrize("meth", ["SAUNet", "SAMultiResUNet", "SelfSAUNet"])
def test_saunet_variants(meth):
    x = jnp.ones((1, 32, 1))
    model = getattr(SAUNet(32, 2, 1, 8, 3, ds=1, block_size=3), meth)()
    out, _ = _run(model, x)
    assert out["out"].shape == (1, 32, 1)


def test_dense_inception_unet():
    from tf_1d_2d_segmentation_end2endpipelines_tpu.models import (
        Dense_Inception_UNet)
    x = jnp.ones((1, 32, 1))
    model = Dense_Inception_UNet(32, 2, 1, 4, 3, ds=1, ag=1).Dense_Inception_UNet()
    out, _ = _run(model, x)
    assert out["out"].shape == (1, 32, 1)


@pytest.mark.parametrize("meth", ["TernausNet11", "TernausNet13",
                                  "TernausNet16", "TernausNet19"])
def test_ternausnet(meth):
    from tf_1d_2d_segmentation_end2endpipelines_tpu.models import TernausNet
    x = jnp.ones((1, 64, 1))
    out, _ = _run(getattr(TernausNet(64, 1, 4, ds=1), meth)(), x)
    assert out["out"].shape == (1, 64, 1)


@pytest.mark.parametrize("variant", [18, 34, 50])
def test_albunet(variant):
    from tf_1d_2d_segmentation_end2endpipelines_tpu.models import AlbUNet
    x = jnp.ones((1, 64, 1))
    out, _ = _run(getattr(AlbUNet(64, 1, 4), f"AlbUNet{variant}")(), x)
    assert out["out"].shape == (1, 64, 1)


@pytest.mark.parametrize("meth", ["LinkNet", "LinkNetE", "LinkNetP",
                                  "LinkNetPP", "MultiResLinkNet"])
def test_linknet(meth):
    from tf_1d_2d_segmentation_end2endpipelines_tpu.models import LinkNet
    x = jnp.ones((1, 32, 1))
    out, _ = _run(getattr(LinkNet(32, 2, 1, 8, 3, ds=1), meth)(), x)
    assert out["out"].shape == (1, 32, 1)


def test_fpn_1d():
    from tf_1d_2d_segmentation_end2endpipelines_tpu.models import FPN
    x = jnp.ones((1, 32, 1))
    out, _ = _run(FPN(32, 2, 1, 4, 3, ds=1).FPN(), x)
    assert out["out"].shape == (1, 32, 1)
