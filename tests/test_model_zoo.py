"""Shape/constructibility tests across the model zoo (replaces the
reference's __main__ smoke blocks, SURVEY.md §4)."""
import jax
import jax.numpy as jnp
import pytest

from tf_1d_2d_segmentation_end2endpipelines_tpu.models import (
    ARCH_NAMES_1D, SegModel, UNet1D)

# representative subset runs by default; the full sweep is in
# test_model_zoo_full.py behind -m slow (single-core CI budget)
DECODERS_2D = ["UNet", "UNetPP", "UNet3P", "UNet4P", "MultiResUNet",
               "SelfUNetPP"]
DECODERS_2D_FULL = ["UNetE", "UNetP", "AHNet", "MultiResUNet3P", "KSSNet",
                    "SelfUNet", "SelfUNet3P"]


def _run(model, x):
    vs = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    return jax.jit(lambda v, x: model.apply(v, x))(vs, x), vs


@pytest.mark.parametrize("dec", DECODERS_2D)
def test_2d_decoder_builds(dec):
    x = jnp.ones((1, 32, 32, 3))
    model = SegModel(decoder_name=dec, model_width=4, model_depth=2, ds=1)
    out, _ = _run(model, x)
    assert out["out"].shape == (1, 32, 32, 1)
    assert set(out) == {"out", "level1", "level2"}
    # UNet3P-style DS heads are stride-2 (reference quirk)
    if dec in ("UNet3P", "MultiResUNet3P", "SelfUNet3P"):
        assert out["level1"].shape == (1, 16, 16, 1)


ARCHS_1D = ["UNet", "UNetPP", "UNet3P", "MultiResUNet", "R2UNet",
            "SelfUNetPP", "ConvMixerUNet"]
ARCHS_1D_FULL = [a for a in ARCH_NAMES_1D if a not in ARCHS_1D]


@pytest.mark.parametrize("arch", ARCHS_1D)
def test_1d_arch_builds(arch):
    x = jnp.ones((1, 32, 1))
    model = getattr(UNet1D(32, 2, 1, 4, 3, ds=1), arch)()
    out, _ = _run(model, x)
    assert out["out"].shape == (1, 32, 1)
    assert set(out) == {"out", "level1", "level2"}


def test_2d_fpn_genre():
    x = jnp.ones((1, 32, 32, 3))
    model = SegModel(decoder_name="FPN", model_width=4, model_depth=3,
                     genre="FPN")
    out, _ = _run(model, x)
    assert out["out"].shape == (1, 32, 32, 1)


def test_flags_ag_lstm_ae():
    x = jnp.ones((1, 32, 32, 3))
    model = SegModel(decoder_name="UNet", model_width=4, model_depth=2,
                     ag=1, lstm=1, ae=1, feature_number=16)
    out, vs = _run(model, x)
    assert out["out"].shape == (1, 32, 32, 1)
    # autoencoder latent Dense named 'features' exists
    flat = jax.tree_util.tree_flatten_with_path(vs["params"])[0]
    assert any("features" in "/".join(str(p) for p in path)
               for path, _ in flat)


# one tiny representative per special family, DEFAULT-ON (r2 verdict: the
# gated full sweep meant a family breakage shipped green; these cost
# seconds at 32-sample shapes — variants stay in test_model_zoo_full.py)
def _special_builders():
    from tf_1d_2d_segmentation_end2endpipelines_tpu.models import (
        FPN, AlbUNet, Dense_Inception_UNet, LinkNet, TernausNet)
    from tf_1d_2d_segmentation_end2endpipelines_tpu.models.mlmrsnet import (
        MLMRSNet)
    from tf_1d_2d_segmentation_end2endpipelines_tpu.models.saunet import (
        SAUNet)
    from tf_1d_2d_segmentation_end2endpipelines_tpu.models.specials_1d import (
        BCDUNet, IBAUNet, NABNet, SEDUNet)
    return {
        "BCDUNet": (lambda: BCDUNet(model_width=4, model_depth=2,
                                    lstm=1, dense_loop=2), 32),
        "SEDUNet": (lambda: SEDUNet(model_width=4, model_depth=2,
                                    se_ratio=4), 32),
        "IBAUNet": (lambda: IBAUNet(model_width=4, model_depth=2), 32),
        "NABNet": (lambda: NABNet(model_width=4, model_depth=2,
                                  dense_loop=2), 32),
        "MLMRSNet": (lambda: MLMRSNet(32, 2, 1, 4, 3, cardinality=2,
                                      pooling_type="mix").MLMRSNet(), 32),
        "SAUNet": (lambda: SAUNet(32, 2, 1, 8, 3,
                                  block_size=3).SAUNet(), 32),
        "DenseInception": (lambda: Dense_Inception_UNet(
            32, 2, 1, 4, 3).Dense_Inception_UNet(), 32),
        "TernausNet": (lambda: TernausNet(64, 1, 4).TernausNet11(), 64),
        "AlbUNet": (lambda: AlbUNet(64, 1, 4).AlbUNet18(), 64),
        "LinkNet": (lambda: LinkNet(32, 2, 1, 8, 3).LinkNet(), 32),
        "FPN1D": (lambda: FPN(32, 2, 1, 4, 3).FPN(), 32),
    }


@pytest.mark.parametrize("family", ["BCDUNet", "SEDUNet", "IBAUNet",
                                    "NABNet", "MLMRSNet", "SAUNet",
                                    "DenseInception", "TernausNet",
                                    "AlbUNet", "LinkNet", "FPN1D"])
def test_special_family_builds_default(family):
    build, length = _special_builders()[family]
    x = jnp.ones((1, length, 1))
    out, _ = _run(build(), x)
    assert out["out"].shape == (1, length, 1)


# one case per dispatch branch of the 1D factory (the reference has no 1D
# factory — SURVEY.md §2.2; this is the added L3 dispatch, api_1d.py)
SELECTOR_1D_CASES = [
    ("UNetPP", 32, 4), ("ConvMixerUNet", 32, 4), ("BCDUNet", 32, 4),
    ("MLMRSNet", 32, 4), ("SAUNet", 32, 8), ("Dense_Inception_UNet", 32, 4),
    ("TernausNet11", 64, 4), ("AlbUNet18", 64, 4), ("LinkNet", 32, 8),
    ("FPN", 32, 4),
]


@pytest.mark.parametrize("arch,length,width",
                         SELECTOR_1D_CASES,
                         ids=[c[0] for c in SELECTOR_1D_CASES])
def test_model_selector_1d_dispatch(arch, length, width):
    from tf_1d_2d_segmentation_end2endpipelines_tpu.models import (
        model_selector_1d)
    model = model_selector_1d(arch, length, 2, 1, width, 3,
                              cardinality=2, block_size=3)
    x = jnp.ones((1, length, 1))
    out, _ = _run(model, x)
    assert out["out"].shape == (1, length, 1)


def test_model_selector_1d_unknown_raises():
    from tf_1d_2d_segmentation_end2endpipelines_tpu.models import (
        model_selector_1d)
    with pytest.raises(ValueError, match="unknown 1D architecture"):
        model_selector_1d("NotAModel", 32, 2, 1, 4, 3)


def test_classification_softmax_1d():
    x = jnp.ones((1, 32, 1))
    model = getattr(UNet1D(32, 2, 1, 4, 3, ds=0,
                           problem_type="Classification", output_nums=4),
                    "UNet")()
    out, _ = _run(model, x)
    assert out["out"].shape == (1, 32, 4)
    assert jnp.allclose(out["out"].sum(-1), 1.0, atol=1e-4)
