"""int8 post-training quantization (quant.py): numerics, HLO lowering,
and the Predictor/serving integration."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from tf_1d_2d_segmentation_end2endpipelines_tpu.models import SegModel
from tf_1d_2d_segmentation_end2endpipelines_tpu.quant import (
    _int8_conv,
    calibrate,
    default_skip,
    quantize_predict_fn,
)
from tf_1d_2d_segmentation_end2endpipelines_tpu.serve import Predictor


def _small_model_and_batch(seed=0):
    model = SegModel(decoder_name="UNet", model_width=8, model_depth=2,
                     final_activation="sigmoid")
    x = np.random.default_rng(seed).normal(
        size=(2, 32, 32, 3)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    return model, variables, x


def test_int8_conv_matches_fake_quant_exactly():
    """The int8 conv must equal the same computation done with
    quantize-dequantized f32 operands (int32 accumulation is exact for
    these magnitudes)."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 9, 9, 5)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(3, 3, 5, 7)), jnp.float32)
    conv = nn.Conv(7, (3, 3), padding="SAME")
    bound = conv.bind(conv.init(jax.random.PRNGKey(0), x))
    amax = float(jnp.max(jnp.abs(x)))
    got = _int8_conv(bound, x, k, amax)

    s_w = jnp.maximum(jnp.max(jnp.abs(k), axis=(0, 1, 2)) / 127.0, 1e-12)
    s_x = max(amax / 127.0, 1e-12)
    qx = jnp.clip(jnp.round(x / s_x), -127, 127) * s_x
    qk = jnp.clip(jnp.round(k / s_w), -127, 127) * s_w
    want = jax.lax.conv_general_dilated(
        qx, qk, (1, 1), "SAME",
        dimension_numbers=jax.lax.conv_dimension_numbers(
            x.shape, k.shape, ("NHWC", "HWIO", "NHWC")))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


def test_quantized_model_close_to_float():
    model, variables, x = _small_model_and_batch()
    scales = calibrate(model, variables, x)
    assert len(scales) >= 5  # the conv tower is calibrated
    fn = jax.jit(quantize_predict_fn(model, variables, scales))
    q = np.asarray(fn(x))
    f = np.asarray(model.apply(variables, x, train=False)["out"])
    # sigmoid outputs: int8 PTQ should track the float model closely
    assert np.abs(q - f).mean() < 0.01
    assert np.abs(q - f).max() < 0.1


def test_quantized_lowering_uses_int8_convs():
    model, variables, x = _small_model_and_batch()
    scales = calibrate(model, variables, x)
    txt = jax.jit(quantize_predict_fn(model, variables, scales)).lower(
        jnp.asarray(x)).as_text()
    conv_lines = [l for l in txt.splitlines() if "stablehlo.convolution" in l]
    int8_lines = [l for l in conv_lines if "i8" in l]
    # every calibrated conv lowers with i8 operands; the output head and
    # the transposed convs legitimately stay float
    assert len(int8_lines) == len(scales)
    assert len(conv_lines) > len(int8_lines)


def test_default_skip_protects_output_head():
    head = nn.Conv(1, (1, 1))
    assert default_skip(head)
    body = nn.Conv(32, (3, 3))
    assert not default_skip(body)


def test_quantized_1d_model():
    from tf_1d_2d_segmentation_end2endpipelines_tpu.models import SegModel1D
    model = SegModel1D(arch="UNet", model_depth=2, model_width=4,
                       kernel_size=3)
    x = np.random.default_rng(2).normal(size=(2, 64, 1)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    scales = calibrate(model, variables, x)
    assert scales
    q = np.asarray(jax.jit(quantize_predict_fn(
        model, variables, scales))(x))
    f = np.asarray(model.apply(variables, x, train=False)["out"])
    # regression head on an untrained net: compare against output scale
    denom = max(float(np.abs(f).max()), 1e-6)
    assert np.abs(q - f).max() / denom < 0.15


def test_unsupported_convs_stay_float():
    """Convs with explicit list padding (pretrained-backbone stems, e.g.
    ResNet's [(3,3),(3,3)]) must be left on the float path — not recorded
    by calibrate, not crashed on by the quantized forward."""

    class Stem(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            x = nn.Conv(8, (7, 7), strides=(2, 2),
                        padding=[(3, 3), (3, 3)])(x)
            x = nn.relu(x)
            x = nn.Conv(8, (3, 3), padding="SAME")(x)
            return {"out": x}

    model = Stem()
    x = np.random.default_rng(4).normal(
        size=(2, 16, 16, 3)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    scales = calibrate(model, variables, x, skip=lambda m: False)
    # only the SAME-padded conv is calibrated
    assert len(scales) == 1
    q = np.asarray(jax.jit(quantize_predict_fn(
        model, variables, scales, skip=lambda m: False))(x))
    assert np.isfinite(q).all()


def test_predictor_int8_calibration():
    """Predictor(int8_calibration=...) serves quantized predictions with
    the same padding/chunking semantics as the float path."""
    model, variables, x = _small_model_and_batch()

    class _State:
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})

    p_f32 = Predictor(model, _State(), (32, 32, 3), max_batch=2)
    p_int8 = Predictor(model, _State(), (32, 32, 3), max_batch=2,
                       int8_calibration=x)
    xs = np.random.default_rng(3).normal(
        size=(3, 32, 32, 3)).astype(np.float32)  # odd size: padding path
    got_f = p_f32(xs)
    got_q = p_int8(xs)
    assert got_f.shape == got_q.shape == (3, 32, 32, 1)
    assert np.abs(got_f - got_q).mean() < 0.01
