"""Post-training int8 quantization for the serving path.

A NEW capability with no reference counterpart (the reference serves
nothing — its inference is ``model.predict`` one image at a time,
2DCNN/Test.py:161).  TPU v5e's MXU runs int8 matmuls/convolutions at 2x
the bf16 rate, so quantized inference is the TPU-native serving
optimization: every ``nn.Conv`` in the zoo is swapped — via a flax method
interceptor, with NO per-model code — for

    x_i8  = clip(round(x / s_x))          (per-tensor, calibrated)
    w_i8  = clip(round(w / s_w[c]))       (per-output-channel, symmetric)
    y     = conv(x_i8, w_i8, preferred_element_type=int32) * (s_x * s_w)

Weight quantization happens on closure-constant params, so XLA constant-
folds it at compile time; only the activation quantize/dequantize runs
per step, and the convolution itself — where all the FLOPs are — executes
on the int8 MXU path.  Everything else (BN, activations, transposed
convs, pooling) stays in the float dtype, which keeps the numerics tame:
conv-UNets spend >90% of their FLOPs inside these convs.

MEASURED REALITY (v5e, 2026-08; benchmarks/serving_bench.py +
conv microbench): at this zoo's widths (C=32-64) the convs are
HBM-bandwidth-bound, so the per-conv quantize/round/clip traffic
outweighs the MXU gain — int8 serving is 0.62-0.66x the bf16 path for
the flagship (C=32 conv microbench: 0.62x; C=128: 1.10x).  Use --int8
for genuinely wide custom models; for the stock zoo, bf16 is the fast
serving path.  The capability is kept because it is correct, tested,
and wins where convs are MXU-bound.

Calibration is one eager forward over a representative batch recording
each conv input's abs-max.  Use :func:`quantize_predict_fn` directly or
``Predictor(..., int8_calibration=batch)`` (serve.py).
"""
from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

__all__ = ["calibrate", "quantize_predict_fn", "default_skip"]

PathKey = tp.Tuple[str, ...]


def default_skip(module: "nn.Conv") -> bool:
    """Skip quantizing output heads (1x1 convs onto <=4 channels): their
    few FLOPs buy no speed and their precision sets the mask quality."""
    return int(np.prod(module.kernel_size)) == 1 and module.features <= 4


def _quantizable(module: "nn.Conv") -> bool:
    """True when _int8_conv implements everything this conv uses.
    Unsupported convs (explicit list padding — e.g. the pretrained
    backbones' [(3,3),(3,3)] stem convs, input dilation, kernel masks)
    simply STAY FLOAT rather than crashing the quantized forward."""
    if not (isinstance(module.padding, str)
            and module.padding in ("SAME", "VALID")):
        return False
    if getattr(module, "mask", None) is not None:
        return False
    in_dil = getattr(module, "input_dilation", None)
    if in_dil not in (None, 1) and tuple(np.atleast_1d(in_dil)) != \
            (1,) * len(np.atleast_1d(in_dil)):
        return False
    return True


def _conv_spec(ndim: int) -> tp.Tuple[str, str, str]:
    if ndim == 3:   # (B, L, C)
        return ("NWC", "WIO", "NWC")
    if ndim == 4:   # (B, H, W, C)
        return ("NHWC", "HWIO", "NHWC")
    raise ValueError(f"unsupported conv input rank {ndim}")


def _tuplify(v, n: int) -> tp.Tuple[int, ...]:
    if v is None:
        return (1,) * n
    if isinstance(v, int):
        return (v,) * n
    return tuple(v)


def _int8_conv(module: "nn.Conv", x: jax.Array, kernel: jax.Array,
               s_x: jax.Array) -> jax.Array:
    """The quantized replacement for one bound nn.Conv call (bias and
    output dtype handled by the caller; the caller gates on
    :func:`_quantizable`)."""
    if not _quantizable(module):
        raise NotImplementedError(
            f"conv not quantizable (padding={module.padding!r}); "
            "callers must gate on _quantizable")
    n_spatial = x.ndim - 2
    # per-output-channel symmetric weight scales; params are closure
    # constants so XLA folds the weight quantization at compile time
    s_w = jnp.max(jnp.abs(kernel.astype(jnp.float32)),
                  axis=tuple(range(kernel.ndim - 1)))
    s_w = jnp.maximum(s_w / 127.0, 1e-12)
    qw = jnp.clip(jnp.round(kernel.astype(jnp.float32) / s_w),
                  -127, 127).astype(jnp.int8)
    s_x = jnp.maximum(jnp.asarray(s_x, jnp.float32) / 127.0, 1e-12)
    qx = jnp.clip(jnp.round(x.astype(jnp.float32) / s_x),
                  -127, 127).astype(jnp.int8)
    dn = jax.lax.conv_dimension_numbers(
        x.shape, kernel.shape, _conv_spec(x.ndim))
    y = jax.lax.conv_general_dilated(
        qx, qw,
        window_strides=_tuplify(module.strides, n_spatial),
        padding=module.padding,
        rhs_dilation=_tuplify(module.kernel_dilation, n_spatial),
        dimension_numbers=dn,
        feature_group_count=module.feature_group_count,
        preferred_element_type=jnp.int32)
    return y.astype(jnp.float32) * (s_x * s_w)


def _lookup(params: tp.Mapping, path: PathKey) -> tp.Mapping:
    leaf: tp.Any = params
    for k in path:
        leaf = leaf[k]
    return leaf


def calibrate(model, variables, calib_x,
              skip: tp.Callable[["nn.Conv"], bool] = default_skip
              ) -> tp.Dict[PathKey, float]:
    """One forward over ``calib_x`` recording each quantizable conv
    input's abs-max (per-tensor).  Eager (unjitted), so the recorded
    values are concrete floats keyed by the module path."""
    scales: tp.Dict[PathKey, float] = {}

    def recorder(next_fn, args, kwargs, context):
        mod = context.module
        if (type(mod) is nn.Conv and context.method_name == "__call__"
                and _quantizable(mod) and not skip(mod)):
            amax = float(jnp.max(jnp.abs(args[0].astype(jnp.float32))))
            key = tuple(mod.path)
            scales[key] = max(scales.get(key, 0.0), amax, 1e-12)
        return next_fn(*args, **kwargs)

    with nn.intercept_methods(recorder):
        model.apply(variables, jnp.asarray(calib_x), train=False)
    return scales


def quantize_predict_fn(model, variables, scales: tp.Mapping[PathKey, float],
                        skip: tp.Callable[["nn.Conv"], bool] = default_skip,
                        out_key: tp.Optional[str] = "out") -> tp.Callable:
    """Build ``fn(x) -> prediction`` where every calibrated ``nn.Conv``
    runs on the int8 MXU path.  Jit-compatible; weights quantize at
    compile time."""
    params = variables["params"]

    def interceptor(next_fn, args, kwargs, context):
        mod = context.module
        key = tuple(mod.path) if mod.path is not None else ()
        if (type(mod) is nn.Conv and context.method_name == "__call__"
                and _quantizable(mod) and not skip(mod)
                and key in scales):
            x = args[0]
            leaf = _lookup(params, key)
            y = _int8_conv(mod, x, leaf["kernel"], scales[key])
            if mod.use_bias:
                y = y + leaf["bias"].astype(jnp.float32)
            return y.astype(mod.dtype or x.dtype)
        return next_fn(*args, **kwargs)

    def fn(x):
        with nn.intercept_methods(interceptor):
            out = model.apply(variables, x, train=False)
        return out[out_key] if out_key else out

    return fn
