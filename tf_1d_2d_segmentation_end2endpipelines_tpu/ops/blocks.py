"""Rank-polymorphic block library (the framework's L1).

One canonical implementation of every building block that the reference
duplicates across its 1D and 2D trees (reference: TensorFlow/2DCNN/models/
unet_variants.py:7-122, TensorFlow/1DCNN/Models/*.py headers).  All blocks
work on NHWC / NLC layouts: the number of spatial dims is inferred from the
input rank, so 1D models are the same code with one spatial axis.

TPU-first notes
---------------
- Convs are expressed through ``flax.linen.Conv`` -> ``lax.conv_general_dilated``
  which XLA tiles onto the MXU; activations/norms fuse into the conv epilogue.
- Activations/params: compute dtype is configurable (bf16 on TPU), parameters
  and BatchNorm statistics stay float32.
- Everything is shape-static and jit-friendly (no data-dependent control flow).
"""
from __future__ import annotations

import functools
import os
import typing as tp

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.ad_checkpoint import checkpoint_name

Dtype = tp.Any

_REMAT_BLOCK_CACHE: tp.Dict[type, type] = {}


def remat_block(cls: type) -> type:
    """Per-block rematerialization wrapper (``block_remat`` model flag).

    Returns ``cls`` wrapped in ``flax.linen.remat`` with the ``conv_outs``
    policy: the block's conv outputs (tagged ``checkpoint_name('conv_out')``
    below) are saved for the backward pass, the elementwise tail (BN-apply,
    activations, concats) is recomputed.  Compared to a whole-graph
    ``jax.checkpoint`` in the train step (``remat='dots'``), this produces
    many small remat regions instead of one doubled graph.

    Measured on the axon remote-compile tunnel (benchmarks/RESULTS.json
    "remat_modes" section): at b32, where memory fits, it runs but LOSES to
    plain (205.18 vs 225.61 img/s — recompute with no byte win); at the zoo
    b96-b128 optima it does NOT get past the tunnel's compile helper
    (recorded crashes for MultiResUNet/UNet++, same as 'dots'/'conv_outs'
    there) — on this host it is a numerics-verified memory tool, not a
    measured win.  Hosts with a local XLA compiler may behave differently;
    keep it opt-in.

    Param naming parity: the wrapped class keeps ``cls.__name__`` so flax
    auto-naming produces identical scopes — checkpoints are interchangeable
    between ``block_remat`` on/off (verified bit-identical init + grads).

    Only valid for blocks with a ``__call__(self, x, train)`` signature
    (``train`` is static arg 2).
    """
    try:
        return _REMAT_BLOCK_CACHE[cls]
    except KeyError:
        pass
    wrapped = nn.remat(
        cls, static_argnums=(2,),
        policy=jax.checkpoint_policies.save_only_these_names("conv_out"))
    wrapped.__name__ = cls.__name__
    _REMAT_BLOCK_CACHE[cls] = wrapped
    return wrapped


def maybe_remat(cls: type, enabled: bool) -> type:
    """``remat_block(cls)`` when ``enabled`` else ``cls``."""
    return remat_block(cls) if enabled else cls

# Keras's LeakyReLU layer / "LeakyReLU" activation default slope; the
# reference leaves it at the default (trans_conv2D, unet_variants.py:17).
LEAKY_SLOPE = 0.3


def _spatial_ndim(x: jax.Array) -> int:
    """Number of spatial dims of an NC...C tensor (N...(spatial)...C)."""
    return x.ndim - 2


def _tup(v, n: int) -> tuple:
    if isinstance(v, (tuple, list)):
        if len(v) == n:
            return tuple(v)
        if len(v) == 1:
            return tuple(v) * n
        # a 2D kernel spec applied to a 1D tensor (or vice versa): take first
        return (v[0],) * n
    return (v,) * n


# --- Output-residual (Leaky)ReLU -----------------------------------------
# The default jax.nn rules save the PRE-activation input as the autodiff
# residual (grad reads sign(x)).  But both activations preserve sign, so the
# backward mask is recomputable from the OUTPUT — which the next layer saves
# as its own input anyway, letting XLA CSE the two and drop one full
# activation tensor per conv block from the forward save-set / backward
# read-set.  Gradients are bit-identical to jax.nn.relu / jax.nn.leaky_relu
# (incl. the x == ±0 conventions); the single exception is leaky_relu on
# negative inputs where slope*x underflows to -0.0 — XLA flushes subnormals
# to zero, so that is |x| < min_normal/slope ≈ 3.9e-38 for f32/bf16 (same
# 8-bit exponent) — and the mask then reads >= 0.  A measure-zero set on
# real activations (tests/test_act_vjp.py pins the boundary).  Escape
# hatch: TPUSEG_ACT_VJP=input restores the stock rules.
#
# MEASURED WIN (round 3, real-TPU A/B, flagship UNet++ 256² bf16 b128
# plain): 249.6 -> 240.8 ms/step (512.8 -> 531.6 img/s, +3.7%);
# compare_select_fusion 18.1 -> 8.4 ms — the ReLU backward chains stop
# re-reading the saved pre-activations.  Default ON.


@jax.custom_vjp
def relu_outres(x: jax.Array) -> jax.Array:
    return jnp.maximum(x, 0)


def _relu_outres_fwd(x):
    y = jnp.maximum(x, 0)
    return y, y


def _relu_outres_bwd(y, g):
    # jax.nn.relu's custom JVP: lax.select(x > 0, g, 0); y > 0 ⟺ x > 0.
    return (jnp.where(y > 0, g, jnp.zeros_like(g)),)


relu_outres.defvjp(_relu_outres_fwd, _relu_outres_bwd)


@jax.custom_vjp
def leaky_relu_outres(x: jax.Array) -> jax.Array:
    return jnp.where(x >= 0, x, LEAKY_SLOPE * x).astype(x.dtype)


def _leaky_outres_fwd(x):
    y = jnp.where(x >= 0, x, LEAKY_SLOPE * x).astype(x.dtype)
    return y, y


def _leaky_outres_bwd(y, g):
    # jax.nn.leaky_relu grad: where(x >= 0, g, slope*g).  y >= 0 ⟺ x >= 0
    # (±0 included: x = -0.0 gives y = -0.0 and -0.0 >= 0 is True in both).
    slope = jnp.asarray(LEAKY_SLOPE, g.dtype)
    return (jnp.where(y >= 0, g, slope * g),)


leaky_relu_outres.defvjp(_leaky_outres_fwd, _leaky_outres_bwd)

_OUTPUT_RESIDUAL_ACTS = os.environ.get("TPUSEG_ACT_VJP", "output") != "input"


def relu(x: jax.Array) -> jax.Array:
    """ReLU through the output-residual VJP (TPUSEG_ACT_VJP aware)."""
    return relu_outres(x) if _OUTPUT_RESIDUAL_ACTS else nn.relu(x)


def get_activation(name: tp.Optional[str]) -> tp.Optional[tp.Callable]:
    """Activation registry covering every name the reference uses."""
    if name is None:
        return None
    key = name.lower()
    if _OUTPUT_RESIDUAL_ACTS and key in ("relu", "leakyrelu", "leaky_relu"):
        return relu_outres if key == "relu" else leaky_relu_outres
    table = {
        "relu": nn.relu,
        "leakyrelu": lambda x: nn.leaky_relu(x, negative_slope=LEAKY_SLOPE),
        "leaky_relu": lambda x: nn.leaky_relu(x, negative_slope=LEAKY_SLOPE),
        "tanh": nn.tanh,
        "sigmoid": nn.sigmoid,
        "gelu": nn.gelu,
        "elu": nn.elu,
        "selu": nn.selu,
        "softmax": lambda x: nn.softmax(x, axis=-1),
        "linear": None,
        "none": None,
    }
    if key not in table:
        raise ValueError(f"Unknown activation: {name!r}")
    return table[key]


def apply_activation(x: jax.Array, name: tp.Optional[str]) -> jax.Array:
    fn = get_activation(name)
    return x if fn is None else fn(x)


class ConvBlock(nn.Module):
    """conv -> [BatchNorm] -> [activation].

    Reference: ``Conv_Block`` (2DCNN/models/unet_variants.py:7-14; 1D copies).
    Keras defaults replicated: he_uniform kernel init, BN momentum .99/eps 1e-3.
    """

    features: int
    kernel: tp.Union[int, tuple] = 3
    strides: tp.Union[int, tuple] = 1
    use_bn: bool = True
    activation: tp.Optional[str] = "relu"
    padding: str = "SAME"
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        n = _spatial_ndim(x)
        x = nn.Conv(
            self.features,
            kernel_size=_tup(self.kernel, n),
            strides=_tup(self.strides, n),
            padding=self.padding,
            use_bias=self.use_bias,
            kernel_init=nn.initializers.he_uniform(),
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)
        # saveable under remat='conv_outs' (train/state.py): keep the MXU
        # results, recompute BN-apply/activation in the backward pass
        x = checkpoint_name(x, "conv_out")
        if self.use_bn:
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.99,
                epsilon=1e-3,
                dtype=self.dtype,
                param_dtype=jnp.float32,
            )(x)
        return apply_activation(x, self.activation)


# --- Explicit-gradient transposed conv ------------------------------------
# ``lax.conv_transpose(transpose_kernel=True)`` IS the linear transpose of a
# plain strided conv F with the same kernel — that is its definition (it
# reproduces Keras Conv*DTranspose).  Autodiff of the stock lowering (an
# input-dilated conv of a flipped kernel) leaves ~10 ms/step of `reverse`
# fusions in the flagship backward pass (round-2/3 profiles).  The transpose
# identity gives both gradients directly in the forms XLA lowers best:
#   grad_x      = F(g)  — a PLAIN strided conv: no input dilation, no flips
#   grad_kernel = the standard conv weight-grad pattern, identical to every
#                 forward Conv's (jax's own rhs-transpose of F)
# Same linear maps, different op forms.  Selected by TPUSEG_TRANSCONV_VJP
# (see ``TransConv``); measured on the real chip before any default flip.


def _convt_dn(n: int) -> tp.Tuple[str, str, str]:
    """Channels-last conv dimension-number strings for n spatial dims."""
    sp = "DHW"[3 - n:]
    return ("N" + sp + "C", sp + "IO", "N" + sp + "C")


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _conv_transpose_eg(x, kernel, strides, dn):
    return jax.lax.conv_transpose(x, kernel, strides, "SAME",
                                  transpose_kernel=True,
                                  dimension_numbers=dn)


def _conv_transpose_eg_fwd(x, kernel, strides, dn):
    return _conv_transpose_eg(x, kernel, strides, dn), (x, kernel)


def _conv_transpose_eg_bwd(strides, dn, res, g):
    x, kernel = res

    def plain(k):
        # F: the forward strided conv this op is the transpose of.  The
        # stored (k..., C_out, C_in) kernel reads as HWIO with I=C_out,
        # O=C_in, so it is used as-is — no flip, no channel swap.
        return jax.lax.conv_general_dilated(
            g, k, window_strides=strides, padding="SAME",
            dimension_numbers=dn)

    grad_x, pull = jax.vjp(plain, kernel)  # primal of F(g) IS grad_x
    (grad_k,) = pull(x)
    return grad_x, grad_k


_conv_transpose_eg.defvjp(_conv_transpose_eg_fwd, _conv_transpose_eg_bwd)


class _ExplicitGradConvTranspose(nn.ConvTranspose):
    """``nn.ConvTranspose`` routed through the explicit-gradient VJP.

    Parameter names/shapes/init are identical to the parent (checkpoint-
    and converter-compatible; ``isinstance(mod, nn.ConvTranspose)`` in
    utils/keras_compat.py still matches).  Supports exactly the
    configuration ``TransConv`` uses: channels-last single-batch-dim
    input, 'SAME' padding, ``transpose_kernel=True``, no kernel
    dilation, no mask.
    """

    @nn.compact
    def __call__(self, inputs: jax.Array) -> jax.Array:
        kernel_size = ((self.kernel_size,)
                       if isinstance(self.kernel_size, int)
                       else tuple(self.kernel_size))
        n = len(kernel_size)
        if not (self.padding == "SAME" and self.transpose_kernel
                and self.mask is None and inputs.ndim == n + 2):
            raise NotImplementedError(
                "explicit-gradient transposed conv supports TransConv's "
                "configuration only (SAME / transpose_kernel / no mask)")
        strides = self.strides or 1
        strides = ((strides,) * n if isinstance(strides, int)
                   else tuple(strides))
        in_features = inputs.shape[-1]
        kernel = self.param("kernel", self.kernel_init,
                            kernel_size + (self.features, in_features),
                            self.param_dtype)
        bias = (self.param("bias", self.bias_init, (self.features,),
                           self.param_dtype) if self.use_bias else None)
        inputs, kernel, bias = self.promote_dtype(inputs, kernel, bias,
                                                  dtype=self.dtype)
        y = _conv_transpose_eg(inputs, kernel, strides, _convt_dn(n))
        if bias is not None:
            y = y + jnp.reshape(bias, (1,) * (y.ndim - 1) + (-1,))
        return y


#: Default ON: measured on the real chip (b128 256² bf16 UNet++ plain
#: step) 241.85 -> 236.79 ms/step (529.3 -> 540.6 img/s/chip) — the
#: backward `reverse` fusions drop out.  Gradients equal jax's stock
#: autodiff to 1e-5 (tests/test_transconv_vjp.py).
#: TPUSEG_TRANSCONV_VJP=stock restores jax's conv_transpose autodiff
#: (also the route to forward-mode autodiff: the custom_vjp path does
#: not support jvp/jacfwd).  Legacy 'auto' maps to the default.
def _parse_transconv_vjp() -> bool:
    value = os.environ.get("TPUSEG_TRANSCONV_VJP", "explicit")
    if value in ("explicit", "auto"):
        return True
    if value == "stock":
        return False
    import warnings
    warnings.warn(
        f"TPUSEG_TRANSCONV_VJP={value!r} is not one of 'explicit'/'stock' "
        f"(legacy 'auto' = default); using 'explicit'", stacklevel=2)
    return True


_TRANSCONV_EXPLICIT = _parse_transconv_vjp()


class TransConv(nn.Module):
    """Transposed-conv upsample block (stride-2, 4-wide kernel).

    Reference: ``trans_conv2D`` / ``trans_conv1D``
    (2DCNN/models/unet_variants.py:17-24).  Defaults: no BN, LeakyReLU.
    """

    features: int
    kernel: tp.Union[int, tuple] = 4
    strides: tp.Union[int, tuple] = 2
    use_bn: bool = False
    activation: tp.Optional[str] = "leaky_relu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        n = _spatial_ndim(x)
        cls = (_ExplicitGradConvTranspose if _TRANSCONV_EXPLICIT
               else nn.ConvTranspose)
        x = cls(
            self.features,
            kernel_size=_tup(self.kernel, n),
            strides=_tup(self.strides, n),
            padding="SAME",
            transpose_kernel=True,  # Keras Conv*DTranspose semantics/layout
            dtype=self.dtype,
            param_dtype=jnp.float32,
            # pin the child name so the param tree (checkpoints, the Keras
            # converter) is identical under either implementation
            name="ConvTranspose_0",
        )(x)
        x = checkpoint_name(x, "conv_out")
        if self.use_bn:
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.99,
                epsilon=1e-3,
                dtype=self.dtype,
                param_dtype=jnp.float32,
            )(x)
        return apply_activation(x, self.activation)


def upsample(x: jax.Array, factor: tp.Union[int, tuple] = 2,
             method: str = "bilinear") -> jax.Array:
    """Spatial upsampling (reference ``upConv_Block``, unet_variants.py:35-38).

    ``method='bilinear'`` matches Keras UpSampling2D(interpolation='bilinear')
    (half-pixel centers); ``'nearest'`` matches the Keras default.
    """
    n = _spatial_ndim(x)
    f = _tup(factor, n)
    new_spatial = tuple(int(s * fi) for s, fi in zip(x.shape[1:-1], f))
    if method == "nearest":
        for axis, fi in enumerate(f):
            if fi != 1:
                x = jnp.repeat(x, fi, axis=axis + 1)
        return x
    shape = (x.shape[0], *new_spatial, x.shape[-1])
    return jax.image.resize(x, shape, method="bilinear")


def _slicemax_pool(x: jax.Array, f: tp.Tuple[int, ...]) -> jax.Array:
    """Max-pool (window == stride) as an elementwise max of strided
    slices, with the backward pass of ``lax.reduce_window`` kept exactly
    (via custom_vjp) so tie-breaking on plateaus — common after ReLU —
    routes gradients identically to XLA's select_and_scatter.

    MEASURED AND REJECTED as the default (round 3, real-TPU A/B at the
    b128 flagship config): baseline 249.6 ms/step vs slicemax 252.9.
    The profile's 18 ms ``compare_select_fusion`` — long attributed to
    the pool forward — did NOT move; a new 1.5 ms
    ``maximum_maximum_fusion`` appeared instead, proving XLA's
    reduce_window forward was already ~1-2 ms (fused) and the 18 ms
    category is the ReLU/LeakyReLU backward select chains (elementwise
    over ~15 GB of activation+gradient traffic — bandwidth-bound,
    nothing to win).  Kept behind TPUSEG_POOL_IMPL=slicemax with an
    exact-equivalence test as the committed evidence.  Forward values
    are bit-identical (max over the same elements)."""
    import itertools

    window = (1, *f, 1)
    init = (-jnp.inf if jnp.issubdtype(x.dtype, jnp.floating)
            else jnp.iinfo(x.dtype).min)

    def ref_pool(t):
        return jax.lax.reduce_window(t, init, jax.lax.max, window, window,
                                     "VALID")

    @jax.custom_vjp
    def pool(t):
        trims = tuple((t.shape[i + 1] // fi) * fi for i, fi in enumerate(f))
        t2 = t[(slice(None), *(slice(0, tr) for tr in trims), slice(None))]
        out = None
        for offs in itertools.product(*(range(fi) for fi in f)):
            s = t2[(slice(None),
                    *(slice(o, None, fi) for o, fi in zip(offs, f)),
                    slice(None))]
            out = s if out is None else jnp.maximum(out, s)
        return out

    def fwd(t):
        return pool(t), t

    def bwd(t, g):
        _, vjp = jax.vjp(ref_pool, t)
        return vjp(g)

    pool.defvjp(fwd, bwd)
    return pool(x)


def downsample_pool(x: jax.Array, factor: tp.Union[int, tuple] = 2,
                    op: str = "max") -> jax.Array:
    """MaxPooling / AveragePooling with window == stride (Keras semantics)."""
    n = _spatial_ndim(x)
    f = _tup(factor, n)
    window = (1, *f, 1)
    if op == "max":
        if os.environ.get("TPUSEG_POOL_IMPL", "") == "slicemax":
            return _slicemax_pool(x, f)
        return jax.lax.reduce_window(
            x, -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
            jax.lax.max, window, window, "VALID")
    if op == "avg":
        summed = jax.lax.reduce_window(x, 0.0, jax.lax.add, window, window, "VALID")
        denom = 1.0
        for fi in f:
            denom *= fi
        return summed / jnp.asarray(denom, x.dtype)
    raise ValueError(f"Unknown pool op {op!r}")


def concat(*tensors: jax.Array) -> jax.Array:
    """Channel-axis concat (reference ``Concat_Block``)."""
    return jnp.concatenate(tensors, axis=-1)


def add(*tensors: jax.Array) -> jax.Array:
    """Elementwise add-merge (reference ``Add_Block``, fpn_variants.py:35)."""
    out = tensors[0]
    for t in tensors[1:]:
        out = out + t
    return out


class FeatureExtractionBlock(nn.Module):
    """Autoencoder-mode latent bottleneck: flatten -> Dense(features,
    name='features') -> Dense -> reshape back to the spatial grid.

    Reference: ``Feature_Extraction_Block`` (unet_variants.py:41-48).
    """

    model_width: int
    feature_number: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        spatial = x.shape[1:-1]
        flat = x.reshape((x.shape[0], -1))
        latent = nn.Dense(self.feature_number, name="features",
                          dtype=self.dtype, param_dtype=jnp.float32)(flat)
        size = self.model_width
        for s in spatial:
            size *= s
        latent = nn.Dense(size, dtype=self.dtype, param_dtype=jnp.float32)(latent)
        return latent.reshape((x.shape[0], *spatial, self.model_width))


class DenseBlock(nn.Module):
    """Residual conv chain used as the UNet latent layer.

    Reference: ``dense_block`` (unet_variants.py:51-56): one ConvBlock, then
    ``num_layers`` iterations of ``x = x + ConvBlock(x)``.
    """

    features: int
    kernel: tp.Union[int, tuple] = 3
    num_layers: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = ConvBlock(self.features, self.kernel, dtype=self.dtype)(x, train)
        for _ in range(self.num_layers):
            cb = ConvBlock(self.features, self.kernel, dtype=self.dtype)(x, train)
            x = x + cb
        return x


class AttentionGate(nn.Module):
    """Additive attention gate over a skip connection.

    Reference: ``Attention_Block`` (unet_variants.py:67-82):
    strided 1x1(+BN) on the skip, 1x1(+BN) on the gating signal, relu(add),
    1x1->BN->sigmoid, resampled back up by (bilinear upsample + 1-filter
    transposed conv) sum, then multiplied into the skip.
    Output channels == skip channels; ``features = num_filters * multiplier``.
    ``dialect='1d'`` switches the resampler to the 1D tree's conventions
    (nearest upsample + 2-wide BN+relu transposed conv,
    1DCNN/Models/unet_variants.py:165-167).
    """

    features: int
    dialect: str = "2d"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, skip: jax.Array, gate: jax.Array,
                 train: bool = False) -> jax.Array:
        n = _spatial_ndim(skip)
        a = nn.Conv(self.features, _tup(1, n), strides=_tup(2, n),
                    dtype=self.dtype, param_dtype=jnp.float32)(skip)
        a = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                         epsilon=1e-3, dtype=self.dtype,
                         param_dtype=jnp.float32)(a)
        b = nn.Conv(self.features, _tup(1, n), dtype=self.dtype,
                    param_dtype=jnp.float32)(gate)
        b = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                         epsilon=1e-3, dtype=self.dtype,
                         param_dtype=jnp.float32)(b)
        c = relu(a + b)
        c = nn.Conv(1, _tup(1, n), dtype=self.dtype, param_dtype=jnp.float32)(c)
        c = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                         epsilon=1e-3, dtype=self.dtype,
                         param_dtype=jnp.float32)(c)
        c = nn.sigmoid(c)
        if self.dialect == "1d":
            r1 = upsample(c, 2, method="nearest")
            r2 = TransConv(1, kernel=2, use_bn=True, activation="relu",
                           dtype=self.dtype)(c, train)
        else:
            r1 = upsample(c, 2, method="bilinear")
            r2 = TransConv(1, dtype=self.dtype)(c, train)
        return skip * (r1 + r2)


# --- Packed dual-conv execution (MultiRes family) --------------------------
# MultiResBlock and every ResPath unit issue TWO convs over the SAME input:
# the 1x1 shortcut and the kxk main/branch conv (reference MultiResBlock /
# ResPath, unet_variants.py:85-122).  The family is HBM-traffic-bound on TPU
# (benchmarks/RESULTS.json roofline_b128_plain: MultiResUNet moves 2x the
# flagship's bytes at half the FLOPs, hbm_util 0.80), so the pair is merged
# into ONE conv: the 1x1 kernel is zero-embedded at the kxk center and the
# output channels are concatenated.  This halves the input reads and merges
# the two backward input-grad convs, at the cost of 9x the (cheap) shortcut
# FLOPs.  MEASURED AND REJECTED as a default on the real chip (v5e,
# MultiResUNet 256^2 bf16 b128 plain: 335.42 packed vs 345.78 unpacked
# img/s/chip — benchmarks/RESULTS.json roofline note): XLA already lowers
# the 1x1 shortcut as a cheap matmul, so the merge buys no HBM passes and
# pays the extra MXU work.  Kept opt-in (TPUSEG_PACK_DUAL=1) so the A/B is
# reproducible and the machinery is available to future layouts.
# Numerics: zero kernel taps contribute exact zeros and each output channel
# keeps its own contraction, so the merged conv equals the two separate
# convs (verified in tests/test_packed_dual.py); BN then runs per channel
# slice, which is exactly per-branch BN.
#
# The parameter tree is bit-identical to the unpacked path: ``_CBShell``
# twins ConvBlock's scope layout (ConvBlock_n/Conv_0 + BatchNorm_0) and
# materializes the conv params through a real ``nn.Conv`` call so names,
# shapes, initializers, and rng fold paths all match — checkpoints are
# interchangeable and ``pack`` can flip per-build.  Keras-import call-order
# interception must see the unpacked call sequence; use ``pack_override``
# around ``flax_call_order`` (utils/keras_compat.py does).

_PACK_OVERRIDE: tp.Optional[bool] = None


class pack_override:
    """Context manager forcing packed execution on/off at trace time."""

    def __init__(self, value: tp.Optional[bool]):
        self.value = value

    def __enter__(self):
        global _PACK_OVERRIDE
        self._prev = _PACK_OVERRIDE
        _PACK_OVERRIDE = self.value
        return self

    def __exit__(self, *exc):
        global _PACK_OVERRIDE
        _PACK_OVERRIDE = self._prev


def _pack_enabled(field: tp.Optional[bool]) -> bool:
    if _PACK_OVERRIDE is not None:
        return _PACK_OVERRIDE
    if field is not None:
        return field
    return os.environ.get("TPUSEG_PACK_DUAL", "0") != "0"


def _center_embed(kernel: jax.Array, kshape: tp.Tuple[int, ...],
                  cin_total: int, cin_off: int) -> jax.Array:
    """Zero-embed ``kernel`` at the spatial center of a ``kshape`` kernel
    over ``cin_total`` input channels (rows ``cin_off:cin_off+cin``)."""
    pads = []
    for t, s in zip(kshape, kernel.shape[:-2]):
        lo = (t - s) // 2
        pads.append((lo, t - s - lo))
    pads.append((cin_off, cin_total - cin_off - kernel.shape[-2]))
    pads.append((0, 0))
    return jnp.pad(kernel, pads)


def _packed_conv(x: jax.Array, parts, dtype) -> jax.Array:
    """One SAME conv whose kernel is the output-channel concat of
    ``parts`` = [(kernel, bias, cin_offset), ...] (smaller spatial kernels
    zero-embedded at the center).  Matches nn.Conv's promote-to-dtype
    semantics."""
    n = _spatial_ndim(x)
    kshape = tuple(max(p[0].shape[i] for p in parts) for i in range(n))
    cin = x.shape[-1]
    K = jnp.concatenate(
        [_center_embed(k, kshape, cin, off) for k, _, off in parts], axis=-1)
    b = jnp.concatenate([b for _, b, _ in parts])
    sp = "DHW"[3 - n:]
    dn = ("N" + sp + "C", sp + "IO", "N" + sp + "C")
    y = jax.lax.conv_general_dilated(
        x.astype(dtype), K.astype(dtype), (1,) * n, "SAME",
        dimension_numbers=dn)
    return y + b.astype(dtype)


class _CBShell(nn.Module):
    """Parameter-tree twin of ``ConvBlock`` for packed execution.

    ``mode='params'``: materialize and return the conv kernel/bias (the
    params are created through a real 1-pixel ``nn.Conv`` call so init and
    naming are bit-identical to ConvBlock's; the dummy compute is DCE'd).
    ``mode='bn_act'``: apply this block's BatchNorm_0 + activation to a
    pre-BN tensor (the caller's slice of the merged conv output).
    """

    features: int
    kernel: tp.Union[int, tuple] = 3
    activation: tp.Optional[str] = "relu"
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False,
                 mode: str = "params"):
        n = _spatial_ndim(x)
        conv = nn.Conv(
            self.features,
            kernel_size=_tup(self.kernel, n),
            strides=_tup(1, n),
            padding="SAME",
            use_bias=self.use_bias,
            kernel_init=nn.initializers.he_uniform(),
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )
        if mode == "params":
            _ = conv(jnp.zeros((1,) + (1,) * n + (x.shape[-1],), self.dtype))
            p = conv.variables["params"]
            return p["kernel"], p["bias"]
        x = checkpoint_name(x, "conv_out")
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.99,
            epsilon=1e-3,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)
        return apply_activation(x, self.activation)


class MultiResBlock(nn.Module):
    """MultiRes block: 3 chained convs (0.167/0.333/0.5 * alpha*W) concat +
    1x1 shortcut, add, relu, BN.

    Reference: ``MultiResBlock`` (unet_variants.py:85-100).

    ``pack`` (default: env ``TPUSEG_PACK_DUAL``): merge the 1x1 shortcut
    conv into the first branch conv (same input) — see the packed dual-conv
    notes above.  Parameter trees are identical either way.
    """

    model_width: int
    kernel: tp.Union[int, tuple] = 3
    alpha: float = 1.0
    #: the 1D tree truncates branch widths BEFORE multiplying by the level
    #: multiplier (1DCNN Models MultiResBlock: Conv_Block(.., int(w*f),
    #: kernel, multiplier)); the 2D tree passes the full width in.  2D
    #: callers leave multiplier=1; 1D callers pass base width + multiplier.
    multiplier: int = 1
    mixer: bool = False  # ConvMixer blocks as the conv unit (convmixer_unet.py)
    pack: tp.Optional[bool] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        Block = (lambda f, k: ConvMixerBlock(f, k, dtype=self.dtype)) if self.mixer \
            else (lambda f, k: ConvBlock(f, k, dtype=self.dtype))
        w = self.alpha * self.model_width
        # int() truncation as in the reference; clamped to >=1 so tiny test
        # widths (which crash the reference) still build
        m = self.multiplier
        f1, f2, f3 = (max(int(w * 0.167), 1) * m, max(int(w * 0.333), 1) * m,
                      max(int(w * 0.5), 1) * m)
        if not self.mixer and _pack_enabled(self.pack):
            return self._packed(x, train, f1, f2, f3)
        shortcut = Block(f1 + f2 + f3, 1)(x, train)
        c3 = Block(f1, self.kernel)(x, train)
        c5 = Block(f2, self.kernel)(c3, train)
        c7 = Block(f3, self.kernel)(c5, train)
        out = jnp.concatenate([c3, c5, c7], axis=-1)
        out = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                           epsilon=1e-3, dtype=self.dtype,
                           param_dtype=jnp.float32)(out)
        out = relu(shortcut + out)
        out = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                           epsilon=1e-3, dtype=self.dtype,
                           param_dtype=jnp.float32)(out)
        return out

    def _packed(self, x: jax.Array, train: bool,
                f1: int, f2: int, f3: int) -> jax.Array:
        """Dual-conv-merged execution: the 1x1 shortcut and the first branch
        conv share input ``x`` and run as ONE conv (see packed notes above).
        Parameter tree identical to the unpacked path."""
        F = f1 + f2 + f3
        sc = _CBShell(F, 1, dtype=self.dtype, name="ConvBlock_0")
        br = _CBShell(f1, self.kernel, dtype=self.dtype, name="ConvBlock_1")
        ks, bs = sc(x, mode="params")
        k3, b3 = br(x, mode="params")
        u = _packed_conv(x, [(ks, bs, 0), (k3, b3, 0)], self.dtype)
        shortcut = sc(u[..., :F], train, mode="bn_act")
        c3 = br(u[..., F:], train, mode="bn_act")
        c5 = ConvBlock(f2, self.kernel, dtype=self.dtype,
                       name="ConvBlock_2")(c3, train)
        c7 = ConvBlock(f3, self.kernel, dtype=self.dtype,
                       name="ConvBlock_3")(c5, train)
        out = jnp.concatenate([c3, c5, c7], axis=-1)
        out = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                           epsilon=1e-3, dtype=self.dtype,
                           param_dtype=jnp.float32)(out)
        out = relu(shortcut + out)
        out = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                           epsilon=1e-3, dtype=self.dtype,
                           param_dtype=jnp.float32)(out)
        return out


class ResPath(nn.Module):
    """Chain of ``length`` residual (3x3 conv + 1x1 shortcut) units with
    relu+BN after each add.  Reference: ``ResPath`` (unet_variants.py:103-122).
    """

    length: int
    model_width: int
    kernel: tp.Union[int, tuple] = 3
    pack: tp.Optional[bool] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        packed = _pack_enabled(self.pack)
        W = self.model_width
        out = x
        for i in range(max(self.length, 1)):
            if packed:
                # 1x1 shortcut + kxk main share the input: run as ONE conv
                # (see packed dual-conv notes above); tree-identical.
                cs = _CBShell(W, 1, dtype=self.dtype,
                              name=f"ConvBlock_{2 * i}")
                cm = _CBShell(W, self.kernel, dtype=self.dtype,
                              name=f"ConvBlock_{2 * i + 1}")
                ks, bs = cs(out, mode="params")
                km, bm = cm(out, mode="params")
                u = _packed_conv(out, [(ks, bs, 0), (km, bm, 0)], self.dtype)
                shortcut = cs(u[..., :W], train, mode="bn_act")
                main = cm(u[..., W:], train, mode="bn_act")
            else:
                shortcut = ConvBlock(W, 1, dtype=self.dtype)(out, train)
                main = ConvBlock(W, self.kernel, dtype=self.dtype)(out, train)
            out = relu(shortcut + main)
            out = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                               epsilon=1e-3, dtype=self.dtype,
                               param_dtype=jnp.float32)(out)
        return out


class SqueezeExcite(nn.Module):
    """SE channel-attention block (reference: 1DCNN/Models/SEDUNet.py:79-86):
    GAP -> Dense(C//ratio, relu) -> Dense(C, sigmoid) -> scale.
    """

    ratio: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        spatial_axes = tuple(range(1, x.ndim - 1))
        s = jnp.mean(x, axis=spatial_axes)
        s = nn.Dense(max(c // self.ratio, 1), dtype=self.dtype,
                     param_dtype=jnp.float32)(s)
        s = relu(s)
        s = nn.Dense(c, dtype=self.dtype, param_dtype=jnp.float32)(s)
        s = nn.sigmoid(s)
        s = s.reshape((x.shape[0],) + (1,) * len(spatial_axes) + (c,))
        return x * s


class SpatialAttention(nn.Module):
    """CBAM-style spatial attention: channelwise mean+max -> concat ->
    wide-kernel conv -> sigmoid gate.  Reference: ``spatial_attention``
    (1DCNN/Models/saunet_variants.py:234-247).
    """

    kernel: int = 7
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        n = _spatial_ndim(x)
        avg = jnp.mean(x, axis=-1, keepdims=True)
        mx = jnp.max(x, axis=-1, keepdims=True)
        feat = jnp.concatenate([avg, mx], axis=-1)
        gate = nn.Conv(1, _tup(self.kernel, n), use_bias=False,
                       dtype=self.dtype, param_dtype=jnp.float32)(feat)
        return x * nn.sigmoid(gate)


class DropBlock(nn.Module):
    """Contiguous-block dropout with valid-seed-region sampling and
    renormalization.  Reference: ``DropBlock1D``
    (1DCNN/Models/saunet_variants.py:53-121); rank-polymorphic here.
    """

    block_size: int = 7
    keep_prob: float = 0.9
    deterministic: tp.Optional[bool] = None

    @nn.compact
    def __call__(self, x: jax.Array,
                 deterministic: tp.Optional[bool] = None) -> jax.Array:
        det = nn.merge_param("deterministic", self.deterministic, deterministic)
        if det or self.keep_prob >= 1.0:
            return x
        n = _spatial_ndim(x)
        spatial = x.shape[1:-1]
        bs = min(self.block_size, min(spatial))
        # gamma: seed-rate so that expected dropped fraction == 1 - keep_prob
        feat = 1.0
        valid = 1.0
        for s in spatial:
            feat *= s
            valid *= max(s - bs + 1, 1)
        gamma = (1.0 - self.keep_prob) / (bs ** n) * feat / valid
        rng = self.make_rng("dropout")
        # sample seeds only in the valid region (centers fit in bounds)
        mask_shape = list(x.shape)
        seeds = jax.random.bernoulli(rng, gamma, tuple(mask_shape)).astype(x.dtype)
        # limit seeds to the valid region with a static border mask
        for axis, s in enumerate(spatial):
            idx = jnp.arange(s)
            lo = (bs - 1) // 2
            hi = s - (bs // 2)
            border = ((idx >= lo) & (idx < hi)).astype(x.dtype)
            shape = [1] * x.ndim
            shape[axis + 1] = s
            seeds = seeds * border.reshape(shape)
        # expand each seed into a block via max-pool with window block_size
        window = (1, *(_tup(bs, n)), 1)
        block = jax.lax.reduce_window(
            seeds, 0.0, jax.lax.max, window, (1,) * x.ndim, "SAME")
        mask = 1.0 - block
        denom = jnp.mean(mask)
        return x * mask / jnp.maximum(denom, 1e-7)


class RecurrentConvBlock(nn.Module):
    """Recurrent conv block for RUNet/R2UNet variants.

    Reference: ``Recurrent_Conv_Block`` (1DCNN/Models/unet_variants.py:64-73):
    t iterations of ``x = concat(ConvBlock(x), inputs)`` followed by a final
    ConvBlock.  The unrolled chain is static, so XLA fuses the concat into
    the next conv's input gather.
    """

    features: int
    kernel: tp.Union[int, tuple] = 3
    t: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        inputs = x
        for _ in range(self.t):
            tmp = ConvBlock(self.features, self.kernel, dtype=self.dtype)(x, train)
            x = jnp.concatenate([tmp, inputs], axis=-1)
        return ConvBlock(self.features, self.kernel, dtype=self.dtype)(x, train)


class SelfRecurrentConvBlock(nn.Module):
    """Self-ONN recurrent conv block (reference ``Self_Recurrent_Conv_Block``
    1DCNN/Models/unet_variants.py:76-85): t iterations of
    ``x = concat(Oper(x), inputs)`` + final plain ConvBlock."""

    features: int
    kernel: tp.Union[int, tuple] = 3
    t: int = 2
    q: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        from .onn import Oper
        inputs = x
        for _ in range(self.t):
            tmp = Oper(self.features, self.kernel, q=self.q, dtype=self.dtype)(x)
            x = jnp.concatenate([tmp, inputs], axis=-1)
        return ConvBlock(self.features, self.kernel, dtype=self.dtype)(x, train)


class ConvMixerBlock(nn.Module):
    """ConvMixer block (reference 1DCNN/Models/convmixer_unet.py:6-18):
    depthwise conv -> gelu -> BN -> residual add -> pointwise conv -> gelu
    -> BN.  Also covers ``Conv_Block_DW`` (unet_variants.py:87-100)."""

    features: int
    kernel: tp.Union[int, tuple] = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        n = _spatial_ndim(x)
        c_in = x.shape[-1]
        # named 'dw' so conversion streams it as depthwise even at c_in=1
        # (feature_group_count=1 is then indistinguishable from a plain
        # conv); gelu approximate=False matches Keras's exact gelu
        dw = nn.Conv(c_in, _tup(self.kernel, n), feature_group_count=c_in,
                     padding="SAME", dtype=self.dtype,
                     param_dtype=jnp.float32, name="dw")(x)
        dw = nn.gelu(dw, approximate=False)
        dw = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                          epsilon=1e-3, dtype=self.dtype,
                          param_dtype=jnp.float32)(dw)
        x = dw + x
        x = nn.Conv(self.features, _tup(1, n), dtype=self.dtype,
                    param_dtype=jnp.float32)(x)
        x = nn.gelu(x, approximate=False)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                         epsilon=1e-3, dtype=self.dtype,
                         param_dtype=jnp.float32)(x)
        return x


class MixPool(nn.Module):
    """max-pool + avg-pool sum -> 1x1 conv (reference ``mix_pool_layer``,
    1DCNN/Models/unet_variants.py:146-151 / MLMRSNet.py:57-63)."""

    pool_size: int = 2
    window: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        n = _spatial_ndim(x)
        w = (1, *(_tup(self.window, n)), 1)
        s = (1, *(_tup(self.pool_size, n)), 1)
        mx = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, w, s, "SAME")
        sm = jax.lax.reduce_window(x, 0.0, jax.lax.add, w, s, "SAME")
        # TF 'SAME' avg-pool excludes padding from the divisor
        cnt = jax.lax.reduce_window(jnp.ones_like(x), 0.0, jax.lax.add, w, s,
                                    "SAME")
        avg = sm / cnt
        return nn.Conv(x.shape[-1], _tup(1, n), dtype=self.dtype,
                       param_dtype=jnp.float32)(mx + avg)


def np_prod(t: tuple) -> int:
    out = 1
    for v in t:
        out *= v
    return out


class ConvLSTMCell(nn.Module):
    """One fused ConvLSTM step over a synthetic length-1 "time" axis.

    The reference's BiConvLSTM skip-fusion trick reshapes two tensors to
    (B, 1, ..., C), concats on channels and runs ConvLSTM with
    return_sequences=False/go_backwards=True (e.g. 2DCNN models
    unet_variants.py:144-149, 1DCNN/Models/BCDUNet.py:152-156).  With one
    timestep that is exactly one LSTM cell application from a zero state, so
    we implement the single fused step (Keras gate order i, f, c, o).
    """

    features: int
    kernel: tp.Union[int, tuple] = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        n = _spatial_ndim(x)
        gates_x = nn.Conv(
            4 * self.features, _tup(self.kernel, n), padding="SAME",
            kernel_init=nn.initializers.he_normal(),
            dtype=self.dtype, param_dtype=jnp.float32, name="input_conv")(x)
        # Keras ConvLSTM carries a recurrent kernel; with one timestep from
        # the zero state its contribution (and its gradient) is identically
        # zero, so it is created for param-count/checkpoint parity but never
        # applied.  Bias lives in input_conv.
        self.param("recurrent_kernel", nn.initializers.orthogonal(),
                   tuple(_tup(self.kernel, n)) + (self.features,
                                                  4 * self.features),
                   jnp.float32)
        i, f, g, o = jnp.split(gates_x, 4, axis=-1)
        i = nn.sigmoid(i)
        f = nn.sigmoid(f)
        g = nn.tanh(g)
        o = nn.sigmoid(o)
        c = i * g  # c0 = 0 so f * c0 vanishes
        return o * nn.tanh(c)


class ConvLSTMFusion(nn.Module):
    """LSTM-mode skip fusion: stack [skip, deconv, (extra)] on channels and
    apply one ConvLSTM cell with ``features`` output channels."""

    features: int
    kernel: tp.Union[int, tuple] = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, *tensors: jax.Array) -> jax.Array:
        merged = jnp.concatenate(tensors, axis=-1)
        return ConvLSTMCell(self.features, self.kernel, dtype=self.dtype)(merged)


class BiConvLSTM(nn.Module):
    """Bidirectional two-step ConvLSTM over a synthetic time axis of two
    same-shape tensors (a fusion pair).

    Unlike ``ConvLSTMCell`` (one step from the zero state, where the
    recurrent kernel is inert), both directions here take TWO steps with
    shared weights, so the recurrent kernel genuinely mixes the pair:
    forward processes (a, b), backward processes (b, a); the output is the
    concatenation of the two final hidden states (2*features channels).
    The two steps are unrolled (no scan) — XLA fuses the gate math into the
    four convolutions.  Building block for NABNet (reference README.md:14,
    citation [9]); the reference ships no code for it.
    """

    features: int
    kernel: tp.Union[int, tuple] = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, a: jax.Array, b: jax.Array) -> jax.Array:
        n = _spatial_ndim(a)
        f = self.features
        conv_x = nn.Conv(4 * f, _tup(self.kernel, n), padding="SAME",
                         kernel_init=nn.initializers.he_normal(),
                         dtype=self.dtype, param_dtype=jnp.float32,
                         name="input_conv")
        conv_h = nn.Conv(4 * f, _tup(self.kernel, n), padding="SAME",
                         kernel_init=nn.initializers.orthogonal(),
                         use_bias=False, dtype=self.dtype,
                         param_dtype=jnp.float32, name="recurrent_conv")

        def step(x, h, c):
            gates = conv_x(x) if h is None else conv_x(x) + conv_h(h)
            i, fg, g, o = jnp.split(gates, 4, axis=-1)
            new_c = nn.tanh(g) * nn.sigmoid(i) if c is None else \
                nn.sigmoid(fg) * c + nn.sigmoid(i) * nn.tanh(g)
            return nn.sigmoid(o) * nn.tanh(new_c), new_c

        h, c = step(a, None, None)
        h_fwd, _ = step(b, h, c)
        h, c = step(b, None, None)
        h_bwd, _ = step(a, h, c)
        return jnp.concatenate([h_fwd, h_bwd], axis=-1)
