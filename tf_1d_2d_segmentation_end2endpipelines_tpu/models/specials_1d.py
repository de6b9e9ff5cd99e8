"""1D special families: BCDUNet, SEDUNet (MCGUNet), IBAUNet.

References:
- BCDUNet: 1DCNN/Models/BCDUNet.py (dense-concat bottleneck :70-76, decoder
  whose skips fuse ONLY through the ConvLSTM branch :152-156)
- SEDUNet: 1DCNN/Models/SEDUNet.py (SqueezeExcite :79-86, SE after each
  upsample + BN/relu :165-167 and between the two decoder convs :174)
- IBAUNet: 1DCNN/Models/IBAUNet.py (RI_Block :52-66, Attention_LSTM_Block
  :68-87, attention applied after upsampling with the upsampled gate)
"""
from __future__ import annotations

import math
import typing as tp

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import (
    AttentionGate,
    ConvBlock,
    ConvLSTMCell,
    ConvLSTMFusion,
    FeatureExtractionBlock,
    SqueezeExcite,
    TransConv,
    concat,
    downsample_pool,
    relu,
    upsample,
)

Dtype = tp.Any


class DenseConcatBlock(nn.Module):
    """Densely-connected bottleneck (BCDUNet.py:70-76): num_layers iterations
    of ``x = concat(x, ConvBlock(ConvBlock(x)))``."""

    features: int
    kernel: int = 3
    num_layers: int = 0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        for _ in range(self.num_layers):
            cb = ConvBlock(self.features, self.kernel, dtype=self.dtype)(x, train)
            cb = ConvBlock(self.features, self.kernel, dtype=self.dtype)(cb, train)
            x = concat(x, cb)
        return x


class RIBlock(nn.Module):
    """Redesigned-Inception block (IBAUNet.py:52-66): 1x1 branch + a 3-conv
    3x3 chain whose three stages concat to exactly ``features`` channels,
    residual-added to the 1x1 branch."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        f = self.features
        b1 = ConvBlock(f, 1, dtype=self.dtype)(x, train)
        c0 = ConvBlock(max(int(f / 2), 1), 1, dtype=self.dtype)(x, train)
        c1 = ConvBlock(max(math.ceil(f / 6), 1), 3, dtype=self.dtype)(c0, train)
        c2 = ConvBlock(max(math.floor(f / 3), 1), 3, dtype=self.dtype)(c1, train)
        c3 = ConvBlock(max(int(f / 2), 1), 3, dtype=self.dtype)(c2, train)
        b3 = concat(c1, c2, c3)
        if b3.shape[-1] != b1.shape[-1]:
            # tiny-width fallback: project to match (reference crashes here)
            b3 = ConvBlock(f, 1, use_bn=False, activation=None,
                           dtype=self.dtype)(b3, train)
        return b3 + b1


class AttentionLSTMGate(nn.Module):
    """Attention gate whose merge is a single ConvLSTM step
    (IBAUNet.py:68-87).  Both skip and (already-upsampled) gate are strided
    1x1-conv'd to half resolution, fused by ConvLSTM, squashed to one
    channel, resampled up and multiplied into the skip."""

    features: int
    lstm_features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, skip: jax.Array, gate: jax.Array,
                 train: bool = False) -> jax.Array:
        a = nn.Conv(self.features, (1,), strides=(2,), dtype=self.dtype,
                    param_dtype=jnp.float32)(skip)
        a = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                         epsilon=1e-3, dtype=self.dtype,
                         param_dtype=jnp.float32)(a)
        b = nn.Conv(self.features, (1,), strides=(2,), dtype=self.dtype,
                    param_dtype=jnp.float32)(gate)
        b = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                         epsilon=1e-3, dtype=self.dtype,
                         param_dtype=jnp.float32)(b)
        c = ConvLSTMCell(max(self.lstm_features, 1),
                         dtype=self.dtype)(concat(a, b))
        c = nn.Conv(1, (1,), dtype=self.dtype, param_dtype=jnp.float32)(c)
        c = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                         epsilon=1e-3, dtype=self.dtype,
                         param_dtype=jnp.float32)(c)
        c = nn.sigmoid(relu(c))
        r = upsample(c, 2, method="nearest") + TransConv(
            1, kernel=2, use_bn=True, activation="relu",
            dtype=self.dtype)(c, train)
        return skip * r


class _Special1DBase(nn.Module):
    model_width: int
    model_depth: int
    kernel_size: int = 3
    problem_type: str = "Regression"
    output_nums: int = 1
    ds: int = 0
    ae: int = 0
    ag: int = 0
    lstm: int = 0
    dense_loop: int = 1
    se_ratio: int = 16
    feature_number: int = 1024
    is_transconv: bool = True
    dtype: Dtype = jnp.float32

    def _up(self, x: jax.Array, feats: int, train: bool) -> jax.Array:
        if self.is_transconv:
            return TransConv(feats, kernel=2, use_bn=True, activation="relu",
                             dtype=self.dtype)(x, train)
        return upsample(x, 2, method="nearest")

    def _head(self, deconv: jax.Array, levels: tp.List[jax.Array]
              ) -> tp.Dict[str, jax.Array]:
        out = nn.Conv(self.output_nums, (1,), dtype=self.dtype,
                      param_dtype=jnp.float32, name="out")(deconv)
        if self.problem_type == "Classification":
            out = nn.softmax(out, axis=-1)
        outputs = {"out": out}
        if self.ds == 1:
            for idx, lvl in enumerate(levels):
                outputs[f"level{self.model_depth - idx}"] = lvl
        return outputs

    def _ds(self, x: jax.Array, level: int) -> jax.Array:
        return nn.Conv(1, (1,), dtype=self.dtype, param_dtype=jnp.float32,
                       name=f"level{level}")(x)


class BCDUNet(_Special1DBase):
    """Bi-directional ConvLSTM Dense UNet (1DCNN/Models/BCDUNet.py:111-175).

    Skip connections fuse ONLY through the ConvLSTM branch (with lstm=0 the
    decoder is skip-free -- a deliberate reference behavior)."""

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False
                 ) -> tp.Dict[str, jax.Array]:
        D, W, k = self.model_depth, self.model_width, self.kernel_size
        x = x.astype(self.dtype)
        taps = []
        pool = x
        for i in range(1, D + 1):
            conv = ConvBlock(W * 2 ** (i - 1), k, dtype=self.dtype)(pool, train)
            conv = ConvBlock(W * 2 ** (i - 1), k, dtype=self.dtype)(conv, train)
            pool = downsample_pool(conv, 2, op="max")
            taps.append(conv)
        conv = DenseConcatBlock(W * 2 ** D, k, num_layers=self.dense_loop - 1,
                                dtype=self.dtype)(pool, train)
        if self.ae == 1:
            conv = FeatureExtractionBlock(W, self.feature_number,
                                          dtype=self.dtype)(conv)
        conv = ConvBlock(W * 2 ** D, k, dtype=self.dtype)(conv, train)
        conv = ConvBlock(W * 2 ** D, k, dtype=self.dtype)(conv, train)

        deconv = conv
        levels: tp.List[jax.Array] = []
        for j in range(D):
            feats = W * 2 ** (D - j - 1)
            skip = taps[D - j - 1]
            if self.ag == 1:
                skip = AttentionGate(feats, dialect="1d", dtype=self.dtype)(
                    taps[D - j - 1], deconv, train)
            if self.ds == 1:
                levels.append(self._ds(deconv, D - j))
            deconv = self._up(deconv, feats, train)
            if self.lstm == 1:
                deconv = ConvLSTMFusion(max(int(W * 2 ** (D - j - 2)), 1),
                                        dtype=self.dtype)(skip, deconv)
            deconv = ConvBlock(feats, k, dtype=self.dtype)(deconv, train)
            deconv = ConvBlock(feats, k, dtype=self.dtype)(deconv, train)
        return self._head(deconv, levels)


class SEDUNet(_Special1DBase):
    """SE-Dense UNet / MCGUNet (1DCNN/Models/SEDUNet.py:124-198): BCDUNet
    with SqueezeExcite after each upsample (+BN/relu) and between the two
    decoder convs."""

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False
                 ) -> tp.Dict[str, jax.Array]:
        D, W, k = self.model_depth, self.model_width, self.kernel_size
        x = x.astype(self.dtype)
        taps = []
        pool = x
        for i in range(1, D + 1):
            conv = ConvBlock(W * 2 ** (i - 1), k, dtype=self.dtype)(pool, train)
            conv = ConvBlock(W * 2 ** (i - 1), k, dtype=self.dtype)(conv, train)
            pool = downsample_pool(conv, 2, op="max")
            taps.append(conv)
        conv = DenseConcatBlock(W * 2 ** D, k, num_layers=self.dense_loop - 1,
                                dtype=self.dtype)(pool, train)
        if self.ae == 1:
            conv = FeatureExtractionBlock(W, self.feature_number,
                                          dtype=self.dtype)(conv)
        conv = ConvBlock(W * 2 ** D, k, dtype=self.dtype)(conv, train)
        conv = ConvBlock(W * 2 ** D, k, dtype=self.dtype)(conv, train)

        deconv = conv
        levels: tp.List[jax.Array] = []
        for j in range(D):
            feats = W * 2 ** (D - j - 1)
            skip = taps[D - j - 1]
            if self.ag == 1:
                skip = AttentionGate(feats, dialect="1d", dtype=self.dtype)(
                    taps[D - j - 1], deconv, train)
            if self.ds == 1:
                levels.append(self._ds(deconv, D - j))
            deconv = self._up(deconv, feats, train)
            deconv = SqueezeExcite(ratio=self.se_ratio,
                                   dtype=self.dtype)(deconv)
            deconv = nn.BatchNorm(use_running_average=not train,
                                  momentum=0.99, epsilon=1e-3,
                                  dtype=self.dtype,
                                  param_dtype=jnp.float32)(deconv)
            deconv = relu(deconv)
            if self.lstm == 1:
                deconv = ConvLSTMFusion(max(int(W * 2 ** (D - j - 2)), 1),
                                        dtype=self.dtype)(skip, deconv)
            deconv = ConvBlock(feats, k, dtype=self.dtype)(deconv, train)
            deconv = SqueezeExcite(ratio=self.se_ratio,
                                   dtype=self.dtype)(deconv)
            deconv = ConvBlock(feats, k, dtype=self.dtype)(deconv, train)
        return self._head(deconv, levels)


class IBAUNet(_Special1DBase):
    """Inception-Block Attention UNet (1DCNN/Models/IBAUNet.py:116-172):
    RI blocks everywhere; guided attention is an Attention-LSTM gate applied
    AFTER upsampling with the upsampled tensor as the gating signal."""

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False
                 ) -> tp.Dict[str, jax.Array]:
        D, W = self.model_depth, self.model_width
        x = x.astype(self.dtype)
        taps = []
        pool = x
        for i in range(1, D + 1):
            conv = RIBlock(W * 2 ** (i - 1), dtype=self.dtype)(pool, train)
            pool = downsample_pool(conv, 2, op="max")
            taps.append(conv)
        conv = RIBlock(W * 2 ** D, dtype=self.dtype)(pool, train)
        if self.ae == 1:
            conv = FeatureExtractionBlock(W, self.feature_number,
                                          dtype=self.dtype)(conv)
        conv = RIBlock(W * 2 ** D, dtype=self.dtype)(conv, train)

        deconv = conv
        levels: tp.List[jax.Array] = []
        for j in range(D):
            feats = W * 2 ** (D - j - 1)
            if self.ds == 1:
                levels.append(self._ds(deconv, D - j))
            deconv = self._up(deconv, feats, train)
            skip = taps[D - j - 1]
            if self.ag == 1:
                skip = AttentionLSTMGate(
                    feats, lstm_features=max(int(W * 2 ** (D - j - 2)), 1),
                    dtype=self.dtype)(taps[D - j - 1], deconv, train)
            deconv = concat(deconv, skip)
            deconv = RIBlock(feats, dtype=self.dtype)(deconv, train)
        return self._head(deconv, levels)


class NABNet(_Special1DBase):
    """NABNet — Nested Attention-guided BiConvLSTM Network.

    The reference lists NABNet as model #10 (README.md:14, citation [9]
    Mahmud et al., Biomedical Signal Processing and Control 79:104247,
    2023) but ships NO code for it, so no numerical parity fixture is
    possible; this is a capability-parity implementation assembled from
    this package's own primitives per the paper's description:

    - a UNet++-style nested dense-skip grid (the topology of
      1DCNN/Models/unet_variants.py:544-646),
    - every grid-node fusion attention-guided: each incoming same-row
      tensor passes an AttentionGate gated by the node below,
    - the gated aggregate merges with the upsampled below-node through a
      genuine bidirectional two-step ConvLSTM (``ops.BiConvLSTM``) instead
      of concatenation,
    - over a BCDUNet-style densely-connected bottleneck
      (Models/BCDUNet.py:70-76).
    """

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False
                 ) -> tp.Dict[str, jax.Array]:
        from ..ops import BiConvLSTM
        D, W, k = self.model_depth, self.model_width, self.kernel_size
        x = x.astype(self.dtype)
        # ---- encoder: double conv per level ----
        skips: tp.List[jax.Array] = []
        pool = x
        for i in range(1, D + 1):
            conv = ConvBlock(W * 2 ** (i - 1), k, dtype=self.dtype)(pool, train)
            conv = ConvBlock(W * 2 ** (i - 1), k, dtype=self.dtype)(conv, train)
            pool = downsample_pool(conv, 2, op="max")
            skips.append(conv)
        # ---- densely-connected bottleneck ----
        conv = DenseConcatBlock(W * 2 ** D, k, num_layers=self.dense_loop - 1,
                                dtype=self.dtype)(pool, train)
        if self.ae == 1:
            conv = FeatureExtractionBlock(W, self.feature_number,
                                          dtype=self.dtype)(conv)
        conv = ConvBlock(W * 2 ** D, k, dtype=self.dtype)(conv, train)
        conv = ConvBlock(W * 2 ** D, k, dtype=self.dtype)(conv, train)
        skips.append(conv)  # skips[D] = bottleneck (row-D source)

        # ---- nested attention-guided BiConvLSTM grid ----
        levels: tp.List[jax.Array] = []
        if self.ds == 1:
            levels.append(self._ds(skips[0], D))
        nodes: tp.Dict[tp.Tuple[int, int], jax.Array] = {}
        for i in range(1, D + 1):          # grid column
            for j in range(0, D - i + 1):  # resolution row
                src = skips[j + 1] if i == 1 else nodes[(j + 1, i - 1)]
                width_j = W * (2 ** j)
                parts = [skips[j]] + [nodes[(j, c)] for c in range(1, i)]
                parts = [AttentionGate(width_j, dialect="1d",
                                       dtype=self.dtype)(p, src, train)
                         for p in parts]
                agg = concat(*parts) if len(parts) > 1 else parts[0]
                if agg.shape[-1] != width_j:
                    # project the dense aggregate to the row width so it can
                    # share the BiConvLSTM input conv with the upsampled node
                    agg = ConvBlock(width_j, 1, dtype=self.dtype)(agg, train)
                up = self._up(src, width_j, train)
                fused = BiConvLSTM(max(width_j // 2, 1), k,
                                   dtype=self.dtype)(agg, up)
                node = ConvBlock(width_j, k, dtype=self.dtype)(fused, train)
                node = ConvBlock(width_j, k, dtype=self.dtype)(node, train)
                nodes[(j, i)] = node
                if self.ds == 1 and j == 0 and i < D:
                    levels.append(self._ds(node, D - i))
        return self._head(nodes[(0, D)], levels)
