"""Remaining 1D families: TernausNet, AlbuNet, LinkNet, FPN.

References:
- TernausNet (1DCNN/Models/TernausNet.py): UNet with VGG11/13/16/19-style
  scratch encoders; decoder convs come BEFORE the upsample+concat; DS heads
  named level4..level0 (:90-397)
- AlbuNet (1DCNN/Models/AlbuNet.py): ResNet18/34/50/101/152-style scratch
  encoders (+stem :49) and a LinkNet-ish decoder of 1x1 -> transconv -> 1x1
  units (:197-206).  Two reference bugs are fixed to their evident intent:
  the group connector's three stride-2 convs (:66-73, which would shrink 8x
  per group and crash on real lengths) use one stride-2 conv, and the skip
  adapters' stride `len+1` (:215) is stride 1.
- LinkNet (1DCNN/Models/linknet.py): add-merge decoders; LinkNet/E/P/PP +
  MultiResLinkNet (:123-469)
- FPN (1DCNN/Models/FPN.py:106-191): 1-filter lateral convs (a reference
  quirk -- the skip add broadcasts over channels), add-merge top-down,
  concat pyramid of all decoder stages
"""
from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import (
    AttentionGate,
    ConvBlock,
    FeatureExtractionBlock,
    TransConv,
    concat,
    downsample_pool,
    relu,
    upsample,
)
from .decoders import ChainDecoder, GridDecoder

Dtype = tp.Any


def _head_1d(module, deconv, levels, name_from: int = None):
    out = nn.Conv(module.output_nums, (1,), dtype=module.dtype,
                  param_dtype=jnp.float32, name="out")(deconv)
    if module.problem_type == "Classification":
        out = nn.softmax(out, axis=-1)
    outputs = {"out": out}
    if module.ds == 1:
        start = module.model_depth if name_from is None else name_from
        for idx, lvl in enumerate(levels):
            outputs[f"level{start - idx}"] = lvl
    return outputs


class TernausNetModel(nn.Module):
    """variant in {11, 13, 16, 19}; fixed depth-5 VGG-style encoder."""

    variant: int
    model_width: int
    problem_type: str = "Regression"
    output_nums: int = 1
    ds: int = 0
    ae: int = 0
    ag: int = 0
    feature_number: int = 1024
    is_transconv: bool = True
    dtype: Dtype = jnp.float32
    model_depth: int = 5  # fixed by the architecture

    #: convs per stage / kernel of each conv, per variant (TernausNet.py)
    _STAGES = {
        11: [[3], [3], [3, 3], [3, 3], [3, 3]],
        13: [[3, 3], [3, 3], [3, 3], [3, 3], [3, 3]],
        16: [[3, 3], [3, 3], [3, 3, 1], [3, 3, 1], [3, 3, 1]],
        19: [[3, 3], [3, 3], [3, 3, 3, 3], [3, 3, 3, 3], [3, 3, 3, 3]],
    }
    _MULTS = [1, 2, 4, 8, 8]

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False
                 ) -> tp.Dict[str, jax.Array]:
        W = self.model_width
        x = x.astype(self.dtype)
        taps = []
        pool = x
        for stage, kernels in enumerate(self._STAGES[self.variant]):
            f = W * self._MULTS[stage]
            conv = pool
            for k in kernels:
                conv = ConvBlock(f, k, dtype=self.dtype)(conv, train)
            pool = downsample_pool(conv, 2, op="max")
            taps.append(conv)
        if self.ae == 1:
            pool = FeatureExtractionBlock(W, self.feature_number,
                                          dtype=self.dtype)(pool)
        conv = ConvBlock(W * 8, 3, dtype=self.dtype)(pool, train)
        conv = ConvBlock(W * 8, 3, dtype=self.dtype)(conv, train)

        deconv = conv
        levels: tp.List[jax.Array] = []
        for j in range(5):
            # decoder widths follow 2**(4-j) (TernausNet.py decoder), NOT
            # the encoder's stage multipliers which cap at 8
            mult = 2 ** (4 - j)
            skip = taps[4 - j]
            if self.ag == 1:
                skip = AttentionGate(W * mult, dialect="1d", dtype=self.dtype)(
                    taps[4 - j], deconv, train)
            deconv = ConvBlock(W * mult, 3, dtype=self.dtype)(deconv, train)
            deconv = ConvBlock(W * mult, 3, dtype=self.dtype)(deconv, train)
            if self.is_transconv:
                up = TransConv(W * mult, kernel=4, strides=2, use_bn=True,
                               activation="relu", dtype=self.dtype)(deconv, train)
            else:
                up = upsample(deconv, 2, method="nearest")
            deconv = concat(up, skip)
            if self.ds == 1:
                levels.append(nn.Conv(1, (1,), dtype=self.dtype,
                                      param_dtype=jnp.float32,
                                      name=f"level{4 - j}")(deconv))
        deconv = ConvBlock(W, 3, dtype=self.dtype)(deconv, train)
        return _head_1d(self, deconv, levels, name_from=4)


class TernausNet:
    """Facade (TernausNet.py:68-88): methods TernausNet11/13/16/19."""

    def __init__(self, length, num_channel, model_width, ds=0, ae=0, ag=0,
                 problem_type="Regression", output_nums=1,
                 feature_number=1024, is_transconv=True, dtype=jnp.float32):
        self._kw = dict(model_width=model_width, problem_type=problem_type,
                        output_nums=output_nums, ds=ds, ae=ae, ag=ag,
                        feature_number=feature_number,
                        is_transconv=is_transconv, dtype=dtype)

    def TernausNet11(self):
        return TernausNetModel(variant=11, **self._kw)

    def TernausNet13(self):
        return TernausNetModel(variant=13, **self._kw)

    def TernausNet16(self):
        return TernausNetModel(variant=16, **self._kw)

    def TernausNet19(self):
        return TernausNetModel(variant=19, **self._kw)


class _ResidualGroup(nn.Module):
    features: int
    n_blocks: int
    bottleneck: bool = False
    connector: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        f = self.features
        for _ in range(self.n_blocks):
            if self.bottleneck:
                shortcut = ConvBlock(f * 4, 1, dtype=self.dtype)(x, train)
                h = ConvBlock(f, 1, dtype=self.dtype)(x, train)
                h = ConvBlock(f, 3, dtype=self.dtype)(h, train)
                h = ConvBlock(f * 4, 1, dtype=self.dtype)(h, train)
                x = relu(h + shortcut)
            else:
                h = ConvBlock(f, 3, dtype=self.dtype)(x, train)
                h = ConvBlock(f, 3, dtype=self.dtype)(h, train)
                x = relu(h + x)
        if self.connector:
            # intended behavior: one stride-2 conv into the next group
            x = ConvBlock(f * 2, 3, strides=2, dtype=self.dtype)(x, train)
            x = ConvBlock(f * 2, 3, dtype=self.dtype)(x, train)
            x = ConvBlock(f * 2, 3, dtype=self.dtype)(x, train)
        return x


class AlbUNetModel(nn.Module):
    variant: int  # 18 | 34 | 50 | 101 | 152
    num_filters: int
    problem_type: str = "Regression"
    output_nums: int = 1
    ds: int = 0
    ae: int = 0
    ag: int = 0
    feature_number: int = 1024
    dropout_rate: float = 0.0
    dtype: Dtype = jnp.float32
    model_depth: int = 4

    _GROUPS = {
        18: ([2, 1, 1, 1], False),
        34: ([3, 3, 5, 2], False),
        50: ([3, 3, 5, 2], True),
        101: ([3, 3, 22, 2], True),
        152: ([3, 7, 35, 2], True),
    }

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False
                 ) -> tp.Dict[str, jax.Array]:
        F = self.num_filters
        blocks, bneck = self._GROUPS[self.variant]
        x = x.astype(self.dtype)
        # stem: 7-wide stride-2 conv + stride-2 maxpool (AlbuNet.py:49-58)
        h = ConvBlock(F, 7, strides=2, dtype=self.dtype)(x, train)
        h = downsample_pool(h, 2, op="max")
        feats = [F, F * 2, F * 4, F * 8]
        taps = []
        for g in range(4):
            # taps at each group's own resolution; the stride-2 connector
            # feeds the next group (the reference's tap-after-connector
            # wiring makes x3/x4 the same length and cannot concat)
            h = _ResidualGroup(feats[g], blocks[g], bottleneck=bneck,
                               connector=False, dtype=self.dtype)(h, train)
            taps.append(h)
            if g < 3:
                h = ConvBlock(feats[g] * 2, 3, strides=2,
                              dtype=self.dtype)(h, train)
                h = ConvBlock(feats[g] * 2, 3, dtype=self.dtype)(h, train)
                h = ConvBlock(feats[g] * 2, 3, dtype=self.dtype)(h, train)
        x1, x2, x3, x4 = taps
        if self.ae == 1:
            x4 = FeatureExtractionBlock(F, self.feature_number,
                                        dtype=self.dtype)(x4)

        levels: tp.List[jax.Array] = []

        def decoder_unit(t, f):
            c = ConvBlock(f, 1, dtype=self.dtype)(t, train)
            c = TransConv(f, kernel=4, strides=2, use_bn=True,
                          activation="relu", dtype=self.dtype)(c, train)
            return ConvBlock(f, 1, dtype=self.dtype)(c, train)

        if self.ds == 1:
            levels.append(nn.Conv(1, (1,), dtype=self.dtype,
                                  param_dtype=jnp.float32, name="level4")(x4))
        decode = decoder_unit(x4, F * 8)
        for lvl, (skip, f) in enumerate([(x3, F * 8), (x2, F * 4),
                                         (x1, F * 2)]):
            skip = ConvBlock(f, 1, dtype=self.dtype)(skip, train)
            if self.ag == 1:
                skip = AttentionGate(f, dialect="1d", dtype=self.dtype)(skip, decode, train)
            decode = concat(decode, skip)
            if self.ds == 1:
                levels.append(nn.Conv(1, (1,), dtype=self.dtype,
                                      param_dtype=jnp.float32,
                                      name=f"level{3 - lvl}")(decode))
            decode = decoder_unit(decode, f // 2)
        out = TransConv(F, kernel=3, strides=2, use_bn=True,
                        activation="relu", dtype=self.dtype)(decode, train)
        out = ConvBlock(F, 3, dtype=self.dtype)(out, train)
        out = ConvBlock(F, 2, dtype=self.dtype)(out, train)
        if self.ds == 1:
            levels.append(nn.Conv(1, (1,), dtype=self.dtype,
                                  param_dtype=jnp.float32,
                                  name="level0")(decode))
        if self.dropout_rate:
            out = nn.Dropout(self.dropout_rate, deterministic=not train)(out)
        y = nn.Dense(self.output_nums, dtype=self.dtype,
                     param_dtype=jnp.float32, name="out")(out)
        if self.problem_type == "Classification":
            y = nn.softmax(y, axis=-1)
        outputs = {"out": y}
        if self.ds == 1:
            for idx, lvl in enumerate(levels):
                outputs[f"level{4 - idx}"] = lvl
        return outputs


class AlbUNet:
    """Facade (AlbuNet.py:228-267): methods AlbUNet18/34/50/101/152."""

    def __init__(self, length, num_channel, num_filters, ds=0, ae=0, ag=0,
                 problem_type="Regression", output_nums=1, pooling="avg",
                 feature_number=1024, dropout_rate=False, dtype=jnp.float32):
        self._kw = dict(num_filters=num_filters, problem_type=problem_type,
                        output_nums=output_nums, ds=ds, ae=ae, ag=ag,
                        feature_number=feature_number,
                        dropout_rate=dropout_rate or 0.0, dtype=dtype)

    def __getattr__(self, name):
        if name.startswith("AlbUNet"):
            variant = int(name[len("AlbUNet"):])
            return lambda: AlbUNetModel(variant=variant, **self._kw)
        raise AttributeError(name)


class LinkNetModel(nn.Module):
    """LinkNet family: add-merge decoders over a double-conv encoder.
    ``variant``: 'LinkNet' | 'LinkNetE' | 'LinkNetP' | 'LinkNetPP' |
    'MultiResLinkNet'."""

    variant: str
    model_width: int
    model_depth: int
    kernel_size: int = 3
    problem_type: str = "Regression"
    output_nums: int = 1
    ds: int = 0
    ae: int = 0
    ag: int = 0
    lstm: int = 0
    alpha: float = 1.0
    feature_number: int = 1024
    is_transconv: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False
                 ) -> tp.Dict[str, jax.Array]:
        from ..ops import MultiResBlock, ResPath
        D, W, k = self.model_depth, self.model_width, self.kernel_size
        multires = self.variant == "MultiResLinkNet"
        x = x.astype(self.dtype)
        taps = []
        pool = x
        for i in range(1, D + 1):
            f = W * 2 ** (i - 1)
            if multires:
                conv = MultiResBlock(W, k, alpha=self.alpha,
                                     multiplier=f // W,
                                     dtype=self.dtype)(pool, train)
                tap = ResPath(D - i + 1, f, k, dtype=self.dtype)(conv, train)
            else:
                conv = ConvBlock(f, k, dtype=self.dtype)(pool, train)
                conv = ConvBlock(f, k, dtype=self.dtype)(conv, train)
                tap = conv
            pool = downsample_pool(conv, 2, op="max")
            taps.append(tap)
        if self.ae == 1:
            pool = FeatureExtractionBlock(W, self.feature_number,
                                          dtype=self.dtype)(pool)
        if multires:
            latent = MultiResBlock(W, k, alpha=self.alpha,
                                   multiplier=2 ** D,
                                   dtype=self.dtype)(pool, train)
        else:
            latent = ConvBlock(W * 2 ** D, k, dtype=self.dtype)(pool, train)
            latent = ConvBlock(W * 2 ** D, k, dtype=self.dtype)(latent, train)

        common = dict(model_width=W, model_depth=D, D_S=self.ds, A_G=self.ag,
                      LSTM=self.lstm, is_transconv=self.is_transconv,
                      alpha=self.alpha, kernel=k, dialect="1d", merge="add",
                      conv_repeats=1 if multires else 2,
                      node="multires" if multires else "conv",
                      dtype=self.dtype)
        if self.variant in ("LinkNet", "MultiResLinkNet"):
            decoder = ChainDecoder(style="unet", **common)
        elif self.variant == "LinkNetE":
            decoder = GridDecoder(variant="E", **common)
        elif self.variant == "LinkNetP":
            decoder = GridDecoder(variant="P", **common)
        elif self.variant == "LinkNetPP":
            decoder = GridDecoder(variant="PP", **common)
        else:
            raise ValueError(self.variant)
        deconv, levels = decoder(list(taps) + [latent], train)
        return _head_1d(self, deconv, levels)


class LinkNet:
    """Facade (linknet.py:83-121): LinkNet/LinkNetE/LinkNetP/LinkNetPP/
    MultiResLinkNet methods."""

    _NAMES = ("LinkNet", "LinkNetE", "LinkNetP", "LinkNetPP",
              "MultiResLinkNet")

    def __init__(self, length, model_depth, num_channel, model_width,
                 kernel_size, problem_type="Regression", output_nums=1,
                 ds=0, ae=0, ag=0, lstm=0, alpha=1.0, feature_number=1024,
                 is_transconv=True, dtype=jnp.float32):
        self._kw = dict(model_width=model_width, model_depth=model_depth,
                        kernel_size=kernel_size, problem_type=problem_type,
                        output_nums=output_nums, ds=ds, ae=ae, ag=ag,
                        lstm=lstm, alpha=alpha,
                        feature_number=feature_number,
                        is_transconv=is_transconv, dtype=dtype)

    def __getattr__(self, name):
        if name in self._NAMES:
            return lambda: LinkNetModel(variant=name, **self._kw)
        raise AttributeError(name)


class FPN1DModel(nn.Module):
    """1D FPN (FPN.py:106-191): double-conv encoder, 1-filter laterals (the
    skip-add broadcasts over channels -- a reference quirk), add-merge
    top-down with double convs, concat pyramid head."""

    model_width: int
    model_depth: int
    kernel_size: int = 3
    problem_type: str = "Regression"
    output_nums: int = 1
    ds: int = 0
    ae: int = 0
    ag: int = 0
    feature_number: int = 1024
    is_transconv: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False
                 ) -> tp.Dict[str, jax.Array]:
        D, W, k = self.model_depth, self.model_width, self.kernel_size
        x = x.astype(self.dtype)
        laterals = []
        pool = x
        for i in range(1, D + 1):
            conv = ConvBlock(W * 2 ** (i - 1), k, dtype=self.dtype)(pool, train)
            conv = ConvBlock(W * 2 ** (i - 1), k, dtype=self.dtype)(conv, train)
            pool = downsample_pool(conv, 2, op="max")
            laterals.append(nn.Conv(1, (1,), dtype=self.dtype,
                                    param_dtype=jnp.float32)(conv))
        if self.ae == 1:
            pool = FeatureExtractionBlock(W, self.feature_number,
                                          dtype=self.dtype)(pool)
        deconv = pool
        stages = []
        levels: tp.List[jax.Array] = []
        for j in range(D):
            f = W * 2 ** (D - j - 1)
            skip = laterals[D - j - 1]
            if self.ag == 1:
                skip = AttentionGate(f, dialect="1d", dtype=self.dtype)(
                    laterals[D - j - 1], deconv, train)
            if self.ds == 1:
                levels.append(nn.Conv(1, (1,), dtype=self.dtype,
                                      param_dtype=jnp.float32,
                                      name=f"level{D - j}")(deconv))
            if self.is_transconv:
                up = TransConv(f, kernel=2, strides=2, use_bn=True,
                               activation="relu", dtype=self.dtype)(deconv, train)
            else:
                up = upsample(deconv, 2, method="nearest")
            deconv = skip + up  # 1-channel lateral broadcasts
            deconv = ConvBlock(f, k, dtype=self.dtype)(deconv, train)
            deconv = ConvBlock(f, k, dtype=self.dtype)(deconv, train)
            stages.append(deconv)
        tot = stages[0]
        for s in stages[1:]:
            tot = upsample(tot, 2, method="nearest")
            tot = concat(tot, s)
        return _head_1d(self, tot, levels)


class FPN:
    """Facade (FPN.py:75-105)."""

    def __init__(self, length, model_depth, num_channel, model_width,
                 kernel_size, problem_type="Regression", output_nums=1,
                 ds=0, ae=0, ag=0, feature_number=1024, is_transconv=True,
                 dtype=jnp.float32):
        self._kw = dict(model_width=model_width, model_depth=model_depth,
                        kernel_size=kernel_size, problem_type=problem_type,
                        output_nums=output_nums, ds=ds, ae=ae, ag=ag,
                        feature_number=feature_number,
                        is_transconv=is_transconv, dtype=dtype)

    def FPN(self) -> FPN1DModel:
        return FPN1DModel(**self._kw)
