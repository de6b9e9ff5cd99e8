"""MLMRSNet / LDNet family (reference: 1DCNN/Models/MLMRSNet.py).

Multi-scale-pooling blocks:
- ``MSPUnit`` (:65-82): pool@level (window 3, stride=level, SAME; avg/max/
  mix) -> 1x1 conv(BN) -> [4-wide transconv upsample || nearest upsample]
  concat -> 1x1 conv (no BN)
- ``MRPBlock`` (:85-102): ``cardinality`` MSP units at levels 2**0..2**c-1
  concat with the input, then parallel 3/5/7-kernel convs concat + 1x1 BN
  conv

Topologies: ``MLMRSNet`` (:149) plain U; ``MLMRSNet_V2`` (:203) UNet3+-like
full-scale; ``LDNet`` (:279) UNet++-like nested grid with ungated skip
paths and decreasing cardinality per level.
"""
from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import (
    ConvBlock,
    FeatureExtractionBlock,
    TransConv,
    concat,
    downsample_pool,
    upsample,
)

Dtype = tp.Any


def _pool_same(x: jax.Array, window: int, stride: int, op: str) -> jax.Array:
    n = x.ndim - 2
    w = (1, *((window,) * n), 1)
    s = (1, *((stride,) * n), 1)
    if op == "max":
        return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, w, s, "SAME")
    sm = jax.lax.reduce_window(x, 0.0, jax.lax.add, w, s, "SAME")
    cnt = jax.lax.reduce_window(jnp.ones_like(x), 0.0, jax.lax.add, w, s,
                                "SAME")
    return sm / cnt


class MSPUnit(nn.Module):
    """Reference MSP_Unit (MLMRSNet.py:65-82): width and multiplier are
    SEPARATE — the internal 1x1 conv and transconv emit width*multiplier
    channels, but the closing 1x1 conv emits width*1 (the reference calls
    Conv_Block(..., conv_filters, 1, 1), :81)."""

    width: int
    multiplier: int
    level: int
    pooling_type: str = "mix"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        lvl = self.level
        wm = self.width * self.multiplier
        if self.pooling_type == "mix":
            mx = _pool_same(x, 3, lvl, "max")
            av = _pool_same(x, 3, lvl, "avg")
            p = nn.Conv(x.shape[-1], (1,) * (x.ndim - 2), dtype=self.dtype,
                        param_dtype=jnp.float32)(mx + av)
        elif self.pooling_type == "avg":
            p = _pool_same(x, 3, lvl, "avg")
        else:
            p = _pool_same(x, 3, lvl, "max")
        # use_batchnorm=True is hardcoded at the reference call (:77)
        p = ConvBlock(wm, 1, dtype=self.dtype)(p, train)
        up1 = TransConv(wm, kernel=4, strides=lvl, use_bn=True,
                        activation="relu", dtype=self.dtype)(p, train)
        up2 = upsample(p, lvl, method="nearest")
        out = concat(up1, up2)
        return ConvBlock(self.width, 1, use_bn=False,
                         dtype=self.dtype)(out, train)


class MRPBlock(nn.Module):
    """Reference MRP_Block (MLMRSNet.py:85-102): the 3/5/7-kernel convs
    and the closing 1x1 BN conv emit width*multiplier channels; the MSP
    units receive (width, multiplier) unchanged."""

    width: int
    multiplier: int
    cardinality: int = 5
    pooling_type: str = "mix"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        f = self.width * self.multiplier
        acc = x
        for ii in range(self.cardinality):
            u = MSPUnit(self.width, self.multiplier, 2 ** ii,
                        pooling_type=self.pooling_type,
                        dtype=self.dtype)(x, train)
            acc = concat(acc, u)
        x3 = ConvBlock(f, 3, use_bn=False, dtype=self.dtype)(acc, train)
        x5 = ConvBlock(f, 5, use_bn=False, dtype=self.dtype)(acc, train)
        x7 = ConvBlock(f, 7, use_bn=False, dtype=self.dtype)(acc, train)
        return ConvBlock(f, 1, use_bn=True,
                         dtype=self.dtype)(concat(x3, x5, x7), train)


class MLMRSNetModel(nn.Module):
    """All three MLMRSNet-family topologies, selected by ``topology``
    ('MLMRSNet' | 'MLMRSNet_V2' | 'LDNet')."""

    topology: str
    model_width: int
    model_depth: int
    kernel_size: int = 3
    problem_type: str = "Regression"
    output_nums: int = 1
    ds: int = 0
    ae: int = 0
    cardinality: int = 5
    pooling_type: str = "avg"
    feature_number: int = 1024
    is_transconv: bool = True
    dtype: Dtype = jnp.float32

    def _head(self, deconv, levels):
        out = nn.Conv(self.output_nums, (1,), dtype=self.dtype,
                      param_dtype=jnp.float32, name="out")(deconv)
        if self.problem_type == "Classification":
            out = nn.softmax(out, axis=-1)
        outputs = {"out": out}
        if self.ds == 1:
            for idx, lvl in enumerate(levels):
                outputs[f"level{self.model_depth - idx}"] = lvl
        return outputs

    def _ds_head(self, x, level, strides=1):
        return nn.Conv(1, (1,), strides=(strides,), dtype=self.dtype,
                       param_dtype=jnp.float32, name=f"level{level}")(x)

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False
                 ) -> tp.Dict[str, jax.Array]:
        D, W = self.model_depth, self.model_width
        card, pt = self.cardinality, self.pooling_type
        x = x.astype(self.dtype)
        levels: tp.List[jax.Array] = []

        if self.topology == "MLMRSNet":
            taps = []
            pool = x
            for i in range(1, D + 1):
                conv = MRPBlock(W, 2 ** (i - 1), card, pt,
                                dtype=self.dtype)(pool, train)
                pool = downsample_pool(conv, 2, op="max")
                taps.append(conv)
            if self.ae == 1:
                pool = FeatureExtractionBlock(W, self.feature_number,
                                              dtype=self.dtype)(pool)
            deconv = MRPBlock(W, 2 ** D, card, pt, dtype=self.dtype)(pool, train)
            for j in range(D):
                feats = W * 2 ** (D - j - 1)
                if self.ds == 1:
                    levels.append(self._ds_head(deconv, D - j))
                if self.is_transconv:
                    # reference upsamples with a 1-wide kernel stride-2
                    # transposed conv here (MLMRSNet.py:181)
                    up = TransConv(feats, kernel=1, strides=2, use_bn=True,
                                   activation="relu", dtype=self.dtype)(deconv, train)
                else:
                    up = upsample(deconv, 2, method="nearest")
                deconv = concat(up, taps[D - j - 1])
                deconv = MRPBlock(W, 2 ** (D - j - 1), card, pt,
                                  dtype=self.dtype)(deconv, train)
            return self._head(deconv, levels)

        if self.topology == "MLMRSNet_V2":
            # dense-input encoder with the reference's index quirk: level i
            # concats pooled taps from levels 1..i-1 (skipping level 0)
            taps = []
            pool = x
            for i in range(D):
                if i > 0:
                    for k in range(1, i):
                        g = downsample_pool(taps[k], 2 ** (i - k), op="max")
                        pool = concat(pool, g)
                conv = MRPBlock(W, 2 ** i, D - i + 1, pt,
                                dtype=self.dtype)(pool, train)
                taps.append(conv)
                pool = downsample_pool(conv, 2, op="max")
            if self.ae == 1:
                pool = FeatureExtractionBlock(W, self.feature_number,
                                              dtype=self.dtype)(pool)
            deconv = MRPBlock(W, 2 ** D, 1, pt, dtype=self.dtype)(pool, train)
            deconvs: tp.Dict[int, jax.Array] = {}
            for j in range(D):
                sc_all = taps[D - j - 1]
                for k in range(0, D - j - 1):
                    sc = downsample_pool(taps[k], 2 ** ((D - j) - k - 1),
                                         op="max")
                    sc_all = concat(sc_all, sc)
                tot = upsample(deconv, 2, method="nearest")
                tot = concat(sc_all, nn.sigmoid(tot))
                if j > 0:
                    for m in range(0, j):
                        d = upsample(deconvs[m], 2 ** (j - m), method="nearest")
                        tot = concat(tot, nn.sigmoid(d))
                deconv = MRPBlock(W, D + 1, j + 1, pt,
                                  dtype=self.dtype)(tot, train)
                deconvs[j] = deconv
                if self.ds == 1:
                    levels.append(self._ds_head(deconv, D - j, strides=2))
            return self._head(deconv, levels)

        if self.topology == "LDNet":
            taps = []
            pool = x
            for i in range(1, D + 1):
                conv = MRPBlock(W, 2 ** (i - 1), D - i + 1, pt,
                                dtype=self.dtype)(pool, train)
                pool = downsample_pool(conv, 2, op="max")
                taps.append(conv)
            if self.ae == 1:
                pool = FeatureExtractionBlock(W, self.feature_number,
                                              dtype=self.dtype)(pool)
            # latent multiplier 2**(D-1): the reference reuses the loop var
            # (MLMRSNet.py:292), so the bottleneck is half the usual width
            latent = MRPBlock(W, 2 ** (D - 1), 0, pt,
                              dtype=self.dtype)(pool, train)
            skips = taps + [latent]
            if self.ds == 1:
                levels.append(self._ds_head(skips[0], D))
            k_sz = self.kernel_size
            deconvs: tp.Dict[tp.Tuple[int, int], jax.Array] = {}
            deconvs_skip: tp.Dict[int, jax.Array] = {}
            for i in range(1, D + 1):
                for j in range(0, D - i + 1):
                    src = skips[j + 1] if i == 1 else deconvs[(j + 1, i - 1)]
                    feats = W * 2 ** j
                    if self.is_transconv:
                        up = TransConv(feats, kernel=2, strides=2,
                                       use_bn=True, activation="relu",
                                       dtype=self.dtype)(src, train)
                    else:
                        up = upsample(src, 2, method="nearest")
                    if i > 1:
                        tot = deconvs[(j, 1)]
                        for k in range(2, i):
                            tot = concat(tot, deconvs[(j, k)])
                        deconv = concat(up, tot, skips[j])
                        if (i + j) == D and j != (D - 1):
                            for m in range(1, i - 1):
                                tmp = upsample(deconvs_skip[m], 2 ** (i - m),
                                               method="nearest")
                                deconv = concat(deconv, tmp)
                    else:
                        deconv = concat(up, skips[j])
                    deconv = ConvBlock(feats, k_sz, dtype=self.dtype)(deconv, train)
                    deconv = ConvBlock(feats, k_sz, dtype=self.dtype)(deconv, train)
                    deconvs[(j, i)] = deconv
                    if (i + j) == D:
                        deconvs_skip[i] = deconv
                    if self.ds == 1 and j == 0 and i < D:
                        levels.append(self._ds_head(deconvs[(0, i)], D - i))
            return self._head(deconvs[(0, D)], levels)

        raise ValueError(f"Unknown MLMRSNet topology {self.topology!r}")


class MLMRSNet:
    """Facade with the reference's constructor and the three method names
    (MLMRSNet.py:120-147)."""

    def __init__(self, length, model_depth, num_channel, model_width,
                 kernel_size, problem_type="Regression", output_nums=1,
                 ds=0, ae=0, cardinality=5, pooling_type="avg",
                 feature_number=1024, is_transconv=True, dtype=jnp.float32):
        self._kw = dict(model_width=model_width, model_depth=model_depth,
                        kernel_size=kernel_size, problem_type=problem_type,
                        output_nums=output_nums, ds=ds, ae=ae,
                        cardinality=cardinality, pooling_type=pooling_type,
                        feature_number=feature_number,
                        is_transconv=is_transconv, dtype=dtype)

    def MLMRSNet(self) -> MLMRSNetModel:
        return MLMRSNetModel(topology="MLMRSNet", **self._kw)

    def MLMRSNet_V2(self) -> MLMRSNetModel:
        return MLMRSNetModel(topology="MLMRSNet_V2", **self._kw)

    def LDNet(self) -> MLMRSNetModel:
        return MLMRSNetModel(topology="LDNet", **self._kw)
