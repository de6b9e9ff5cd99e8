"""SAUNet variants (reference: 1DCNN/Models/saunet_variants.py).

- ``Conv_Block_Regulated`` (:180-187): conv -> DropBlock -> BN -> relu
- ``MultiResBlock_Regulated`` (:250-272): MultiRes with DropBlock before
  the first BN
- ``spatial_attention`` (:234-247): CBAM gate (channel mean+max -> 7-kernel
  conv sigmoid) applied between the two latent blocks
- topologies ``SAUNet`` (:329), ``SAMultiResUNet`` (:388), ``SelfSAUNet``
  (:445): chain UNets; head is linear for output_nums==1 else softmax
  (:374-377)
"""
from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import (
    ConvBlock,
    DropBlock,
    ResPath,
    FeatureExtractionBlock,
    Oper,
    OperTranspose,
    SpatialAttention,
    TransConv,
    concat,
    downsample_pool,
    relu,
    upsample,
)

Dtype = tp.Any


class ConvBlockRegulated(nn.Module):
    features: int
    kernel: int = 3
    block_size: int = 7
    keep_prob: float = 0.9
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        n = x.ndim - 2
        x = nn.Conv(self.features, (self.kernel,) * n, padding="SAME",
                    dtype=self.dtype, param_dtype=jnp.float32)(x)
        x = DropBlock(self.block_size, self.keep_prob)(x, deterministic=not train)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                         epsilon=1e-3, dtype=self.dtype,
                         param_dtype=jnp.float32)(x)
        return relu(x)


class MultiResBlockRegulated(nn.Module):
    features: int  # base model width (1D semantics: truncate, then scale)
    multiplier: int = 1
    kernel: int = 3
    alpha: float = 1.0
    block_size: int = 7
    keep_prob: float = 0.9
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        w = self.alpha * self.features
        m = self.multiplier
        f1, f2, f3 = (max(int(w * 0.167), 1) * m, max(int(w * 0.333), 1) * m,
                      max(int(w * 0.5), 1) * m)
        shortcut = ConvBlock(f1 + f2 + f3, 1, dtype=self.dtype)(x, train)
        c3 = ConvBlock(f1, self.kernel, dtype=self.dtype)(x, train)
        c5 = ConvBlock(f2, self.kernel, dtype=self.dtype)(c3, train)
        c7 = ConvBlock(f3, self.kernel, dtype=self.dtype)(c5, train)
        out = jnp.concatenate([c3, c5, c7], axis=-1)
        out = DropBlock(self.block_size, self.keep_prob)(
            out, deterministic=not train)
        out = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                           epsilon=1e-3, dtype=self.dtype,
                           param_dtype=jnp.float32)(out)
        out = relu(shortcut + out)
        return nn.BatchNorm(use_running_average=not train, momentum=0.99,
                            epsilon=1e-3, dtype=self.dtype,
                            param_dtype=jnp.float32)(out)


class SAUNetModel(nn.Module):
    """'SAUNet' | 'SAMultiResUNet' | 'SelfSAUNet' chain topologies."""

    variant: str
    model_width: int
    model_depth: int
    kernel_size: int = 3
    output_nums: int = 1
    ds: int = 0
    ae: int = 0
    alpha: float = 1.0
    feature_number: int = 1024
    block_size: int = 7
    keep_prob: float = 0.9
    is_transconv: bool = True
    q: int = 3
    dtype: Dtype = jnp.float32

    def _block(self, x, feats, train):
        if self.variant == "SAMultiResUNet":
            return MultiResBlockRegulated(
                self.model_width, feats // self.model_width,
                self.kernel_size, self.alpha, self.block_size,
                self.keep_prob, dtype=self.dtype)(x, train)
        if self.variant == "SelfSAUNet":
            # Oper1D (no activation) -> DropBlock -> BN -> tanh
            # (saunet_variants.py:459-463; the BN+tanh tail was missing —
            # caught by the SelfSAUNet parity fixture, round 3)
            x = Oper(feats, self.kernel_size, q=self.q, dtype=self.dtype)(x)
            x = DropBlock(self.block_size, self.keep_prob)(
                x, deterministic=not train)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                             epsilon=1e-3, dtype=self.dtype,
                             param_dtype=jnp.float32)(x)
            return jnp.tanh(x)
        return ConvBlockRegulated(feats, self.kernel_size, self.block_size,
                                  self.keep_prob, dtype=self.dtype)(x, train)

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False
                 ) -> tp.Dict[str, jax.Array]:
        D, W = self.model_depth, self.model_width
        double = self.variant == "SAUNet"
        x = x.astype(self.dtype)
        taps = []
        pool = x
        for i in range(1, D + 1):
            conv = self._block(pool, W * 2 ** (i - 1), train)
            if double:
                conv = self._block(conv, W * 2 ** (i - 1), train)
            pool = downsample_pool(conv, 2, op="max")
            if self.variant == "SAMultiResUNet":
                # skips route through UN-regulated ResPath chains of
                # length D-i+1 (saunet_variants.py:402 — was missing,
                # caught by the SAMultiResUNet parity fixture, round 3)
                conv = ResPath(D - i + 1, W * 2 ** (i - 1),
                               self.kernel_size, dtype=self.dtype)(
                                   conv, train)
            taps.append(conv)
        if self.ae == 1:
            pool = FeatureExtractionBlock(W, self.feature_number,
                                          dtype=self.dtype)(pool)
        conv = self._block(pool, W * 2 ** D, train)
        conv = SpatialAttention(kernel=7, dtype=self.dtype)(conv)
        conv = self._block(conv, W * 2 ** D, train)

        deconv = conv
        levels: tp.List[jax.Array] = []
        for j in range(D):
            feats = W * 2 ** (D - j - 1)
            if self.ds == 1:
                levels.append(nn.Conv(1, (1,), dtype=self.dtype,
                                      param_dtype=jnp.float32,
                                      name=f"level{D - j}")(deconv))
            if self.is_transconv:
                if self.variant == "SelfSAUNet":
                    deconv = OperTranspose(feats, 4, strides=2,
                                           activation="tanh", q=self.q,
                                           dtype=self.dtype)(deconv)
                else:
                    deconv = TransConv(feats, kernel=2, use_bn=True,
                                       activation="relu",
                                       dtype=self.dtype)(deconv, train)
            else:
                deconv = upsample(deconv, 2, method="nearest")
            deconv = concat(deconv, taps[D - j - 1])
            deconv = self._block(deconv, feats, train)
            if double:
                deconv = self._block(deconv, feats, train)

        out = nn.Conv(self.output_nums, (1,), dtype=self.dtype,
                      param_dtype=jnp.float32, name="out")(deconv)
        if self.output_nums > 1:
            out = nn.softmax(out, axis=-1)
        outputs = {"out": out}
        if self.ds == 1:
            for idx, lvl in enumerate(levels):
                outputs[f"level{D - idx}"] = lvl
        return outputs


class SAUNet:
    """Facade with the reference's constructor and method names
    (saunet_variants.py:301-327)."""

    def __init__(self, length, model_depth, num_channel, model_width,
                 kernel_size, output_nums=1, ds=1, ae=0, alpha=1,
                 feature_number=1024, block_size=7, keep_prob=0.9,
                 is_transconv=True, q=3, dtype=jnp.float32):
        self._kw = dict(model_width=model_width, model_depth=model_depth,
                        kernel_size=kernel_size, output_nums=output_nums,
                        ds=ds, ae=ae, alpha=alpha,
                        feature_number=feature_number, block_size=block_size,
                        keep_prob=keep_prob, is_transconv=is_transconv, q=q,
                        dtype=dtype)

    def SAUNet(self) -> SAUNetModel:
        return SAUNetModel(variant="SAUNet", **self._kw)

    def SAMultiResUNet(self) -> SAUNetModel:
        return SAUNetModel(variant="SAMultiResUNet", **self._kw)

    def SelfSAUNet(self) -> SAUNetModel:
        return SAUNetModel(variant="SelfSAUNet", **self._kw)
