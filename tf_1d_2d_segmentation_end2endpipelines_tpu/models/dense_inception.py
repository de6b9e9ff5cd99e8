"""Dense-Inception UNet (reference: 1DCNN/Models/Dense_Inception_UNet.py).

Blocks:
- ``Downsampling_Block`` (:73-90): maxpool || strided-3x3 || double-3x3
  concat -> 1x1 conv -> BN -> relu
- ``Upsampling_Block`` (:93-110): nearest upsample || strided transconv ||
  double transconv concat -> 1x1 transconv -> BN -> relu
- ``Inception_Res_Block`` (:112-130): 3 inception branches concat -> 1x1
  conv, densely concatenated with the input, BN+relu
- ``Dense_Inception_Block`` (:133-138): 3 IRBs densely concatenated

Topology (:167-226): deepest encoder/decoder level uses Dense blocks, the
rest single IRBs; a final IRB at multiplier 0.5 precedes the head.
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

Dtype = tp.Any


class InceptionResBlock(nn.Module):
    features: int  # model_width * multiplier
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        f = self.features

        def conv(h, k, bn=True, act=True):
            return ConvBlock(f, k, use_bn=bn,
                             activation="relu" if act else None,
                             dtype=self.dtype)(h, train)

        b1 = conv(x, 1)
        b2 = conv(conv(x, 1, bn=False, act=False), 3)
        b3 = conv(conv(conv(x, 1, bn=False, act=False), 3), 3)
        branch = conv(concat(b1, b2, b3), 1)
        out = concat(x, branch)
        out = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                           epsilon=1e-3, dtype=self.dtype,
                           param_dtype=jnp.float32)(out)
        return relu(out)


class DenseInceptionBlock(nn.Module):
    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        for _ in range(3):
            iru = InceptionResBlock(self.features, dtype=self.dtype)(x, train)
            x = concat(x, iru)
        return x


class DownsamplingBlock(nn.Module):
    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        f = self.features
        pool = downsample_pool(x, 2, op="max")
        a = ConvBlock(f, 1, use_bn=False, activation=None,
                      dtype=self.dtype)(x, train)
        a = ConvBlock(f, 3, strides=2, dtype=self.dtype)(a, train)
        b = ConvBlock(f, 1, use_bn=False, activation=None,
                      dtype=self.dtype)(x, train)
        b = ConvBlock(f, 3, use_bn=False, activation=None,
                      dtype=self.dtype)(b, train)
        b = ConvBlock(f, 3, strides=2, dtype=self.dtype)(b, train)
        out = ConvBlock(f, 1, dtype=self.dtype)(concat(pool, a, b), train)
        out = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                           epsilon=1e-3, dtype=self.dtype,
                           param_dtype=jnp.float32)(out)
        return relu(out)


class UpsamplingBlock(nn.Module):
    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        f = self.features
        up = upsample(x, 2, method="nearest")
        a = TransConv(f, kernel=1, strides=1, use_bn=False, activation=None,
                      dtype=self.dtype)(x, train)
        a = TransConv(f, kernel=3, strides=2, use_bn=True, activation="relu",
                      dtype=self.dtype)(a, train)
        b = TransConv(f, kernel=1, strides=1, use_bn=False, activation=None,
                      dtype=self.dtype)(x, train)
        b = TransConv(f, kernel=3, strides=1, use_bn=True, activation="relu",
                      dtype=self.dtype)(b, train)
        b = TransConv(f, kernel=3, strides=2, use_bn=True, activation="relu",
                      dtype=self.dtype)(b, train)
        out = TransConv(f, kernel=1, strides=1, use_bn=True,
                        activation="relu",
                        dtype=self.dtype)(concat(up, a, b), train)
        out = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                           epsilon=1e-3, dtype=self.dtype,
                           param_dtype=jnp.float32)(out)
        return relu(out)


class DenseInceptionUNetModel(nn.Module):
    model_width: int
    model_depth: int
    kernel_size: int = 3
    problem_type: str = "Regression"
    output_nums: int = 1
    ds: int = 0
    ae: int = 0
    ag: int = 0
    feature_number: int = 1024
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False
                 ) -> tp.Dict[str, jax.Array]:
        D, W = self.model_depth, self.model_width
        x = x.astype(self.dtype)
        taps = []
        pool = x
        for i in range(1, D + 1):
            f = W * 2 ** (i - 1)
            if i == D:
                conv = DenseInceptionBlock(f, dtype=self.dtype)(pool, train)
            else:
                conv = InceptionResBlock(f, dtype=self.dtype)(pool, train)
            pool = DownsamplingBlock(f, dtype=self.dtype)(conv, train)
            taps.append(conv)
        if self.ae == 1:
            pool = FeatureExtractionBlock(W, self.feature_number,
                                          dtype=self.dtype)(pool)
        deconv = DenseInceptionBlock(W * 2 ** D, dtype=self.dtype)(pool, train)

        levels: tp.List[jax.Array] = []
        for j in range(D):
            layer_num = D - j
            f = W * 2 ** (layer_num - 1)
            skip = taps[layer_num - 1]
            if self.ag == 1:
                skip = AttentionGate(f, dialect="1d", dtype=self.dtype)(
                    taps[layer_num - 1], deconv, train)
            if self.ds == 1:
                levels.append(nn.Conv(1, (1,), dtype=self.dtype,
                                      param_dtype=jnp.float32,
                                      name=f"level{layer_num}")(deconv))
            up = UpsamplingBlock(f, dtype=self.dtype)(deconv, train)
            deconv = concat(up, skip)
            if layer_num == D:
                deconv = DenseInceptionBlock(f, dtype=self.dtype)(deconv, train)
            else:
                deconv = InceptionResBlock(f, dtype=self.dtype)(deconv, train)
        deconv = InceptionResBlock(max(W // 2, 1), dtype=self.dtype)(deconv, train)

        out = nn.Conv(self.output_nums, (1,), dtype=self.dtype,
                      param_dtype=jnp.float32, name="out")(deconv)
        if self.problem_type == "Classification":
            out = nn.softmax(out, axis=-1)
        outputs = {"out": out}
        if self.ds == 1:
            for idx, lvl in enumerate(levels):
                outputs[f"level{D - idx}"] = lvl
        return outputs


class Dense_Inception_UNet:
    """Facade with the reference's constructor/method name
    (Dense_Inception_UNet.py:141-165)."""

    def __init__(self, length, model_depth, num_channel, model_width,
                 kernel_size, problem_type="Regression", output_nums=1,
                 ds=0, ae=0, ag=0, feature_number=1024, dtype=jnp.float32):
        self._kw = dict(model_width=model_width, model_depth=model_depth,
                        kernel_size=kernel_size, problem_type=problem_type,
                        output_nums=output_nums, ds=ds, ae=ae, ag=ag,
                        feature_number=feature_number, dtype=dtype)

    def Dense_Inception_UNet(self) -> DenseInceptionUNetModel:
        return DenseInceptionUNetModel(**self._kw)
