"""Self-ONN operational layers (q-branch Maclaurin operator neurons).

Reference semantics (2DCNN/models/onn_layers.py:6-48, 1DCNN/Models/
ONN_layers.py): ``Oper(x) = sum_{i=1..q} Conv_i(x ** i)``, optionally
followed by an activation.  Each branch has its own kernel and bias.

TPU-first design: instead of q separate small convolutions (q kernel
launches, q HBM round-trips), we stack the elementwise powers
``[x, x**2, .., x**q]`` on the channel axis and run ONE convolution with
q*C input channels.  This is mathematically identical (the block-diagonal
concatenated kernel computes the same sum; biases fold into one) and maps
onto a single large MXU matmul -- the power expansion is a cheap VPU
epilogue that XLA fuses into the conv's input.
"""
from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
from flax import linen as nn

from .blocks import _spatial_ndim, _tup, apply_activation

Dtype = tp.Any


def _power_stack(x: jax.Array, q: int) -> jax.Array:
    """Channel-concat [x**1, x**2, ..., x**q] (computed by repeated multiply,
    not `pow`, so XLA emits q-1 fused multiplies)."""
    if q == 1:
        return x
    powers = [x]
    acc = x
    for _ in range(q - 1):
        acc = acc * x
        powers.append(acc)
    return jnp.concatenate(powers, axis=-1)


class Oper(nn.Module):
    """Fused Self-ONN convolution (replaces reference ``Oper1D``/``Oper2D``)."""

    features: int
    kernel: tp.Union[int, tuple] = 3
    strides: tp.Union[int, tuple] = 1
    padding: str = "SAME"
    activation: tp.Optional[str] = None
    q: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        n = _spatial_ndim(x)
        stacked = _power_stack(x, self.q)
        out = nn.Conv(
            self.features,
            kernel_size=_tup(self.kernel, n),
            strides=_tup(self.strides, n),
            padding=self.padding,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="onn_conv",
        )(stacked)
        return apply_activation(out, self.activation)


class OperTranspose(nn.Module):
    """Fused Self-ONN transposed convolution (reference
    ``Oper1DTranspose``/``Oper2DTranspose``)."""

    features: int
    kernel: tp.Union[int, tuple] = 3
    strides: tp.Union[int, tuple] = 1
    padding: str = "SAME"
    activation: tp.Optional[str] = None
    q: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        n = _spatial_ndim(x)
        stacked = _power_stack(x, self.q)
        out = nn.ConvTranspose(
            self.features,
            kernel_size=_tup(self.kernel, n),
            strides=_tup(self.strides, n),
            padding="SAME",
            transpose_kernel=True,  # Keras Conv*DTranspose semantics/layout
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="onn_trans_conv",
        )(stacked)
        return apply_activation(out, self.activation)


class OperationalDenseBlock(nn.Module):
    """Self-ONN latent layer: Oper, then ``num_layers`` residual Oper adds.

    Reference: ``operational_dense_block`` (2DCNN/models/unet_variants.py:59-64).
    """

    features: int
    kernel: tp.Union[int, tuple] = 3
    num_layers: int = 1
    q: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = Oper(self.features, self.kernel, q=self.q, dtype=self.dtype)(x)
        for _ in range(self.num_layers):
            cb = Oper(self.features, self.kernel, q=self.q, dtype=self.dtype)(x)
            x = x + cb
        return x
