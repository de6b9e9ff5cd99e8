"""Inception V3 and Inception-ResNet V2 backbones.

The reference taps these by numbered activation indices
(unet_variants.py:2203-2221 / :2286-2304) at strides 1..32; here each
stage boundary provides the tap.  Both use 'VALID'-padded stems like the
originals, with SAME padding where the original uses it, so tap spatial
sizes track stride 2**i on power-of-two inputs.
"""
from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.blocks import relu

Dtype = tp.Any


def _bn(x, train, dtype):
    # keras Inception uses BatchNormalization(scale=False): no gamma
    return nn.BatchNorm(use_running_average=not train, momentum=0.99,
                        epsilon=1e-3, use_scale=False, dtype=dtype,
                        param_dtype=jnp.float32)(x)


def _cba(x, feats, k, s, train, dtype, padding="SAME"):
    if isinstance(k, int):
        k = (k, k)
    x = nn.Conv(feats, k, strides=(s, s), padding=padding, use_bias=False,
                dtype=dtype, param_dtype=jnp.float32)(x)
    return relu(_bn(x, train, dtype))


def _maxpool(x, k=3, s=2, padding="SAME"):
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, k, k, 1),
                                 (1, s, s, 1), padding)


def _avgpool(x, k=3, s=1):
    sm = jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, k, k, 1),
                               (1, s, s, 1), "SAME")
    cnt = jax.lax.reduce_window(jnp.ones_like(x), 0.0, jax.lax.add,
                                (1, k, k, 1), (1, s, s, 1), "SAME")
    return sm / cnt


class InceptionV3Backbone(nn.Module):
    """pad='SAME' (default): every stage lands on the power-of-two grid a
    UNet decoder needs -- the implementable INTENT of the reference's
    InceptionV3 encoder (its literal VALID-padded taps are 125/60/29/14 px
    at 256² input, which crashes the reference's own decoder concat --
    demonstrated in tests/test_backbones.py).  pad='VALID' mirrors
    keras.applications exactly for the weight-conversion fixtures."""

    max_tap: int = 5
    dtype: Dtype = jnp.float32
    pad: str = "SAME"

    def _block_a(self, x, pool_feats, train):
        d = self.dtype
        b1 = _cba(x, 64, 1, 1, train, d)
        b2 = _cba(_cba(x, 48, 1, 1, train, d), 64, 5, 1, train, d)
        b3 = _cba(_cba(_cba(x, 64, 1, 1, train, d), 96, 3, 1, train, d),
                  96, 3, 1, train, d)
        b4 = _cba(_avgpool(x), pool_feats, 1, 1, train, d)
        return jnp.concatenate([b1, b2, b3, b4], -1)

    def _block_b(self, x, c7, train):
        d = self.dtype
        b1 = _cba(x, 192, 1, 1, train, d)
        b2 = _cba(_cba(_cba(x, c7, 1, 1, train, d), c7, (1, 7), 1, train, d),
                  192, (7, 1), 1, train, d)
        b3 = x
        for k, f in [((1, 1), c7), ((7, 1), c7), ((1, 7), c7), ((7, 1), c7),
                     ((1, 7), 192)]:
            b3 = _cba(b3, f, k, 1, train, d)
        b4 = _cba(_avgpool(x), 192, 1, 1, train, d)
        return jnp.concatenate([b1, b2, b3, b4], -1)

    def _block_c(self, x, train):
        d = self.dtype
        b1 = _cba(x, 320, 1, 1, train, d)
        b2 = _cba(x, 384, 1, 1, train, d)
        b2 = jnp.concatenate([_cba(b2, 384, (1, 3), 1, train, d),
                              _cba(b2, 384, (3, 1), 1, train, d)], -1)
        b3 = _cba(_cba(x, 448, 1, 1, train, d), 384, 3, 1, train, d)
        b3 = jnp.concatenate([_cba(b3, 384, (1, 3), 1, train, d),
                              _cba(b3, 384, (3, 1), 1, train, d)], -1)
        b4 = _cba(_avgpool(x), 192, 1, 1, train, d)
        return jnp.concatenate([b1, b2, b3, b4], -1)

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False
                 ) -> tp.List[jax.Array]:
        d = self.dtype
        p = self.pad
        n_need = self.max_tap + 1
        taps = [x]
        h = _cba(x, 32, 3, 2, train, d, padding=p)
        h = _cba(h, 32, 3, 1, train, d, padding=p)
        h = _cba(h, 64, 3, 1, train, d)
        taps.append(h)  # stride 2
        if len(taps) >= n_need:
            return taps
        h = _maxpool(h, padding=p)
        h = _cba(h, 80, 1, 1, train, d, padding=p)
        h = _cba(h, 192, 3, 1, train, d, padding=p)
        taps.append(h)  # stride 4
        if len(taps) >= n_need:
            return taps
        h = _maxpool(h, padding=p)
        h = self._block_a(h, 32, train)
        h = self._block_a(h, 64, train)
        h = self._block_a(h, 64, train)
        taps.append(h)  # stride 8
        if len(taps) >= n_need:
            return taps
        # reduction A
        b1 = _cba(h, 384, 3, 2, train, d, padding=p)
        b2 = _cba(_cba(_cba(h, 64, 1, 1, train, d), 96, 3, 1, train, d),
                  96, 3, 2, train, d, padding=p)
        h = jnp.concatenate([b1, b2, _maxpool(h, padding=p)], -1)
        for c7 in (128, 160, 160, 192):
            h = self._block_b(h, c7, train)
        taps.append(h)  # stride 16
        if len(taps) >= n_need:
            return taps
        # reduction B
        b1 = _cba(_cba(h, 192, 1, 1, train, d), 320, 3, 2, train, d,
                  padding=p)
        b2 = _cba(_cba(_cba(h, 192, 1, 1, train, d), 192, (1, 7), 1, train,
                       d), 192, (7, 1), 1, train, d)
        b2 = _cba(b2, 192, 3, 2, train, d, padding=p)
        h = jnp.concatenate([b1, b2, _maxpool(h, padding=p)], -1)
        h = self._block_c(h, train)
        h = self._block_c(h, train)
        taps.append(h)  # stride 32
        return taps


class InceptionResNetV2Backbone(nn.Module):
    """Same pad='SAME'-intent / pad='VALID'-exact split as
    InceptionV3Backbone (the reference's activation_N tap names do not
    even exist under the installed Keras 3)."""

    max_tap: int = 5
    dtype: Dtype = jnp.float32
    pad: str = "SAME"

    def _block35(self, x, train, scale=0.17):
        d = self.dtype
        b1 = _cba(x, 32, 1, 1, train, d)
        b2 = _cba(_cba(x, 32, 1, 1, train, d), 32, 3, 1, train, d)
        b3 = _cba(_cba(_cba(x, 32, 1, 1, train, d), 48, 3, 1, train, d),
                  64, 3, 1, train, d)
        mix = jnp.concatenate([b1, b2, b3], -1)
        up = nn.Conv(x.shape[-1], (1, 1), dtype=d,
                     param_dtype=jnp.float32)(mix)
        return relu(x + scale * up)

    def _block17(self, x, train, scale=0.1):
        d = self.dtype
        b1 = _cba(x, 192, 1, 1, train, d)
        b2 = _cba(_cba(_cba(x, 128, 1, 1, train, d), 160, (1, 7), 1, train,
                       d), 192, (7, 1), 1, train, d)
        mix = jnp.concatenate([b1, b2], -1)
        up = nn.Conv(x.shape[-1], (1, 1), dtype=d,
                     param_dtype=jnp.float32)(mix)
        return relu(x + scale * up)

    def _block8(self, x, train, scale=0.2, activate=True):
        d = self.dtype
        b1 = _cba(x, 192, 1, 1, train, d)
        b2 = _cba(_cba(_cba(x, 192, 1, 1, train, d), 224, (1, 3), 1, train,
                       d), 256, (3, 1), 1, train, d)
        mix = jnp.concatenate([b1, b2], -1)
        up = nn.Conv(x.shape[-1], (1, 1), dtype=d,
                     param_dtype=jnp.float32)(mix)
        out = x + scale * up
        return relu(out) if activate else out

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False
                 ) -> tp.List[jax.Array]:
        d = self.dtype
        p = self.pad
        n_need = self.max_tap + 1
        taps = [x]
        h = _cba(x, 32, 3, 2, train, d, padding=p)
        h = _cba(h, 32, 3, 1, train, d, padding=p)
        h = _cba(h, 64, 3, 1, train, d)
        taps.append(h)  # stride 2
        if len(taps) >= n_need:
            return taps
        h = _maxpool(h, padding=p)
        h = _cba(h, 80, 1, 1, train, d, padding=p)
        h = _cba(h, 192, 3, 1, train, d, padding=p)
        taps.append(h)  # stride 4
        if len(taps) >= n_need:
            return taps
        h = _maxpool(h, padding=p)
        # stem mixed block
        b1 = _cba(h, 96, 1, 1, train, d)
        b2 = _cba(_cba(h, 48, 1, 1, train, d), 64, 5, 1, train, d)
        b3 = _cba(_cba(_cba(h, 64, 1, 1, train, d), 96, 3, 1, train, d),
                  96, 3, 1, train, d)
        b4 = _cba(_avgpool(h), 64, 1, 1, train, d)
        h = jnp.concatenate([b1, b2, b3, b4], -1)
        for _ in range(10):
            h = self._block35(h, train)
        taps.append(h)  # stride 8
        if len(taps) >= n_need:
            return taps
        # reduction A
        b1 = _cba(h, 384, 3, 2, train, d, padding=p)
        b2 = _cba(_cba(_cba(h, 256, 1, 1, train, d), 256, 3, 1, train, d),
                  384, 3, 2, train, d, padding=p)
        h = jnp.concatenate([b1, b2, _maxpool(h, padding=p)], -1)
        for _ in range(20):
            h = self._block17(h, train)
        taps.append(h)  # stride 16
        if len(taps) >= n_need:
            return taps
        # reduction B
        b1 = _cba(_cba(h, 256, 1, 1, train, d), 384, 3, 2, train, d,
                  padding=p)
        b2 = _cba(_cba(h, 256, 1, 1, train, d), 288, 3, 2, train, d,
                  padding=p)
        b3 = _cba(_cba(_cba(h, 256, 1, 1, train, d), 288, 3, 1, train, d),
                  320, 3, 2, train, d, padding=p)
        h = jnp.concatenate([b1, b2, b3, _maxpool(h, padding=p)], -1)
        for i in range(10):
            # keras: 9 scaled-relu block8s + one final scale=1, linear
            h = self._block8(h, train, scale=1.0 if i == 9 else 0.2,
                             activate=i < 9)
        h = _cba(h, 1536, 1, 1, train, d)
        taps.append(h)  # stride 32
        return taps
