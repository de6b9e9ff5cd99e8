"""From-scratch encoders + latent (bottleneck) layers.

Reference: ``encoder_block_scratch`` (2DCNN/models/unet_variants.py:750-792),
``latent_layer`` (:966-974), and the per-level pretrained projection blocks
``encoder_block_pretrained_level_{1..5}`` (:795-933).  Rank-polymorphic.
"""
from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import (
    ConvBlock,
    DenseBlock,
    MultiResBlock,
    Oper,
    OperationalDenseBlock,
    ResPath,
    concat,
    downsample_pool,
    maybe_remat,
)

Dtype = tp.Any


class ScratchEncoder(nn.Module):
    """Per-decoder-family scratch encoder producing ``model_depth + 1`` taps.

    Returns (taps, bottom): taps[i] at stride 2**i for i in 0..D, bottom is
    the deepest conv (== taps[D]).  The builder truncates to D taps and
    replaces the last with the latent output, mirroring unet_variants.py
    :1100-1101.
    """

    decoder_name: str
    model_width: int
    model_depth: int
    alpha: float = 1.0
    q: int = 3
    block_remat: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False
                 ) -> tp.Tuple[tp.List[jax.Array], jax.Array]:
        D = self.model_depth
        W = self.model_width
        name = self.decoder_name
        MRB = maybe_remat(MultiResBlock, self.block_remat)
        RP = maybe_remat(ResPath, self.block_remat)
        CB = maybe_remat(ConvBlock, self.block_remat)
        taps: tp.List[jax.Array] = []
        pool = x
        conv = x
        if name in ("MultiResUNet", "MultiResUNet3P"):
            for i in range(1, D + 2):
                conv = MRB(W * (2 ** (i - 1)), 3, alpha=self.alpha,
                           dtype=self.dtype)(pool, train)
                pool = downsample_pool(conv, 2, op="max")
                if i <= D:
                    taps.append(RP(D - i + 1, W * (2 ** (i - 1)), 3,
                                   dtype=self.dtype)(conv, train))
                else:
                    # the (D+1)-th tap is replaced by the latent output; its
                    # ResPath is dangling in the reference's Keras graph
                    taps.append(conv)
        elif name == "KSSNet":
            for i in range(1, D + 2):
                if i > 1:
                    for k in range(1, i):
                        g = downsample_pool(taps[k - 1], 2 ** (i - k), op="max")
                        pool = concat(pool, nn.sigmoid(g))
                conv = MRB(W * (2 ** (i - 1)), 3, alpha=self.alpha,
                           dtype=self.dtype)(pool, train)
                if i <= D:
                    taps.append(RP(D - i + 1, W * (2 ** (i - 1)), 3,
                                   dtype=self.dtype)(conv, train))
                else:
                    taps.append(conv)  # dangling ResPath skipped (see above)
                pool = downsample_pool(conv, 2, op="max")
        elif name in ("UNet4P", "UNet4PV2", "AHNet"):
            for i in range(1, D + 2):
                if i > 1:
                    for k in range(1, i):
                        g = taps[k - 1]
                        if name == "AHNet":
                            g = RP(D - k, W, 3, dtype=self.dtype)(g, train)
                        g = downsample_pool(g, 2 ** (i - k), op="max")
                        pool = concat(pool, nn.sigmoid(g))
                conv = CB(W * (2 ** (i - 1)), 3, dtype=self.dtype)(pool, train)
                taps.append(conv)
                pool = downsample_pool(conv, 2, op="max")
        elif name.startswith("Self"):
            for i in range(1, D + 2):
                conv = Oper(W * (2 ** (i - 1)), 3, q=self.q,
                            dtype=self.dtype)(pool)
                pool = downsample_pool(conv, 2, op="max")
                taps.append(conv)
        else:
            for i in range(1, D + 2):
                conv = CB(W * (2 ** (i - 1)), 3, dtype=self.dtype)(pool, train)
                pool = downsample_pool(conv, 2, op="max")
                taps.append(conv)
        # bottom is the raw deepest conv (reference returns `conv`, not the
        # ResPath'd tap -- unet_variants.py:792)
        return taps, conv


class LatentLayer(nn.Module):
    """Bottleneck: MultiRes block / operational dense block / dense block
    depending on the decoder family (reference ``latent_layer`` :966-974)."""

    decoder_name: str
    model_width: int
    model_depth: int
    alpha: float = 1.0
    q: int = 3
    dense_loop: int = 1
    block_remat: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        feats = self.model_width * (2 ** self.model_depth)
        name = self.decoder_name
        if name in ("MultiResUNet", "MultiResUNet3P", "KSSNet"):
            return maybe_remat(MultiResBlock, self.block_remat)(
                feats, 3, alpha=self.alpha, dtype=self.dtype)(x, train)
        if name.startswith("Self"):
            return OperationalDenseBlock(feats, 3, num_layers=self.dense_loop,
                                         q=self.q, dtype=self.dtype)(x)
        return maybe_remat(DenseBlock, self.block_remat)(
            feats, 3, num_layers=self.dense_loop, dtype=self.dtype)(x, train)


class PretrainedTapProjector(nn.Module):
    """Project a pretrained-backbone tap at ``level`` (1-based) into the
    decoder's expected channel width, with the reference's per-family
    adapters (unet_variants.py:795-933).

    ``prev_taps`` are the already-projected shallower taps (for the gated
    dense-input families KSSNet / UNet4P / AHNet).
    """

    decoder_name: str
    level: int
    model_width: int
    model_depth: int
    alpha: float = 1.0
    q: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, prev_taps: tp.Sequence[jax.Array],
                 train: bool = False) -> jax.Array:
        lvl = self.level
        W = self.model_width
        D = self.model_depth
        feats = W * (2 ** (lvl - 1))
        name = self.decoder_name
        if name in ("MultiResUNet", "MultiResUNet3P"):
            x = MultiResBlock(feats, 3, alpha=self.alpha, dtype=self.dtype)(x, train)
            return ResPath(D - lvl + 1, feats, 3, dtype=self.dtype)(x, train)
        if name == "KSSNet":
            if lvl == 1:
                x = MultiResBlock(feats, 3, alpha=self.alpha,
                                  dtype=self.dtype)(x, train)
                return ResPath(D, feats, 3, dtype=self.dtype)(x, train)
            x = ConvBlock(feats, 1, use_bn=False, activation=None,
                          dtype=self.dtype)(x, train)
            for k in range(1, lvl):
                g = downsample_pool(prev_taps[k - 1], 2 ** (lvl - k), op="max")
                x = concat(x, nn.sigmoid(g))
            x = MultiResBlock(feats, 3, alpha=self.alpha, dtype=self.dtype)(x, train)
            return ResPath(D - 1, feats, 3, dtype=self.dtype)(x, train)
        if name in ("UNet4P", "UNet4PV2", "AHNet"):
            if lvl == 1:
                return ConvBlock(feats, 3, use_bn=False, activation=None,
                                 dtype=self.dtype)(x, train)
            x = ConvBlock(feats, 1, use_bn=False, activation=None,
                          dtype=self.dtype)(x, train)
            for k in range(1, lvl):
                g = prev_taps[k - 1]
                if name == "AHNet":
                    g = ResPath(D - k, feats, 3, dtype=self.dtype)(g, train)
                g = downsample_pool(g, 2 ** (lvl - k), op="max")
                x = concat(x, nn.sigmoid(g))
            return ConvBlock(feats, 3, dtype=self.dtype)(x, train)
        if name.startswith("Self"):
            kernel = 3 if lvl == 1 else 1
            return Oper(feats, kernel, q=self.q, dtype=self.dtype)(x)
        # default: level 1 gets a 3x3, deeper levels a 1x1; bare conv
        kernel = 3 if lvl == 1 else 1
        return ConvBlock(feats, kernel, use_bn=False, activation=None,
                         dtype=self.dtype)(x, train)
