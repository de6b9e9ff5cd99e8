"""EfficientNet V1 (B0-B7) and V2 (B0-B3/S/M/L) backbones.

Tap semantics per the reference: block2a/3a/4a/6a_expand_activation +
top_activation for V1 (unet_variants.py:2440-2461), block1x_project /
2a/4a/6a expand activations for V2 (:2943-2964) -- i.e. taps at strides
1, 2, 4, 8, 16, 32.
"""
from __future__ import annotations

import math
import typing as tp

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = tp.Any


def _bn(x, train, dtype):
    return nn.BatchNorm(use_running_average=not train, momentum=0.99,
                        epsilon=1e-3, dtype=dtype,
                        param_dtype=jnp.float32)(x)


def _conv(x, feats, k, s, dtype, groups=1):
    return nn.Conv(feats, (k, k), strides=(s, s), padding="SAME",
                   feature_group_count=groups, use_bias=False,
                   dtype=dtype, param_dtype=jnp.float32)(x)


def _round_filters(f: float, width: float, divisor: int = 8) -> int:
    f *= width
    new_f = max(divisor, int(f + divisor / 2) // divisor * divisor)
    if new_f < 0.9 * f:
        new_f += divisor
    return int(new_f)


def _round_repeats(r: int, depth: float) -> int:
    return int(math.ceil(depth * r))


class InputNorm(nn.Module):
    """keras.applications EfficientNet's internal Rescaling(1/255) +
    Normalization layers.  mean/variance are variables so converted keras
    weights drop in; with random init this is the identity-ish default."""

    channels: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        mean = self.param("mean", nn.initializers.zeros, (self.channels,),
                          jnp.float32)
        var = self.param("var", nn.initializers.ones, (self.channels,),
                         jnp.float32)
        x = x / 255.0
        return ((x - mean) / jnp.sqrt(var + 1e-7)).astype(self.dtype)


class EfficientNetBackbone(nn.Module):
    """EfficientNet V1 with compound width/depth scaling (MBConv + SE).

    Exact keras.applications structure: internal Rescaling+Normalization,
    SE as 1x1 convs, taps at the reference's blockNa_expand_activation
    positions (inside the first block of each strided stage,
    unet_variants.py:2440-2461) + top_activation."""

    width: float = 1.0
    depth: float = 1.0
    max_tap: int = 5
    dtype: Dtype = jnp.float32

    # B0 base config: (kernel, repeats, cin, cout, expand, stride)
    _BASE = [(3, 1, 32, 16, 1, 1), (3, 2, 16, 24, 6, 2),
             (5, 2, 24, 40, 6, 2), (3, 3, 40, 80, 6, 2),
             (5, 3, 80, 112, 6, 1), (5, 4, 112, 192, 6, 2),
             (3, 1, 192, 320, 6, 1)]

    def _mbconv(self, h, k, cout, expand, stride, train, tap_only=False):
        cin = h.shape[-1]
        y = h
        expand_act = None
        if expand != 1:
            y = _conv(y, cin * expand, 1, 1, self.dtype)
            y = nn.swish(_bn(y, train, self.dtype))
            expand_act = y
            if tap_only:
                # final needed tap: keras prunes the rest of the block
                return None, expand_act
        c = y.shape[-1]
        y = _conv(y, c, k, stride, self.dtype, groups=c)
        y = nn.swish(_bn(y, train, self.dtype))
        # squeeze-excite at ratio 0.25 of cin, as 1x1 convs (keras layout)
        se_c = max(1, int(cin * 0.25))
        s = jnp.mean(y, axis=(1, 2), keepdims=True)
        s = nn.Conv(se_c, (1, 1), dtype=self.dtype,
                    param_dtype=jnp.float32)(s)
        s = nn.swish(s)
        s = nn.Conv(c, (1, 1), dtype=self.dtype, param_dtype=jnp.float32)(s)
        s = nn.sigmoid(s)
        y = y * s
        y = _conv(y, cout, 1, 1, self.dtype)
        y = _bn(y, train, self.dtype)
        if stride == 1 and cin == cout:
            y = y + h
        return y, expand_act

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False
                 ) -> tp.List[jax.Array]:
        n_need = self.max_tap + 1
        taps = [x]
        h = InputNorm(dtype=self.dtype)(x)
        stem = _round_filters(32, self.width)
        h = _conv(h, stem, 3, 2, self.dtype)
        h = nn.swish(_bn(h, train, self.dtype))
        for (k, r, cin, cout, expand, stride) in self._BASE:
            cout_s = _round_filters(cout, self.width)
            reps = _round_repeats(r, self.depth)
            for b in range(reps):
                s = stride if b == 0 else 1
                is_tap = s == 2 and b == 0 and expand != 1
                tap_only = is_tap and len(taps) + 1 >= n_need
                h, expand_act = self._mbconv(h, k, cout_s, expand, s, train,
                                             tap_only=tap_only)
                if is_tap:
                    taps.append(expand_act)  # blockNa_expand_activation
                    if tap_only:
                        return taps
        h = _conv(h, _round_filters(1280, self.width), 1, 1, self.dtype)
        h = nn.swish(_bn(h, train, self.dtype))
        taps.append(h)  # top_activation, stride 32
        return taps


class EfficientNetV2Backbone(nn.Module):
    """EfficientNet V2 (fused-MBConv early stages)."""

    size: str = "b0"
    max_tap: int = 5
    dtype: Dtype = jnp.float32

    # (kernel, repeats, cout, expand, stride, fused, se)
    _CFG = {
        "b0": [(3, 1, 16, 1, 1, True, 0), (3, 2, 32, 4, 2, True, 0),
               (3, 2, 48, 4, 2, True, 0), (3, 3, 96, 4, 2, False, .25),
               (3, 5, 112, 6, 1, False, .25), (3, 8, 192, 6, 2, False, .25)],
        "b1": [(3, 2, 16, 1, 1, True, 0), (3, 3, 32, 4, 2, True, 0),
               (3, 3, 48, 4, 2, True, 0), (3, 4, 96, 4, 2, False, .25),
               (3, 6, 112, 6, 1, False, .25), (3, 9, 192, 6, 2, False, .25)],
        "b2": [(3, 2, 16, 1, 1, True, 0), (3, 3, 32, 4, 2, True, 0),
               (3, 3, 56, 4, 2, True, 0), (3, 4, 104, 4, 2, False, .25),
               (3, 6, 120, 6, 1, False, .25), (3, 10, 208, 6, 2, False, .25)],
        "b3": [(3, 2, 16, 1, 1, True, 0), (3, 3, 40, 4, 2, True, 0),
               (3, 3, 56, 4, 2, True, 0), (3, 5, 112, 4, 2, False, .25),
               (3, 7, 136, 6, 1, False, .25), (3, 12, 232, 6, 2, False, .25)],
        "s": [(3, 2, 24, 1, 1, True, 0), (3, 4, 48, 4, 2, True, 0),
              (3, 4, 64, 4, 2, True, 0), (3, 6, 128, 4, 2, False, .25),
              (3, 9, 160, 6, 1, False, .25), (3, 15, 256, 6, 2, False, .25)],
        "m": [(3, 3, 24, 1, 1, True, 0), (3, 5, 48, 4, 2, True, 0),
              (3, 5, 80, 4, 2, True, 0), (3, 7, 160, 4, 2, False, .25),
              (3, 14, 176, 6, 1, False, .25), (3, 18, 304, 6, 2, False, .25),
              (3, 5, 512, 6, 1, False, .25)],
        "l": [(3, 4, 32, 1, 1, True, 0), (3, 7, 64, 4, 2, True, 0),
              (3, 7, 96, 4, 2, True, 0), (3, 10, 192, 4, 2, False, .25),
              (3, 19, 224, 6, 1, False, .25), (3, 25, 384, 6, 2, False, .25),
              (3, 7, 640, 6, 1, False, .25)],
    }

    #: keras.applications stem filters per size
    _STEM = {"b0": 32, "b1": 32, "b2": 32, "b3": 40, "s": 24, "m": 24,
             "l": 32}

    def _block(self, h, k, cout, expand, stride, fused, se_ratio, train,
               tap_only=False):
        cin = h.shape[-1]
        y = h
        expand_act = None
        if fused:
            if expand != 1:
                y = _conv(y, cin * expand, k, stride, self.dtype)
                y = nn.swish(_bn(y, train, self.dtype))
                expand_act = y
                if tap_only:
                    return None, expand_act
                y = _conv(y, cout, 1, 1, self.dtype)
                y = _bn(y, train, self.dtype)
            else:
                y = _conv(y, cout, k, stride, self.dtype)
                y = nn.swish(_bn(y, train, self.dtype))
                expand_act = y  # 'project_activation' of an e=1 fused
                # block is this pre-residual activation
                if tap_only:
                    return None, expand_act
        else:
            if expand != 1:
                y = _conv(y, cin * expand, 1, 1, self.dtype)
                y = nn.swish(_bn(y, train, self.dtype))
                expand_act = y
                if tap_only:
                    return None, expand_act
            c = y.shape[-1]
            y = _conv(y, c, k, stride, self.dtype, groups=c)
            y = nn.swish(_bn(y, train, self.dtype))
            if se_ratio:
                # SE as 1x1 convs on input-filter count (keras layout)
                se_c = max(1, int(cin * se_ratio))
                s = jnp.mean(y, axis=(1, 2), keepdims=True)
                s = nn.Conv(se_c, (1, 1), dtype=self.dtype,
                            param_dtype=jnp.float32)(s)
                s = nn.swish(s)
                s = nn.Conv(c, (1, 1), dtype=self.dtype,
                            param_dtype=jnp.float32)(s)
                y = y * nn.sigmoid(s)
            y = _conv(y, cout, 1, 1, self.dtype)
            y = _bn(y, train, self.dtype)
        if stride == 1 and cin == cout:
            y = y + h
        return y, expand_act

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False
                 ) -> tp.List[jax.Array]:
        cfg = self._CFG[self.size]
        taps = [x]
        # keras.applications V2 preprocessing (weightless layers): B variants
        # rescale 1/255 + ImageNet normalization constants; S/M/L rescale
        # to [-1, 1]
        if self.size.startswith("b"):
            mean = jnp.asarray([0.485, 0.456, 0.406], jnp.float32)
            std = jnp.asarray([0.229, 0.224, 0.225], jnp.float32)
            h = ((x.astype(jnp.float32) / 255.0 - mean) / std
                 ).astype(self.dtype)
        else:
            h = (x.astype(jnp.float32) / 128.0 - 1.0).astype(self.dtype)
        h = _conv(h, self._STEM[self.size], 3, 2, self.dtype)
        h = nn.swish(_bn(h, train, self.dtype))
        # reference tap scheme (EffV2B0, unet_variants.py:2943-2964):
        # block1a project act (s2), block2b expand act (s4), block4a expand
        # act (s8), block6a expand act (s16), top (s32) -- i.e. the output
        # of (stage0, block0) and the expand activations of (stage1,
        # block1), (stage3, block0), (stage5, block0).  Exact for the
        # 6-stage B0-B3 layouts; S/M/L share the first 6 stages.
        tap_expand = {(1, 1), (3, 0), (5, 0)}
        n_need = self.max_tap + 1
        for stage, (k, reps, cout, expand, stride, fused, se) in enumerate(cfg):
            for b in range(reps):
                s = stride if b == 0 else 1
                is_tap = (stage == 0 and b == 0) or (stage, b) in tap_expand
                tap_only = is_tap and len(taps) + 1 >= n_need
                h, expand_act = self._block(h, k, cout, expand, s, fused,
                                            se, train, tap_only=tap_only)
                if stage == 0 and b == 0:
                    # block1a project_activation (pre-residual; for the B
                    # variants cin != cout so it equals the block output)
                    taps.append(expand_act if expand_act is not None else h)
                elif (stage, b) in tap_expand and expand_act is not None:
                    taps.append(expand_act)
                if tap_only and len(taps) >= n_need:
                    return taps
        h = _conv(h, 1280, 1, 1, self.dtype)
        h = nn.swish(_bn(h, train, self.dtype))
        taps.append(h)  # top_activation, stride 32
        return taps
