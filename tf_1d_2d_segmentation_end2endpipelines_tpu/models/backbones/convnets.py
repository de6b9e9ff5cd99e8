"""Classic conv backbones: ResNet(V2), VGG, DenseNet, MobileNet(V1/V2/V3).

Tap semantics mirror the reference's per-backbone ``get_layer`` tables
(2DCNN/models/unet_variants.py:1057-1086 ResNet50, :1520-1549 VGG16,
:1664-1699 DenseNet121, :1905-1935 MobileNet, ...): taps[i] at stride 2**i,
taps[0] = the raw input.  All blocks are NHWC, bf16-capable, BN stats f32.
"""
from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.blocks import relu

Dtype = tp.Any


def _bn(x, train, dtype, name=None, eps=1.001e-5):
    return nn.BatchNorm(use_running_average=not train, momentum=0.99,
                        epsilon=eps, dtype=dtype,
                        param_dtype=jnp.float32, name=name)(x)


def _conv(x, feats, k, s, dtype, use_bias=True, name=None, groups=1):
    return nn.Conv(feats, (k, k), strides=(s, s), padding="SAME",
                   feature_group_count=groups, use_bias=use_bias,
                   dtype=dtype, param_dtype=jnp.float32, name=name)(x)


def _maxpool(x, k=3, s=2):
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, k, k, 1),
                                 (1, s, s, 1), "SAME")


class ResNetBackbone(nn.Module):
    """ResNet v1 bottleneck backbone (taps: input, stem relu, stage ends --
    the reference's conv1_relu / convN_blockM_out tap names).

    ``max_tap``: deepest tap index to produce (taps[0..max_tap]).  At
    model_depth < 5 the reference's Keras graph prunes every encoder layer
    unreachable from the used taps (unet_variants.py:1062-1087 truncates
    ``convs`` + picks the bottleneck by depth); stopping the stage loop at
    the same boundary keeps params/compute/checkpoints identical.  All
    backbones in this module follow the same contract.
    """

    blocks: tp.Tuple[int, ...] = (3, 4, 6, 3)
    max_tap: int = 5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False
                 ) -> tp.List[jax.Array]:
        n_need = self.max_tap + 1
        taps = [x]
        # keras.applications stem: ZeroPad(3) + VALID 7x7 s2, ZeroPad(1) +
        # VALID 3x3 maxpool (exact for ImageNet weight conversion)
        h = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    dtype=self.dtype, param_dtype=jnp.float32)(x)
        h = _bn(h, train, self.dtype)
        h = relu(h)
        taps.append(h)  # stride 2 ('conv1_relu')
        if len(taps) >= n_need:
            return taps
        h = jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0)),
                    constant_values=-jnp.inf)
        h = jax.lax.reduce_window(h, -jnp.inf, jax.lax.max, (1, 3, 3, 1),
                                  (1, 2, 2, 1), "VALID")
        feats = 64
        for stage, n_blocks in enumerate(self.blocks):
            if len(taps) >= n_need:
                break
            for b in range(n_blocks):
                stride = 2 if (stage > 0 and b == 0) else 1
                shortcut = h
                if b == 0:
                    shortcut = _conv(h, feats * 4, 1, stride, self.dtype)
                    shortcut = _bn(shortcut, train, self.dtype)
                y = _conv(h, feats, 1, stride, self.dtype)
                y = relu(_bn(y, train, self.dtype))
                y = _conv(y, feats, 3, 1, self.dtype)
                y = relu(_bn(y, train, self.dtype))
                y = _conv(y, feats * 4, 1, 1, self.dtype)
                y = _bn(y, train, self.dtype)
                h = relu(y + shortcut)
            taps.append(h)  # strides 4, 8, 16, 32
            feats *= 2
        return taps


class ResNetV2Backbone(nn.Module):
    """ResNet v2 (pre-activation).  The reference taps concat two
    activations per stage (convN_blockM_1_relu + preact_relu,
    unet_variants.py:1288-1319); here each stage tap is the concat of the
    stage's last pre-activation and first-conv activation, matching that
    two-tensor concat semantics."""

    blocks: tp.Tuple[int, ...] = (3, 4, 6, 3)
    max_tap: int = 5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False
                 ) -> tp.List[jax.Array]:
        n_need = self.max_tap + 1
        taps = [x]
        # keras.applications v2 stem: ZeroPad(3) + VALID 7x7 s2 (with bias,
        # no BN -- pre-activation design), ZeroPad(1) + VALID 3x3 maxpool
        h = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    dtype=self.dtype, param_dtype=jnp.float32)(x)
        taps.append(h)  # 'conv1_conv', stride 2
        if len(taps) >= n_need:
            return taps
        h = jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0)),
                    constant_values=-jnp.inf)
        h = jax.lax.reduce_window(h, -jnp.inf, jax.lax.max, (1, 3, 3, 1),
                                  (1, 2, 2, 1), "VALID")
        feats = 64
        for stage, n_blocks in enumerate(self.blocks):
            # this stage's concat tap completes the budget: keras keeps
            # only the layers feeding (y1, preact) of the LAST block —
            # cut mid-block at the same boundary
            final_stage = len(taps) + 1 >= n_need and self.max_tap < 5
            stage_pair = None
            for b in range(n_blocks):
                stride = 2 if (stage < len(self.blocks) - 1
                               and b == n_blocks - 1) else 1
                cut = final_stage and b == n_blocks - 1
                preact = relu(_bn(h, train, self.dtype))
                shortcut = None
                if not cut:
                    if b == 0:
                        shortcut = _conv(preact, feats * 4, 1, 1, self.dtype)
                    elif stride > 1:
                        shortcut = _maxpool(h, 1, stride)
                    else:
                        shortcut = h
                y = _conv(preact, feats, 1, 1, self.dtype, use_bias=False)
                y1 = relu(_bn(y, train, self.dtype))
                stage_pair = (y1, preact)
                if cut:
                    break
                # keras v2 pads (1,1) + VALID for the 3x3 (differs from
                # SAME's (0,1) alignment when stride == 2)
                y = nn.Conv(feats, (3, 3), strides=(stride, stride),
                            padding=[(1, 1), (1, 1)], use_bias=False,
                            dtype=self.dtype, param_dtype=jnp.float32)(y1)
                y = relu(_bn(y, train, self.dtype))
                y = _conv(y, feats * 4, 1, 1, self.dtype)
                h = y + shortcut
            y1, preact = stage_pair
            # both tensors are at the stage's INPUT stride (the stride-2
            # conv happens after them), matching the reference's taps
            taps.append(jnp.concatenate([y1, preact], axis=-1))
            if len(taps) >= n_need and self.max_tap < 5:
                # the full path instead swaps taps[5] for post_relu below
                return taps
            feats *= 2
        # final post_relu at stride 32
        taps.append(relu(_bn(h, train, self.dtype)))
        # taps: [in, s2, s4, s8, s16, s32-from-last-stage, post_relu(s32)]
        # keep reference shape: 6 taps with [5] = post_relu
        return taps[:5] + [taps[6]]


class VGGBackbone(nn.Module):
    """VGG16/19 (taps: block2_conv2 .. block5_conv3/4 + block5_pool,
    unet_variants.py:1520-1549)."""

    convs: tp.Tuple[int, ...] = (2, 2, 3, 3, 3)
    max_tap: int = 5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False
                 ) -> tp.List[jax.Array]:
        n_need = self.max_tap + 1
        widths = (64, 128, 256, 512, 512)
        taps = [x]
        h = x
        for stage, (n, w) in enumerate(zip(self.convs, widths)):
            if len(taps) >= n_need:
                return taps
            for _ in range(n):
                h = relu(_conv(h, w, 3, 1, self.dtype))
            if stage >= 1:
                taps.append(h)  # last conv of blocks 2..5
            h = _maxpool(h, 2, 2)
        if len(taps) < n_need:
            taps.append(h)  # block5_pool, stride 32
        return taps


class DenseNetBackbone(nn.Module):
    """DenseNet (taps: conv1/relu, pool2_relu, pool3_relu, pool4_relu,
    relu -- unet_variants.py:1664-1699).  growth_rate 32."""

    blocks: tp.Tuple[int, ...] = (6, 12, 24, 16)
    growth: int = 32
    max_tap: int = 5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False
                 ) -> tp.List[jax.Array]:
        n_need = self.max_tap + 1
        taps = [x]
        # keras.applications stem: ZeroPad(3) + VALID 7x7 s2 (exact match
        # so converted ImageNet weights reproduce keras outputs)
        h = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32)(x)
        h = relu(_bn(h, train, self.dtype))
        taps.append(h)  # conv1/relu, stride 2
        if len(taps) >= n_need:
            return taps
        h = jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0)),
                    constant_values=-jnp.inf)
        h = jax.lax.reduce_window(h, -jnp.inf, jax.lax.max, (1, 3, 3, 1),
                                  (1, 2, 2, 1), "VALID")
        for stage, n_layers in enumerate(self.blocks):
            for _ in range(n_layers):
                y = relu(_bn(h, train, self.dtype))
                y = _conv(y, 4 * self.growth, 1, 1, self.dtype,
                          use_bias=False)
                y = relu(_bn(y, train, self.dtype))
                y = _conv(y, self.growth, 3, 1, self.dtype, use_bias=False)
                h = jnp.concatenate([h, y], axis=-1)
            if stage < len(self.blocks) - 1:
                # transition: BN relu (tap: the reference's poolN_relu is
                # BEFORE the 1x1 conv) then conv + avgpool
                y = relu(_bn(h, train, self.dtype))
                taps.append(y)  # poolN_relu
                if len(taps) >= n_need:
                    # keras prunes the transition's 1x1 conv too: the
                    # poolN_relu tap is BEFORE it
                    return taps
                y = _conv(y, h.shape[-1] // 2, 1, 1, self.dtype,
                          use_bias=False)
                h = jax.lax.reduce_window(
                    y, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1),
                    "VALID") / 4.0
            else:
                taps.append(relu(_bn(h, train, self.dtype)))  # 'relu'
        # taps: [in, s2, s4, s8, s16, s32]: transition taps are pre-pool
        return taps


class MobileNetBackbone(nn.Module):
    """MobileNet v1 (depthwise-separable; taps at the conv_dw/pw relus of
    strides 1..32, unet_variants.py:1905-1935)."""

    alpha: float = 1.0
    max_tap: int = 5
    dtype: Dtype = jnp.float32

    def _sep(self, h, feats, stride, train):
        c = h.shape[-1]
        h = _conv(h, c, 3, stride, self.dtype, use_bias=False, groups=c)
        h = nn.relu6(_bn(h, train, self.dtype, eps=1e-3))
        h = _conv(h, feats, 1, 1, self.dtype, use_bias=False)
        return nn.relu6(_bn(h, train, self.dtype, eps=1e-3))

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False
                 ) -> tp.List[jax.Array]:
        a = self.alpha
        n_need = self.max_tap + 1
        taps = [x]
        h = _conv(x, int(32 * a), 3, 2, self.dtype, use_bias=False)
        h = nn.relu6(_bn(h, train, self.dtype, eps=1e-3))
        h = self._sep(h, int(64 * a), 1, train)
        taps.append(h)  # stride 2
        if len(taps) >= n_need:
            return taps
        h = self._sep(h, int(128 * a), 2, train)
        h = self._sep(h, int(128 * a), 1, train)
        taps.append(h)  # stride 4
        if len(taps) >= n_need:
            return taps
        h = self._sep(h, int(256 * a), 2, train)
        h = self._sep(h, int(256 * a), 1, train)
        taps.append(h)  # stride 8
        if len(taps) >= n_need:
            return taps
        h = self._sep(h, int(512 * a), 2, train)
        for _ in range(5):
            h = self._sep(h, int(512 * a), 1, train)
        taps.append(h)  # stride 16
        if len(taps) >= n_need:
            return taps
        h = self._sep(h, int(1024 * a), 2, train)
        h = self._sep(h, int(1024 * a), 1, train)
        taps.append(h)  # stride 32
        return taps


class MobileNetV2Backbone(nn.Module):
    """MobileNet v2 inverted residuals.  Taps match the reference's
    block_{1,3,6,13}_expand_relu + out_relu (unet_variants.py:1977-2007):
    the expand activation INSIDE the first block of each strided group
    (exact for keras.applications weight conversion; BN eps 1e-3)."""

    alpha: float = 1.0
    max_tap: int = 5
    dtype: Dtype = jnp.float32

    def _inv(self, h, feats, stride, expand, train, tap_only=False):
        cin = h.shape[-1]
        y = h
        expand_act = None
        if expand != 1:
            y = _conv(y, cin * expand, 1, 1, self.dtype, use_bias=False)
            y = nn.relu6(_bn(y, train, self.dtype, eps=1e-3))
            expand_act = y
            if tap_only:
                # this block's expand activation is the final needed tap:
                # keras prunes the depthwise/project layers after it
                return None, expand_act
        c = y.shape[-1]
        y = _conv(y, c, 3, stride, self.dtype, use_bias=False, groups=c)
        y = nn.relu6(_bn(y, train, self.dtype, eps=1e-3))
        y = _conv(y, feats, 1, 1, self.dtype, use_bias=False)
        y = _bn(y, train, self.dtype, eps=1e-3)
        if stride == 1 and cin == feats:
            y = y + h
        return y, expand_act

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False
                 ) -> tp.List[jax.Array]:
        cfg = [  # (expand, feats, n, stride)
            (1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
            (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1)]
        n_need = self.max_tap + 1
        taps = [x]
        h = _conv(x, 32, 3, 2, self.dtype, use_bias=False)
        h = nn.relu6(_bn(h, train, self.dtype, eps=1e-3))
        for expand, feats, n, s in cfg:
            for b in range(n):
                is_tap = s == 2 and b == 0 and expand != 1
                tap_only = is_tap and len(taps) + 1 >= n_need
                h, expand_act = self._inv(h, int(feats * self.alpha),
                                          s if b == 0 else 1, expand, train,
                                          tap_only=tap_only)
                if is_tap:
                    taps.append(expand_act)  # block_N_expand_relu
                    if tap_only:
                        return taps
        h = _conv(h, 1280, 1, 1, self.dtype, use_bias=False)
        h = nn.relu6(_bn(h, train, self.dtype, eps=1e-3))
        taps.append(h)  # out_relu, stride 32
        return taps


def _hswish(x):
    return x * nn.relu6(x + 3.0) / 6.0


class MobileNetV3Backbone(nn.Module):
    """MobileNet v3 small/large, mirroring keras.applications.MobileNetV3
    layer-for-layer (incl. the internal Rescaling(1/127.5, -1), the
    block-0 expansion skip, SE 1x1 convs with _depth(expand/4) filters and
    hard-sigmoid gates, BN eps 1e-3) so ImageNet weights convert exactly
    by call order.

    Taps: the reference's auto-numbered layer names (re_lu / re_lu_3 /
    re_lu_7 / re_lu_22 / re_lu_31, unet_variants.py:2049-2079 /
    2121-2151) do not exist under the installed Keras 3 -- the reference's
    own MobileNetV3 pretrained path crashes (demonstrated in
    tests/test_backbones.py::test_reference_mobilenetv3_taps_broken), and
    the resolvable ones include 1x1 squeeze-excite tensors that cannot
    feed a spatial decoder.  Taps here implement the INTENT: the last
    tensor at each stride (input, pre-stride-2 block inputs, final
    activation).
    """

    size: str = "large"
    max_tap: int = 5
    dtype: Dtype = jnp.float32

    @staticmethod
    def _depth(v, divisor=8, min_value=None):
        if min_value is None:
            min_value = divisor
        new_v = max(min_value, (int(v + divisor / 2) // divisor) * divisor)
        if new_v < 0.9 * v:
            new_v += divisor
        return new_v

    def _hsig(self, x):
        return nn.relu6(x + 3.0) * (1.0 / 6.0)

    def _se(self, h, expand):
        filters = self._depth(expand * 0.25)
        s = jnp.mean(h, axis=(1, 2), keepdims=True)
        s = relu(_conv(s, filters, 1, 1, self.dtype, use_bias=True))
        s = _conv(s, expand, 1, 1, self.dtype, use_bias=True)
        return h * self._hsig(s)

    def _block(self, h, block_id, k, exp, feats, se, act, stride, train):
        cin = h.shape[-1]
        y = h
        if block_id > 0:  # keras skips the expansion on block 0
            y = _conv(y, exp, 1, 1, self.dtype, use_bias=False)
            y = act(_bn(y, train, self.dtype, eps=1e-3))
        y = nn.Conv(exp, (k, k), strides=(stride, stride), padding="SAME",
                    feature_group_count=exp, use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32)(y)
        y = act(_bn(y, train, self.dtype, eps=1e-3))
        if se:
            y = self._se(y, exp)
        y = _conv(y, feats, 1, 1, self.dtype, use_bias=False)
        y = _bn(y, train, self.dtype, eps=1e-3)
        if stride == 1 and cin == feats:
            y = y + h
        return y

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False
                 ) -> tp.List[jax.Array]:
        hs = _hswish  # `relu` = output-residual ReLU from ops.blocks
        # (kernel, expand, project, se, activation, stride) per keras config
        if self.size == "large":
            cfg = [(3, 16, 16, False, relu, 1), (3, 64, 24, False, relu, 2),
                   (3, 72, 24, False, relu, 1), (5, 72, 40, True, relu, 2),
                   (5, 120, 40, True, relu, 1), (5, 120, 40, True, relu, 1),
                   (3, 240, 80, False, hs, 2), (3, 200, 80, False, hs, 1),
                   (3, 184, 80, False, hs, 1), (3, 184, 80, False, hs, 1),
                   (3, 480, 112, True, hs, 1), (3, 672, 112, True, hs, 1),
                   (5, 672, 160, True, hs, 2), (5, 960, 160, True, hs, 1),
                   (5, 960, 160, True, hs, 1)]
            last = 960
        else:
            cfg = [(3, 16, 16, True, relu, 2), (3, 72, 24, False, relu, 2),
                   (3, 88, 24, False, relu, 1), (5, 96, 40, True, hs, 2),
                   (5, 240, 40, True, hs, 1), (5, 240, 40, True, hs, 1),
                   (5, 120, 48, True, hs, 1), (5, 144, 48, True, hs, 1),
                   (5, 288, 96, True, hs, 2), (5, 576, 96, True, hs, 1),
                   (5, 576, 96, True, hs, 1)]
            last = 576
        n_need = self.max_tap + 1
        taps = [x]
        h = x.astype(self.dtype) / 127.5 - 1.0  # keras internal Rescaling
        h = _conv(h, 16, 3, 2, self.dtype, use_bias=False)
        h = _hswish(_bn(h, train, self.dtype, eps=1e-3))
        for block_id, (k, exp, feats, se, act, s) in enumerate(cfg):
            if s == 2:
                taps.append(h)  # pre-stride block input (intent taps)
                if len(taps) >= n_need:
                    return taps
            h = self._block(h, block_id, k, exp, feats, se, act, s, train)
        h = _conv(h, last, 1, 1, self.dtype, use_bias=False)
        h = _hswish(_bn(h, train, self.dtype, eps=1e-3))
        taps.append(h)
        while len(taps) < 6:  # small variant reaches stride 32 early
            taps.append(taps[-1])
        return taps[:6]
