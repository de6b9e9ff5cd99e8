"""Decoder zoo (the framework's L2): every decoder family of the reference,
rank-polymorphic (1D + 2D from the same code) and parameterized instead of
copy-pasted.

Reference wiring being reproduced (TensorFlow/2DCNN/models/unet_variants.py):
- ``UNet``            :125-154   plain chain
- ``UNetE``           :157-214   ensembled grid (skip = encoder tap)
- ``UNetP``           :217-274   plus grid (skip = previous column node)
- ``UNetPP``          :277-343   nested dense-skip grid
- ``UNet3P``          :346-376   full-scale skips w/ sigmoid-gated concats
- ``UNet4P``          :379-456   nested grid + inter-decoder skip paths
- ``MultiResUNet``    :459-487   chain with MultiRes blocks
- ``MultiResUNet3P``  :490-520   full-scale with MultiRes blocks + ResPath
- ``AHNet``           :523-600   UNet4P with ResPath'd skip paths
- ``KSSNet``          :603-641   MultiRes chain + sigmoid-gated cross-level concats
- ``SelfUNet/PP/3P``  :644-747   Self-ONN (Oper) variants
- ``FPN``/``SelfFPN`` fpn_variants.py:132-199  add-merge top-down + concat pyramid

Every decoder takes ``skips`` = [conv1 .. convD, bottleneck] (index 0 =
highest resolution) and returns ``(deconv, levels)`` where ``levels`` are the
deep-supervision heads in reference order (level{D} first .. level1 last).

The interior of each decoder column is static Python loop-nesting over a
fixed (i, j) grid -- fully unrolled at trace time so XLA sees one static
graph and fuses the per-node conv->BN->act chains.
"""
from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import (
    AttentionGate,
    ConvBlock,
    ConvLSTMFusion,
    ConvMixerBlock,
    MultiResBlock,
    Oper,
    OperTranspose,
    RecurrentConvBlock,
    ResPath,
    TransConv,
    concat,
    downsample_pool,
    maybe_remat,
    upsample,
)

Dtype = tp.Any


class _DecoderBase(nn.Module):
    """Shared decoder machinery.

    ``dialect`` selects the reference tree's upsampling conventions:
    - '2d' (2DCNN): transposed conv = 4-wide kernel, no BN, LeakyReLU
      (trans_conv2D, unet_variants.py:17); non-transconv upsampling is
      bilinear (upConv_Block :35)
    - '1d' (1DCNN): transposed conv = 2-wide kernel + BN + ReLU
      (trans_conv1D, Models/unet_variants.py:103); UpSampling1D is nearest

    ``node`` selects the per-node block:
    - 'conv'      : ``conv_repeats`` x ConvBlock(kernel)
    - 'multires'  : MultiResBlock
    - 'recurrent' : ``conv_repeats`` x RecurrentConvBlock (RUNet)
    - 'r2'        : 1x1 ConvBlock + RecurrentConvBlock residual add (R2UNet;
      ``conv_repeats`` recurrent blocks chained before the add)
    - 'convmixer' : ConvMixerBlock (convmixer_unet.py topologies)
    """

    model_width: int
    model_depth: int
    D_S: int = 0
    A_G: int = 0
    LSTM: int = 0
    is_transconv: bool = True
    alpha: float = 1.0
    q: int = 3
    t: int = 2
    kernel: int = 3
    conv_repeats: int = 1
    node: str = "conv"
    dialect: str = "2d"
    merge: str = "concat"  # 'add' = LinkNet-style add-merge (linknet.py:123)
    block_remat: bool = False  # per-block remat (ops.blocks.remat_block)
    dtype: Dtype = jnp.float32

    def _merge(self, *tensors: jax.Array) -> jax.Array:
        if self.merge == "add":
            out = tensors[0]
            for t in tensors[1:]:
                out = out + t
            return out
        return concat(*tensors)

    def _up(self, x: jax.Array, features: int, train: bool) -> jax.Array:
        """Upsample one step: transposed conv or resize (reference
        ``trans_conv2D``/``trans_conv1D`` vs ``upConv_Block``)."""
        if self.is_transconv:
            if self.dialect == "1d":
                return TransConv(features, kernel=2, use_bn=True,
                                 activation="relu", dtype=self.dtype)(x, train)
            return TransConv(features, dtype=self.dtype)(x, train)
        method = "nearest" if self.dialect == "1d" else "bilinear"
        return upsample(x, 2, method=method)

    def _resize(self, x: jax.Array, factor: int) -> jax.Array:
        method = "nearest" if self.dialect == "1d" else "bilinear"
        return upsample(x, factor, method=method)

    def _node_block(self, x: jax.Array, features: int, train: bool
                    ) -> jax.Array:
        MRB = maybe_remat(MultiResBlock, self.block_remat)
        RCB = maybe_remat(RecurrentConvBlock, self.block_remat)
        CMB = maybe_remat(ConvMixerBlock, self.block_remat)
        CB = maybe_remat(ConvBlock, self.block_remat)
        if self.node in ("multires", "multires_mixer"):
            if self.dialect == "1d":
                return MRB(self.model_width, self.kernel,
                           alpha=self.alpha,
                           multiplier=features // self.model_width,
                           mixer=self.node == "multires_mixer",
                           dtype=self.dtype)(x, train)
            return MRB(features, self.kernel, alpha=self.alpha,
                       mixer=self.node == "multires_mixer",
                       dtype=self.dtype)(x, train)
        if self.node == "recurrent":
            for _ in range(self.conv_repeats):
                x = RCB(features, self.kernel, t=self.t,
                        dtype=self.dtype)(x, train)
            return x
        if self.node == "r2":
            raw = CB(features, 1, dtype=self.dtype)(x, train)
            out = x
            for _ in range(self.conv_repeats):
                out = RCB(features, self.kernel, t=self.t,
                          dtype=self.dtype)(out, train)
            return raw + out
        if self.node == "convmixer":
            out = x
            for _ in range(self.conv_repeats):
                out = CMB(features, self.kernel,
                          dtype=self.dtype)(out, train)
            return out
        out = x
        for _ in range(self.conv_repeats):
            out = CB(features, self.kernel, dtype=self.dtype)(out, train)
        return out

    def _ds_head(self, x: jax.Array, level: int,
                 strides: int = 1) -> jax.Array:
        """Deep-supervision head: 1-filter 1x1 conv named ``level{k}``."""
        n = x.ndim - 2
        return nn.Conv(1, (1,) * n, strides=(strides,) * n,
                       dtype=self.dtype, param_dtype=jnp.float32,
                       name=f"level{level}")(x)

    def _lstm_filters(self, j: int) -> int:
        # reference: np.int32(model_width * (2 ** (j - 1)))
        return max(int(self.model_width * (2.0 ** (j - 1))), 1)


class ChainDecoder(_DecoderBase):
    """Plain top-down chain decoder: UNet / MultiResUNet / KSSNet / FPN.

    ``style``: 'unet' (ConvBlock merge, concat), 'multires' (MultiResBlock,
    concat), 'kssnet' (MultiResBlock + sigmoid-gated cross-level concats),
    'fpn' (ConvBlock, add-merge + final top-down concat pyramid).
    """

    style: str = "unet"

    @nn.compact
    def __call__(self, skips: tp.Sequence[jax.Array],
                 train: bool = False) -> tp.Tuple[jax.Array, tp.List[jax.Array]]:
        D = self.model_depth
        W = self.model_width
        levels: tp.List[jax.Array] = []
        deconv = skips[-1]
        deconvs: tp.Dict[int, jax.Array] = {}
        fpn_stages: tp.List[jax.Array] = []
        for j in range(D):
            width_j = W * (2 ** (D - j - 1))
            skip = skips[D - j - 1]
            if self.A_G == 1:
                skip = AttentionGate(W * (2 ** (D - j - 1)), dialect=self.dialect,
                                     dtype=self.dtype)(skips[D - j - 1], deconv, train)
            if self.D_S == 1:
                levels.append(self._ds_head(deconv, D - j))
            deconv = self._up(deconv, width_j, train)
            if self.LSTM == 1:
                deconv = ConvLSTMFusion(
                    max(int(W * (2.0 ** (D - j - 2))), 1),
                    dtype=self.dtype)(skip, deconv)
            elif self.style == "fpn":
                deconv = skip + deconv
            else:
                deconv = self._merge(deconv, skip)
            if self.style == "kssnet":
                # sigmoid-gated concats from the bottleneck and every earlier
                # decoder stage (unet_variants.py:631-638)
                for m in range(0, j + 1):
                    tmp = skips[-1] if m == 0 else deconvs[m]
                    tmp = self._resize(tmp, 2 ** (j - m + 1))
                    deconv = concat(deconv, nn.sigmoid(tmp))
            deconv = self._node_block(deconv, width_j, train)
            deconvs[j + 1] = deconv
            if self.style == "fpn":
                fpn_stages.append(deconv)
        if self.style == "fpn":
            # concat pyramid of all decoder stages (fpn_variants.py:163-169)
            tot = fpn_stages[0]
            for k in range(1, D):
                tot = self._resize(tot, 2)
                tot = concat(tot, fpn_stages[k])
            return tot, levels
        return deconv, levels


class GridDecoder(_DecoderBase):
    """(i, j) grid decoders: UNetE / UNetP / UNetPP / UNet4P / AHNet.

    ``variant`` selects the skip policy at i > 1:
    - 'E'  : encoder tap convs[j]                 (unet_variants.py:157)
    - 'P'  : previous column node deconvs[j,i-1]  (:217)
    - 'PP' : encoder tap + dense concat of deconvs[j,1..i-1]  (:277)
    - '4P' : 'PP' + sigmoid inter-decoder skip paths          (:379)
    - 'AH' : '4P' with ResPath on the skip paths              (:523)
    """

    variant: str = "PP"

    @nn.compact
    def __call__(self, skips: tp.Sequence[jax.Array],
                 train: bool = False) -> tp.Tuple[jax.Array, tp.List[jax.Array]]:
        D = self.model_depth
        W = self.model_width
        dense = self.variant in ("PP", "4P", "AH")
        has_skip_paths = self.variant in ("4P", "AH")
        levels: tp.List[jax.Array] = []
        if self.D_S == 1:
            levels.append(self._ds_head(skips[0], D))
        deconvs: tp.Dict[tp.Tuple[int, int], jax.Array] = {}
        deconvs_skip: tp.Dict[int, jax.Array] = {}
        for i in range(1, D + 1):
            for j in range(0, D - i + 1):
                if self.variant == "E" and self.D_S == 0 and i + j != D:
                    # UNetE off-diagonal nodes only feed DS heads; without
                    # deep supervision they are dangling in the reference's
                    # Keras graph (UNetE builds them but Model() prunes
                    # them), so they are skipped here too
                    continue
                src = skips[j + 1] if i == 1 else deconvs[(j + 1, i - 1)]
                width_j = W * (2 ** j)
                # --- dense accumulation of earlier columns (PP/4P/AH) ---
                deconv_tot = None
                if dense and i > 1:
                    deconv_tot = deconvs[(j, 1)]
                    if self.A_G == 1:
                        deconv_tot = AttentionGate(width_j, dialect=self.dialect, dtype=self.dtype)(
                            deconv_tot, src, train)
                    for k in range(2, i):
                        tmp = deconvs[(j, k)]
                        if self.A_G == 1:
                            tmp = AttentionGate(width_j, dialect=self.dialect, dtype=self.dtype)(
                                tmp, src, train)
                        deconv_tot = (deconv_tot + tmp if self.merge == "add"
                                      else concat(deconv_tot, tmp))
                # --- skip selection ---
                if self.variant == "P" and i > 1:
                    raw_skip = deconvs[(j, i - 1)]
                else:
                    raw_skip = skips[j]
                skip = raw_skip
                if self.A_G == 1:
                    skip = AttentionGate(width_j, dialect=self.dialect, dtype=self.dtype)(
                        raw_skip, src, train)
                # --- upsample + merge ---
                deconv = self._up(src, width_j, train)
                if self.LSTM == 1:
                    parts = [skip, deconv]
                    if deconv_tot is not None:
                        parts.append(deconv_tot)
                    deconv = ConvLSTMFusion(self._lstm_filters(j),
                                            dtype=self.dtype)(*parts)
                else:
                    if deconv_tot is not None:
                        if self.merge == "add":
                            # LinkNet grids add skip + dense-acc + upsample
                            # (linknet.py LinkNetPP wiring)
                            deconv = skip + deconv_tot + deconv
                        else:
                            deconv = concat(deconv, deconv_tot, skip)
                    else:
                        deconv = self._merge(skip, deconv) \
                            if self.merge == "add" else concat(deconv, skip)
                # --- inter-decoder sigmoid skip paths (4P/AH) ---
                if (has_skip_paths and i > 1 and (i + j) == D
                        and j != (D - 1)):
                    for m in range(1, i - 1):
                        tmp = deconvs_skip[m]
                        if self.variant == "AH":
                            tmp = maybe_remat(ResPath, self.block_remat)(
                                j, W, self.kernel,
                                dtype=self.dtype)(tmp, train)
                        tmp = self._resize(tmp, 2 ** (i - m))
                        # 1D UNet4P concats the skip paths ungated (the 2D
                        # tree sigmoid-gates them, unet_variants.py:444)
                        if self.dialect == "2d":
                            tmp = nn.sigmoid(tmp)
                        deconv = concat(deconv, tmp)
                deconv = self._node_block(deconv, width_j, train)
                deconvs[(j, i)] = deconv
                if has_skip_paths and (i + j) == D:
                    deconvs_skip[i] = deconv
                if self.D_S == 1 and j == 0 and i < D:
                    levels.append(self._ds_head(deconvs[(0, i)], D - i))
        return deconvs[(0, D)], levels


class FullScaleDecoder(_DecoderBase):
    """Full-scale skip decoder: UNet3+ / MultiResUNet3+.

    Reference ``UNet3P`` (unet_variants.py:346-376) and ``MultiResUNet3P``
    (:490-520).  Every decoder node sees: a 3x3-conv'd same-level encoder
    tap, maxpooled-and-conv'd taps from every higher level, the sigmoid of
    the upsampled previous node, and sigmoids of all earlier decoder nodes
    upsampled to this level.  DS heads are stride-2 (half-resolution), a
    reference quirk preserved for parity.
    """

    multires: bool = False

    @nn.compact
    def __call__(self, skips: tp.Sequence[jax.Array],
                 train: bool = False) -> tp.Tuple[jax.Array, tp.List[jax.Array]]:
        D = self.model_depth
        W = self.model_width
        levels: tp.List[jax.Array] = []
        deconv = skips[-1]
        deconvs: tp.Dict[int, jax.Array] = {}
        for j in range(D):
            if self.node == "r2":
                # R2UNet3P quirk: the same-level skip gets a plain conv
                # while pooled skips get full r2 nodes (1D unet_variants.py)
                sc_all = ConvBlock(W, self.kernel,
                                   dtype=self.dtype)(skips[D - j - 1], train)
            else:
                sc_all = self._node_block(skips[D - j - 1], W, train)
            for k in range(0, D - j - 1):
                sc = downsample_pool(skips[k], 2 ** ((D - j) - k - 1), op="max")
                sc = self._node_block(sc, W, train)
                sc_all = concat(sc_all, sc)
            tot = self._node_block(deconv, W, train)
            tot = self._resize(tot, 2)
            tot = nn.sigmoid(tot)
            tot = concat(sc_all, tot)
            if j > 0:
                for m in range(0, j):
                    if self.multires:
                        d = maybe_remat(ResPath, self.block_remat)(
                            j, W, self.kernel,
                            dtype=self.dtype)(deconvs[m], train)
                    elif self.node == "r2":
                        # reference chains two recurrents but the second
                        # re-reads deconvs[m], so one contributes; replicate
                        # the effective single-recurrent residual node
                        raw = ConvBlock(W, 1, dtype=self.dtype)(deconvs[m],
                                                                train)
                        d = RecurrentConvBlock(W, self.kernel, t=self.t,
                                               dtype=self.dtype)(deconvs[m],
                                                                 train)
                        d = raw + d
                    else:
                        d = self._node_block(deconvs[m], W, train)
                    d = self._resize(d, 2 ** (j - m))
                    tot = concat(tot, nn.sigmoid(d))
            feat = W * D if self.multires else W * (D + 1)
            deconv = self._node_block(tot, feat, train)
            deconvs[j] = deconv
            if self.D_S == 1:
                levels.append(self._ds_head(deconv, D - j, strides=2))
        return deconv, levels


class SelfChainDecoder(_DecoderBase):
    """Self-ONN chain decoder (reference ``SelfUNet`` :644-664, ``SelfFPN``
    fpn_variants.py:172-199).  Oper blocks with tanh, BN after the merge op.
    ``style``: 'unet' (concat merge) or 'fpn' (add merge + concat pyramid).
    """

    style: str = "unet"

    @nn.compact
    def __call__(self, skips: tp.Sequence[jax.Array],
                 train: bool = False) -> tp.Tuple[jax.Array, tp.List[jax.Array]]:
        D = self.model_depth
        W = self.model_width
        levels: tp.List[jax.Array] = []
        deconv = skips[-1]
        fpn_stages: tp.List[jax.Array] = []
        for j in range(D):
            width_j = W * (2 ** (D - j - 1))
            skip = skips[D - j - 1]
            if self.D_S == 1:
                levels.append(Oper(1, 1, q=self.q, dtype=self.dtype)(deconv))
            if self.is_transconv:
                deconv = OperTranspose(width_j, 4, strides=2,
                                       activation="tanh", q=self.q,
                                       dtype=self.dtype)(deconv)
            else:
                deconv = self._resize(deconv, 2)
            deconv = (deconv + skip) if self.style == "fpn" else concat(deconv, skip)
            deconv = Oper(width_j, self.kernel, q=self.q, dtype=self.dtype)(deconv)
            deconv = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                                  epsilon=1e-3, dtype=self.dtype,
                                  param_dtype=jnp.float32)(deconv)
            deconv = nn.tanh(deconv)
            fpn_stages.append(deconv)
        if self.style == "fpn":
            tot = fpn_stages[0]
            for k in range(1, D):
                tot = self._resize(tot, 2)
                tot = concat(tot, fpn_stages[k])
            return tot, levels
        return deconv, levels


class SelfGridDecoder(_DecoderBase):
    """Self-ONN nested grid (reference 2D ``SelfUNetPP`` :667-710): UNet++
    topology with Oper blocks + BN + tanh, no attention/LSTM options.

    The 1D tree's convention (1DCNN/Models/unet_variants.py:1412-1511,
    ``dialect='1d'``) drops the BN+tanh after each node Oper and uses
    plain-conv DS heads; ``node_reps`` is 2 for the 1D ``SelfUNetPP``
    (two Opers per node, :1463-1464) and 1 for ``SelfR2UNetPP``
    (``bare=True`` is that arch's legacy alias for the 1D convention)."""

    bare: bool = False
    node_reps: int = 1

    @nn.compact
    def __call__(self, skips: tp.Sequence[jax.Array],
                 train: bool = False) -> tp.Tuple[jax.Array, tp.List[jax.Array]]:
        D = self.model_depth
        W = self.model_width
        levels: tp.List[jax.Array] = []
        plain = self.bare or self.dialect == "1d"

        def _head(x):
            if self.dialect == "1d":  # Conv1D heads (:1440, :1495)
                return nn.Conv(1, (1,), dtype=self.dtype,
                               param_dtype=jnp.float32)(x)
            return Oper(1, 1, q=self.q, dtype=self.dtype)(x)

        if self.D_S == 1:
            levels.append(_head(skips[0]))
        deconvs: tp.Dict[tp.Tuple[int, int], jax.Array] = {}
        for i in range(1, D + 1):
            for j in range(0, D - i + 1):
                src = skips[j + 1] if i == 1 else deconvs[(j + 1, i - 1)]
                width_j = W * (2 ** j)
                if self.is_transconv:
                    deconv = OperTranspose(width_j, 4, strides=2,
                                           activation="tanh", q=self.q,
                                           dtype=self.dtype)(src)
                else:
                    deconv = self._resize(src, 2)
                if i > 1:
                    tot = deconvs[(j, 1)]
                    for k in range(2, i):
                        tot = concat(tot, deconvs[(j, k)])
                    deconv = concat(deconv, tot, skips[j])
                else:
                    deconv = concat(deconv, skips[j])
                for _ in range(max(self.node_reps, 1)):
                    deconv = Oper(width_j, self.kernel, q=self.q,
                                  dtype=self.dtype)(deconv)
                if not plain:
                    deconv = nn.BatchNorm(use_running_average=not train,
                                          momentum=0.99, epsilon=1e-3,
                                          dtype=self.dtype,
                                          param_dtype=jnp.float32)(deconv)
                    deconv = nn.tanh(deconv)
                deconvs[(j, i)] = deconv
                if self.D_S == 1 and j == 0 and i < D:
                    levels.append(_head(deconvs[(0, i)]))
        return deconvs[(0, D)], levels


class SelfFullScaleDecoder(_DecoderBase):
    """Self-ONN UNet3+ (reference ``SelfUNet3P`` :713-747)."""

    @nn.compact
    def __call__(self, skips: tp.Sequence[jax.Array],
                 train: bool = False) -> tp.Tuple[jax.Array, tp.List[jax.Array]]:
        D = self.model_depth
        W = self.model_width
        levels: tp.List[jax.Array] = []
        deconv = skips[-1]
        deconvs: tp.Dict[int, jax.Array] = {}

        def oper_bn_tanh(x: jax.Array, feats: int) -> jax.Array:
            x = Oper(feats, self.kernel, q=self.q, dtype=self.dtype)(x)
            if self.dialect == "1d":
                # 1D SelfUNet3P leaves the skip Opers bare
                return x
            x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                             epsilon=1e-3, dtype=self.dtype,
                             param_dtype=jnp.float32)(x)
            return nn.tanh(x)

        gate = nn.sigmoid if self.dialect == "1d" else nn.tanh

        for j in range(D):
            sc_all = oper_bn_tanh(skips[D - j - 1], W)
            for k in range(0, D - j - 1):
                sc = downsample_pool(skips[k], 2 ** ((D - j) - k - 1), op="max")
                sc_all = concat(sc_all, oper_bn_tanh(sc, W))
            tot = Oper(W, self.kernel, q=self.q, dtype=self.dtype)(deconv)
            tot = self._resize(tot, 2)
            tot = gate(tot)
            tot = concat(sc_all, tot)
            if j > 0:
                for m in range(0, j):
                    d = Oper(W, self.kernel, q=self.q, dtype=self.dtype)(deconvs[m])
                    d = self._resize(d, 2 ** (j - m))
                    tot = concat(tot, gate(d))
            deconv = Oper(W * (D + 1), self.kernel, q=self.q, dtype=self.dtype)(tot)
            deconvs[j] = deconv
            if self.D_S == 1:
                levels.append(Oper(1, 1, strides=2, q=self.q,
                                   dtype=self.dtype)(deconv))
        return deconv, levels


#: decoder-name -> constructor, mirroring the reference's ``decoder_block``
#: dispatch (unet_variants.py:936-963, fpn_variants.py:228-233).
def build_decoder(decoder_name: str, **kw) -> nn.Module:
    name = decoder_name
    if name in ("MultiResUNet", "MultiResUNet3P", "KSSNet"):
        kw.setdefault("node", "multires")
    if name == "UNet":
        return ChainDecoder(style="unet", **kw)
    if name == "UNetE":
        return GridDecoder(variant="E", **kw)
    if name == "UNetP":
        return GridDecoder(variant="P", **kw)
    if name == "UNetPP":
        return GridDecoder(variant="PP", **kw)
    if name in ("UNet3P", "UNet4PV2"):
        return FullScaleDecoder(multires=False, **kw)
    if name == "UNet4P":
        return GridDecoder(variant="4P", **kw)
    if name == "AHNet":
        return GridDecoder(variant="AH", **kw)
    if name == "MultiResUNet":
        return ChainDecoder(style="multires", **kw)
    if name == "MultiResUNet3P":
        return FullScaleDecoder(multires=True, **kw)
    if name == "KSSNet":
        return ChainDecoder(style="kssnet", **kw)
    if name == "FPN":
        return ChainDecoder(style="fpn", **kw)
    if name == "SelfUNet":
        return SelfChainDecoder(style="unet", **kw)
    if name == "SelfUNetPP":
        return SelfGridDecoder(**kw)
    if name == "SelfUNet3P":
        return SelfFullScaleDecoder(**kw)
    if name == "SelfFPN":
        return SelfChainDecoder(style="fpn", **kw)
    raise ValueError(f"Unknown decoder: {decoder_name!r}")


DECODER_NAMES = (
    "UNet", "UNetE", "UNetP", "UNetPP", "UNet3P", "UNet4P", "UNet4PV2",
    "AHNet", "MultiResUNet", "MultiResUNet3P", "KSSNet", "FPN",
    "SelfUNet", "SelfUNetPP", "SelfUNet3P", "SelfFPN",
)
