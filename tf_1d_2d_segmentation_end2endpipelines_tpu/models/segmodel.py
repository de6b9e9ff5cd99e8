"""Top-level segmentation model (the framework's L3).

One config-driven Flax module replaces the reference's 28-method
``unet_model_builder`` / ``fpn_model_builder`` classes
(2DCNN/models/unet_variants.py:977-3502, fpn_variants.py:236-2690): the
encoder is either a from-scratch stack or a pretrained backbone from the
``backbones`` registry; the decoder comes from ``decoders.build_decoder``.

Works for 1D (NLC) and 2D (NHWC) inputs unchanged.
"""
from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import FeatureExtractionBlock, Oper, apply_activation
from .decoders import build_decoder
from .encoders import LatentLayer, PretrainedTapProjector, ScratchEncoder

Dtype = tp.Any


class SegModel(nn.Module):
    """Config-driven segmentation network.

    Mirrors the reference constructor surface
    (unet_variants.py:978-998 / fpn_variants.py:237-255):

    - ``genre``: 'UNet' (latent bottleneck) or 'FPN' (no latent layer)
    - ``decoder_name``: any name in ``decoders.DECODER_NAMES``
    - ``model_width`` / ``model_depth``: channel width W and depth D
    - ``output_nums``: classes (classification) or features (regression)
    - ``ds/ae/ag/lstm``: deep supervision / autoencoder / attention gates /
      BiConvLSTM skip fusion flags
    - ``dense_loop``: latent dense-block length
    - ``feature_number``: autoencoder embedding width
    - ``is_transconv``: transposed conv (True) vs bilinear upsampling (False)
    - ``alpha``: MultiRes width multiplier;  ``q``: Self-ONN order
    - ``final_activation``: 'sigmoid' | 'softmax' | 'linear' | None
    - ``train_mode``: 'from_scratch' | 'pretrained_encoder'
    - ``backbone``: backbone name when ``train_mode='pretrained_encoder'``

    Output: ``{'out': y}`` plus ``{'level1'..'levelD': ...}`` when ds=1.
    """

    decoder_name: str
    model_width: int
    model_depth: int
    output_nums: int = 1
    ds: int = 0
    ae: int = 0
    ag: int = 0
    lstm: int = 0
    dense_loop: int = 1
    feature_number: int = 1024
    is_transconv: bool = True
    alpha: float = 1.0
    q: int = 3
    final_activation: tp.Optional[str] = "sigmoid"
    genre: str = "UNet"
    train_mode: str = "from_scratch"
    backbone: tp.Optional[str] = None
    backbone_trainable: bool = False
    #: per-block rematerialization (INI ``remat = blocks``): wrap the hot
    #: block classes in flax remat with the conv_outs policy — saves conv
    #: (MXU) outputs, recomputes the elementwise tail in backward.  Param
    #: naming is unchanged (ops.blocks.remat_block), so checkpoints are
    #: interchangeable with block_remat off.  See remat_block's docstring
    #: for the measured compile-helper limits on the axon tunnel.
    block_remat: bool = False
    dtype: Dtype = jnp.float32

    def setup(self) -> None:
        if self.train_mode == "pretrained_encoder":
            if not (1 <= self.model_depth <= 5):
                raise ValueError(
                    "The depth of a pretrained-encoder model can only be "
                    "discretely varied from 1 to 5")
        elif self.train_mode == "from_scratch":
            if self.model_depth < 1:
                raise ValueError("The depth of the model cannot be less than 1")
        else:
            raise ValueError(
                'train_mode must be "pretrained_encoder" or "from_scratch"')

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False
                 ) -> tp.Dict[str, jax.Array]:
        D = self.model_depth
        W = self.model_width
        x = x.astype(self.dtype)

        # ---- encoder ----
        if self.train_mode == "pretrained_encoder":
            from .backbones import get_backbone  # lazy: registry import
            bb = get_backbone(self.backbone, dtype=self.dtype,
                              max_tap=min(D, 5))
            raw = bb(x, train=train and self.backbone_trainable)
            # raw: list of taps at strides 1,2,4,8,16(,32).  The reference
            # creates projections for all 5 levels, but for depth<5 the
            # levels above D+1 are unreachable from the output and Keras
            # drops them from the saved graph (unet_variants.py:1062-1087);
            # build only the reachable ones so params/checkpoints match.
            n_proj = min(D + 1, 5)
            taps: tp.List[jax.Array] = []
            if self.genre == "FPN":
                for lvl in range(1, n_proj + 1):
                    kernel = 1
                    feats = W * (2 ** (lvl - 1))
                    from ..ops import ConvBlock
                    if self.decoder_name.startswith("Self"):
                        taps.append(Oper(feats, kernel, q=self.q,
                                         dtype=self.dtype)(raw[lvl - 1]))
                    else:
                        taps.append(ConvBlock(feats, kernel, use_bn=False,
                                              dtype=self.dtype)(raw[lvl - 1], train))
            else:
                for lvl in range(1, n_proj + 1):
                    taps.append(PretrainedTapProjector(
                        self.decoder_name, lvl, W, D, alpha=self.alpha,
                        q=self.q, dtype=self.dtype)(raw[lvl - 1], taps, train))
            bottom = raw[5] if D == 5 else taps[D]
            taps = taps[:D]
        else:
            all_taps, bottom = ScratchEncoder(
                self.decoder_name, W, D, alpha=self.alpha, q=self.q,
                block_remat=self.block_remat, dtype=self.dtype)(x, train)
            taps = all_taps[:D]

        # ---- latent (UNet genre only: unet_variants.py:1095 vs
        #      fpn_variants.py:351 which has no latent layer) ----
        conv = bottom
        if self.genre != "FPN":
            conv = LatentLayer(self.decoder_name, W, D, alpha=self.alpha,
                               q=self.q, dense_loop=self.dense_loop,
                               block_remat=self.block_remat,
                               dtype=self.dtype)(conv, train)
        if self.ae == 1:
            conv = FeatureExtractionBlock(W * (2 ** D), self.feature_number,
                                          dtype=self.dtype)(conv)

        # ---- decoder ----
        skips = list(taps) + [conv]
        decoder = build_decoder(
            self.decoder_name, model_width=W, model_depth=D, D_S=self.ds,
            A_G=self.ag, LSTM=self.lstm, is_transconv=self.is_transconv,
            alpha=self.alpha, q=self.q, block_remat=self.block_remat,
            dtype=self.dtype)
        deconv, levels = decoder(skips, train)

        # ---- output head ----
        n = deconv.ndim - 2
        if self.decoder_name.startswith("Self"):
            out = Oper(self.output_nums, 1, activation=self.final_activation,
                       q=self.q, dtype=self.dtype, name="out")(deconv)
        else:
            out = nn.Conv(self.output_nums, (1,) * n, dtype=self.dtype,
                          param_dtype=jnp.float32, name="out")(deconv)
            out = apply_activation(out, self.final_activation)

        outputs = {"out": out}
        if self.ds == 1:
            # reference order: [out, level1, ..., levelD]
            # (levels arrive as [levelD..level1]; unet_variants.py:1111-1114)
            for idx, lvl in enumerate(levels):
                outputs[f"level{D - idx}"] = lvl
        return outputs


def model_selector(
    model_genre: str,
    encoder_name: str,
    decoder_name: str,
    length: int,
    width: int = 1,
    model_width: int = 64,
    model_depth: int = 5,
    num_channels: int = 3,
    output_nums: int = 1,
    ds: int = 0,
    ae: int = 0,
    ag: int = 0,
    lstm: int = 0,
    dense_loop: int = 1,
    feature_number: int = 1024,
    is_transconv: bool = True,
    alpha: float = 1.0,
    q: int = 3,
    final_activation: str = "sigmoid",
    train_mode: str = "from_scratch",
    is_base_model_trainable: bool = False,
    block_remat: bool = False,
    dtype: Dtype = jnp.float32,
) -> SegModel:
    """String-dispatch factory mirroring the reference ``model_selector``
    (2DCNN/models/model_selector.py:8-72).

    ``encoder_name`` is a pretrained-backbone name (e.g. 'ResNet50') or
    'from_scratch'; genre is 'UNet' or 'FPN'.  Spatial sizes (length/width/
    num_channels) are properties of the *input array* in this framework --
    they are accepted for API parity and validated at call time.
    """
    if model_genre not in ("UNet", "FPN"):
        raise ValueError(f"Unknown model genre {model_genre!r}")
    backbone = None
    if train_mode == "pretrained_encoder":
        backbone = encoder_name
    return SegModel(
        decoder_name=decoder_name,
        model_width=model_width,
        model_depth=model_depth,
        output_nums=output_nums,
        ds=ds, ae=ae, ag=ag, lstm=lstm,
        dense_loop=dense_loop,
        feature_number=feature_number,
        is_transconv=is_transconv,
        alpha=alpha, q=q,
        final_activation=final_activation,
        genre=model_genre,
        train_mode=train_mode,
        backbone=backbone,
        backbone_trainable=is_base_model_trainable,
        block_remat=block_remat,
        dtype=dtype,
    )
