"""1D model API — the JAX equivalent of the reference's
``TensorFlow/1DCNN/Models/unet_variants.py`` builder class (16 methods,
constructor :223-253).

1D-tree conventions that differ from the 2D tree (SURVEY.md §2.2):
- double Conv_Block per encoder level and per decoder node (except MultiRes
  / UNet3P nodes)
- ``trans_conv1D``: 2-wide kernel + BN + ReLU (Models/unet_variants.py:103)
- nearest-neighbor UpSampling1D
- autoencoder Feature_Extraction_Block applied to the POOLED bottleneck
  input (before the latent convs, :269-271)
- head: softmax for 'Classification', linear for 'Regression' (:306-310)
"""
from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import (
    AttentionGate,
    ConvBlock,
    ConvMixerBlock,
    FeatureExtractionBlock,
    MultiResBlock,
    Oper,
    RecurrentConvBlock,
    ResPath,
    SelfRecurrentConvBlock,
    TransConv,
    concat,
    downsample_pool,
    upsample,
)
from .decoders import (
    ChainDecoder,
    FullScaleDecoder,
    GridDecoder,
    SelfFullScaleDecoder,
    SelfGridDecoder,
)

Dtype = tp.Any

#: arch -> (topology ctor, decoder kwargs, encoder family, latent family)
_ARCHS: tp.Dict[str, tp.Dict[str, tp.Any]] = {
    "UNet":           dict(topo="chain", node="conv", reps=2),
    "UNetE":          dict(topo="grid", variant="E", node="conv", reps=2),
    "UNetP":          dict(topo="grid", variant="P", node="conv", reps=2),
    "UNetPP":         dict(topo="grid", variant="PP", node="conv", reps=2),
    "UNet3P":         dict(topo="full", node="conv", reps=1),
    "UNet4P":         dict(topo="grid", variant="4P", node="conv", reps=2,
                           enc="dense4p"),
    "MultiResUNet":   dict(topo="chain", node="multires", reps=1,
                           enc="multires", latent="multires"),
    # the 1D MultiResUNet3P is a DIFFERENT architecture from the 2D one
    # (unet_variants.py:899-980): dense sigmoid-gated encoder + chain
    # decoder with full-scale sigmoid concats — custom builder below
    "MultiResUNet3P": dict(topo="mr3p1d"),
    "RUNet":          dict(topo="chain", node="recurrent", reps=2,
                           enc="recurrent", latent="recurrent"),
    "R2UNet":         dict(topo="chain", node="r2", reps=2, enc="r2x2",
                           latent="r2x2"),
    "R2UNetPP":       dict(topo="grid", variant="PP", node="r2", reps=1,
                           enc="r2x1", latent="r2x1"),
    "R2UNet3P":       dict(topo="full", node="r2", reps=2, enc="r2x2",
                           latent="r2x2"),
    "SelfR2UNetPP":   dict(topo="selfgrid", bare=True, enc="selfrec",
                           latent="selfrec_q1"),
    "SelfUNetPP":     dict(topo="selfgrid", node_reps=2, enc="oper2",
                           latent="oper2"),
    "SelfUNet3P":     dict(topo="selffull", enc="oper2", latent="oper2"),
    # ConvMixer_UNet topologies (1DCNN/Models/convmixer_unet.py:164-710):
    # the same wirings with ConvMixer blocks as the conv unit
    "ConvMixerUNet":      dict(topo="chain", node="convmixer", reps=2,
                               enc="convmixer", latent="convmixer"),
    "ConvMixerUNetE":     dict(topo="grid", variant="E", node="convmixer",
                               reps=2, enc="convmixer", latent="convmixer"),
    "ConvMixerUNetP":     dict(topo="grid", variant="P", node="convmixer",
                               reps=2, enc="convmixer", latent="convmixer"),
    "ConvMixerUNetPP":    dict(topo="grid", variant="PP", node="convmixer",
                               reps=2, enc="convmixer", latent="convmixer"),
    "ConvMixerUNet3P":    dict(topo="full", node="convmixer", reps=1,
                               enc="convmixer", latent="convmixer"),
    "ConvMixerMultiResUNet": dict(topo="chain", node="multires_mixer",
                                  reps=1, enc="multires_mixer",
                                  latent="multires_mixer"),
}

ARCH_NAMES_1D = tuple(_ARCHS)


class SegModel1D(nn.Module):
    """Config-driven 1D segmentation network (input: (B, L, C))."""

    arch: str
    model_width: int
    model_depth: int
    kernel_size: int = 3
    problem_type: str = "Regression"
    output_nums: int = 1
    ds: int = 0
    ae: int = 0
    ag: int = 0
    lstm: int = 0
    alpha: float = 1.0
    t: int = 2
    q: int = 3
    feature_number: int = 1024
    is_transconv: bool = True
    dtype: Dtype = jnp.float32

    def _enc_level(self, x: jax.Array, feats: int, family: str,
                   respath_len: int, train: bool) -> tp.Tuple[jax.Array, jax.Array]:
        """One encoder level -> (tap, conv_for_pool)."""
        k = self.kernel_size
        if family in ("multires", "multires_mixer"):
            conv = MultiResBlock(self.model_width, k, alpha=self.alpha,
                                 multiplier=feats // self.model_width,
                                 mixer=family == "multires_mixer",
                                 dtype=self.dtype)(x, train)
            tap = ResPath(respath_len, feats, k, dtype=self.dtype)(conv, train)
            return tap, conv
        if family == "convmixer":
            conv = ConvMixerBlock(feats, k, dtype=self.dtype)(x, train)
            conv = ConvMixerBlock(feats, k, dtype=self.dtype)(conv, train)
            return conv, conv
        if family == "recurrent":
            conv = RecurrentConvBlock(feats, k, t=self.t, dtype=self.dtype)(x, train)
            conv = RecurrentConvBlock(feats, k, t=self.t, dtype=self.dtype)(conv, train)
            return conv, conv
        if family in ("r2x1", "r2x2"):
            raw = ConvBlock(feats, 1, dtype=self.dtype)(x, train)
            conv = RecurrentConvBlock(feats, k, t=self.t, dtype=self.dtype)(x, train)
            if family == "r2x2":
                conv = RecurrentConvBlock(feats, k, t=self.t,
                                          dtype=self.dtype)(conv, train)
            conv = raw + conv
            return conv, conv
        if family == "selfrec":
            conv = SelfRecurrentConvBlock(feats, k, t=self.t, q=self.q,
                                          dtype=self.dtype)(x, train)
            return conv, conv
        if family == "oper2":
            conv = Oper(feats, k, q=self.q, dtype=self.dtype)(x)
            conv = Oper(feats, k, q=self.q, dtype=self.dtype)(conv)
            return conv, conv
        conv = ConvBlock(feats, k, dtype=self.dtype)(x, train)
        conv = ConvBlock(feats, k, dtype=self.dtype)(conv, train)
        return conv, conv

    def _latent(self, x: jax.Array, family: str, train: bool) -> jax.Array:
        k = self.kernel_size
        feats = self.model_width * (2 ** self.model_depth)
        if family in ("multires", "multires_mixer"):
            return MultiResBlock(self.model_width, k, alpha=self.alpha,
                                 multiplier=feats // self.model_width,
                                 mixer=family == "multires_mixer",
                                 dtype=self.dtype)(x, train)
        if family == "convmixer":
            x = ConvMixerBlock(feats, k, dtype=self.dtype)(x, train)
            return ConvMixerBlock(feats, k, dtype=self.dtype)(x, train)
        if family == "recurrent":
            x = RecurrentConvBlock(feats, k, t=self.t, dtype=self.dtype)(x, train)
            return RecurrentConvBlock(feats, k, t=self.t, dtype=self.dtype)(x, train)
        if family in ("r2x1", "r2x2"):
            raw = ConvBlock(feats, 1, dtype=self.dtype)(x, train)
            out = RecurrentConvBlock(feats, k, t=self.t, dtype=self.dtype)(x, train)
            if family == "r2x2":
                out = RecurrentConvBlock(feats, k, t=self.t,
                                         dtype=self.dtype)(out, train)
            return raw + out
        if family == "selfrec_q1":
            # SelfR2UNetPP passes q=1 to its latent block (a reference quirk)
            return SelfRecurrentConvBlock(feats, k, t=self.t, q=1,
                                          dtype=self.dtype)(x, train)
        if family == "oper2":
            x = Oper(feats, k, q=self.q, dtype=self.dtype)(x)
            return Oper(feats, k, q=self.q, dtype=self.dtype)(x)
        x = ConvBlock(feats, k, dtype=self.dtype)(x, train)
        return ConvBlock(feats, k, dtype=self.dtype)(x, train)

    def _mr3p_1d(self, x: jax.Array, train: bool
                 ) -> tp.Dict[str, jax.Array]:
        """1D ``MultiResUNet3P`` (1DCNN/Models/unet_variants.py:899-980)
        — NOT the 2D architecture of the same name.  Faithful quirks:

        - the encoder's dense k-loop REASSIGNS ``pool`` each step, so
          only the LAST earlier tap survives: level i>1 reads
          concat(sigmoid(mp2(tap_{i-1})), mp2(tap_{i-1}))  (:913-918)
        - ResPath taps use filter multiplier ``2**i`` (not 2**(i-1))
          and length D-i+1 (0 -> one unit)  (:920)
        - the decoder concats sigmoid-gated UpSampling1D copies of the
          bottleneck tap and every earlier decoder node  (:948-955)
        - DS heads are STRIDE-2 1x1 convs  (:962)
        - a second bottleneck MultiResBlock is created but disconnected
          from the functional graph  (:926) — omitted (dead weights are
          not part of the reference model either)
        - the LSTM branch references an undefined ``model_depth`` global
          (:942) and crashes in the reference; unsupported here."""
        if self.lstm == 1:
            raise NotImplementedError(
                "the reference's 1D MultiResUNet3P LSTM branch crashes "
                "(undefined 'model_depth', unet_variants.py:942)")
        D, W, k = self.model_depth, self.model_width, self.kernel_size
        taps: tp.List[jax.Array] = []
        pool = x
        for i in range(1, D + 2):
            if i > 1:
                g = downsample_pool(taps[-1], 2, op="max")
                pool = concat(nn.sigmoid(g), g)
            m = MultiResBlock(W, k, alpha=self.alpha,
                              multiplier=2 ** (i - 1),
                              dtype=self.dtype)(pool, train)
            taps.append(ResPath(D - i + 1, W * (2 ** i), k,
                                dtype=self.dtype)(m, train))

        deconv = taps[D]
        nodes: tp.List[jax.Array] = []
        levels: tp.List[jax.Array] = []
        for j in range(D):
            skip = taps[D - j - 1]
            if self.ag == 1:
                skip = AttentionGate(W * (2 ** (D - j - 1)),
                                     dtype=self.dtype)(skip, deconv, train)
            if self.is_transconv:
                deconv = TransConv(W * (2 ** (D - j - 1)), kernel=2,
                                   use_bn=True, activation="relu",
                                   dtype=self.dtype)(deconv, train)
            else:
                deconv = upsample(deconv, 2, method="nearest")
            deconv = concat(deconv, skip)
            for mi in range(j + 1):
                temp = taps[D] if mi == 0 else nodes[mi - 1]
                temp = upsample(temp, 2 ** (j - mi + 1), method="nearest")
                deconv = concat(deconv, nn.sigmoid(temp))
            deconv = MultiResBlock(W, k, alpha=self.alpha,
                                   multiplier=2 ** (D - j - 1),
                                   dtype=self.dtype)(deconv, train)
            nodes.append(deconv)
            if self.ds == 1:
                levels.append(nn.Conv(
                    1, (1,), strides=(2,), dtype=self.dtype,
                    param_dtype=jnp.float32,
                    name=f"level{D - j}")(deconv))

        act = self.problem_type == "Classification"
        out = nn.Conv(self.output_nums, (1,), dtype=self.dtype,
                      param_dtype=jnp.float32, name="out")(deconv)
        if act:
            out = nn.softmax(out, axis=-1)
        outputs = {"out": out}
        if self.ds == 1:
            for idx, lvl in enumerate(levels):
                outputs[f"level{D - idx}"] = lvl
        return outputs

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False
                 ) -> tp.Dict[str, jax.Array]:
        cfg = _ARCHS[self.arch]
        D = self.model_depth
        W = self.model_width
        if cfg["topo"] == "mr3p1d":
            return self._mr3p_1d(x.astype(self.dtype), train)
        family = cfg.get("enc", "conv")
        latent_family = cfg.get("latent", "conv")
        x = x.astype(self.dtype)

        # ---- encoder ----
        taps: tp.List[jax.Array] = []
        pool = x
        for i in range(1, D + 1):
            if family == "dense4p" and i > 1:
                # 1D UNet4P dense encoder inputs: pooled earlier taps
                # (skipping the first level -- a reference indexing quirk),
                # concatenated ungated
                for kk in range(1, i - 1):
                    g = downsample_pool(taps[kk], 2 ** (i - 1 - kk), op="max")
                    pool = concat(pool, g)
            lvl_family = "conv" if family == "dense4p" else family
            tap, conv = self._enc_level(pool, W * (2 ** (i - 1)), lvl_family,
                                        D - i + 1, train)
            taps.append(tap)
            pool = downsample_pool(conv, 2, op="max")

        # ---- autoencoder bottleneck (on the pooled tensor: 1D convention)
        if self.ae == 1:
            pool = FeatureExtractionBlock(W, self.feature_number,
                                          dtype=self.dtype)(pool)
        latent = self._latent(pool, latent_family, train)

        # ---- decoder ----
        skips = taps + [latent]
        common = dict(model_width=W, model_depth=D, D_S=self.ds, A_G=self.ag,
                      LSTM=self.lstm, is_transconv=self.is_transconv,
                      alpha=self.alpha, q=self.q, t=self.t,
                      kernel=self.kernel_size, node=cfg.get("node", "conv"),
                      conv_repeats=cfg.get("reps", 1), dialect="1d",
                      dtype=self.dtype)
        topo = cfg["topo"]
        if topo == "chain":
            decoder = ChainDecoder(style="unet", **common)
        elif topo == "grid":
            decoder = GridDecoder(variant=cfg["variant"], **common)
        elif topo == "full":
            decoder = FullScaleDecoder(multires=cfg.get("multires", False),
                                       **common)
        elif topo == "selfgrid":
            decoder = SelfGridDecoder(bare=cfg.get("bare", False),
                                      node_reps=cfg.get("node_reps", 1),
                                      **common)
        elif topo == "selffull":
            decoder = SelfFullScaleDecoder(**common)
        else:
            raise ValueError(topo)
        deconv, levels = decoder(skips, train)

        # ---- output head ----
        act = "softmax" if self.problem_type == "Classification" else None
        out = nn.Conv(self.output_nums, (1,), dtype=self.dtype,
                      param_dtype=jnp.float32, name="out")(deconv)
        if act is not None:
            out = nn.softmax(out, axis=-1)
        outputs = {"out": out}
        if self.ds == 1:
            for idx, lvl in enumerate(levels):
                outputs[f"level{D - idx}"] = lvl
        return outputs


class UNet1D:
    """Facade with the reference's exact constructor + 16 method names
    (1DCNN/Models/unet_variants.py:222-253).  Each method returns a
    configured ``SegModel1D`` Flax module."""

    def __init__(self, length, model_depth, num_channel, model_width,
                 kernel_size, problem_type="Regression", output_nums=1,
                 ds=1, ae=0, ag=0, lstm=0, alpha=1, t=2, feature_number=1024,
                 is_transconv=True, q=3, dtype=jnp.float32):
        if (length == 0 or model_depth == 0 or model_width == 0
                or num_channel == 0 or kernel_size == 0):
            raise ValueError("Please Check the Values of the Input Parameters!")
        self.length = length
        self.num_channel = num_channel
        self._kw = dict(model_width=model_width, model_depth=model_depth,
                        kernel_size=kernel_size, problem_type=problem_type,
                        output_nums=output_nums, ds=ds, ae=ae, ag=ag,
                        lstm=lstm, alpha=alpha, t=t,
                        feature_number=feature_number,
                        is_transconv=is_transconv, q=q, dtype=dtype)

    def _build(self, arch: str) -> SegModel1D:
        return SegModel1D(arch=arch, **self._kw)


class ConvMixerUNet:
    """Facade for the reference ``ConvMixer_UNet`` class
    (convmixer_unet.py:141-162): methods UNet/UNetE/UNetP/UNetPP/UNet3P/
    MultiResUNet with ConvMixer conv units."""

    _MAP = {"UNet": "ConvMixerUNet", "UNetE": "ConvMixerUNetE",
            "UNetP": "ConvMixerUNetP", "UNetPP": "ConvMixerUNetPP",
            "UNet3P": "ConvMixerUNet3P",
            "MultiResUNet": "ConvMixerMultiResUNet"}

    def __init__(self, length, model_depth, num_channel, model_width,
                 kernel_size, problem_type="Regression", output_nums=1,
                 ds=1, ae=0, ag=0, lstm=0, alpha=1, feature_number=1024,
                 is_transconv=True, dtype=jnp.float32):
        self._kw = dict(model_width=model_width, model_depth=model_depth,
                        kernel_size=kernel_size, problem_type=problem_type,
                        output_nums=output_nums, ds=ds, ae=ae, ag=ag,
                        lstm=lstm, alpha=alpha,
                        feature_number=feature_number,
                        is_transconv=is_transconv, dtype=dtype)

    def __getattr__(self, name):
        if name in self._MAP:
            arch = self._MAP[name]
            return lambda: SegModel1D(arch=arch, **self._kw)
        raise AttributeError(name)


def _add_methods():
    for name in ARCH_NAMES_1D:
        setattr(UNet1D, name, (lambda self, _n=name: self._build(_n)))


_add_methods()


def model_selector_1d(arch: str, length: int, model_depth: int,
                      num_channel: int, model_width: int, kernel_size: int,
                      problem_type: str = "Regression", output_nums: int = 1,
                      ds: int = 0, ae: int = 0, ag: int = 0, lstm: int = 0,
                      alpha: float = 1.0, t: int = 2, q: int = 3,
                      dense_loop: int = 2, feature_number: int = 1024,
                      is_transconv: bool = True, cardinality: int = 5,
                      pooling_type: str = "avg", se_ratio: int = 16,
                      block_size: int = 7, keep_prob: float = 0.9,
                      dtype=jnp.float32):
    """ONE name-string dispatch over the whole 1D zoo (the reference has
    no 1D factory — each Models/*.py exposes its own builder class,
    SURVEY.md §2.2; this is the L3 equivalent the 2D tree's
    model_selector provides).  Accepts every UNet1D arch name plus the
    special families' method names (BCDUNet, SEDUNet, IBAUNet, NABNet,
    MLMRSNet/MLMRSNet_V2/LDNet, SAUNet/SAMultiResUNet/SelfSAUNet,
    Dense_Inception_UNet, TernausNet{11,13,16,19}, AlbUNet{18..152},
    LinkNet{,E,P,PP}/MultiResLinkNet, FPN)."""
    if arch in _ARCHS:
        return UNet1D(length, model_depth, num_channel, model_width,
                      kernel_size, problem_type=problem_type,
                      output_nums=output_nums, ds=ds, ae=ae, ag=ag,
                      lstm=lstm, alpha=alpha, t=t, q=q,
                      feature_number=feature_number,
                      is_transconv=is_transconv, dtype=dtype)._build(arch)
    from .dense_inception import Dense_Inception_UNet
    from .extra_1d import FPN, AlbUNet, LinkNet, TernausNet
    from .mlmrsnet import MLMRSNet
    from .saunet import SAUNet
    from .specials_1d import BCDUNet, IBAUNet, NABNet, SEDUNet

    common = dict(model_width=model_width, model_depth=model_depth,
                  kernel_size=kernel_size, problem_type=problem_type,
                  output_nums=output_nums, ds=ds, ae=ae, ag=ag, lstm=lstm,
                  feature_number=feature_number, is_transconv=is_transconv,
                  dtype=dtype)
    if arch in ("BCDUNet", "SEDUNet", "IBAUNet", "NABNet"):
        cls = {"BCDUNet": BCDUNet, "SEDUNet": SEDUNet,
               "IBAUNet": IBAUNet, "NABNet": NABNet}[arch]
        return cls(dense_loop=dense_loop, se_ratio=se_ratio, **common)
    if arch in ("MLMRSNet", "MLMRSNet_V2", "LDNet"):
        return getattr(MLMRSNet(
            length, model_depth, num_channel, model_width, kernel_size,
            problem_type=problem_type, output_nums=output_nums, ds=ds,
            ae=ae, cardinality=cardinality, pooling_type=pooling_type,
            feature_number=feature_number, is_transconv=is_transconv,
            dtype=dtype), arch)()
    if arch in ("SAUNet", "SAMultiResUNet", "SelfSAUNet"):
        return getattr(SAUNet(
            length, model_depth, num_channel, model_width, kernel_size,
            output_nums=output_nums, ds=ds, ae=ae, alpha=alpha,
            feature_number=feature_number, block_size=block_size,
            keep_prob=keep_prob, is_transconv=is_transconv, q=q,
            dtype=dtype), arch)()
    if arch == "Dense_Inception_UNet":
        return Dense_Inception_UNet(
            length, model_depth, num_channel, model_width, kernel_size,
            problem_type=problem_type, output_nums=output_nums, ds=ds,
            ae=ae, ag=ag, feature_number=feature_number,
            dtype=dtype).Dense_Inception_UNet()
    if arch in ("TernausNet11", "TernausNet13", "TernausNet16",
                "TernausNet19"):
        return getattr(TernausNet(
            length, num_channel, model_width, ds=ds, ae=ae, ag=ag,
            problem_type=problem_type, output_nums=output_nums,
            feature_number=feature_number, is_transconv=is_transconv,
            dtype=dtype), arch)()
    if arch in ("AlbUNet18", "AlbUNet34", "AlbUNet50", "AlbUNet101",
                "AlbUNet152"):
        return getattr(AlbUNet(
            length, num_channel, model_width, ds=ds, ae=ae, ag=ag,
            problem_type=problem_type, output_nums=output_nums,
            feature_number=feature_number, dtype=dtype), arch)()
    if arch in LinkNet._NAMES:
        return getattr(LinkNet(
            length, model_depth, num_channel, model_width, kernel_size,
            problem_type=problem_type, output_nums=output_nums, ds=ds,
            ae=ae, ag=ag, lstm=lstm, alpha=alpha,
            feature_number=feature_number, is_transconv=is_transconv,
            dtype=dtype), arch)()
    if arch == "FPN":
        return FPN(length, model_depth, num_channel, model_width,
                   kernel_size, problem_type=problem_type,
                   output_nums=output_nums, ds=ds, ae=ae, ag=ag,
                   feature_number=feature_number,
                   is_transconv=is_transconv, dtype=dtype).FPN()
    raise ValueError(
        f"unknown 1D architecture {arch!r}; expected one of "
        f"{sorted(_ARCHS)} or a special-family method name "
        "(BCDUNet/SEDUNet/IBAUNet/NABNet, MLMRSNet/MLMRSNet_V2/LDNet, "
        "SAUNet/SAMultiResUNet/SelfSAUNet, Dense_Inception_UNet, "
        "TernausNet{11,13,16,19}, AlbUNet{18,34,50,101,152}, "
        "LinkNet{,E,P,PP}/MultiResLinkNet, FPN)")
