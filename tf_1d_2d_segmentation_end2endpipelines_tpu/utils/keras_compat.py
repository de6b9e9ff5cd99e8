"""Keras <-> Flax weight conversion for parity fixtures and pretrained
encoders.

Both this framework and the reference build their graphs in the same call
sequence (the decoders replicate the reference's layer-call order), so a
weight mapping by *call order* is well-defined:

- the Flax side records leaf-module creation order by intercepting module
  ``__call__``s during ``init`` (``flax_call_order``)
- the Keras side streams ``model.layers`` (functional-API creation order)
  keeping only weighted layers (``keras_weight_stream``)
- ``convert_keras_weights`` zips the two streams, checking that the layer
  kinds agree at every position (a structural self-test), and emits a Flax
  ``variables`` tree

Per-kind conversions:
- Conv/Dense: direct copy (layouts agree)
- ConvTranspose: direct copy -- our ``TransConv`` uses
  ``transpose_kernel=True`` which matches Keras's gradient-of-conv
  semantics and (k.., out, in) kernel layout (verified < 2e-7)
- BatchNorm: gamma/beta -> scale/bias; moving stats -> batch_stats
- ConvLSTM: kernel/bias load into the cell's input_conv; the recurrent
  kernel loads into the cell's ``recurrent_kernel`` param (the reference
  only ever applies ConvLSTM to a length-1 synthetic time axis from a zero
  state, SURVEY.md §7 "hard parts", where it contributes nothing --
  verified < 9e-8 -- but it is kept for param-count/checkpoint parity)
- Oper (Self-ONN): the q per-power Conv kernels concatenate along the
  input-channel axis of our single fused conv; biases sum
- DepthwiseConv: (k, C, 1) -> (k, 1, C) for feature_group_count=C
"""
from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class _Leaf(tp.NamedTuple):
    path: tp.Tuple[str, ...]
    kind: str


def _flax_kind(mod) -> tp.Optional[str]:
    name = mod.name or ""
    if isinstance(mod, nn.ConvTranspose):
        return "operT" if name == "onn_trans_conv" else "convT"
    if isinstance(mod, nn.Conv):
        if name == "onn_conv":
            return "oper"
        if name == "input_conv":
            return "convlstm"
        if getattr(mod, "feature_group_count", 1) > 1 or name == "dw":
            # 'dw': a depthwise conv whose input has 1 channel
            # (feature_group_count=1); Keras still streams it as depthwise
            return "dwconv"
        return "conv"
    if isinstance(mod, nn.Dense):
        return "dense"
    if isinstance(mod, nn.BatchNorm):
        return "bn"
    if type(mod).__name__ == "InputNorm":
        return "norm"
    return None


def flax_call_order(model, sample: jax.Array, **apply_kwargs
                    ) -> tp.List[_Leaf]:
    """Leaf parameterized modules in creation (call) order."""
    order: tp.List[_Leaf] = []
    seen = set()

    def interceptor(next_fn, args, kwargs, context):
        mod = context.module
        kind = _flax_kind(mod)
        if kind is not None and context.method_name == "__call__":
            path = tuple(mod.scope.path)
            if path not in seen:
                seen.add(path)
                order.append(_Leaf(path, kind))
        return next_fn(*args, **kwargs)

    # packed dual-conv execution (ops/blocks.py) changes the leaf CALL
    # sequence (conv params are materialized before the sibling BNs run);
    # force the unpacked call order here — the parameter tree is identical
    # either way, so the converted weights load into packed builds too.
    from ..ops.blocks import pack_override
    with pack_override(False), nn.intercept_methods(interceptor):
        jax.eval_shape(
            lambda: model.init(jax.random.PRNGKey(0), sample, **apply_kwargs))
    return order


class KerasCreationRecorder:
    """Records Keras layer instantiation order.

    ``model.layers`` is in *graph-traversal* order, which diverges from
    creation order for non-chain graphs (UNet++ grids).  Build the Keras
    model inside this context manager and pass ``recorder.order`` to
    ``keras_weight_stream`` to stream weights in true creation order.
    """

    def __init__(self):
        self.order: tp.List[tp.Any] = []

    def __enter__(self):
        import keras
        self._cls = keras.layers.Layer
        self._orig = self._cls.__init__
        rec = self.order
        orig = self._orig

        def patched(layer_self, *a, **k):
            orig(layer_self, *a, **k)
            rec.append(layer_self)

        self._cls.__init__ = patched
        return self

    def __exit__(self, *exc):
        self._cls.__init__ = self._orig
        return False


def keras_weight_stream(kmodel, creation_order: tp.Optional[tp.List] = None
                        ) -> tp.List[tp.Tuple[str, tp.List[np.ndarray]]]:
    """(kind, weights) per weighted layer, in creation order when a
    ``KerasCreationRecorder`` order is supplied (else model.layers order)."""
    layers = kmodel.layers
    if creation_order is not None:
        members = set(id(l) for l in layers)
        layers = [l for l in creation_order if id(l) in members]
    out = []
    for layer in layers:
        weights = layer.get_weights()
        if not weights:
            continue
        cls = type(layer).__name__
        if cls in ("Conv1D", "Conv2D"):
            out.append(("conv", weights))
        elif cls in ("Conv1DTranspose", "Conv2DTranspose"):
            out.append(("convT", weights))
        elif cls in ("DepthwiseConv1D", "DepthwiseConv2D"):
            out.append(("dwconv", weights))
        elif cls == "Dense":
            out.append(("dense", weights))
        elif cls == "BatchNormalization":
            out.append(("bn", weights))
        elif cls in ("ConvLSTM1D", "ConvLSTM2D"):
            out.append(("convlstm", weights))
        elif cls in ("Oper1D", "Oper2D"):
            out.append(("oper", weights))
        elif cls in ("Oper1DTranspose", "Oper2DTranspose"):
            out.append(("operT", weights))
        elif cls == "Normalization":
            out.append(("norm", weights))
        else:
            raise ValueError(
                f"Unhandled weighted Keras layer {cls} ({layer.name})")
    return out


_KIND_OF_KERAS_CLS = {
    "Conv1D": "conv", "Conv2D": "conv",
    "Conv1DTranspose": "convT", "Conv2DTranspose": "convT",
    "DepthwiseConv1D": "dwconv", "DepthwiseConv2D": "dwconv",
    "Dense": "dense", "BatchNormalization": "bn",
    "ConvLSTM1D": "convlstm", "ConvLSTM2D": "convlstm",
    "Oper1D": "oper", "Oper2D": "oper",
    "Oper1DTranspose": "operT", "Oper2DTranspose": "operT",
    "Normalization": "norm",
}


def _snake(cls_name: str) -> str:
    """Keras auto-name stem for a class (keras.src.utils.naming)."""
    try:
        from keras.src.utils.naming import to_snake_case
        return to_snake_case(cls_name)
    except Exception:
        import re
        s = re.sub(r"(.)([A-Z][a-z]+)", r"\1_\2", cls_name)
        return re.sub(r"([a-z])([A-Z])", r"\1_\2", s).lower()


def _auto_rank(layer) -> tp.Optional[int]:
    """Creation rank of an AUTO-named Keras layer within its class, or
    None for a hand-named layer.

    Keras auto-names are ``<snake_class>`` then ``<snake_class>_N`` from a
    per-class counter that only ever increments, so the numeric suffix
    orders same-class layers by creation time — including across the
    reference's fold loop (later folds just start at higher N)."""
    import re
    stem = _snake(type(layer).__name__)
    m = re.fullmatch(re.escape(stem) + r"(?:_(\d+))?", layer.name)
    if m is None:
        return None
    return int(m.group(1)) if m.group(1) else 0


def infer_creation_order(kmodel, forder: tp.Sequence["_Leaf"],
                         backbone_names: tp.Optional[tp.Sequence[str]] = None
                         ) -> tp.List[tp.Any]:
    """Reconstruct a DESERIALIZED Keras model's layer creation order.

    A model loaded from disk (``keras.saving.load_model``) was never built
    under a ``KerasCreationRecorder``; ``model.layers`` is graph-traversal
    order, which diverges from creation order for non-chain graphs (UNet++
    grids).  Three facts recover it (used by ``tpuseg import-keras``;
    reference Train.py:375-379 writes the ``.keras`` artifact, the 1D
    notebook cell 35 an ``.h5``):

    - AUTO-named layers: per class, the name suffix counters order layers
      by creation (``_auto_rank``); the Flax model records its own leaf
      creation order, which equals the reference's global creation order
      (the invariant every parity fixture in tests/test_parity_*.py rests
      on), so per-kind queues interleave along the Flax kind sequence.
    - HAND-named layers: the reference hand-names exactly the layers this
      framework also hand-names — DS heads ``level{k}``
      (e.g. unet_variants.py:136) and the A_E latent ``features`` Dense
      (:45) — so they pair directly with the Flax leaf of the same name.
    - BACKBONE layers (pretrained_encoder): keras.applications names are
      fixed strings; ``backbone_names`` (weighted-layer names of a
      fresh-built backbone in recorded creation order) ranks them, and the
      whole backbone precedes every decoder layer (the reference calls the
      ctor first, unet_variants.py:1057).
    """
    import collections
    bb_rank = ({n: i for i, n in enumerate(backbone_names)}
               if backbone_names else {})
    queues: tp.Dict[str, list] = {}
    anchors: tp.Dict[str, tp.Any] = {}

    def _rank(layer):
        if layer.name in bb_rank:
            return (0, bb_rank[layer.name], 0)
        r = _auto_rank(layer)
        if r is None:  # hand-named inside the backbone but absent from
            # the fresh build (should not happen for keras.applications)
            raise ValueError(
                f"cannot import: cannot order hand-named layer "
                f"{layer.name!r} ({type(layer).__name__})")
        return (1, r, 0)

    for layer in kmodel.layers:
        if not layer.get_weights():
            continue
        cls = type(layer).__name__
        kind = _KIND_OF_KERAS_CLS.get(cls)
        if kind is None:
            raise ValueError(
                f"cannot import: unhandled weighted Keras layer {cls} "
                f"({layer.name}) — Self-ONN checkpoints need the "
                f"reference's custom Oper classes to deserialize")
        auto = _auto_rank(layer) is not None
        if not auto and layer.name not in bb_rank:
            # reference hand-names: level{k} DS heads, 'features' — both
            # named identically on the Flax side, pair directly
            anchors[layer.name] = (kind, layer)
        else:
            queues.setdefault(kind, []).append(layer)
    for kind in queues:
        queues[kind] = collections.deque(sorted(queues[kind], key=_rank))
    order: tp.List[tp.Any] = []
    for pos, leaf in enumerate(forder):
        tail = leaf.path[-1] if leaf.path else ""
        if tail in anchors:
            kind, layer = anchors.pop(tail)
            if kind != leaf.kind:
                raise ValueError(
                    f"cannot import: named layer {tail!r} is {kind} in "
                    f"the checkpoint but {leaf.kind} in the model")
            order.append(layer)
            continue
        q = queues.get(leaf.kind)
        if not q:
            raise ValueError(
                f"cannot import: checkpoint has no remaining "
                f"{leaf.kind!r} layer for position {pos} "
                f"({'/'.join(leaf.path)}) — the config does not describe "
                f"this checkpoint's architecture")
        order.append(q.popleft())
    leftover = {k: len(q) for k, q in queues.items() if q}
    if leftover or anchors:
        raise ValueError(
            f"cannot import: checkpoint has unconsumed weighted layers "
            f"(per kind {leftover}, named {sorted(anchors)}) — the config "
            f"does not describe this checkpoint's architecture")
    return order


def convert_loaded_keras(kmodel, model, sample: jax.Array,
                         backbone_names: tp.Optional[tp.Sequence[str]] = None,
                         **apply_kwargs) -> dict:
    """``convert_keras_weights`` for a model DESERIALIZED from disk
    (``tpuseg import-keras``): reconstructs the creation order from
    auto-name counters / name anchors (``infer_creation_order``) instead
    of a live ``KerasCreationRecorder``."""
    forder = flax_call_order(model, sample, **apply_kwargs)
    order = infer_creation_order(kmodel, forder,
                                 backbone_names=backbone_names)
    return convert_keras_weights(kmodel, model, sample,
                                 creation_order=order, **apply_kwargs)


def _set(tree: dict, path: tp.Tuple[str, ...], leaf_name: str,
         value: np.ndarray) -> None:
    node = tree
    for key in path:
        node = node.setdefault(key, {})
    node[leaf_name] = jnp.asarray(value)


def convert_keras_weights(kmodel, model, sample: jax.Array,
                          creation_order: tp.Optional[tp.List] = None,
                          allow_prefix: bool = False,
                          **apply_kwargs) -> dict:
    """Build a Flax ``variables`` dict carrying the Keras model's weights.

    ``allow_prefix``: accept a Flax model whose leaves are a strict PREFIX
    of the Keras stream (still kind-checked per position).  Used for
    truncated backbones (``max_tap < 5``): both sides build sequentially in
    the same shared creation order, so truncation only removes a suffix.
    """
    forder = flax_call_order(model, sample, **apply_kwargs)
    kstream = keras_weight_stream(kmodel, creation_order)
    if allow_prefix and len(forder) < len(kstream):
        kstream = kstream[:len(forder)]
    if len(forder) != len(kstream):
        raise ValueError(
            f"layer-count mismatch: flax {len(forder)} vs keras "
            f"{len(kstream)}\nflax: {[f.kind for f in forder]}\n"
            f"keras: {[k for k, _ in kstream]}")
    params: dict = {}
    batch_stats: dict = {}
    for leaf, (kind, weights) in zip(forder, kstream):
        if leaf.kind != kind:
            raise ValueError(
                f"kind mismatch at {leaf.path}: flax={leaf.kind} "
                f"keras={kind}")
        if kind in ("conv", "convT", "dense", "convlstm"):
            kernel = weights[0]
            _set(params, leaf.path, "kernel", kernel)
            if kind == "convlstm":
                # weights = [kernel, recurrent_kernel, bias]; the flax leaf
                # is the cell's input_conv, the recurrent kernel lives one
                # level up on the ConvLSTMCell itself
                _set(params, leaf.path, "bias", weights[2])
                _set(params, leaf.path[:-1], "recurrent_kernel", weights[1])
            elif len(weights) > 1:
                _set(params, leaf.path, "bias", weights[1])
        elif kind == "dwconv":
            k = weights[0]  # (k.., C, 1) -> (k.., 1, C)
            k = np.swapaxes(k, -1, -2)
            _set(params, leaf.path, "kernel", k)
            if len(weights) > 1:
                _set(params, leaf.path, "bias", weights[1])
        elif kind in ("oper", "operT"):
            kernels = weights[0::2]
            biases = weights[1::2]
            axis = -2 if kind == "oper" else -1  # cin axis of fused kernel
            fused_k = np.concatenate(kernels, axis=axis)
            fused_b = np.sum(np.stack(biases, 0), axis=0)
            _set(params, leaf.path, "kernel", fused_k)
            _set(params, leaf.path, "bias", fused_b)
        elif kind == "norm":
            # keras Normalization: [mean, variance(, count)]
            _set(params, leaf.path, "mean", np.asarray(weights[0]).reshape(-1))
            _set(params, leaf.path, "var", np.asarray(weights[1]).reshape(-1))
        elif kind == "bn":
            if len(weights) == 4:
                gamma, beta, mean, var = weights
                _set(params, leaf.path, "scale", gamma)
            else:  # BatchNormalization(scale=False): Inception family
                beta, mean, var = weights
            _set(params, leaf.path, "bias", beta)
            _set(batch_stats, leaf.path, "mean", mean)
            _set(batch_stats, leaf.path, "var", var)
    variables = {"params": params}
    if batch_stats:
        variables["batch_stats"] = batch_stats
    return variables
