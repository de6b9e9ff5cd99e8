"""Initialize a SegModel with converted ImageNet encoder weights.

Ties together ``SegModel(train_mode='pretrained_encoder')`` and
``backbones.pretrained.load_backbone_weights``: the backbone subtree of the
freshly-initialized variables is replaced by the keras-converted weights
(the reference's ``weights='imagenet'`` path, unet_variants.py:1057).
"""
from __future__ import annotations

import typing as tp

import jax


def init_segmodel_with_imagenet(model, sample: jax.Array,
                                weights: tp.Optional[str] = "imagenet",
                                rng: tp.Optional[jax.Array] = None) -> dict:
    """init(model) with the encoder backbone carrying Keras weights.

    ``weights``: 'imagenet' (needs network/keras cache), a local .h5 path,
    or None (random keras init -- structure verification).
    """
    from ..models.backbones import get_backbone
    from ..models.backbones.pretrained import load_backbone_weights

    if rng is None:
        rng = jax.random.PRNGKey(0)
    variables = model.init(rng, sample, train=False)
    # match the model's truncation: SegModel builds its backbone with
    # max_tap = min(model_depth, 5) (unused deep stages pruned)
    bb = get_backbone(model.backbone, dtype=model.dtype,
                      max_tap=min(model.model_depth, 5))
    bb_vars, _ = load_backbone_weights(model.backbone, bb, sample,
                                       weights=weights)

    def find_backbone_key(tree: dict) -> str:
        for key in tree:
            if "Backbone" in key:
                return key
        raise KeyError("no backbone submodule in variables")

    variables = jax.tree_util.tree_map(lambda x: x, variables)  # unfreeze copy
    out = {}
    for col, tree in variables.items():
        tree = dict(tree)
        if col in bb_vars:
            key = find_backbone_key(tree)
            tree[key] = bb_vars[col]
        out[col] = tree
    return out
