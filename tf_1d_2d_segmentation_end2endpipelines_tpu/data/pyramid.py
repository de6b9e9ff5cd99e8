"""Deep-supervision target pyramids.

Reference: ``prepareTrainDict`` (2DCNN/utils/helper_functions.py:359-380):
- ds_type 'UNet'  : level{i} target = mask max-pooled by 2**i
- ds_type 'UNetPP': level{i} target = full-resolution mask

Implemented as a jittable device-side transform (``lax.reduce_window``),
so the pyramid is built on-TPU after the host->HBM transfer instead of in
the Python loader like the reference.

Note the semantic match-up with decoder head resolutions (SURVEY.md §2.4):
'UNet' pyramids match chain decoders whose level{i} heads live at stride
2**i; 'UNetPP' pyramids match nested-grid decoders whose heads are all at
full resolution.  UNet3+'s stride-2 heads pair with the 'UNet' pyramid.
"""
from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp

from ..ops import downsample_pool


def prepare_train_dict(mask: jax.Array, model_depth: int,
                       ds_type: str = "UNet") -> tp.Dict[str, jax.Array]:
    """Build {'out', 'level1'..'levelD'} targets from a full-res mask.

    ``mask``: (B, *spatial) or (B, *spatial, C); a channel axis is added if
    missing (helper_functions.py:365-366).
    """
    if mask.ndim == 3 and ds_type is not None:
        # (B, H, W) -> (B, H, W, 1); for 1D (B, L) handled below
        mask = mask[..., None]
    elif mask.ndim == 2:
        mask = mask[..., None]
    targets = {"out": mask}
    for i in range(1, model_depth + 1):
        if ds_type == "UNet":
            targets[f"level{i}"] = downsample_pool(mask, 2 ** i, op="max")
        elif ds_type == "UNetPP":
            targets[f"level{i}"] = mask
        else:
            raise ValueError(f"Unknown ds_type {ds_type!r}")
    return targets
