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
                       ds_type: str = "UNet",
                       spatial_rank: tp.Optional[int] = None
                       ) -> tp.Dict[str, jax.Array]:
    """Build {'out', 'level1'..'levelD'} targets from a full-res mask.

    ``mask``: (B, *spatial) or (B, *spatial, C); a channel axis is added
    if missing (helper_functions.py:365-366).

    ``spatial_rank`` (1 or 2) disambiguates rank-3 masks: (B, H, W)
    without channels vs a 1D (B, L, C).  When omitted it is inferred —
    a trailing axis of size 1 must be a channel axis (pooling a size-1
    spatial axis by 2 would yield size 0), larger trailing axes are
    taken as 2D-width per the reference's 2D usage.
    """
    if mask.ndim == 2:
        mask = mask[..., None]                       # (B, L) -> (B, L, 1)
    elif mask.ndim == 3:
        if spatial_rank is None:
            spatial_rank = 1 if mask.shape[-1] == 1 else 2
        if spatial_rank == 2:
            mask = mask[..., None]               # (B, H, W) -> + channel
    elif mask.ndim != 4:
        raise ValueError(f"mask rank {mask.ndim} unsupported "
                         f"(expected (B, *spatial[, C]))")
    targets = {"out": mask}
    for i in range(1, model_depth + 1):
        if ds_type == "UNet":
            targets[f"level{i}"] = downsample_pool(mask, 2 ** i, op="max")
        elif ds_type == "UNetPP":
            targets[f"level{i}"] = mask
        else:
            raise ValueError(f"Unknown ds_type {ds_type!r}")
    return targets
