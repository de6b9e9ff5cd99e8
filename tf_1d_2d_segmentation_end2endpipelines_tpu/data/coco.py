"""COCO-polygon mask tooling + raw-data preprocessing.

Reference: 2D notebook cells 61-62 (parse a COCO ``data.json``, rasterize
class polygons into masks, contour-based cleanup) and
``process_raw_data`` (utils/helper_functions.py:416-434, CLAHE contrast
enhancement via albumentations -- cv2's CLAHE here, same operator).
"""
from __future__ import annotations

import json
import os
import typing as tp

import numpy as np


def rasterize_coco_masks(
    annotation_path: str,
    out_dir: str,
    category_values: tp.Optional[tp.Dict[int, int]] = None,
) -> tp.Dict[str, np.ndarray]:
    """Rasterize COCO polygon annotations into per-image label masks.

    ``category_values`` maps COCO category_id -> mask pixel value (defaults
    to the category index + 1; 0 = background).  Masks are written as PNGs
    named after their images and also returned in-memory.
    """
    import cv2

    with open(annotation_path) as f:
        coco = json.load(f)
    images = {im["id"]: im for im in coco.get("images", [])}
    if category_values is None:
        cats = sorted(c["id"] for c in coco.get("categories", []))
        category_values = {cid: i + 1 for i, cid in enumerate(cats)}
    masks: tp.Dict[str, np.ndarray] = {}
    for im in images.values():
        masks[im["file_name"]] = np.zeros(
            (im["height"], im["width"]), np.uint8)
    for ann in coco.get("annotations", []):
        im = images.get(ann["image_id"])
        if im is None:
            continue
        value = category_values.get(ann["category_id"], 0)
        mask = masks[im["file_name"]]
        seg = ann.get("segmentation", [])
        for poly in seg if isinstance(seg, list) else []:
            pts = np.asarray(poly, np.float64).reshape(-1, 2)
            cv2.fillPoly(mask, [pts.round().astype(np.int32)], int(value))
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
        for fname, mask in masks.items():
            base = os.path.splitext(os.path.basename(fname))[0]
            cv2.imwrite(os.path.join(out_dir, base + ".png"), mask)
    return masks


def clean_mask_contours(mask: np.ndarray, min_area: float = 16.0
                        ) -> np.ndarray:
    """Drop connected components below ``min_area`` (the notebook's
    contour-based mask cleanup, 2D notebook cell 62)."""
    import cv2

    out = np.zeros_like(mask)
    for value in np.unique(mask):
        if value == 0:
            continue
        binary = (mask == value).astype(np.uint8)
        contours, _ = cv2.findContours(binary, cv2.RETR_EXTERNAL,
                                       cv2.CHAIN_APPROX_SIMPLE)
        keep = [c for c in contours if cv2.contourArea(c) >= min_area]
        if keep:
            cv2.fillPoly(out, keep, int(value))
    return out


def process_raw_data(image: np.ndarray, clip_limit: float = 2.0,
                     tile_grid: int = 8) -> np.ndarray:
    """CLAHE contrast enhancement (reference ``process_raw_data``,
    helper_functions.py:416-434).  uint8 in, uint8 out."""
    import cv2

    clahe = cv2.createCLAHE(clipLimit=clip_limit,
                            tileGridSize=(tile_grid, tile_grid))
    img = np.asarray(image)
    if img.ndim == 2:
        return clahe.apply(img)
    lab = cv2.cvtColor(img, cv2.COLOR_RGB2LAB)
    lab[..., 0] = clahe.apply(lab[..., 0])
    return cv2.cvtColor(lab, cv2.COLOR_LAB2RGB)
