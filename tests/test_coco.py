"""COCO rasterization + CLAHE preprocessing."""
import json

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from tf_1d_2d_segmentation_end2endpipelines_tpu.data import (
    clean_mask_contours, process_raw_data, rasterize_coco_masks)


def test_rasterize_and_clean(tmp_path):
    coco = {
        "images": [{"id": 1, "file_name": "a.png", "height": 32,
                    "width": 32}],
        "categories": [{"id": 7, "name": "kidney"},
                       {"id": 9, "name": "fluid"}],
        "annotations": [
            {"image_id": 1, "category_id": 7,
             "segmentation": [[4, 4, 20, 4, 20, 20, 4, 20]]},
            {"image_id": 1, "category_id": 9,
             "segmentation": [[25, 25, 27, 25, 27, 27, 25, 27]]},
        ],
    }
    p = tmp_path / "data.json"
    p.write_text(json.dumps(coco))
    masks = rasterize_coco_masks(str(p), str(tmp_path / "masks"))
    m = masks["a.png"]
    assert m[10, 10] == 1 and m[26, 26] == 2 and m[0, 0] == 0
    assert (tmp_path / "masks" / "a.png").exists()
    cleaned = clean_mask_contours(m, min_area=16)
    assert cleaned[10, 10] == 1      # big region kept
    assert (cleaned == 2).sum() == 0  # tiny region dropped


def test_clahe():
    img = (np.random.default_rng(0).uniform(0, 255, (32, 32, 3))
           ).astype(np.uint8)
    out = process_raw_data(img)
    assert out.shape == img.shape and out.dtype == np.uint8
    gray = process_raw_data(img[..., 0])
    assert gray.shape == (32, 32)
