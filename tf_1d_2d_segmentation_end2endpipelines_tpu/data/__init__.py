"""Input pipelines: synthetic generators, patching, DS pyramids."""

from .patch import create_patches, patch_grid, unpatchify  # noqa: F401
from .pyramid import prepare_train_dict  # noqa: F401
from .synthetic import batches, synthetic_images, synthetic_signals  # noqa: F401
from .device_augment import (  # noqa: F401
    augment_stream_key,
    make_device_augment,
)
from .generators import (  # noqa: F401
    PrefetchLoader,
    SegmentationFolderDataset,
    augment_dataset,
    augment_pair,
    create_folds,
)
from .pt_io import load_pt, load_signal_dataset, save_pt  # noqa: F401
from .coco import (  # noqa: F401
    clean_mask_contours,
    process_raw_data,
    rasterize_coco_masks,
)
