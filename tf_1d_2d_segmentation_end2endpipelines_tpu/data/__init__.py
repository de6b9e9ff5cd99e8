"""Input pipelines: synthetic generators, patching, DS pyramids."""

from .patch import create_patches, patch_grid, unpatchify  # noqa: F401
from .pyramid import prepare_train_dict  # noqa: F401
from .synthetic import batches, synthetic_images, synthetic_signals  # noqa: F401
