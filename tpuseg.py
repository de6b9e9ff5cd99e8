"""Short import alias: ``import tpuseg`` -> the framework package."""
import sys

import tf_1d_2d_segmentation_end2endpipelines_tpu as _pkg

sys.modules[__name__] = _pkg
