"""Model zoo."""

from .api_1d import ARCH_NAMES_1D, SegModel1D, UNet1D  # noqa: F401
from .decoders import DECODER_NAMES, build_decoder  # noqa: F401
from .segmodel import SegModel, model_selector  # noqa: F401
