"""Model zoo."""

from .decoders import DECODER_NAMES, build_decoder  # noqa: F401
from .segmodel import SegModel, model_selector  # noqa: F401
