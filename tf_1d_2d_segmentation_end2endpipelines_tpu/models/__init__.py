"""Model zoo."""

from .api_1d import (  # noqa: F401
    ARCH_NAMES_1D,
    ConvMixerUNet,
    SegModel1D,
    UNet1D,
    model_selector_1d,
)
from .decoders import DECODER_NAMES, build_decoder  # noqa: F401
from .dense_inception import Dense_Inception_UNet  # noqa: F401
from .extra_1d import FPN, AlbUNet, LinkNet, TernausNet  # noqa: F401
from .mlmrsnet import MLMRSNet  # noqa: F401
from .saunet import SAUNet  # noqa: F401
from .segmodel import SegModel, model_selector  # noqa: F401
from .specials_1d import BCDUNet, IBAUNet, NABNet, SEDUNet  # noqa: F401
