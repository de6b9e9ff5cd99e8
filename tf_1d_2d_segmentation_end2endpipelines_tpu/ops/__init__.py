"""Block library: rank-polymorphic Flax modules + functional helpers."""

from .blocks import (  # noqa: F401
    LEAKY_SLOPE,
    AttentionGate,
    ConvBlock,
    BiConvLSTM,
    ConvLSTMCell,
    ConvLSTMFusion,
    ConvMixerBlock,
    DenseBlock,
    DropBlock,
    FeatureExtractionBlock,
    MixPool,
    MultiResBlock,
    RecurrentConvBlock,
    ResPath,
    SelfRecurrentConvBlock,
    SpatialAttention,
    SqueezeExcite,
    TransConv,
    add,
    apply_activation,
    concat,
    downsample_pool,
    get_activation,
    upsample,
)
from .onn import Oper, OperationalDenseBlock, OperTranspose  # noqa: F401
