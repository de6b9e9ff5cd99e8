"""Pallas TPU kernels for ops where XLA fusion falls short."""

from .pyramid import fused_maxpool_pyramid  # noqa: F401
