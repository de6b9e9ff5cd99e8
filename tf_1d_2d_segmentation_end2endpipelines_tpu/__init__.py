"""tpuseg — a TPU-native 1D/2D semantic-segmentation framework.

A brand-new JAX / Flax / pjit / Pallas framework with the capabilities of the
TensorFlow-Keras model zoo in Sakib1263/TF-1D-2D-Segmentation-End2EndPipelines
(see /root/repo/SURVEY.md for the structural map of the reference):

- ``ops``      rank-polymorphic block library (one implementation serves the
               reference's duplicated 1D and 2D copies)
- ``models``   the model zoo: UNet family (UNet/UNetE/UNetP/UNet++/UNet3+/
               UNet4+/AHNet/KSSNet/MultiResUNet(3+)/Self-ONN), FPN, plus the
               1D specials (BCDUNet, SEDUNet/MCGUNet, IBAUNet, MLMRSNet/LDNet,
               SAUNet, ConvMixer-UNet, Dense-Inception-UNet, TernausNet,
               AlbuNet, LinkNet, R2UNet, ...)
- ``parallel`` jax.sharding Mesh helpers + sharding rules (dp/model axes)
- ``train``    pjit train/eval steps, loss/metric/optimizer registries,
               callbacks, orbax checkpointing
- ``data``     host->HBM input pipelines, patchify, deep-supervision pyramids
- ``eval``     confusion-matrix metrics, reports, NILM 1D metrics
- ``utils``    typed config (INI-compatible with the reference's schema)

Import alias: ``import tpuseg`` works via the shim in ``tpuseg.py``.
"""

__version__ = "0.2.0"

from . import ops  # noqa: F401
