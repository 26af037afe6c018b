"""vsc2022_tpu — TPU-native video copy detection & localization framework.

A from-scratch JAX/XLA/Pallas rebuild of the facebookresearch/vsc2022
capabilities: descriptor retrieval, score normalization, temporal
localization, descriptor inference, and bit-compatible evaluation.
"""

__version__ = "0.1.0"

from vsc2022_tpu.types import (  # noqa: F401
    PairMatch,
    PairMatches,
    VideoFeature,
    VideoMetadata,
)
