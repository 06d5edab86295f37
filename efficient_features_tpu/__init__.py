"""efficient_features_tpu — TPU-native reimplementation of
fixstars/cuda-efficient-features (JAX/XLA/Pallas).

GPU keypoint detection (multi-scale FAST + Harris + radius NMS + IC-angle) and
binary descriptors (BAD 256/512, HashSIFT 256/512) redesigned TPU-first:
fixed-shape masked pipelines under one jit, MXU matmuls for histogram/hash
stages, exact-integer selection semantics shared with a NumPy oracle.
"""
import jax as _jax

# The detector's exact-integer Harris response requires int64 (values up to
# ~2^56).  TPU lowers s64 to emulated i32 pairs; this is validated on-device.
_jax.config.update("jax_enable_x64", True)

from .pipeline import FeatureConfig, DESCRIPTOR_TYPES  # noqa: E402
from .api import EfficientFeatures, BAD, HashSIFT, KeyPoints  # noqa: E402

__all__ = [
    "FeatureConfig", "DESCRIPTOR_TYPES",
    "EfficientFeatures", "BAD", "HashSIFT", "KeyPoints",
]

__version__ = "0.1.0"
