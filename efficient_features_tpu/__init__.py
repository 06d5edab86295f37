"""efficient_features_tpu — TPU-native reimplementation of
fixstars/cuda-efficient-features (JAX/XLA/Pallas).

GPU keypoint detection (multi-scale FAST + Harris + radius NMS + IC-angle) and
binary descriptors (BAD 256/512, HashSIFT 256/512) redesigned TPU-first:
fixed-shape masked pipelines under one jit, MXU matmuls for histogram/hash
stages, exact-integer selection semantics shared with a NumPy oracle.
"""
from .pipeline import FeatureConfig, DESCRIPTOR_TYPES
from .api import EfficientFeatures, BAD, HashSIFT, KeyPoints

__all__ = [
    "FeatureConfig", "DESCRIPTOR_TYPES",
    "EfficientFeatures", "BAD", "HashSIFT", "KeyPoints",
]

__version__ = "0.1.0"
