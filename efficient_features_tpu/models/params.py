"""Learned descriptor constants (Suarez et al., RA-L 2021).

Loaded from .npz assets extracted verbatim from the reference headers
(tools/extract_params.py):
  - BAD box pairs {x1, x2, y1, y2, boxRadius} + float thresholds
    (bad.p256.h:27,94 / bad.p512.h:209,340)
  - HashSIFT projection matrices, (nbits, 129) float64 -> float32
    (hash_sift.p256.h:22 / hash_sift.p512.h:22, conversion at
    cuda_hash_sift.cpp:103-105)
"""
from __future__ import annotations

import functools
from pathlib import Path

import numpy as np

_ASSETS = Path(__file__).resolve().parent.parent / "assets"


@functools.lru_cache(maxsize=None)
def load_bad_params(nbits: int) -> tuple[np.ndarray, np.ndarray]:
    """Returns (box_pairs (nbits, 5) int32, thresholds (nbits,) float32)."""
    if nbits not in (256, 512):
        raise ValueError(f"BAD supports 256 or 512 bits, got {nbits}")
    data = np.load(_ASSETS / f"bad_p{nbits}.npz")
    return data["box_pairs"], data["thresholds"]


@functools.lru_cache(maxsize=None)
def load_hash_sift_matrix(nbits: int) -> np.ndarray:
    """Returns the (nbits, 129) float32 projection matrix (col 0 = bias)."""
    if nbits not in (256, 512):
        raise ValueError(f"HashSIFT supports 256 or 512 bits, got {nbits}")
    data = np.load(_ASSETS / f"hash_sift_p{nbits}.npz")
    return data["b_matrix"].astype(np.float32)
