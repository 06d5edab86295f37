"""Hamming brute-force matcher, MXU-native.

The reference matches binary descriptors with cv::BFMatcher(NORM_HAMMING)
(samples/sample_feature_matching.cpp:99-101, sample_image_sequence.cpp:114-144:
knn ratio test + cross check).  TPU-first formulation: descriptors unpack to
+-1 vectors, one bf16 GEMM gives dot = nbits - 2*hamming, so

    hamming(a, b) = (nbits - a_pm1 . b_pm1) / 2

exactly (+-1 exact in bf16; f32 accumulation of +-1 terms is exact up to 2^24
>> 512).  argmin / top-2 run on the distance matrix.  For large sets the GEMM
is tiled by jit/XLA automatically.
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp


def unpack_bits_pm1(desc: jax.Array) -> jax.Array:
    """(N, B) uint8 -> (N, 8B) float +-1, MSB-first (bit 7 of byte 0 first)."""
    n, b = desc.shape
    shifts = jnp.arange(7, -1, -1, dtype=jnp.uint8)
    bits = (desc[:, :, None] >> shifts[None, None, :]) & jnp.uint8(1)
    return (bits.reshape(n, 8 * b).astype(jnp.bfloat16) * 2 - 1)


@jax.jit
def hamming_matrix(desc1: jax.Array, desc2: jax.Array) -> jax.Array:
    """(N, M) int32 Hamming distances between packed binary descriptors."""
    a = unpack_bits_pm1(desc1)
    b = unpack_bits_pm1(desc2)
    nbits = a.shape[1]
    dot = jnp.dot(a, b.T, preferred_element_type=jnp.float32)
    return ((nbits - dot) * 0.5).astype(jnp.int32)


@partial(jax.jit, static_argnums=(2,))
def match(desc1: jax.Array, desc2: jax.Array, cross_check: bool = True):
    """Best match per query: (train_idx, distance, valid).

    cross_check keeps (i, j) only if i is also j's best (BFMatcher crossCheck
    semantics, sample_feature_matching.cpp:99)."""
    d = hamming_matrix(desc1, desc2)
    j = jnp.argmin(d, axis=1)
    dist = jnp.take_along_axis(d, j[:, None], axis=1)[:, 0]
    if cross_check:
        i_back = jnp.argmin(d, axis=0)
        valid = i_back[j] == jnp.arange(d.shape[0])
    else:
        valid = jnp.ones(d.shape[0], bool)
    return j.astype(jnp.int32), dist, valid


@partial(jax.jit, static_argnums=(2,))
def knn2_ratio_match(desc1: jax.Array, desc2: jax.Array,
                     max_ratio: float = 0.8):
    """Lowe ratio test on the best-2 neighbours + cross check
    (sample_image_sequence.cpp:114-144)."""
    d = hamming_matrix(desc1, desc2)
    neg2, idx2 = jax.lax.top_k(-d, 2)
    best = -neg2[:, 0]
    second = -neg2[:, 1]
    j = idx2[:, 0]
    ratio_ok = best.astype(jnp.float32) <= max_ratio * second.astype(jnp.float32)
    i_back = jnp.argmin(d, axis=0)
    cross_ok = i_back[j] == jnp.arange(d.shape[0])
    return j.astype(jnp.int32), best, ratio_ok & cross_ok


@partial(jax.jit, static_argnums=(4,))
def knn2_ratio_match_masked(desc1: jax.Array, valid1: jax.Array,
                            desc2: jax.Array, valid2: jax.Array,
                            max_ratio: float = 0.8):
    """knn2_ratio_match over fixed-capacity descriptor SLOT arrays with
    validity masks — lets streaming pipelines chain detect+describe+match
    fully on-device with zero host synchronization (the analogue of the
    reference's CUDA-stream loop in sample_image_sequence.cpp:96-144)."""
    d = hamming_matrix(desc1, desc2)
    big = jnp.int32(1 << 30)
    d = jnp.where(valid1[:, None] & valid2[None, :], d, big)
    neg2, idx2 = jax.lax.top_k(-d, 2)
    best = -neg2[:, 0]
    second = -neg2[:, 1]
    j = idx2[:, 0]
    ratio_ok = best.astype(jnp.float32) <= max_ratio * second.astype(jnp.float32)
    i_back = jnp.argmin(d, axis=0)
    cross_ok = i_back[j] == jnp.arange(d.shape[0])
    ok = ratio_ok & cross_ok & valid1 & (best < big)
    return j.astype(jnp.int32), best, ok
