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

import functools
import os
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


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


def _use_fused(fused: bool | None) -> bool:
    """Routing rule for the public matcher entry points.

    None (auto): the streaming fused kernel on the TPU backend (bit-identical
    outputs, on-chip A/B: 16.0 vs 231.2 ms at 16k x 16k x 512 — the dense
    (N, N) matrix's HBM lifetime is the whole cost), the dense XLA path
    elsewhere (the fused kernel would run interpreted).  EFF_TPU_FUSED_MATCH
    =0/1 forces either path; the `fused=` kwarg wins over both."""
    if fused is not None:
        return fused
    env = os.environ.get("EFF_TPU_FUSED_MATCH")
    if env is not None:
        if env not in ("0", "1"):
            raise ValueError(
                f"EFF_TPU_FUSED_MATCH must be '0' or '1', got {env!r} "
                "(the EFF_TPU_* flag convention)")
        return env == "1"
    return jax.default_backend() == "tpu"


def match(desc1: jax.Array, desc2: jax.Array, cross_check: bool = True,
          *, fused: bool | None = None):
    """Best match per query: (train_idx, distance, valid).

    cross_check keeps (i, j) only if i is also j's best (BFMatcher crossCheck
    semantics, sample_feature_matching.cpp:99).  `fused` routes between the
    streaming Pallas kernel and the dense XLA path (see _use_fused)."""
    if _use_fused(fused):
        return match_fused(desc1, desc2, cross_check)
    return _match_dense(desc1, desc2, cross_check)


@partial(jax.jit, static_argnums=(2,))
def _match_dense(desc1: jax.Array, desc2: jax.Array,
                 cross_check: bool = True):
    d = hamming_matrix(desc1, desc2)
    j = jnp.argmin(d, axis=1)
    dist = jnp.take_along_axis(d, j[:, None], axis=1)[:, 0]
    if cross_check:
        i_back = jnp.argmin(d, axis=0)
        valid = i_back[j] == jnp.arange(d.shape[0])
    else:
        valid = jnp.ones(d.shape[0], bool)
    return j.astype(jnp.int32), dist, valid


def knn2_ratio_match(desc1: jax.Array, desc2: jax.Array,
                     max_ratio: float = 0.8, *,
                     fused: bool | None = None):
    """Lowe ratio test on the best-2 neighbours + cross check
    (sample_image_sequence.cpp:114-144).  `fused` as in match()."""
    if _use_fused(fused):
        return knn2_ratio_match_fused(desc1, desc2, max_ratio)
    return _knn2_ratio_match_dense(desc1, desc2, max_ratio)


@partial(jax.jit, static_argnums=(2,))
def _knn2_ratio_match_dense(desc1: jax.Array, desc2: jax.Array,
                            max_ratio: float = 0.8):
    d = hamming_matrix(desc1, desc2)
    neg2, idx2 = jax.lax.top_k(-d, 2)
    best = -neg2[:, 0]
    second = -neg2[:, 1]
    j = idx2[:, 0]
    ratio_ok = best.astype(jnp.float32) <= max_ratio * second.astype(jnp.float32)
    i_back = jnp.argmin(d, axis=0)
    cross_ok = i_back[j] == jnp.arange(d.shape[0])
    return j.astype(jnp.int32), best, ratio_ok & cross_ok


# ---------------------------------------------------------------------------
# Fused streaming matcher (Pallas): the distance matrix never touches HBM.
#
# SOL.md round-4 probe: the XLA path above is HBM-bound on the (N, M) i32
# distance matrix — a 1 GB write at 16k x 16k, re-READ three more times by
# argmin(axis=1), argmin(axis=0) and top_k.  At 40k x 40k the matrix is
# 6.4 GB and the path stops being practical at all.  The fused kernel tiles
# the +-1 bf16 GEMM over (query-block, train-block) grid steps, keeps the
# running best-2 (in dot space — hamming = (nbits - dot)/2 is monotone
# decreasing, so max-dot == min-hamming) in the revisited output block, and
# writes only O(N) results: HBM traffic drops from ~4 GB to the descriptor
# streams (~N*nbits/4 bytes per query tile).
#
# Exactness: +-1 operands are bf16-exact, MXU products are +-1, f32
# accumulation of <= 512 such terms is exact — distances are bit-identical
# to hamming_matrix.  Tie-breaking matches argmin/top_k (lowest index):
# within a tile the argmax takes the lowest column; across tiles the merge
# replaces only on STRICT improvement and train tiles run in ascending
# order.
# ---------------------------------------------------------------------------

_MASK_PENALTY = np.float32(1e9)       # invalid train column -> dot - 1e9
_EXCL = np.float32(-3e9)              # below any maskable value


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _knn2_kernel(a_ref, b_ref, v_ref, out_ref, *, tb):
    t = pl.program_id(1)
    dot = jnp.dot(a_ref[...], b_ref[...],
                  preferred_element_type=jnp.float32)       # (QB, TB) exact
    dot = dot + (v_ref[...] - 1.0) * _MASK_PENALTY          # mask invalid cols
    col = jax.lax.broadcasted_iota(jnp.int32, dot.shape, 1)
    m1 = jnp.max(dot, axis=1)                               # (QB,)
    big = jnp.int32(1 << 30)
    a1 = jnp.min(jnp.where(dot == m1[:, None], col, big), axis=1)
    m2 = jnp.max(jnp.where(col == a1[:, None], _EXCL, dot), axis=1)
    gidx = (a1 + t * tb).astype(jnp.float32)                # exact < 2^24

    @pl.when(t == 0)
    def _init():
        out_ref[0, :] = m1
        out_ref[1, :] = m2
        out_ref[2, :] = gidx

    @pl.when(t != 0)
    def _merge():
        rb = out_ref[0, :]
        rs = out_ref[1, :]
        ri = out_ref[2, :]
        take = m1 > rb                  # strict: ties keep the earlier tile
        out_ref[0, :] = jnp.where(take, m1, rb)
        out_ref[1, :] = jnp.where(take, jnp.maximum(rb, m2),
                                  jnp.maximum(rs, m1))
        out_ref[2, :] = jnp.where(take, gidx, ri)


def _resolve_qb(qb: int | None) -> int:
    """EFF_TPU_MATCH_QB, resolved in the UN-jitted wrappers so the env var
    participates in the jit cache key (as a static argument) — reading it
    at trace time would silently reuse the first-compiled qb for the rest
    of the process (round-4 advisor finding)."""
    return int(os.environ.get("EFF_TPU_MATCH_QB", "1024")) if qb is None \
        else qb


def _fused_topk2(desc1, desc2, valid2, qb: int = 1024, tb: int = 512):
    """Streaming best-2 in dot space: (best_idx i32, best_dot, second_dot).

    qb (query block rows) sets the RHS re-stream factor: the train-side
    descriptor stream is re-read once per query tile, so HBM traffic
    ~ (n1/qb) * n2 * nbits/4 bytes.  qb=1024 keeps that ~3% of the dense
    matrix's traffic while the per-program GEMM stays (1024, nbits, 512).
    EFF_TPU_MATCH_QB overrides for A/B runs (resolved by _resolve_qb in
    the public entry points)."""
    n1 = desc1.shape[0]
    n2 = desc2.shape[0]
    nbits = desc2.shape[1] * 8
    n1p = -(-n1 // qb) * qb
    n2p = -(-n2 // tb) * tb
    a = jnp.pad(unpack_bits_pm1(desc1), ((0, n1p - n1), (0, 0)))
    bT = jnp.pad(unpack_bits_pm1(desc2).T, ((0, 0), (0, n2p - n2)))
    v = (jnp.ones((n2,), jnp.float32) if valid2 is None
         else valid2.astype(jnp.float32))
    v = jnp.pad(v, (0, n2p - n2))[None, :]
    out = pl.pallas_call(
        functools.partial(_knn2_kernel, tb=tb),
        grid=(n1p // qb, n2p // tb),
        in_specs=[
            pl.BlockSpec((qb, nbits), lambda q, t: (q, 0)),
            pl.BlockSpec((nbits, tb), lambda q, t: (0, t)),
            pl.BlockSpec((1, tb), lambda q, t: (0, t)),
        ],
        out_specs=pl.BlockSpec((8, qb), lambda q, t: (0, q)),
        out_shape=jax.ShapeDtypeStruct((8, n1p), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=_interpret(),
    )(a, bT, v)
    return (out[2, :n1].astype(jnp.int32), out[0, :n1], out[1, :n1])


def _dot_to_hamming(dot, nbits):
    return ((nbits - dot) * 0.5).astype(jnp.int32)


@partial(jax.jit, static_argnums=(2, 3))
def _match_fused_impl(desc1, desc2, cross_check: bool, qb: int):
    nbits = desc1.shape[1] * 8
    j, bdot, _ = _fused_topk2(desc1, desc2, None, qb)
    dist = _dot_to_hamming(bdot, nbits)
    if cross_check:
        i_back, _, _ = _fused_topk2(desc2, desc1, None, qb)
        valid = i_back[j] == jnp.arange(desc1.shape[0])
    else:
        valid = jnp.ones(desc1.shape[0], bool)
    return j, dist, valid


def match_fused(desc1: jax.Array, desc2: jax.Array, cross_check: bool = True,
                qb: int | None = None):
    """`match` semantics via the streaming kernel (identical outputs)."""
    return _match_fused_impl(desc1, desc2, cross_check, _resolve_qb(qb))


@partial(jax.jit, static_argnums=(2, 3))
def _knn2_ratio_match_fused_impl(desc1, desc2, max_ratio: float, qb: int):
    nbits = desc1.shape[1] * 8
    j, bdot, sdot = _fused_topk2(desc1, desc2, None, qb)
    best = _dot_to_hamming(bdot, nbits)
    second = _dot_to_hamming(sdot, nbits)
    ratio_ok = best.astype(jnp.float32) <= max_ratio * second.astype(jnp.float32)
    i_back, _, _ = _fused_topk2(desc2, desc1, None, qb)
    cross_ok = i_back[j] == jnp.arange(desc1.shape[0])
    return j, best, ratio_ok & cross_ok


def knn2_ratio_match_fused(desc1: jax.Array, desc2: jax.Array,
                           max_ratio: float = 0.8, qb: int | None = None):
    """`knn2_ratio_match` semantics via the streaming kernel."""
    return _knn2_ratio_match_fused_impl(desc1, desc2, max_ratio,
                                        _resolve_qb(qb))


@partial(jax.jit, static_argnums=(4, 5))
def _knn2_ratio_match_masked_fused_impl(desc1, valid1, desc2, valid2,
                                        max_ratio: float, qb: int):
    nbits = desc1.shape[1] * 8
    j, bdot, sdot = _fused_topk2(desc1, desc2, valid2, qb)
    best = _dot_to_hamming(bdot, nbits)
    second = _dot_to_hamming(sdot, nbits)
    ratio_ok = best.astype(jnp.float32) <= max_ratio * second.astype(jnp.float32)
    i_back, _, _ = _fused_topk2(desc2, desc1, valid1, qb)
    cross_ok = i_back[j] == jnp.arange(desc1.shape[0])
    ok = ratio_ok & cross_ok & valid1 & (bdot > -_MASK_PENALTY * 0.5)
    return j, best, ok


def knn2_ratio_match_masked_fused(desc1: jax.Array, valid1: jax.Array,
                                  desc2: jax.Array, valid2: jax.Array,
                                  max_ratio: float = 0.8,
                                  qb: int | None = None):
    """`knn2_ratio_match_masked` semantics via the streaming kernel.

    Rows where `ok` is False may carry different `j`/`best` values than
    the dense path (e.g. the dense path's 1<<30-derived sentinels vs this
    kernel's mask-penalty dots) — only `ok` and (j, best)-where-ok are
    path-invariant, which is what the parity tests check."""
    return _knn2_ratio_match_masked_fused_impl(
        desc1, valid1, desc2, valid2, max_ratio, _resolve_qb(qb))


def knn2_ratio_match_masked(desc1: jax.Array, valid1: jax.Array,
                            desc2: jax.Array, valid2: jax.Array,
                            max_ratio: float = 0.8, *,
                            fused: bool | None = None):
    """knn2_ratio_match over fixed-capacity descriptor SLOT arrays with
    validity masks — lets streaming pipelines chain detect+describe+match
    fully on-device with zero host synchronization (the analogue of the
    reference's CUDA-stream loop in sample_image_sequence.cpp:96-144).

    `fused` as in match(); the two paths agree on `ok` and on (j, best)
    wherever ok is True — rows where ok is False may carry different
    j/best values between paths (different sentinel conventions)."""
    if _use_fused(fused):
        return knn2_ratio_match_masked_fused(desc1, valid1, desc2, valid2,
                                             max_ratio)
    return _knn2_ratio_match_masked_dense(desc1, valid1, desc2, valid2,
                                          max_ratio)


@partial(jax.jit, static_argnums=(4,))
def _knn2_ratio_match_masked_dense(desc1: jax.Array, valid1: jax.Array,
                                   desc2: jax.Array, valid2: jax.Array,
                                   max_ratio: float = 0.8):
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
