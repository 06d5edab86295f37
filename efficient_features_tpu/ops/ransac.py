"""TPU-vectorized RANSAC homography estimation (geometric match check).

No reference analogue: the CUDA library stops at descriptor matching
(sample_feature_matching.cpp:99-101 draws raw matches), but every real
consumer of its matches (SfM/SLAM/stitching) verifies them geometrically,
typically with cv::findHomography(RANSAC).  This module supplies that step
the TPU way: RANSAC's hypothesize-and-verify loop — a branchy, sequential
algorithm on CPU — becomes ONE fixed-shape jitted program:

  - all M minimal sets are drawn at once (Gumbel top-4 sampling from the
    valid-match mask: no rejection loops, no duplicate indices per set),
  - all M homographies are solved together (Hartley-normalized DLT via a
    batched 9x9 symmetric eigensolve — tiny LAPACK-free problem XLA maps
    well),
  - all M x N reprojection errors are scored in two batched matmuls,
  - the best hypothesis is refined once on its full inlier set.

Everything is static-shape; invalid matches ride a mask.  Determinism: the
same seed gives the same hypothesis set on every backend.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _normalization(pts, w):
    """Hartley normalization transform for weighted points (w in {0,1}).

    Returns (T, pts_n): T is the 3x3 similarity moving the weighted point
    set to centroid 0, mean distance sqrt(2); pts_n the transformed points.
    """
    wsum = jnp.maximum(w.sum(axis=-1, keepdims=True), 1.0)
    c = (pts * w[..., None]).sum(axis=-2) / wsum                 # (..., 2)
    d = jnp.linalg.norm(pts - c[..., None, :], axis=-1)
    mean_d = (d * w).sum(axis=-1) / wsum[..., 0]
    s = jnp.sqrt(2.0) / jnp.maximum(mean_d, 1e-8)                # (...,)
    pts_n = (pts - c[..., None, :]) * s[..., None, None]
    z = jnp.zeros_like(s)
    one = jnp.ones_like(s)
    T = jnp.stack([
        jnp.stack([s, z, -s * c[..., 0]], axis=-1),
        jnp.stack([z, s, -s * c[..., 1]], axis=-1),
        jnp.stack([z, z, one], axis=-1)], axis=-2)               # (..., 3, 3)
    return T, pts_n


def _dlt(src, dst, w):
    """Weighted normalized DLT: (..., K, 2) point pairs -> (..., 3, 3) H.

    Standard two-row design per correspondence; the homography is the
    eigenvector of A^T A for its smallest eigenvalue (batched 9x9 eigh —
    no SVD of a tall matrix needed).  Weights w (K,) in {0,1} select the
    participating pairs (fixed shapes; masked-out rows contribute zero).
    """
    Ts, src_n = _normalization(src, w)
    Td, dst_n = _normalization(dst, w)
    x, y = src_n[..., 0], src_n[..., 1]
    u, v = dst_n[..., 0], dst_n[..., 1]
    z = jnp.zeros_like(x)
    one = jnp.ones_like(x)
    r1 = jnp.stack([x, y, one, z, z, z, -u * x, -u * y, -u], axis=-1)
    r2 = jnp.stack([z, z, z, x, y, one, -v * x, -v * y, -v], axis=-1)
    A = jnp.concatenate([r1, r2], axis=-2) * jnp.concatenate(
        [w, w], axis=-1)[..., None]                              # (..., 2K, 9)
    AtA = jnp.einsum("...ki,...kj->...ij", A, A,
                     precision=jax.lax.Precision.HIGHEST)
    _, vecs = jnp.linalg.eigh(AtA)          # ascending eigenvalues
    h = vecs[..., :, 0]                      # smallest -> null space of A
    Hn = h.reshape(*h.shape[:-1], 3, 3)
    # denormalize: H = Td^-1 Hn Ts ; build Td^-1 in closed form
    sd = Td[..., 0, 0]
    cdx = -Td[..., 0, 2] / sd
    cdy = -Td[..., 1, 2] / sd
    z0 = jnp.zeros_like(sd)
    one0 = jnp.ones_like(sd)
    Td_inv = jnp.stack([
        jnp.stack([1.0 / sd, z0, cdx], axis=-1),
        jnp.stack([z0, 1.0 / sd, cdy], axis=-1),
        jnp.stack([z0, z0, one0], axis=-1)], axis=-2)
    # explicit f32 precision: jnp.matmul's TPU default is bf16 on the MXU,
    # which costs ~4e-3 relative in H entries — pixel-scale error after
    # denormalization (compiled-tier failure, round 6)
    H = jnp.einsum("...ij,...jk,...kl->...il", Td_inv, Hn, Ts,
                   precision=jax.lax.Precision.HIGHEST)
    return H / jnp.where(jnp.abs(H[..., 2:3, 2:3]) < 1e-12, 1.0,
                         H[..., 2:3, 2:3])


def _reproj_err2(H, src, dst):
    """Squared forward-transfer error of every pair under every H:
    H (M, 3, 3), src/dst (N, 2) -> (M, N)."""
    ones = jnp.ones_like(src[:, :1])
    sh = jnp.concatenate([src, ones], axis=1)                    # (N, 3)
    p = jnp.einsum("mij,nj->mni", H, sh,
                   precision=jax.lax.Precision.HIGHEST)          # (M, N, 3)
    zden = p[..., 2]
    den = jnp.where(jnp.abs(zden) < 1e-12, 1e-12, zden)
    proj = p[..., :2] / den[..., None]
    e2 = jnp.sum((proj - dst[None]) ** 2, axis=-1)
    # points mapped to/behind the plane at infinity are never inliers
    return jnp.where(jnp.abs(zden) < 1e-6, jnp.inf, e2)


@functools.partial(jax.jit, static_argnames=("iters",))
def _ransac_core(src, dst, valid, thresh, key, iters):
    n = src.shape[0]
    # Gumbel top-4: i.i.d. gumbel noise on valid slots, take the 4 largest
    # per hypothesis — a uniform 4-subset without replacement, no loops
    g = jax.random.gumbel(key, (iters, n))
    g = jnp.where(valid[None], g, -jnp.inf)
    _, idx = jax.lax.top_k(g, 4)                                 # (M, 4)
    src4 = src[idx]                                              # (M, 4, 2)
    dst4 = dst[idx]
    w4 = jnp.ones(idx.shape, src.dtype)
    H = _dlt(src4, dst4, w4)                                     # (M, 3, 3)
    e2 = _reproj_err2(H, src, dst)                               # (M, N)
    inl = (e2 <= thresh * thresh) & valid[None]
    scores = inl.sum(axis=1)
    bi = jnp.argmax(scores)
    best_inl = inl[bi]
    # one weighted refit on the winner's inliers (guard the degenerate
    # < 4-inlier case by falling back to the minimal-set estimate)
    w = best_inl.astype(src.dtype)
    H_ref = _dlt(src, dst, w)
    e2_ref = _reproj_err2(H_ref[None], src, dst)[0]
    inl_ref = (e2_ref <= thresh * thresh) & valid
    better = (inl_ref.sum() >= scores[bi]) & (scores[bi] >= 4)
    H_out = jnp.where(better, H_ref, H[bi])
    inl_out = jnp.where(better, inl_ref, best_inl)
    return H_out, inl_out, inl_out.sum()


def find_homography_ransac(src, dst, valid=None, *, iters: int = 512,
                           thresh: float = 3.0, seed: int = 0):
    """Estimate the homography mapping src -> dst from noisy matches.

    src, dst: (N, 2) float point pairs (e.g. matched keypoint coordinates);
    valid: optional (N,) bool mask (False rows ignored — fixed-shape slots).
    iters hypotheses are solved and scored in one jitted program; the best
    is refined on its inliers.  Returns (H 3x3 f32, inlier_mask (N,) bool,
    n_inliers int) as device arrays.

    thresh is the forward-transfer inlier radius in pixels (the
    cv::findHomography ransacReprojThreshold convention).
    """
    src = jnp.asarray(src, jnp.float32)
    dst = jnp.asarray(dst, jnp.float32)
    if src.ndim != 2 or src.shape[1] != 2 or src.shape != dst.shape:
        raise ValueError("src/dst must both be (N, 2)")
    if src.shape[0] < 4:
        raise ValueError("need at least 4 matches")
    if valid is None:
        valid = jnp.ones(src.shape[0], bool)
    else:
        valid = jnp.asarray(valid, bool)
    key = jax.random.PRNGKey(seed)
    return _ransac_core(src, dst, valid, jnp.float32(thresh), key, iters)
