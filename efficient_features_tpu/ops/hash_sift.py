"""HashSIFT descriptor on TPU (cuda_hash_sift.cu / cuda_hash_sift.cpp).

TPU-first redesign of the per-keypoint CUDA block kernel:
  - the 32x32 bilinear patch warp is a batched XLA gather,
  - the trilinearly-interpolated 6x6x10 orientation histogram — an atomicAdd
    scatter loop on GPU (cuda_hash_sift.cu:282-289) — becomes ten MXU matmuls
    against a constant (900, 36) spatial-weight matrix: the spatial bins and
    Gaussian weighting are keypoint-independent, so
        H[n, rc, o] = sum_px Wsp[px, rc] * V_o[n, px]
    where V_o carries the per-keypoint orientation votes.  No scatter at all.
  - the 129 x nbits projection runs as one f32 GEMM on the MXU (the
    reference's cuBLAS call, cuda_hash_sift.cpp:44-60).

Parity with cpu.descriptors.hash_sift_descriptors is float-associativity-level
(histogram accumulation order differs), covered by the 1e-4 budget.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..models.params import load_hash_sift_matrix
from .bad import affine_rows, pack_bits_msb

PATCH_W = PATCH_H = 32
R_BINS = C_BINS = 4
ORI_BINS = 8
MAGNITUDE_TH = np.float32(0.2)
INT_DESCR_FACTOR = np.float32(512.0)
KEYPOINT_SCALE = 1.0 / 6.0
SIFT_DESCR_SCL_FCTR = 3.0


@functools.lru_cache(maxsize=None)
def _spatial_weight_matrix():
    """Constant (900, 36) matrix: pixel -> (r6, c6) trilinear spatial weights
    including the Gaussian magnitude scale (all keypoint-independent,
    cuda_hash_sift.cu:211-233,315-351).

    Also returns the (900,) pixel coordinate grids used for gradients.
    """
    xs = np.arange(1, PATCH_W - 1)
    ys = np.arange(1, PATCH_H - 1)
    gx, gy = np.meshgrid(xs, ys)
    kp_radius = KEYPOINT_SCALE * PATCH_H * 0.5
    kernel_sigma = 0.5 * C_BINS * SIFT_DESCR_SCL_FCTR * kp_radius
    dist_scale = -1.0 / (2 * kernel_sigma * kernel_sigma)
    mag_scale = np.exp(np.float32(dist_scale)
                       * ((gx - np.float32(16)) ** 2
                          + (gy - np.float32(16)) ** 2).astype(np.float32)
                       ).astype(np.float32)

    scale_rc = np.float32(1.0 / (SIFT_DESCR_SCL_FCTR * kp_radius))
    rbin = scale_rc * (gy.astype(np.float32) - np.float32(16)) + np.float32(1.5)
    cbin = scale_rc * (gx.astype(np.float32) - np.float32(16)) + np.float32(1.5)
    ri = np.floor(rbin).astype(np.int32)
    rf = (rbin - ri).astype(np.float32)
    ci = np.floor(cbin).astype(np.int32)
    cf = (cbin - ci).astype(np.float32)

    npx = gx.size
    W = np.zeros((npx, (R_BINS + 2) * (C_BINS + 2)), np.float32)
    rif, cif = ri.ravel(), ci.ravel()
    rff, cff = rf.ravel(), cf.ravel()
    msf = mag_scale.ravel()
    px = np.arange(npx)
    for dr, wr in ((0, 1 - rff), (1, rff)):
        for dc, wc in ((0, 1 - cff), (1, cff)):
            W[px, (rif + 1 + dr) * (C_BINS + 2) + (cif + 1 + dc)] += \
                msf * wr * wc
    return W


@functools.lru_cache(maxsize=None)
def _spatial_weight_core():
    """(1024, 128) f32 constant for the FUSED HashSIFT kernel: rows = padded
    interior-pixel index (900 real), cols 0..15 = the CORE spatial bins
    (r4*4 + c4; edge bins of the 6x6 grid are dropped, as the oracle's core
    crop does), cols 16.. zero.  Circular orientation bins fold at vote time
    instead (bin 8 -> 0), so the kernel histogram is exactly the 8x16 core."""
    W = _spatial_weight_matrix()                              # (900, 36)
    idx = [(r + 1) * (C_BINS + 2) + (c + 1)
           for r in range(R_BINS) for c in range(C_BINS)]
    out = np.zeros((1024, 128), np.float32)
    out[:900, :R_BINS * C_BINS] = W[:, idx]
    return out


@functools.lru_cache(maxsize=None)
def _spatial_weight_core_shifted():
    """(8192, 128) f32 constant for the STANDALONE hist kernel
    (window_kernels._hs_hist_kernel): row block o (1024 rows) is
    _spatial_weight_core with its 16 core columns moved to lanes
    16*o..16*o+15, so the kernel's per-orientation-bin matmuls accumulate
    straight into the orientation-major (o*16 + rc) descriptor layout —
    lane placement rides the matmul instead of (slow) lane shifts, and the
    8 partial products occupy disjoint lanes so their sum is exact."""
    W = _spatial_weight_core()                                # (1024, 128)
    out = np.zeros((8 * 1024, 128), np.float32)
    for o in range(ORI_BINS):
        out[o * 1024:(o + 1) * 1024, 16 * o:16 * o + 16] = W[:, :16]
    return out


@functools.lru_cache(maxsize=None)
def _grad_shift_mat():
    """(1024, 1024) f32 constant for the fused kernel's quantized-patch
    gradients: one MXU matmul q(.,1024) @ G replaces the in-kernel lane
    shifts (slow on TPU) and the recomputed neighbor sample grids (3.5x the
    bilinear work — the round-3 fused kernel's losing trade).

    Rows = full 32x32 row-major patch lane p = yy*32 + xx; output lane
    l < 900 carries BOTH gradients packed as z = dx + 4096*dy (yy = l//30+1,
    xx = l%30+1; dead lanes zero), with
      dx = p[yy, xx+1] - p[yy, xx-1]   (patch_sift_responses:158)
      dy = p[yy-1, xx] - p[yy+1, xx]   (patch_sift_responses:159)
    Entries are {-1, 0, +1, -4096, +4096} and q holds exact <=255 integers,
    all exact in bf16; every product and 4-term partial sum is an exact
    integer < 2^24 in the f32 accumulator, so z is exact and unpacks
    exactly: |dx| <= 255 < 2048 means dy = floor(z/4096 + 0.5) and
    dx = z - 4096*dy recover the integer subtractions bit-for-bit.  The
    packing halves the fused kernel's biggest streamed constant (4 -> 2 MB)
    and its matmul MACs."""
    G = np.zeros((1024, 1024), np.float32)
    for l in range(900):
        yy, xx = l // 30 + 1, l % 30 + 1
        G[yy * 32 + xx + 1, l] += 1.0
        G[yy * 32 + xx - 1, l] -= 1.0
        G[(yy - 1) * 32 + xx, l] += 4096.0
        G[(yy + 1) * 32 + xx, l] -= 4096.0
    return G


def hs_fused_projection(nbits: int):
    """(B0, Bp) for the fused-kernel descriptor layout: the kernel emits
    e[l] = d[(l%16)*8 + l//16] (orientation-major 8x16 core flattened), so
    the learned projection's columns are permuted to match; B0 is the bias
    column.  proj = e @ Bp.T + B0 equals the reference GEMM up to f32
    accumulation order."""
    B = load_hash_sift_matrix(nbits)                          # (nbits, 129)
    perm = np.array([1 + (l % 16) * 8 + l // 16 for l in range(128)])
    return B[:, 0].astype(np.float32), B[:, perm].astype(np.float32)


def warp_patches(image: jax.Array, x, y, size, angle,
                 cropping_scale: float, origin=(0, 0),
                 frame_hw=None) -> jax.Array:
    """(N, 32, 32) float32 warped patches (values already u8-quantized);
    matches cpu.descriptors.warp_patches.

    `origin`/`frame_hw`: the image may be a band starting at global `origin`
    of a `frame_hw` frame; keypoints stay global and the bilinear validity
    test uses the global frame (sharded pipelines)."""
    h, w = image.shape
    if frame_hw is None:
        frame_hw = (h, w)
    fh, fw = frame_hw
    oy, ox = origin
    xf = x[:, None, None]
    yf = y[:, None, None]
    sf = size[:, None, None]
    af = angle[:, None, None]
    m00, m01, m02, m10, m11, m12, _ = affine_rows(xf, yf, sf, af, cropping_scale)

    px = jnp.arange(PATCH_W, dtype=jnp.float32)[None, None, :]
    py = jnp.arange(PATCH_H, dtype=jnp.float32)[None, :, None]
    u = m00 * px + m01 * py + m02
    v = m10 * px + m11 * py + m12

    ui = jnp.floor(u).astype(jnp.int32)
    vi = jnp.floor(v).astype(jnp.int32)
    valid = (ui >= 0) & (ui + 1 < fw) & (vi >= 0) & (vi + 1 < fh)
    uic = jnp.clip(ui - ox, 0, w - 2)
    vic = jnp.clip(vi - oy, 0, h - 2)
    du = u - ui.astype(jnp.float32)
    dv = v - vi.astype(jnp.float32)

    im = image.astype(jnp.float32)
    p00 = im[vic, uic]
    p01 = im[vic, uic + 1]
    p10 = im[vic + 1, uic]
    p11 = im[vic + 1, uic + 1]
    # full-f32 bilinear weights (the window-kernel / oracle formulation,
    # see cpu.descriptors.warp_patches); backend FMA contraction of these
    # lerps shifts values by <= 1 ulp — budget-level, not exactness-level
    h0 = np.float32(1.0) - du
    h1 = du
    z_top = h0 * p00 + h1 * p01
    z_bot = h0 * p10 + h1 * p11
    t2 = (np.float32(1.0) - dv) * z_top + dv * z_bot
    val = jnp.minimum(jnp.trunc(t2 + np.float32(0.5)), np.float32(255.0))
    return jnp.where(valid, val, 0.0)


def patch_sift_responses(patches: jax.Array) -> jax.Array:
    """(N, 129) float32 SIFT response rows [1, d0..d127] from (N, 32, 32)
    patches, histogram built with ten MXU matmuls (see module docstring)."""
    n = patches.shape[0]
    p = patches.astype(jnp.float32)
    dx = p[:, 1:-1, 2:] - p[:, 1:-1, :-2]
    dy = p[:, :-2, 1:-1] - p[:, 2:, 1:-1]
    mag = jnp.sqrt(dx * dx + dy * dy).reshape(n, -1)          # (N, 900)
    ori = jnp.arctan2(dy, dx).reshape(n, -1)

    scale_o = np.float32(ORI_BINS / (2 * np.pi))
    ob = scale_o * ori
    oi = jnp.floor(ob).astype(jnp.int32)
    of = ob - oi.astype(jnp.float32)
    oi = jnp.where(oi < 0, oi + ORI_BINS, oi)
    oi = jnp.where(oi >= ORI_BINS, oi - ORI_BINS, oi)

    v_hi = of * mag
    v_lo = mag - v_hi

    # Only the 4x4 CORE spatial bins survive the crop below, so contract
    # against the (900, 16) core columns, not the full 6x6=36 grid — each
    # kept output column is the identical dot product (bit-identical), the
    # dropped edge columns were discarded anyway.  Likewise orientation bin
    # 9 is provably all-zero (oi is wrapped to [0, 8), so oi + 1 <= 8) and
    # its fold added exact +0.0 — 9 matmuls, not 10.  Together: 60% of the
    # histogram matmul FLOPs removed with bit-identical descriptors.
    Wsp = jnp.asarray(_spatial_weight_matrix())               # (900, 36)
    core_cols = jnp.asarray(
        [(r + 1) * (C_BINS + 2) + (c + 1)
         for r in range(R_BINS) for c in range(C_BINS)], jnp.int32)
    Wcore = Wsp[:, core_cols]                                 # (900, 16)

    # nine (N, 900) @ (900, 16) matmuls, one per orientation bin.
    # precision='highest': full f32 MXU accumulation — descriptor sign bits are
    # compared against an f32 oracle, bf16 default precision is not enough.
    hists = []
    for o in range(ORI_BINS + 1):
        v_o = jnp.where(oi == o, v_lo, 0.0) + jnp.where(oi + 1 == o, v_hi, 0.0)
        hists.append(jnp.dot(v_o, Wcore, preferred_element_type=jnp.float32,
                             precision="highest"))
    core = jnp.stack(hists, axis=-1)                  # (N, 16, 9)
    core = core.reshape(n, R_BINS, C_BINS, ORI_BINS + 1)
    core = core[..., :ORI_BINS].at[..., 0].add(core[..., ORI_BINS])
    desc = core.reshape(n, 128)

    eps = np.float32(np.finfo(np.float32).eps)

    def l2n(d):
        nrm = jnp.maximum(jnp.sqrt((d * d).sum(axis=1)), eps)
        return d / nrm[:, None]

    desc = l2n(desc)
    desc = jnp.minimum(desc, MAGNITUDE_TH)
    desc = l2n(desc)
    desc = jnp.clip(jnp.trunc(INT_DESCR_FACTOR * desc + np.float32(0.5)), 0, 255)

    return jnp.concatenate([jnp.ones((n, 1), jnp.float32), desc], axis=1)


def hash_sift_descriptors(image: jax.Array, x, y, size, angle, valid, *,
                          nbits: int = 256, cropping_scale: float = 1.0,
                          origin=(0, 0), frame_hw=None) -> jax.Array:
    """(N, nbits//8) uint8 HashSIFT descriptors; invalid slots are zero."""
    B = jnp.asarray(load_hash_sift_matrix(nbits))             # (nbits, 129)
    patches = warp_patches(image, x, y, size, angle, cropping_scale,
                           origin, frame_hw)
    responses = patch_sift_responses(patches)
    proj = jnp.dot(responses, B.T, preferred_element_type=jnp.float32,
                   precision="highest")
    bits = (proj > 0).astype(jnp.int32)
    bits = jnp.where(valid[:, None], bits, 0)
    return pack_bits_msb(bits)
