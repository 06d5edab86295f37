"""Pure-NumPy BAD and HashSIFT descriptor oracles.

Semantics follow the reference implementations bit-for-bit up to float
associativity (histogram accumulation order):
  - BAD:      /root/reference/modules/cuda_efficient_features/src/cuda_bad.cu:121-316
  - HashSIFT: /root/reference/modules/cuda_efficient_features/src/cuda_hash_sift.cu:103-435
              and modules/efficient_features/src/hash_sift.cpp:200-378

Descriptors are computed from keypoints given as (x, y, size, angle-degrees)
float32 arrays; angle < 0 means "no orientation" (identity rotation).
"""
from __future__ import annotations

import numpy as np

from ..models.params import load_bad_params, load_hash_sift_matrix
from .reference import integral_image_i32

DEG2RAD = np.float32(0.017453292519943295)  # cuda_bad.cu:45
BAD_EXTRA_RATIO_MARGIN = np.float32(1.75)   # cuda_bad.cu:46
PATCH_W = PATCH_H = 32

# HashSIFT constants (cuda_hash_sift.cu:39-61)
R_BINS = C_BINS = 4
ORI_BINS = 8
SIFT_DESCR_SCL_FCTR = np.float32(3.0)
MAGNITUDE_TH = np.float32(0.2)
INT_DESCR_FACTOR = np.float32(512.0)
KEYPOINT_SCALE = np.float32(1.0 / 6.0)      # cuda_hash_sift.cpp:132


def _round_num(v: np.ndarray) -> np.ndarray:
    """CV_ROUNDNUM: (int)(v + 0.5) — truncation toward zero (cuda_bad.cu:52)."""
    return np.trunc(v + np.float32(0.5)).astype(np.int32)


def _trunc12(v: np.ndarray) -> np.ndarray:
    """Truncate |v| to 12 significant bits (zero the low 12 mantissa bits);
    products of two such values are exact in f32.  Must match ops.bad._trunc12
    and native eff_bad bit-for-bit."""
    iv = np.ascontiguousarray(v, np.float32).view(np.int32)
    return (iv & np.int32(~0xFFF)).view(np.float32)


def _affine_rows(x, y, size, angle, scale_factor, pw=PATCH_W, ph=PATCH_H):
    """Patch->image affine (cuda_bad.cu:121-147 / cuda_hash_sift.cu:136-155).

    Returns (m00, m01, m02, m10, m11, m12, scale), all float32 arrays.
    The angle==-1 branch coincides with the general formula at cost=1, sint=0.
    """
    s = (np.float32(scale_factor) * size /
         np.float32(0.5 * (pw + ph))).astype(np.float32)
    theta = angle * DEG2RAD
    has_angle = angle >= 0
    cost = np.where(has_angle, np.cos(theta, dtype=np.float32), np.float32(1.0))
    sint = np.where(has_angle, np.sin(theta, dtype=np.float32), np.float32(0.0))
    m00 = s * cost
    m01 = -s * sint
    m02 = (-s * cost + s * sint) * np.float32(pw * 0.5) + x
    m10 = s * sint
    m11 = s * cost
    m12 = (-s * sint - s * cost) * np.float32(ph * 0.5) + y
    return m00, m01, m02, m10, m11, m12, s


def _pack_bits_msb(bits: np.ndarray) -> np.ndarray:
    """(N, nbits) {0,1} -> (N, nbits//8) uint8, MSB-first within each byte
    (cuda_bad.cu:251,303 / cuda_hash_sift.cu:425-432)."""
    n, nbits = bits.shape
    b = bits.reshape(n, nbits // 8, 8).astype(np.uint8)
    weights = (1 << np.arange(7, -1, -1)).astype(np.uint8)
    return (b * weights).sum(axis=2).astype(np.uint8)


# ---------------------------------------------------------------------------
# BAD
# ---------------------------------------------------------------------------


def bad_descriptors(image: np.ndarray, x, y, size, angle, *,
                    nbits: int = 256, scale_factor: float = 1.0,
                    integral: np.ndarray | None = None) -> np.ndarray:
    """Box Average Difference descriptor (cuda_bad.cu:166-316)."""
    boxes, thresholds = load_bad_params(nbits)
    if integral is None:
        integral = integral_image_i32(image)
    fh, fw = integral.shape              # frameHeight/frameWidth incl. +1 pad
    img_w, img_h = fw - 1, fh - 1

    x = np.asarray(x, np.float32)[:, None]
    y = np.asarray(y, np.float32)[:, None]
    size = np.asarray(size, np.float32)[:, None]
    angle = np.asarray(angle, np.float32)[:, None]

    m00, m01, m02, m10, m11, m12, s = _affine_rows(x, y, size, angle, scale_factor)

    bx1 = boxes[:, 0].astype(np.float32)[None, :]
    bx2 = boxes[:, 1].astype(np.float32)[None, :]
    by1 = boxes[:, 2].astype(np.float32)[None, :]
    by2 = boxes[:, 3].astype(np.float32)[None, :]
    br = boxes[:, 4].astype(np.float32)[None, :]

    # transformBoxPairParams (cuda_bad.cu:149-157)
    tx1 = _round_num(m00 * bx1 + m01 * by1 + m02)
    ty1 = _round_num(m10 * bx1 + m11 * by1 + m12)
    tx2 = _round_num(m00 * bx2 + m01 * by2 + m02)
    ty2 = _round_num(m10 * bx2 + m11 * by2 + m12)
    tbr = _round_num(s * br)

    ii = integral.astype(np.int32)

    def box_sum_clamped(cx, cy, r):
        """Border-safe path sums (computeBadResponse, cuda_bad.cu:166-243).
        Returns (sum, area) as exact int32/int64 — box sums < 2^31."""
        x1 = np.clip(cx - r, 0, fw - 2)
        y1 = np.clip(cy - r, 0, fh - 2)
        x2 = np.clip(cx + r + 1, 1, fw - 1)
        y2 = np.clip(cy + r + 1, 1, fh - 1)
        a = ii[y1, x1]
        b = ii[y1, x2]
        c = ii[y2, x1]
        d = ii[y2, x2]
        ssum = (a + d - b - c).astype(np.int64)
        area = ((y2 - y1) * (x2 - x1)).astype(np.int64)
        return ssum, area

    def box_sum_fast(cx, cy, r):
        """Interior path: un-normalized int sum; indices clipped for memory
        safety only (matches reference values whenever the reference itself is
        in-bounds, which the 1.75 border margin guarantees)."""
        x1 = np.clip(cx - r, 0, fw - 1)
        y1 = np.clip(cy - r, 0, fh - 1)
        x2 = np.clip(cx + r + 1, 0, fw - 1)
        y2 = np.clip(cy + r + 1, 0, fh - 1)
        return ii[y1, x1] + ii[y2, x2] - ii[y1, x2] - ii[y2, x1]

    th = thresholds[None, :]
    # border-safe response: the reference compares sum1/area1 - sum2/area2
    # <= th (cuda_bad.cu:227-242); we use the equivalent division-free
    # cross-multiplied form (areas > 0) because TPU f32 division is a
    # reciprocal approximation, not IEEE — the integer products are exact and
    # the comparison is deterministic on every backend.  TPU has no int64, so
    # the contract branches: while a1*a2 < 2^22 the products fit int32 (int64
    # here computes the identical value); for larger boxes all backends use
    # 12-significant-bit truncated f32 operands whose products are exact.
    s1b, a1b = box_sum_clamped(tx1, ty1, tbr)
    s2b, a2b = box_sum_clamped(tx2, ty2, tbr)
    a1f = a1b.astype(np.float32)
    a2f = a2b.astype(np.float32)
    safe = a1f * a2f < np.float32(1 << 22)
    lhs = (s1b * a2b - s2b * a1b).astype(np.float32)
    bit_i = lhs <= th * (a1b * a2b).astype(np.float32)
    s1t = _trunc12(s1b.astype(np.float32))
    s2t = _trunc12(s2b.astype(np.float32))
    a1t = _trunc12(a1f)
    a2t = _trunc12(a2f)
    bit_t = (s1t * a2t - s2t * a1t) <= th * (a1t * a2t)
    bit_border = np.where(safe, bit_i, bit_t)
    # interior response (integer, threshold scaled by box area)
    side = 1 + 2 * tbr
    area_resp = (box_sum_fast(tx1, ty1, tbr) - box_sum_fast(tx2, ty2, tbr))
    bit_fast = area_resp.astype(np.float32) <= th * (side * side).astype(np.float32)

    # isKeypointInTheBorder (cuda_bad.cu:62-78): s_border uses /(pw+ph)
    sb = np.float32(scale_factor) * size / np.float32(PATCH_W + PATCH_H)
    border_w = np.float32(PATCH_W) * sb * BAD_EXTRA_RATIO_MARGIN
    border_h = np.float32(PATCH_H) * sb * BAD_EXTRA_RATIO_MARGIN
    in_border = ((x < border_w) | (x + border_w >= np.float32(img_w)) |
                 (y < border_h) | (y + border_h >= np.float32(img_h)))

    bits = np.where(in_border, bit_border, bit_fast)
    return _pack_bits_msb(bits.astype(np.uint8))


# ---------------------------------------------------------------------------
# HashSIFT
# ---------------------------------------------------------------------------


def warp_patches(image: np.ndarray, x, y, size, angle,
                 cropping_scale: float) -> np.ndarray:
    """(N, 32, 32) uint8 bilinear-warped patches (cuda_hash_sift.cu:103-134).

    Pixels whose bilinear support exits the image are set to 0 (the reference
    requires ui >= 0 and ui+1 < W strictly)."""
    h, w = image.shape
    n = np.asarray(x).shape[0]
    xf = np.asarray(x, np.float32)[:, None, None]
    yf = np.asarray(y, np.float32)[:, None, None]
    sf = np.asarray(size, np.float32)[:, None, None]
    af = np.asarray(angle, np.float32)[:, None, None]
    m00, m01, m02, m10, m11, m12, _ = _affine_rows(xf, yf, sf, af, cropping_scale)

    px = np.arange(PATCH_W, dtype=np.float32)[None, None, :]
    py = np.arange(PATCH_H, dtype=np.float32)[None, :, None]
    u = m00 * px + m01 * py + m02
    v = m10 * px + m11 * py + m12

    ui = np.floor(u).astype(np.int32)
    vi = np.floor(v).astype(np.int32)
    valid = (ui >= 0) & (ui + 1 < w) & (vi >= 0) & (vi + 1 < h)
    uic = np.clip(ui, 0, w - 2)
    vic = np.clip(vi, 0, h - 2)
    du = (u - ui.astype(np.float32)).astype(np.float32)
    dv = (v - vi.astype(np.float32)).astype(np.float32)

    im = image.astype(np.float32)
    p00 = im[vic, uic]
    p01 = im[vic, uic + 1]
    p10 = im[vic + 1, uic]
    p11 = im[vic + 1, uic + 1]
    # Full-f32 bilinear lerp, exactly the reference's arithmetic
    # (hash_sift.cpp:68-109): the TPU window kernel gathers the four pixel
    # planes with EXACT one-hot MXU matmuls and applies these same f32
    # weights on the VPU, so cross-backend differences are limited to IEEE
    # rounding order (FMA contraction) and cos/sin ULPs — far inside the
    # reference's own 1e-4 parity budget.
    h0 = np.float32(1.0) - du
    h1 = du
    z_top = h0 * p00 + h1 * p01
    z_bot = h0 * p10 + h1 * p11
    t2 = (np.float32(1.0) - dv) * z_top + dv * z_bot
    val = np.minimum(np.trunc(t2 + np.float32(0.5)), np.float32(255.0))
    return np.where(valid, val, 0).astype(np.uint8)


def _sift_grids():
    """Keypoint-independent per-pixel constants for the 32x32 patch."""
    xs = np.arange(1, PATCH_W - 1)
    ys = np.arange(1, PATCH_H - 1)
    gx, gy = np.meshgrid(xs, ys)          # (30, 30), gy rows / gx cols
    kp_radius = KEYPOINT_SCALE * PATCH_H * 0.5
    kernel_sigma = 0.5 * C_BINS * float(SIFT_DESCR_SCL_FCTR) * kp_radius
    dist_scale = -1.0 / (2 * kernel_sigma * kernel_sigma)
    cx, cy = 0.5 * PATCH_W, 0.5 * PATCH_H
    mag_scale = np.exp(np.float32(dist_scale) *
                       ((gx - np.float32(cx)) ** 2 + (gy - np.float32(cy)) ** 2)
                       .astype(np.float32)).astype(np.float32)
    # spatial bins (HistBin, cuda_hash_sift.cu:211-233)
    scale_rc = np.float32(1.0 / (SIFT_DESCR_SCL_FCTR * (KEYPOINT_SCALE * PATCH_H * 0.5)))
    rbin = scale_rc * (gy.astype(np.float32) - np.float32(0.5 * PATCH_H)) + np.float32(R_BINS / 2 - 0.5)
    cbin = scale_rc * (gx.astype(np.float32) - np.float32(0.5 * PATCH_W)) + np.float32(C_BINS / 2 - 0.5)
    return gx, gy, mag_scale, rbin, cbin


_GX, _GY, _MAG_SCALE, _RBIN, _CBIN = _sift_grids()
_SCALE_O = np.float32(ORI_BINS / (2 * np.pi))


def patch_sift_responses(patches: np.ndarray) -> np.ndarray:
    """(N, 129) float32 rows [1, d0..d127] from uint8 patches
    (computePatchSIFTKernel, cuda_hash_sift.cu:315-412)."""
    n = patches.shape[0]
    p = patches.astype(np.float32)
    dx = p[:, 1:-1, 2:] - p[:, 1:-1, :-2]
    dy = p[:, :-2, 1:-1] - p[:, 2:, 1:-1]
    mag = _MAG_SCALE[None] * np.sqrt(dx * dx + dy * dy)
    ori = np.arctan2(dy, dx)

    ri = np.floor(_RBIN).astype(np.int32)
    rf = (_RBIN - ri).astype(np.float32)
    ci = np.floor(_CBIN).astype(np.int32)
    cf = (_CBIN - ci).astype(np.float32)
    ob = _SCALE_O * ori
    oi = np.floor(ob).astype(np.int32)
    of = (ob - oi).astype(np.float32)
    oi = np.where(oi < 0, oi + ORI_BINS, oi)
    oi = np.where(oi >= ORI_BINS, oi - ORI_BINS, oi)

    # trilinear distribute (cuda_hash_sift.cu:247-289)
    v1 = rf * mag
    v0 = mag - v1
    v01 = cf * v0
    v00 = v0 - v01
    v11 = cf * v1
    v10 = v1 - v11
    hist_sz = (R_BINS + 2) * (C_BINS + 2) * (ORI_BINS + 2)
    hist = np.zeros(n * hist_sz, np.float32)
    n_base = (np.arange(n, dtype=np.int64) * hist_sz)[:, None, None]
    for dr, vr in ((0, (v00, v01)), (1, (v10, v11))):
        for dc, vv in ((0, vr[0]), (1, vr[1])):
            v_hi = of * vv
            v_lo = vv - v_hi
            for do, vo in ((0, v_lo), (1, v_hi)):
                flat = ((ri + 1 + dr) * (C_BINS + 2) + (ci + 1 + dc)) \
                    * (ORI_BINS + 2) + (oi + do)
                # flat is (N, 30, 30) — oi carries the keypoint dimension
                np.add.at(hist, (n_base + flat).ravel(),
                          vo.astype(np.float32).ravel())

    hist = hist.reshape(n, R_BINS + 2, C_BINS + 2, ORI_BINS + 2)
    # circular fold + crop (finalize, cuda_hash_sift.cu:292-309)
    core = hist[:, 1:1 + R_BINS, 1:1 + C_BINS, :].copy()
    core[..., 0] += core[..., ORI_BINS]
    core[..., 1] += core[..., ORI_BINS + 1]
    desc = core[..., :ORI_BINS].reshape(n, 128).astype(np.float32)

    # L2 -> clip(0.2) -> L2 -> x512 uchar clip (describeFeatureVector :353-375)
    eps = np.float32(np.finfo(np.float32).eps)

    def l2n(d):
        nrm = np.maximum(np.sqrt((d * d).sum(axis=1, dtype=np.float32)), eps)
        return d / nrm[:, None]

    desc = l2n(desc)
    desc = np.minimum(desc, MAGNITUDE_TH)
    desc = l2n(desc)
    desc = np.clip(np.trunc(INT_DESCR_FACTOR * desc + np.float32(0.5)), 0, 255)

    out = np.empty((n, 129), np.float32)
    out[:, 0] = 1.0
    out[:, 1:] = desc
    return out


def hash_sift_descriptors(image: np.ndarray, x, y, size, angle, *,
                          nbits: int = 256,
                          cropping_scale: float = 1.0) -> np.ndarray:
    """HashSIFT: patch SIFT -> learned linear hash -> sign bits
    (cuda_hash_sift.cpp:113-137)."""
    b_matrix = load_hash_sift_matrix(nbits)       # (nbits, 129) float32
    patches = warp_patches(image, x, y, size, angle, cropping_scale)
    responses = patch_sift_responses(patches)
    proj = responses @ b_matrix.T                 # (N, nbits) float32
    return _pack_bits_msb((proj > 0).astype(np.uint8))
