"""Pure-NumPy reference implementation (the test oracle).

This plays the role of the reference's CPU module ``modules/efficient_features``
(bit-compatible CPU BAD/HashSIFT used as the parity oracle for the GPU path,
tests/descriptor_test.cpp:29-74) — extended to also cover the full detector,
which the reference never unit-tested directly.

Every keypoint-selection stage is implemented in exact integer arithmetic (see
``utils/semantics.py``) so the TPU path can be tested for *bit-identical*
keypoint sets.  Descriptor stages are float and tested with the reference's
error budgets (2e-5 / 1e-4 nonzero bytes).

Semantics provenance is cited per function against /root/reference sources.
"""
from __future__ import annotations

import numpy as np

from ..utils import semantics as S

# ---------------------------------------------------------------------------
# Image ops (fixed-point, bit-exact across backends)
# ---------------------------------------------------------------------------


def resize_u8(src: np.ndarray, dst_hw: tuple[int, int]) -> np.ndarray:
    """Separable bilinear resize, half-pixel centers, 11-bit fixed point.

    Geometry of cv::cuda::resize INTER_LINEAR (cuda_efficient_features.cpp:154)
    with our own deterministic fixed-point rounding (semantics deviation 3).
    """
    h, w = dst_hw
    sh, sw = src.shape
    x0, x1, wx1 = S.resize_axis_coeffs(w, sw)
    y0, y1, wy1 = S.resize_axis_coeffs(h, sh)
    one = np.int32(1 << S.RESIZE_BITS)
    a = src.astype(np.int32)
    # horizontal: keep full 11-bit precision
    hpass = a[:, x0] * (one - wx1)[None, :] + a[:, x1] * wx1[None, :]
    # vertical + single rounding shift by 22 bits
    acc = hpass[y0, :] * (one - wy1)[:, None] + hpass[y1, :] * wy1[:, None]
    out = (acc + (1 << (2 * S.RESIZE_BITS - 1))) >> (2 * S.RESIZE_BITS)
    return out.astype(np.uint8)


def build_pyramid(image: np.ndarray, scale_factor: float, nlevels: int):
    """Iterated resize: level s from level s-1 (cuda_efficient_features.cpp:148-156)."""
    shapes = S.pyramid_shapes(image.shape[0], image.shape[1], scale_factor, nlevels)
    levels = [image]
    for s in range(1, nlevels):
        levels.append(resize_u8(levels[-1], shapes[s]))
    return levels


def gaussian_blur7_u8(img: np.ndarray) -> np.ndarray:
    """7x7 sigma=2 separable Gaussian, REFLECT_101 border, 16-bit fixed point.

    Reference blurs each level before descriptors (cuda_efficient_features.cpp:193).
    """
    k = S.gaussian_kernel7_fixed().astype(np.int64)
    h, w = img.shape
    half = 1 << (S.BLUR_BITS - 1)

    yy = S.reflect101_index(np.arange(-3, h + 3), h)
    xx = S.reflect101_index(np.arange(-3, w + 3), w)
    a = img.astype(np.int64)[:, xx]
    hp = sum(int(k[i]) * a[:, i:i + w] for i in range(7))
    hp = (hp + half) >> S.BLUR_BITS
    vp = hp[yy, :]
    out = sum(int(k[i]) * vp[i:i + h, :] for i in range(7))
    out = (out + half) >> S.BLUR_BITS
    return out.astype(np.uint8)


def integral_image_i32(img: np.ndarray) -> np.ndarray:
    """(H+1, W+1) int32 integral with zero top row/left col, wrapping overflow.

    Matches gpu::calcIntegralImage (cuda_bad.cu:350-363).  int32 wraparound is
    intentional: box sums recovered by A+D-B-C are exact modulo 2**32.
    """
    h, w = img.shape
    out = np.zeros((h + 1, w + 1), dtype=np.int32)
    with np.errstate(over="ignore"):
        c = np.cumsum(np.cumsum(img.astype(np.int32), axis=0, dtype=np.int32),
                      axis=1, dtype=np.int32)
    out[1:, 1:] = c
    return out


# ---------------------------------------------------------------------------
# FAST-9 segment test (cuda_fast.cu:42-222)
# ---------------------------------------------------------------------------


def _rotations_any9(mask16: np.ndarray) -> np.ndarray:
    """True where a circular 16-bit mask contains a run of >= 9 set bits.

    Replaces the reference's 8KB lookup table (cuda_fast.cu:31,162-166): a run
    of 9 exists iff AND of the mask with its 8 circular rotations is nonzero
    (which also implies popcount > 8).
    """
    acc = mask16.copy()
    for s in range(1, S.FAST_ARC_LEN):
        rot = ((mask16 >> s) | (mask16 << (16 - s))) & np.uint16(0xFFFF)
        acc &= rot
    return acc != 0


def fast_corner_mask(img: np.ndarray, threshold: int) -> np.ndarray:
    """Dense FAST-9 corner map. Domain: [3, dim-3) (kernel margin,
    cuda_fast.cu:172-176); the detector's border mask further restricts it."""
    h, w = img.shape
    v = img.astype(np.int16)
    brighter = np.zeros((h, w), dtype=np.uint16)
    darker = np.zeros((h, w), dtype=np.uint16)
    th = np.int16(threshold)
    for bit, (dy, dx) in enumerate(S.FAST_CIRCLE):
        shifted = np.zeros_like(v)
        ys = slice(max(dy, 0), h + min(dy, 0))
        yd = slice(max(-dy, 0), h + min(-dy, 0))
        xs = slice(max(dx, 0), w + min(dx, 0))
        xd = slice(max(-dx, 0), w + min(-dx, 0))
        shifted[yd, xd] = v[ys, xs]
        brighter |= (shifted > v + th).astype(np.uint16) << bit
        darker |= (shifted < v - th).astype(np.uint16) << bit
    corner = _rotations_any9(brighter) | _rotations_any9(darker)
    corner[:3, :] = False
    corner[-3:, :] = False
    corner[:, :3] = False
    corner[:, -3:] = False
    return corner


# ---------------------------------------------------------------------------
# Harris response, exact integer form (cuda_efficient_features.cu:99-139)
# ---------------------------------------------------------------------------


def _shift2d(a: np.ndarray, dy: int, dx: int) -> np.ndarray:
    out = np.zeros_like(a)
    h, w = a.shape
    ys = slice(max(dy, 0), h + min(dy, 0))
    yd = slice(max(-dy, 0), h + min(-dy, 0))
    xs = slice(max(dx, 0), w + min(dx, 0))
    xd = slice(max(-dx, 0), w + min(-dx, 0))
    out[yd, xd] = a[ys, xs]
    return out


def _box7_sum(a: np.ndarray) -> np.ndarray:
    """Centered 7x7 window sum via padded cumsum (exact int64)."""
    h, w = a.shape
    p = np.zeros((h + 8, w + 8), dtype=np.int64)
    p[4:4 + h, 4:4 + w] = a
    c = p.cumsum(axis=0).cumsum(axis=1)
    # window rows y-3..y+3 => cumsum rows (y+4+3) - (y+4-4)
    return (c[7:7 + h, 7:7 + w] - c[0:h, 7:7 + w]
            - c[7:7 + h, 0:w] + c[0:h, 0:w])


def _trunc_mantissa(x: np.ndarray, drop_bits: int) -> np.ndarray:
    i = x.view(np.int32) & np.int32(~((1 << drop_bits) - 1))
    return i.view(np.float32)


def harris_response(img: np.ndarray) -> np.ndarray:
    """Dense float32 Harris response (cuda_efficient_features.cu:99-139).

    Exact-integer Sobel and 7x7 window sums, then the FMA-immune quantized
    det/trace math of utils/semantics.py deviation 4 — bit-identical to the
    TPU path on every backend.  Valid where the 9x9 support is in-bounds;
    the detector's 15px border mask guarantees that.
    """
    a = img.astype(np.int32)
    # Sobel via shifts; _shift2d(a, dy, dx)[y, x] = a[y+dy, x+dx]
    dx = ((_shift2d(a, 1, 1) + 2 * _shift2d(a, 0, 1) + _shift2d(a, -1, 1))
          - (_shift2d(a, 1, -1) + 2 * _shift2d(a, 0, -1) + _shift2d(a, -1, -1)))
    dy = ((_shift2d(a, 1, -1) + 2 * _shift2d(a, 1, 0) + _shift2d(a, 1, 1))
          - (_shift2d(a, -1, -1) + 2 * _shift2d(a, -1, 0) + _shift2d(a, -1, 1)))
    s2 = np.float32(S.HARRIS_SCALE) * np.float32(S.HARRIS_SCALE)
    sxx = _trunc_mantissa(s2 * _box7_sum((dx * dx).astype(np.int64)).astype(np.float32), 12)
    sxy = _trunc_mantissa(s2 * _box7_sum((dx * dy).astype(np.int64)).astype(np.float32), 12)
    syy = _trunc_mantissa(s2 * _box7_sum((dy * dy).astype(np.int64)).astype(np.float32), 12)
    tr = _trunc_mantissa(sxx + syy, 13)
    det = sxx * syy - sxy * sxy
    return det - np.float32(S.HARRIS_K) * (tr * tr)


# ---------------------------------------------------------------------------
# Radius NMS (cuda_efficient_features.cu:62-97, deterministic variant)
# ---------------------------------------------------------------------------

RESP_SENTINEL = np.float32(-np.inf)


def _shift_x_sent(a: np.ndarray, k: int) -> np.ndarray:
    """out[y, x] = a[y, x + k], sentinel-padded (any |k|)."""
    out = np.full_like(a, RESP_SENTINEL)
    w = a.shape[1]
    if abs(k) >= w:
        return out
    if k >= 0:
        out[:, : w - k] = a[:, k:]
    else:
        out[:, -k:] = a[:, : w + k]
    return out


def _shift_y_sent(a: np.ndarray, k: int) -> np.ndarray:
    """out[y, x] = a[y + k, x], sentinel-padded (any |k|)."""
    out = np.full_like(a, RESP_SENTINEL)
    h = a.shape[0]
    if abs(k) >= h:
        return out
    if k >= 0:
        out[: h - k, :] = a[k:, :]
    else:
        out[-k:, :] = a[: h + k, :]
    return out


def radius_nms(resp: np.ndarray, corner: np.ndarray, radius: int) -> np.ndarray:
    """Survivor mask: corner & (resp >= max over open disc of radius).

    Ties co-survive (documented deviation 1 in utils/semantics.py).  The disc
    max is decomposed into per-dy centered row max-filters; each row filter is
    built from power-of-2 left-aligned running maxima (log-depth, the same
    algorithm the TPU path uses, so results are identical integers).
    """
    masked = np.where(corner, resp, RESP_SENTINEL)
    h, w = masked.shape
    # pad left/right with sentinels so centered windows never clip
    padded = np.full((h, w + 2 * radius), RESP_SENTINEL, dtype=masked.dtype)
    padded[:, radius:radius + w] = masked
    # left-aligned running maxima over power-of-2 windows: L[p][y,x] = max a[y, x:x+p]
    pows = {1: padded}
    p = 1
    while 2 * p <= 2 * radius + 1:
        pows[2 * p] = np.maximum(pows[p], _shift_x_sent(pows[p], p))
        p *= 2

    def centered_rowmax(wdx: int) -> np.ndarray:
        """out[y,x] = max masked[y, x-wdx : x+wdx+1] (clipped to bounds)."""
        width = 2 * wdx + 1
        k = 1
        while k * 2 <= width:
            k *= 2
        left = pows[k]
        if k != width:
            left = np.maximum(left, _shift_x_sent(pows[k], width - k))
        # padded index (radius - wdx + x) starts the window at original x - wdx
        return left[:, radius - wdx:radius - wdx + w]

    # NOTE: the center point is included in the disc max — harmless under the
    # ties-co-survive rule, since resp >= max(resp, others) <=> resp >= others.
    disc_max = np.full_like(masked, RESP_SENTINEL)
    for dy, wdx in S.disc_row_extents(radius):
        disc_max = np.maximum(disc_max, _shift_y_sent(centered_rowmax(wdx), dy))
    return corner & (masked >= disc_max)


# ---------------------------------------------------------------------------
# Selection: per-level top-k by (response desc, index asc)
# ---------------------------------------------------------------------------


def select_topk(resp: np.ndarray, survivor: np.ndarray, quota: int):
    """Returns (ys, xs, resp_int) of up to `quota` survivors, ranked by
    (response desc, flat index asc) — deterministic replacement for the
    reference's unstable thrust sort (cuda_efficient_features.cu:344-358)."""
    ys, xs = np.nonzero(survivor)
    if ys.size == 0:
        return (np.zeros(0, np.int32),) * 2 + (np.zeros(0, np.int64),)
    r = resp[ys, xs]
    flat = ys.astype(np.int64) * resp.shape[1] + xs
    order = np.lexsort((flat, -r))[:quota]
    return ys[order].astype(np.int32), xs[order].astype(np.int32), r[order]


# ---------------------------------------------------------------------------
# IC-angle orientation (cuda_efficient_features.cu:141-172)
# ---------------------------------------------------------------------------


def _ic_angle_offsets():
    offs = []
    for dy in range(-S.HALF_PATCH_SIZE, S.HALF_PATCH_SIZE + 1):
        d = int(S.U_MAX[abs(dy)])
        for dx in range(-d, d + 1):
            offs.append((dy, dx))
    o = np.array(offs, dtype=np.int32)
    return o[:, 0], o[:, 1]


_IC_DY, _IC_DX = _ic_angle_offsets()


def ic_angles(img: np.ndarray, ys: np.ndarray, xs: np.ndarray) -> np.ndarray:
    """Intensity-centroid angle in degrees [0, 360). Exact integer moments,
    float32 atan2."""
    if ys.size == 0:
        return np.zeros(0, np.float32)
    vals = img[ys[:, None] + _IC_DY[None, :],
               xs[:, None] + _IC_DX[None, :]].astype(np.int64)
    m10 = vals @ _IC_DX.astype(np.int64)
    m01 = vals @ _IC_DY.astype(np.int64)
    ang = np.arctan2(m01.astype(np.float32), m10.astype(np.float32))
    ang = np.where(ang < 0, ang + np.float32(2 * np.pi), ang)
    return (np.float32(180.0 / np.pi) * ang).astype(np.float32)


# ---------------------------------------------------------------------------
# Full detector (cuda_efficient_features.cpp:225-321)
# ---------------------------------------------------------------------------


class DetectResult:
    """Level-major concatenated keypoints (SoA, host)."""

    def __init__(self, x, y, response, angle, octave, size, level_counts):
        self.x, self.y = x, y
        self.response, self.angle = response, angle
        self.octave, self.size = octave, size
        self.level_counts = level_counts

    @property
    def count(self):
        return int(self.x.size)


def mask_pyramid(mask: np.ndarray, shapes) -> list[np.ndarray]:
    """Nearest-neighbour user-mask downsampling per pyramid level (mirrors
    pipeline._mask_pyramid exactly)."""
    levels = [mask != 0]
    h0, w0 = shapes[0]
    for (h, w) in shapes[1:]:
        yy = np.clip((np.arange(h) * 2 + 1) * h0 // (2 * h), 0, h0 - 1)
        xx = np.clip((np.arange(w) * 2 + 1) * w0 // (2 * w), 0, w0 - 1)
        levels.append((mask != 0)[yy][:, xx])
    return levels


def detect(image: np.ndarray, *, nfeatures=5000, scale_factor=1.2, nlevels=8,
           first_level=0, fast_threshold=20, nonmax_radius=15,
           mask=None) -> DetectResult:
    levels = build_pyramid(image, scale_factor, nlevels)
    scales = S.pyramid_scales(scale_factor, nlevels)
    quotas = S.features_per_level(nfeatures, scale_factor, nlevels)
    shapes = S.pyramid_shapes(image.shape[0], image.shape[1],
                              scale_factor, nlevels)
    masks = mask_pyramid(mask, shapes) if mask is not None \
        else [None] * nlevels

    per_level = []
    for s in range(first_level, nlevels):
        img = levels[s]
        h, w = img.shape
        corner = fast_corner_mask(img, fast_threshold)
        # border mask: valid in [15, dim-15) (createMask, cuda_efficient_features.cpp:176-182)
        b = S.HALF_PATCH_SIZE
        border = np.zeros_like(corner)
        if h > 2 * b and w > 2 * b:
            border[b:h - b, b:w - b] = True
        corner &= border
        if masks[s] is not None:
            corner &= masks[s]
        resp = harris_response(img)
        surv = radius_nms(resp, corner, nonmax_radius)
        ys, xs, r = select_topk(resp, surv, quotas[s])
        ang = ic_angles(img, ys, xs)
        per_level.append((s, ys, xs, r, ang))

    xs_all, ys_all, resp_all, ang_all, oct_all, size_all, counts = \
        [], [], [], [], [], [], []
    for s, ys, xs, r, ang in per_level:
        sc = np.float32(scales[s])
        # scalePoints (cuda_efficient_features.cu:236-248): short(scale*x + 0.5)
        xs_all.append((sc * xs.astype(np.float32) + np.float32(0.5)).astype(np.int16))
        ys_all.append((sc * ys.astype(np.float32) + np.float32(0.5)).astype(np.int16))
        resp_all.append(r.astype(np.float32))
        ang_all.append(ang)
        oct_all.append(np.full(xs.size, s, np.int32))
        size_all.append(np.full(xs.size, sc * np.float32(S.PATCH_SIZE), np.float32))
        counts.append(int(xs.size))

    return DetectResult(
        np.concatenate(xs_all).astype(np.float32),
        np.concatenate(ys_all).astype(np.float32),
        np.concatenate(resp_all), np.concatenate(ang_all),
        np.concatenate(oct_all), np.concatenate(size_all), counts)
