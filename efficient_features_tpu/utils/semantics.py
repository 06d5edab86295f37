"""Shared algorithm semantics for the TPU-native efficient-features framework.

Everything here is *backend-neutral*: pure-Python/NumPy host math and constant
tables that the CPU oracle (``efficient_features_tpu.cpu``) and the TPU compute
path (``efficient_features_tpu.ops``) both consume.  The design rule of the
framework is that every stage that feeds keypoint *selection* (pyramid resize,
blur, FAST test, Harris response, radius NMS, top-k) is defined in exact integer
arithmetic, so the CPU oracle and the TPU path produce bit-identical keypoint
sets.  Float enters only downstream (angles, descriptors), where parity tests
use the reference's error budgets.

Reference provenance (semantics, not code):
  - FAST circle / segment test: /root/reference/modules/cuda_efficient_features/src/cuda_fast.cu:42-222
  - Harris response window + scale: cuda_efficient_features.cu:99-139
  - IC-angle U_MAX table: cuda_efficient_features.cu:141-172
  - Pyramid / per-level quota / border mask: cuda_efficient_features.cpp:136-182
  - Radius NMS rule: cuda_efficient_features.cu:62-97 (see NOTE below)

Documented deviations from the CUDA reference (deterministic by design):
  1. NMS tie handling: the reference kills a point when ANY in-radius neighbour
     has ``response >= response_i`` (ties annihilate both, cuda_efficient_features.cu:90),
     and its candidate set depends on a nondeterministic atomic-append cap.  We
     define: a corner survives iff its response is >= every response in the open
     disc of radius ``nonmax_radius`` (ties co-survive).  All FAST corners
     participate (no 0.1*area cap).  This is deterministic and order-free.
  2. Selection order: ranked by (response desc, flat index asc) instead of an
     unstable GPU sort.
  3. Resize / Gaussian blur use 11/16-bit fixed-point integer filtering (OpenCV
     itself uses fixed-point for 8U), so pyramid levels are bit-exact across
     backends; the coefficients differ from OpenCV's at the last bit.
  4. Harris response: Sobel and 7x7 structure-tensor sums are exact int32; the
     det/trace float math quantizes operand significands (12 bits for the
     tensor entries, 11 for the trace) and uses k = 3/64, so every multiply is
     EXACT in f32.  Exact products are immune to FMA contraction, making the
     response map bit-identical across NumPy / XLA-CPU / XLA-TPU regardless of
     compiler codegen (plain f32 math differs in the last bit between backends,
     which would make selection nondeterministic across them).  The ~0.05%
     response quantization only coarsens corner *ranking* granularity.
  5. BAD border compare: division-free cross-multiplied form with exact
     integer products while a1*a2 < 2^22; larger boxes (user keypoints with
     size >~ 120) use 12-significant-bit truncated f32 operands so products
     stay exact — deterministic on every backend (TPU has no int64).
  6. HashSIFT patch warp: the reference's own full-f32 bilinear lerp.  The
     TPU kernel's MXU work is exact one-hot pixel gathers; weights apply in
     f32 on the VPU, so residual cross-backend differences are IEEE rounding
     order (FMA contraction) and cos/sin ULPs only — well inside the
     reference's 1e-4 parity budget (measured ~3e-6 of patch pixels, +-1).
"""
from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# Detector constants (cuda_efficient_features.cpp:33-35, .cu:35-38)
# ---------------------------------------------------------------------------
PATCH_SIZE = 31
HALF_PATCH_SIZE = 15
HARRIS_BLOCK_SIZE = 7
# Harris k: the reference uses 0.04 (cuda_efficient_features.cu:38); we use the
# dyadic 3/64 = 0.046875 (2-bit significand) so k*tr^2 is EXACT in f32 — part
# of the FMA-immune response formulation (deviation 4 below).
HARRIS_K = 3.0 / 64.0
HARRIS_SCALE = 1.0 / (4 * HARRIS_BLOCK_SIZE * 255)   # cuda_efficient_features.cu:103

# Keypoint SoA row layout (cuda_efficient_features.h:32-37)
LOCATION_ROW, RESPONSE_ROW, ANGLE_ROW, OCTAVE_ROW, SIZE_ROW, ROWS_COUNT = 0, 1, 2, 3, 4, 5

# IC-angle circular patch extents per |dy| (cuda_efficient_features.cu:143)
U_MAX = np.array([15, 15, 15, 15, 14, 14, 14, 13, 13, 12, 11, 10, 9, 8, 6, 3, 0],
                 dtype=np.int32)

# FAST-9 Bresenham circle in circular bit order, (dy, dx).
# Derived from the C[0..3] byte packing in cuda_fast.cu:168-222 (bit k of the
# brighter/darker masks corresponds to this offset).
FAST_CIRCLE = np.array([
    (3, 0), (3, 1), (2, 2), (1, 3), (0, 3), (-1, 3), (-2, 2), (-3, 1),
    (-3, 0), (-3, -1), (-2, -2), (-1, -3), (0, -3), (1, -3), (2, -2), (3, -1),
], dtype=np.int32)
FAST_ARC_LEN = 9  # "9 contiguous" segment test (FAST-9), cuda_fast.cu:162-166

# Fixed-point precision for bilinear resize / separable Gaussian (our own
# deterministic semantics; see module docstring, deviation 3).
RESIZE_BITS = 11
BLUR_BITS = 16


# ---------------------------------------------------------------------------
# Host math (trace-time / static)
# ---------------------------------------------------------------------------
def cv_round(x: float) -> int:
    """Round-half-to-even like OpenCV's cvRound."""
    return int(np.rint(x))


def pyramid_scales(scale_factor: float, nlevels: int) -> list[np.float32]:
    """Cumulative float32 level scales (cuda_efficient_features.cpp:144-156)."""
    scales = [np.float32(1.0)]
    s = np.float32(1.0)
    for _ in range(1, nlevels):
        s = np.float32(s * np.float32(scale_factor))
        scales.append(s)
    return scales


def pyramid_shapes(h: int, w: int, scale_factor: float, nlevels: int):
    """Per-level (h, w), level s resized from level 0 dims via cvRound(invScale*dim)
    (cuda_efficient_features.cpp:150-154)."""
    shapes = [(h, w)]
    for s in pyramid_scales(scale_factor, nlevels)[1:]:
        inv = np.float32(1.0) / s
        shapes.append((cv_round(np.float32(inv * np.float32(h))),
                       cv_round(np.float32(inv * np.float32(w)))))
    return shapes


def features_per_level(total: int, scale_factor: float, nlevels: int) -> list[int]:
    """ORB-style geometric quota split (cuda_efficient_features.cpp:159-174)."""
    factor = 1.0 / scale_factor
    n = total * (1 - factor) / (1 - factor ** nlevels)
    quotas, acc = [], 0
    for _ in range(nlevels - 1):
        q = cv_round(n)
        quotas.append(q)
        acc += q
        n *= factor
    quotas.append(max(total - acc, 0))
    return quotas


def gaussian_kernel7_fixed() -> np.ndarray:
    """7-tap sigma=2 Gaussian quantized to BLUR_BITS fixed point, sum == 2**BLUR_BITS.

    The reference blurs each level with a 7x7 sigma=2 filter before descriptor
    extraction (cuda_efficient_features.cpp:193).
    """
    i = np.arange(7, dtype=np.float64) - 3
    k = np.exp(-(i * i) / (2.0 * 2.0 * 2.0))
    k /= k.sum()
    q = np.round(k * (1 << BLUR_BITS)).astype(np.int64)
    q[3] += (1 << BLUR_BITS) - q.sum()
    return q.astype(np.int32)


def resize_axis_coeffs(dst_n: int, src_n: int):
    """Half-pixel-center bilinear sampling for one axis in RESIZE_BITS fixed point.

    Returns (i0, i1, w1q): source indices (clamped) and the quantized weight of
    i1; weight of i0 is (1<<RESIZE_BITS) - w1q.  Matches cv::resize INTER_LINEAR
    geometry (half-pixel centers) with our own fixed-point rounding.
    """
    x = (np.arange(dst_n, dtype=np.float64) + 0.5) * (src_n / dst_n) - 0.5
    i0 = np.floor(x).astype(np.int64)
    f = x - i0
    w1 = np.clip(np.round(f * (1 << RESIZE_BITS)), 0, 1 << RESIZE_BITS).astype(np.int32)
    i1 = np.clip(i0 + 1, 0, src_n - 1).astype(np.int32)
    i0 = np.clip(i0, 0, src_n - 1).astype(np.int32)
    return i0, i1, w1


def reflect101_index(idx: np.ndarray, n: int) -> np.ndarray:
    """BORDER_REFLECT_101 index map: -1 -> 1, n -> n-2 (no edge duplication)."""
    idx = np.abs(idx)
    return np.where(idx >= n, 2 * (n - 1) - idx, idx)


def disc_offsets(radius: int) -> list[tuple[int, int]]:
    """Offsets (dy, dx) with 0 < dy*dy+dx*dx < ceil(radius**2).

    The reference suppresses against neighbours at squared distance strictly
    less than cvCeil(radius*radius) (cuda_efficient_features.cu:90,291).
    """
    r2 = int(np.ceil(radius * radius))
    out = []
    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            if (dy, dx) != (0, 0) and dy * dy + dx * dx < r2:
                out.append((dy, dx))
    return out


def disc_row_extents(radius: int) -> list[tuple[int, int]]:
    """Per-dy max |dx| for the NMS disc: [(dy, wdx)] with dx in [-wdx, wdx]."""
    r2 = int(np.ceil(radius * radius))
    rows = []
    for dy in range(-radius, radius + 1):
        m = r2 - 1 - dy * dy
        if (dy, 0) == (0, 0):
            pass
        if m < 0:
            continue
        wdx = int(np.floor(np.sqrt(m)))
        rows.append((dy, wdx))
    return rows
