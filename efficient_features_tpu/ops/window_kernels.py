"""Per-keypoint window kernels: the TPU answer to irregular gathers.

The reference's descriptor/orientation kernels do scattered global-memory
reads per keypoint (integral-image box corners in cuda_bad.cu:246-316,
bilinear patch warp in cuda_hash_sift.cu:103-134, IC-angle circular patch in
cuda_efficient_features.cu:141-172).  XLA gathers serialize badly on TPU, so
instead each keypoint DMAs one aligned image window (80 rows x 256 lanes) into
VMEM and every scattered read becomes an MXU bilinear form, arranged so
results land lane-major:

    Z = win @ colFactor^T        (one MXU matmul per factor)
    result_row = sum_rows(rowFactor^T * Z)   (VPU sublane reduction)

For BAD the factors are box column/row range indicators ({0,1}) and the
matmul runs on the int8 MXU path (2x the bf16 rate): pixels are re-biased to
[-128, 127] and the exactly-known -128*area bias is added back, so box sums
are exact int32; for the HashSIFT warp the MXU factors are exact one-hot
column selectors (left/right bilinear pixels) and ALL lerp weights apply on
the VPU in full f32 — the reference's own float arithmetic; for IC-angle
both factors are integer masks.  All arithmetic is bit-identical to the
oracle up to IEEE rounding order; residual differences come from backend
cos/sin/atan2 ULPs in the per-keypoint affine and FMA contraction of the
f32 lerps (the same class the reference's own CPU-vs-GPU tests budget at
2e-5/1e-4 nonzero bytes).

Alignment rules honored: window row starts 8-aligned, column starts
128-aligned (Mosaic DMA slices); output blocks are (KPB, D) with D equal to
the array's minor dim; per-keypoint rows are stored at dynamic sublane
offsets.  Window geometry guarantees >= 31px margin around the keypoint —
enough for BAD boxes, the HashSIFT patch and the IC disc at detect-sized
keypoints (size=31, scale<=1); callers fall back to the XLA gather path above
`max_window_size`.
"""
from __future__ import annotations

import functools
import os
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.params import load_bad_params
from ..utils import semantics as S

WIN_H = 96
WIN_W = 256
DEG2RAD = np.float32(0.017453292519943295)
MARGIN = np.float32(1.75)

# Worst-case support radii per unit affine scale s (= scale_arg * size / 32):
#   BAD: max over the learned boxes of |rot(center - 16)| + boxRadius is
#        22.2133 (both p256 and p512 assets); transformed corner offsets are
#        <= s*22.2133 + 0.5 (CV_ROUNDNUM) + s*br rounding 0.5 + 1 (the +1 on
#        the exclusive corner) — bounded by s*22.2133 + 2.
#   warp: patch corners are 16*sqrt(2) = 22.63 from the center, +1 for the
#        right/bottom bilinear pixel.
_BAD_SUPPORT = 22.2133
_WARP_SUPPORT = 22.63

# Base geometry gate: affine scale s <= _S_BASE reproduces the round-2
# fixed 96x256 window / 64x64 compacted-window geometry.
_S_BASE = 0.9446


class WinGeom(NamedTuple):
    """Static per-keypoint window geometry (all ints, trace-time).

    The DMA window is (win_h, win_w); row origins quantize to 32 so the
    keypoint row offset lies in [half, half + 32); column origins quantize to
    128 with offset in [c0, c0 + 128).  The kernel rolls the window so the
    keypoint sits at (half, half) of a (2*half, 2*half) compacted window that
    contains the whole descriptor support."""
    win_h: int
    win_w: int
    half: int

    @property
    def c0(self) -> int:
        return self.win_w - 128 - self.half


def _make_geom(support: float, s_max: float) -> WinGeom:
    R = int(np.ceil(support * s_max + 2.0))
    half = max(32, -(-R // 8) * 8)
    win_h = 2 * half + 32
    win_w = 128 * (-(-(2 * half + 128) // 128))
    return WinGeom(win_h, win_w, half)


def bad_geom(s_max: float) -> WinGeom:
    """Window geometry covering BAD boxes of keypoints with affine scale
    <= s_max.  bad_geom(_S_BASE) == the round-2 (96, 256, 32) geometry."""
    return _make_geom(_BAD_SUPPORT, s_max)


def warp_geom(s_max: float) -> WinGeom:
    """Window geometry covering the 32x32 patch warp at affine scale
    <= s_max."""
    return _make_geom(_WARP_SUPPORT, s_max)


_BASE_GEOM = bad_geom(_S_BASE)
assert _BASE_GEOM == WinGeom(96, 256, 32), _BASE_GEOM


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def plan_windows(x: jax.Array, y: jax.Array, img_h: int, img_w: int,
                 geom: WinGeom = _BASE_GEOM):
    """Aligned window origins per keypoint + padded image dims.

    Row origins quantize to 32 (not the round-1 8): the keypoint row offset
    lands in [half, half+32) of a (2*half+32)-row window, and 4x fewer
    distinct windows exist at high keypoint density — one window DMA serves
    ~4x more keypoints."""
    pad_h = max(-(-img_h // 8) * 8, geom.win_h)
    pad_w = max(-(-img_w // 128) * 128, geom.win_w)
    xi = jnp.floor(x).astype(jnp.int32)
    yi = jnp.floor(y).astype(jnp.int32)
    base_y = jnp.clip(((yi - geom.half) // 32) * 32, 0, pad_h - geom.win_h)
    base_x = jnp.clip(((xi - geom.c0) // 128) * 128, 0, pad_w - geom.win_w)
    return base_y, base_x, pad_h, pad_w


def pad_image(image: jax.Array, pad_h: int, pad_w: int) -> jax.Array:
    h, w = image.shape
    return jnp.pad(image, ((0, pad_h - h), (0, pad_w - w)))


def max_window_size(scale: float) -> float:
    """Largest keypoint `size` the BASE window geometry supports (the
    single-geometry fast path; larger sizes take the octave-bucketed
    geometries up to `max_bucketed_size`)."""
    return 29.0 * 32.0 / (30.7 * max(scale, 1e-6))


# Octave buckets: bucket k covers affine scale s in (_S_BASE*1.2^(k-1),
# _S_BASE*1.2^k]; the ceiling keeps compile count and window DMA bounded
# (beyond it, the always-correct XLA gather path).
_S_CAP = 6.0


def max_bucketed_size(scale: float) -> float:
    """Largest keypoint `size` the octave-bucketed window path supports."""
    return _S_CAP * 32.0 / max(scale, 1e-6)


def bucket_scale(s: float) -> float:
    """Round an affine-scale bound up to its bucket's s_max (stable static
    values -> bounded number of jit traces / kernel geometries)."""
    if s <= _S_BASE:
        return _S_BASE
    # the 1e-3 slack absorbs the 4-decimal rounding of a previous
    # bucket_scale (idempotence) — a bound understated by <= 0.1% costs
    # < 0.1 px of the geometry's 2 px margin
    k = int(np.ceil(np.log(s / _S_BASE) / np.log(1.2) - 1e-3))
    return round(_S_BASE * 1.2 ** k, 4)


def _pad_n(arrs, kpb):
    n = arrs[0].shape[0]
    np_ = -(-n // kpb) * kpb
    return [jnp.pad(a, (0, np_ - n)) for a in arrs], np_, n


def _affine_scalars(kx, ky, ksize, kang, scale):
    """getAffineTransform scalars (cuda_hash_sift.cu:136-155); s folded in."""
    s, cost, sint = _affine_trig(ksize, kang, scale)
    m02 = (-cost + sint) * np.float32(16.0) + kx
    m12 = (-sint - cost) * np.float32(16.0) + ky
    return s, cost, sint, m02, m12


def _affine_trig(ksize, kang, scale):
    """XLA-side half of _affine_scalars: s, cos, sin only.

    m02/m12 must NOT be precomputed XLA-side when cost/sint also ride the
    kp block: XLA may re-evaluate cos in different fusions with 1-ulp
    differences, and an m02 inconsistent with the block's cost breaks the
    exact u=0 cancellation at the keypoint-anchored patch pixel (caught by
    the warp fuzz test at a keypoint on the image corner).  The kernels
    rebuild m02/m12 in-kernel from the block values (two mul/adds, no
    trig), which restores the cancellation by construction."""
    s = np.float32(scale) * ksize / np.float32(32.0)
    theta = kang * DEG2RAD
    has = kang >= 0
    cost = jnp.where(has, jnp.cos(theta), np.float32(1.0)) * s
    sint = jnp.where(has, jnp.sin(theta), np.float32(0.0)) * s
    return s, cost, sint


def _affine_block(kx, ky, ksize, kang, scale):
    """(N, 8) f32 kp block [x, y, cost, sint, s, s, s, s] (lanes 5-7 pad)."""
    s, cost, sint = _affine_trig(ksize, kang, scale)
    return jnp.stack([kx, ky, cost, sint, s, s, s, s], axis=1)


def _affine_from_block(kp_ref, k):
    """Per-keypoint scalars from the kp block; m02/m12 rebuilt in-kernel so
    they are exactly consistent with the block's cost/sint (see
    _affine_trig)."""
    kx = kp_ref[k, 0]
    ky = kp_ref[k, 1]
    cost = kp_ref[k, 2]
    sint = kp_ref[k, 3]
    s = kp_ref[k, 4]
    m02 = (-cost + sint) * np.float32(16.0) + kx
    m12 = (-sint - cost) * np.float32(16.0) + ky
    return kx, ky, s, cost, sint, m02, m12


# ---------------------------------------------------------------------------
# BAD descriptor kernel
# ---------------------------------------------------------------------------

_BAD_KPB = 32

# Default BAD kernel formulation: "pair" — the on-chip A/B
# (tools/ab_bad_formulation.py, BENCH_DETAIL bad_formulation) measured
# roll/noroll/pair = 25.7/22.7/19.3 ms at 40k/256b (28.5/26.8/23.9 at
# 512b), all three bit-identical on chip incl. wide buckets.  Two
# keypoints per full-tile box matmul beats per-keypoint quarter tiles.
# EFF_TPU_BAD_FORMULATION overrides (read at import, so full pipelines —
# detect_and_compute included — can be A/B'd per process without code
# edits).
_BAD_FORMULATION = os.environ.get("EFF_TPU_BAD_FORMULATION", "pair")


def _bad_bits_row(win8, rows_t, cols_t, pack, par4, scal, oy_l, ox_l, *,
                  wide_boxes, img_w, img_h):
    """Shared per-keypoint BAD bit pipeline (both kernel formulations).

    `win8` is the -128-biased int8 window in local coordinates with origin
    (oy_l, ox_l); `rows_t`/`cols_t` are int32 iotas whose leading dims match
    win8's (rows, cols) and whose lane width is 2*nbits (both boxes ride one
    MXU pass).  Computes transformed box corners (transformBoxPairParams,
    cuda_bad.cu:149-157), indicator box sums on the int8 MXU, the threshold
    compare with the exact division-free border branch (+ 12-bit-truncated
    exact products for wide boxes), the border select, and the MSB-first
    byte pack.  Returns the (1, nbits//8) f32 byte row.

    `par4` rows are LANE-CONCATENATED (1, 2*nbits) box-pair params
    (bxc = x1|x2, byc = y1|y2, brc = r|r, thv) built host-side: both box
    corners of every pair ride ONE transform + ONE box-sum matmul per
    keypoint — half the per-keypoint op issues, and no in-kernel
    concatenate (Mosaic rejects lane concats whose inputs carry different
    sublane offsets, as par-row slices do)."""
    bxc, byc, brc, thv = par4
    kx, ky, s, cost, sint, m02, m12 = scal

    def rnd(v):
        return jnp.trunc(v + np.float32(0.5)).astype(jnp.int32)

    cxb = rnd(cost * bxc - sint * byc + m02) - ox_l     # (1, 2*nbits)
    cyb = rnd(sint * bxc + cost * byc + m12) - oy_l
    tbr2 = rnd(s * brc)
    tbr = jax.lax.slice(tbr2, (0, 0), (1, brc.shape[1] // 2))

    # clamped integral corners; for interior keypoints the clamps never
    # bind (1.75 margin), so these sums serve both paths exactly
    lo_y = -oy_l
    hi_y = jnp.int32(img_h) - oy_l
    lo_x = -ox_l
    hi_x = jnp.int32(img_w) - ox_l

    iy1 = jnp.clip(cyb - tbr2, lo_y, hi_y - 1)
    iy2 = jnp.clip(cyb + tbr2 + 1, lo_y + 1, hi_y)
    ix1 = jnp.clip(cxb - tbr2, lo_x, hi_x - 1)
    ix2 = jnp.clip(cxb + tbr2 + 1, lo_x + 1, hi_x)
    # range indicator in ONE unsigned compare per (dim, bit) block
    # instead of two compares + AND (the indicator builds are a VPU
    # floor): t in [a, b) <=> u32(t - a) < u32(b - a)
    cc = ((cols_t - ix1).astype(jnp.uint32)
          < (ix2 - ix1).astype(jnp.uint32))
    rr = ((rows_t - iy1).astype(jnp.uint32)
          < (iy2 - iy1).astype(jnp.uint32))
    # int8 MXU path (2x the bf16 rate): pixels re-biased to [-128, 127];
    # the -128 bias contributes exactly -128*area to each box sum (every
    # selected cell is a real image pixel inside the window), undone
    # here.  All values stay exact int32: box sums <= 255*side^2 <=
    # 255*(2*rnd(7*s)+1)^2 (< 2^21 even at the s=6 bucket cap).
    z = jnp.dot(win8, cc.astype(jnp.int8),
                preferred_element_type=jnp.int32)
    area2 = (iy2 - iy1) * (ix2 - ix1)                   # (1, 2*nbits)
    ssum = (rr.astype(jnp.int32) * z).sum(axis=0, keepdims=True) \
        + 128 * area2                                   # exact int32
    return _bad_compare_pack(ssum, area2, tbr, thv, pack,
                             (kx, ky, s), wide_boxes=wide_boxes,
                             img_w=img_w, img_h=img_h)


def _bad_compare_pack(ssum, area2, tbr, thv, pack, kxys, *,
                      wide_boxes, img_w, img_h):
    """Threshold compare + border select + MSB-first byte pack from the
    both-boxes-concatenated (1, 2*nbits) box sums/areas (exact int32).
    Shared by all BAD kernel formulations."""
    kx, ky, s = kxys
    nb = tbr.shape[1]                                   # nbits
    s1i = jax.lax.slice(ssum, (0, 0), (1, nb))
    s2i = jax.lax.slice(ssum, (0, nb), (1, 2 * nb))
    a1i = jax.lax.slice(area2, (0, 0), (1, nb))
    a2i = jax.lax.slice(area2, (0, nb), (1, 2 * nb))
    side = (1 + 2 * tbr).astype(jnp.float32)
    bit_fast = ((s1i - s2i).astype(jnp.float32)
                <= thv * (side * side))
    # division-free border compare in exact int32 (TPU f32 division is a
    # reciprocal approximation; see cpu.descriptors.bad_descriptors)
    lhs = (s1i * a2i - s2i * a1i).astype(jnp.float32)
    bit_border = lhs <= thv * (a1i * a2i).astype(jnp.float32)
    if wide_boxes:
        # large-box buckets (s >~ 3.2): the int32 cross products can
        # exceed 2^31; switch per-bit to 12-significant-bit truncated f32
        # operands whose products are exact — same gate and formulation
        # as ops.bad.bad_descriptors (bit-identical across paths)
        a1f = a1i.astype(jnp.float32)
        a2f = a2i.astype(jnp.float32)

        def t12(v):
            iv = pltpu.bitcast(v, jnp.int32)
            return pltpu.bitcast(iv & jnp.int32(~0xFFF), jnp.float32)

        s1t = t12(s1i.astype(jnp.float32))
        s2t = t12(s2i.astype(jnp.float32))
        a1t = t12(a1f)
        a2t = t12(a2f)
        bit_border_t = (s1t * a2t - s2t * a1t) <= thv * (a1t * a2t)
        safe = a1f * a2f < np.float32(1 << 22)
        # Mosaic cannot select between i1 vectors; select on f32
        bit_border = jnp.where(safe, bit_border.astype(jnp.float32),
                               bit_border_t.astype(jnp.float32))

    # bw == 32 * (scale*ksize/64) * MARGIN bit-for-bit: s = fl(scale*ksize)
    # / 32 exactly, 16*MARGIN = 28 exact, so both forms round 28*s once
    bw = (np.float32(16.0) * MARGIN) * s
    in_border = ((kx < bw) | (kx + bw >= np.float32(img_w)) |
                 (ky < bw) | (ky + bw >= np.float32(img_h)))

    # Mosaic cannot select between i1 vectors; select on f32
    bits = jnp.where(in_border, bit_border.astype(jnp.float32),
                     bit_fast.astype(jnp.float32))
    return jnp.dot(bits, pack, preferred_element_type=jnp.float32)


def _pack_mat(nbits):
    """(nbits, nbits//8) MSB-first bit->byte packing matrix."""
    pr = jax.lax.broadcasted_iota(jnp.int32, (nbits, nbits // 8), 0)
    pc = jax.lax.broadcasted_iota(jnp.int32, (nbits, nbits // 8), 1)
    return jnp.where(pr // 8 == pc,
                     jnp.exp2((7 - pr % 8).astype(jnp.float32)), 0.0)


def _bad_kernel(by_ref, bx_ref, meta_ref, nstart_ref,
                kp_ref, par_ref, img_hbm, out_ref, win_ref, sem, *,
                nbits, scale_factor, img_w, img_h,
                win_h=96, win_w=256, half=32, wide_boxes=False):
    # SMEM budget is 1MB: only the DMA-addressing arrays ride scalar
    # prefetch (by, bx, meta = slot|start<<1, nstart); keypoint params come
    # in as a per-program VMEM block.
    i = pl.program_id(0)
    par = par_ref[...]                    # (8, 2*nbits): x1|x2 y1|y2 r|r th
    bxc = par[0:1, :]
    byc = par[1:2, :]
    brc = par[2:3, :]
    thv = jax.lax.slice(par, (3, 0), (4, nbits))

    cw = 2 * half                         # compacted window: keypoint rotated
    ch = 2 * half                         # to its center; every box corner,
                                          # image-bound clamps included, stays
                                          # within +-half (see bad_geom)
    rows_t = jax.lax.broadcasted_iota(jnp.int32, (ch, 2 * nbits), 0)
    cols_t = jax.lax.broadcasted_iota(jnp.int32, (cw, 2 * nbits), 0)
    pack = _pack_mat(nbits)

    def get_dma(slot, idx):
        return pltpu.make_async_copy(
            img_hbm.at[pl.ds(pl.multiple_of(by_ref[idx], 8), win_h),
                       pl.ds(pl.multiple_of(bx_ref[idx], 128), win_w)],
            win_ref.at[slot], sem.at[slot])

    # Keypoints arrive sorted by window origin: ONE DMA per DISTINCT window
    # group (windows persist in the scratch across programs), double-buffered
    # (each group's start prefetches the next group's window, wherever it
    # lives in the grid).
    @pl.when(i == 0)
    def _():
        get_dma(meta_ref[0] & 1, 0).start()

    def body(k, carry):
        idx = i * _BAD_KPB + k
        meta = meta_ref[idx]
        slot = meta & 1

        @pl.when((meta >> 1) == 1)
        def _():
            nxt = nstart_ref[idx]

            @pl.when(nxt < nstart_ref.shape[0])
            def _():
                get_dma(1 - slot, nxt).start()

            get_dma(slot, idx).wait()

        kx = kp_ref[k, 0]
        ky = kp_ref[k, 1]
        ksize = kp_ref[k, 2]
        kang = kp_ref[k, 3]
        s, cost, sint, m02, m12 = _affine_scalars(kx, ky, ksize, kang,
                                                  scale_factor)

        oy = by_ref[idx]
        ox = bx_ref[idx]
        # window compaction (see _warp_kernel): rotate the keypoint to
        # (row half, col half) and keep (2*half)x(2*half) — every box corner,
        # image-bound clamps included, stays within +-half of the keypoint
        # (clamping pulls corners toward the keypoint), halving the cc factor
        # build and the matmul contraction vs the round-1 full-width slab
        shift_x = jnp.floor(kx).astype(jnp.int32) - ox - half
        shift_y = jnp.floor(ky).astype(jnp.int32) - oy - half
        win_rot = pltpu.roll(win_ref[slot].astype(jnp.int32),
                             (win_w - shift_x) % win_w, 1)
        win_rot = pltpu.roll(win_rot, (win_h - shift_y) % win_h, 0)
        win8 = (jax.lax.slice(win_rot, (0, 0), (ch, cw))
                - 128).astype(jnp.int8)

        bytes_row = _bad_bits_row(
            win8, rows_t, cols_t, pack, (bxc, byc, brc, thv),
            (kx, ky, s, cost, sint, m02, m12),
            oy + shift_y, ox + shift_x,
            wide_boxes=wide_boxes, img_w=img_w, img_h=img_h)
        out_ref[pl.ds(k, 1), :] = bytes_row
        return carry

    jax.lax.fori_loop(0, _BAD_KPB, body, 0)


def _bad_kernel_noroll(by_ref, bx_ref, meta_ref, nstart_ref,
                       kp_ref, par_ref, img_hbm, out_ref, win_ref, win8_ref,
                       sem, *, nbits, img_w, img_h,
                       win_h=96, win_w=256, half=32, wide_boxes=False):
    """BAD window kernel, roll-free formulation (round-4 A/B vs _bad_kernel).

    The round-3 stage profile attributed ~90% of the kernel to per-keypoint
    fixed work (window rolls, bias/cast, affine scalars, MXU issue).  This
    variant removes all three VPU/scalar items:
      - the (win_h, win_w) u8->i32 cast + re-bias happens ONCE per window
        DMA into an int8 scratch (win8_ref), not once per keypoint;
      - the two per-keypoint pltpu.rolls are replaced by ONE exact one-hot
        column-compaction matmul (win8 @ P selects the 2*half columns around
        the keypoint — the _warp_kernel trick) and the row shift is folded
        into the rr indicator bounds for free (indicator bound arithmetic
        costs the same at any offset), at the price of rr/z heights win_h
        instead of 2*half;
      - the affine scalars (cos/sin/m02/m12/s) arrive precomputed per
        keypoint in the kp block (XLA-side _affine_scalars), so the scalar
        core runs no transcendentals.
    Exactness contract is unchanged: one-hot factors x biased int8 pixels
    give exact int32 box sums (+128*area undoes the bias); trig moves from
    the in-kernel scalar core to XLA — the same backend-ULP class the parity
    budget already covers (module docstring)."""
    i = pl.program_id(0)
    par = par_ref[...]                    # (8, 2*nbits): x1|x2 y1|y2 r|r th
    bxc = par[0:1, :]
    byc = par[1:2, :]
    brc = par[2:3, :]
    thv = jax.lax.slice(par, (3, 0), (4, nbits))

    cw = 2 * half
    rows_t = jax.lax.broadcasted_iota(jnp.int32, (win_h, 2 * nbits), 0)
    cols_t = jax.lax.broadcasted_iota(jnp.int32, (cw, 2 * nbits), 0)
    pack = _pack_mat(nbits)
    csel = jax.lax.broadcasted_iota(jnp.int32, (win_w, cw), 0)
    jsel = jax.lax.broadcasted_iota(jnp.int32, (win_w, cw), 1)

    def get_dma(slot, idx):
        return pltpu.make_async_copy(
            img_hbm.at[pl.ds(pl.multiple_of(by_ref[idx], 8), win_h),
                       pl.ds(pl.multiple_of(bx_ref[idx], 128), win_w)],
            win_ref.at[slot], sem.at[slot])

    @pl.when(i == 0)
    def _():
        get_dma(meta_ref[0] & 1, 0).start()

    def body(k, carry):
        idx = i * _BAD_KPB + k
        meta = meta_ref[idx]
        slot = meta & 1

        @pl.when((meta >> 1) == 1)
        def _():
            nxt = nstart_ref[idx]

            @pl.when(nxt < nstart_ref.shape[0])
            def _():
                get_dma(1 - slot, nxt).start()

            get_dma(slot, idx).wait()
            # bias/cast once per window DMA, shared by all its keypoints
            win8_ref[slot] = (win_ref[slot].astype(jnp.int32)
                              - 128).astype(jnp.int8)

        kx, ky, s, cost, sint, m02, m12 = _affine_from_block(kp_ref, k)

        oy = by_ref[idx]
        ox = bx_ref[idx]
        # one-hot column compaction around the keypoint (clamped at image
        # edges; box corners stay inside [off, off+cw) — clamps pull them
        # toward the in-image keypoint, see the geometry notes in bad_geom).
        # Rows are NOT compacted: the row origin folds into the rr indicator
        # bounds for free.
        xloc = jnp.floor(kx).astype(jnp.int32) - ox
        off = jnp.clip(xloc - half, 0, win_w - cw)
        Pm = (csel == jsel + off).astype(jnp.int8)
        win_c = jnp.dot(win8_ref[slot], Pm,
                        preferred_element_type=jnp.int32)
        win_c8 = win_c.astype(jnp.int8)               # biased pixels, exact

        bytes_row = _bad_bits_row(
            win_c8, rows_t, cols_t, pack, (bxc, byc, brc, thv),
            (kx, ky, s, cost, sint, m02, m12), oy, ox + off,
            wide_boxes=wide_boxes, img_w=img_w, img_h=img_h)
        out_ref[pl.ds(k, 1), :] = bytes_row
        return carry

    jax.lax.fori_loop(0, _BAD_KPB, body, 0)


def _bad_kernel_pair(by_ref, bx_ref, meta_ref, nstart_ref,
                     kp_ref, par_ref, img_hbm, out_ref, win_ref,
                     sem, *, nbits, img_w, img_h,
                     win_h=96, win_w=256, half=32, wide_boxes=False):
    """BAD window kernel, keypoint-PAIRED box matmul (formulation="pair").

    The "roll" formulation's per-keypoint box matmul LHS is
    (2*half, 2*half) = (64, 64) at the base bucket — a quarter of an MXU
    tile.  Here two keypoints' rotated windows sit in the diagonal blocks
    of ONE (4*half, 4*half) int8 LHS (the _warp_kernel pairing trick) and
    their indicator factors stack along the contraction axis with
    per-half bounds, so each PAIR issues a single
    (4*half, 4*half)@(4*half, 2*nbits) box matmul — the full systolic
    array every pass, half the per-keypoint MXU issues of "roll" on top
    of the both-boxes lane concat.  Affine scalars arrive precomputed in
    the kp block (XLA-side trig, as in "noroll").  Box sums stay the
    exact int8 x {0,1} integer products of the unpaired kernels: the
    zero off-diagonal blocks contribute exact int32 zeros."""
    i = pl.program_id(0)
    par = par_ref[...]                    # (8, 2*nbits): x1|x2 y1|y2 r|r th
    bxc = par[0:1, :]
    byc = par[1:2, :]
    brc = par[2:3, :]
    thv = jax.lax.slice(par, (3, 0), (4, nbits))

    cw = 2 * half
    ch = 2 * half
    # joint iotas spanning both halves: *loc is the within-half coordinate,
    # *hi selects which keypoint's bounds apply on that row
    rows2 = jax.lax.broadcasted_iota(jnp.int32, (2 * ch, 2 * nbits), 0)
    rhi = rows2 >= ch
    rloc = rows2 - jnp.where(rhi, ch, 0)
    kons2 = jax.lax.broadcasted_iota(jnp.int32, (2 * cw, 2 * nbits), 0)
    khi = kons2 >= cw
    kloc = kons2 - jnp.where(khi, cw, 0)
    pack = _pack_mat(nbits)

    def get_dma(slot, idx):
        return pltpu.make_async_copy(
            img_hbm.at[pl.ds(pl.multiple_of(by_ref[idx], 8), win_h),
                       pl.ds(pl.multiple_of(bx_ref[idx], 128), win_w)],
            win_ref.at[slot], sem.at[slot])

    @pl.when(i == 0)
    def _():
        get_dma(meta_ref[0] & 1, 0).start()

    def rnd(v):
        return jnp.trunc(v + np.float32(0.5)).astype(jnp.int32)

    def half_geom(k):
        """DMA bookkeeping + rotated (ch, cw) int8 window + this keypoint's
        concatenated both-box clip bounds/areas (all (1, 2*nbits))."""
        idx = i * _BAD_KPB + k
        meta = meta_ref[idx]
        slot = meta & 1

        @pl.when((meta >> 1) == 1)
        def _():
            nxt = nstart_ref[idx]

            @pl.when(nxt < nstart_ref.shape[0])
            def _():
                get_dma(1 - slot, nxt).start()

            get_dma(slot, idx).wait()

        kx, ky, s, cost, sint, m02, m12 = _affine_from_block(kp_ref, k)
        oy = by_ref[idx]
        ox = bx_ref[idx]
        shift_x = jnp.floor(kx).astype(jnp.int32) - ox - half
        shift_y = jnp.floor(ky).astype(jnp.int32) - oy - half
        win_rot = pltpu.roll(win_ref[slot].astype(jnp.int32),
                             (win_w - shift_x) % win_w, 1)
        win_rot = pltpu.roll(win_rot, (win_h - shift_y) % win_h, 0)
        win8 = (jax.lax.slice(win_rot, (0, 0), (ch, cw))
                - 128).astype(jnp.int8)

        ox_l = ox + shift_x
        oy_l = oy + shift_y
        cxb = rnd(cost * bxc - sint * byc + m02) - ox_l  # (1, 2*nbits)
        cyb = rnd(sint * bxc + cost * byc + m12) - oy_l
        tbr2 = rnd(s * brc)
        tbr = jax.lax.slice(tbr2, (0, 0), (1, nbits))
        lo_y = -oy_l
        hi_y = jnp.int32(img_h) - oy_l
        lo_x = -ox_l
        hi_x = jnp.int32(img_w) - ox_l
        iy1 = jnp.clip(cyb - tbr2, lo_y, hi_y - 1)
        iy2 = jnp.clip(cyb + tbr2 + 1, lo_y + 1, hi_y)
        ix1 = jnp.clip(cxb - tbr2, lo_x, hi_x - 1)
        ix2 = jnp.clip(cxb + tbr2 + 1, lo_x + 1, hi_x)
        area2 = (iy2 - iy1) * (ix2 - ix1)
        return win8, iy1, iy2, ix1, ix2, area2, tbr, (kx, ky, s)

    def body(p, carry):
        k0 = 2 * p
        w0, iy1_0, iy2_0, ix1_0, ix2_0, area_0, tbr_0, kxys_0 = half_geom(k0)
        w1, iy1_1, iy2_1, ix1_1, ix2_1, area_1, tbr_1, kxys_1 = \
            half_geom(k0 + 1)
        # block-diagonal LHS built as a register value via concatenation —
        # the Mosaic-proven _warp_kernel pattern (bf16 there, int8 here)
        z8 = jnp.zeros((ch, cw), jnp.int8)
        lhs = jnp.concatenate(
            [jnp.concatenate([w0, z8], axis=1),
             jnp.concatenate([z8, w1], axis=1)], axis=0)  # (2*ch, 2*cw)

        # joint indicators with per-half bounds (the (1, 2*nbits) bound rows
        # broadcast against the joint masks); same unsigned-range compare as
        # the unpaired kernels
        cc = ((kloc - jnp.where(khi, ix1_1, ix1_0)).astype(jnp.uint32)
              < jnp.where(khi, ix2_1 - ix1_1,
                          ix2_0 - ix1_0).astype(jnp.uint32))
        rr = ((rloc - jnp.where(rhi, iy1_1, iy1_0)).astype(jnp.uint32)
              < jnp.where(rhi, iy2_1 - iy1_1,
                          iy2_0 - iy1_0).astype(jnp.uint32))
        z = jnp.dot(lhs, cc.astype(jnp.int8),
                    preferred_element_type=jnp.int32)   # (2*ch, 2*nbits)
        prod = rr.astype(jnp.int32) * z
        ssum0 = prod[0:ch].sum(axis=0, keepdims=True) + 128 * area_0
        ssum1 = prod[ch:2 * ch].sum(axis=0, keepdims=True) + 128 * area_1
        b0 = _bad_compare_pack(ssum0, area_0, tbr_0, thv, pack, kxys_0,
                               wide_boxes=wide_boxes,
                               img_w=img_w, img_h=img_h)
        b1 = _bad_compare_pack(ssum1, area_1, tbr_1, thv, pack, kxys_1,
                               wide_boxes=wide_boxes,
                               img_w=img_w, img_h=img_h)
        out_ref[pl.ds(k0, 1), :] = b0
        out_ref[pl.ds(k0 + 1, 1), :] = b1
        return carry

    jax.lax.fori_loop(0, _BAD_KPB // 2, body, 0)


def _window_key(by, bx, pad_w):
    """Collision-free sort/group key for (row, col) window origins: bx is a
    multiple of 128, so index the 128-wide column slots — works for any image
    width (no 2^15 packing limit)."""
    nbx = jnp.int32(pad_w // 128)
    return by.astype(jnp.int32) * nbx + bx.astype(jnp.int32) // 128


def _window_groups(key, kpb):
    """Per-keypoint window-group bookkeeping for window-sorted keypoints.

    `key` is the _window_key of each (padded, sorted) keypoint.  Returns
    (grp, is_start, next_start): `grp` is the 0-based group id (its
    parity selects the DMA buffer slot), `is_start` marks GROUP starts only
    (plus index 0) — windows stay resident in the double-buffer scratch
    across program boundaries, so exactly one DMA is issued per distinct
    window (round 1 re-DMA'd at every program start too: ~#programs extra
    window fetches at high keypoint counts).  `next_start` is the index of
    the following start (cross-program prefetch target; past-the-end when
    none).  Must be called on the final padded arrays so every DMA start
    has a matching wait."""
    del kpb  # starts no longer depend on the program blocking
    n = key.shape[0]
    changed = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), (key[1:] != key[:-1]).astype(jnp.int32)])
    is_start = (changed == 1) | (jnp.arange(n, dtype=jnp.int32) == 0)
    return _meta_parts_from_starts(is_start)


def _meta_parts_from_starts(is_start):
    """(grp, is_start, next_start) for an arbitrary DMA-start mask (index 0
    must be a start).  grp parity alternates per start (double-buffer slot);
    next_start is the cross-program prefetch target (past-the-end if none)."""
    n = is_start.shape[0]
    grp = (jnp.cumsum(is_start.astype(jnp.int32)) - 1).astype(jnp.int32)
    idxs = jnp.where(is_start, jnp.arange(n, dtype=jnp.int32), jnp.int32(n))
    suffix_min = jnp.flip(jax.lax.cummin(jnp.flip(idxs)))
    next_start = jnp.concatenate(
        [suffix_min[1:], jnp.full(1, n, jnp.int32)])
    return grp, is_start.astype(jnp.int32), next_start


_MAX_KP_CHUNK = 16384   # SMEM holds the per-keypoint addressing arrays


def _chunked(fn, n_args, chunk=_MAX_KP_CHUNK):
    """Split per-keypoint array args into chunks (SMEM holds the scalar
    prefetch arrays; the reference's own tests use 100k keypoints, which
    would not fit in one shot)."""
    def wrapper(image, *args, **kw):
        arrs = args[:n_args]
        n = arrs[0].shape[0]
        if n <= chunk:
            return fn(image, *args, **kw)
        outs = [fn(image, *(a[i:i + chunk] for a in arrs),
                   *args[n_args:], **kw)
                for i in range(0, n, chunk)]
        return jnp.concatenate(outs, axis=0)
    return wrapper


@functools.partial(jax.jit, static_argnums=(6, 7, 8, 9),
                   static_argnames=("s_max", "dma_mode", "formulation"))
def _bad_descriptors_windows_impl(image, x, y, size, angle, valid,
                                  nbits: int, scale_factor: float,
                                  s_max: float = _S_BASE,
                                  dma_mode: str = "group",
                                  formulation: str = _BAD_FORMULATION):
    """(N, nbits//8) uint8 BAD descriptors via the window kernel; exact.

    `s_max` (static): upper bound on the affine scale scale_factor*size/32 of
    the keypoints — selects the bucket window geometry (see bad_geom).
    `dma_mode` (static): "group" = one DMA per distinct window, persisting
    across programs (round-2 default); "program" additionally re-DMAs at
    every program start (the round-1 behavior, kept for same-session A/B —
    see BENCH_DETAIL dma_ab).
    `formulation` (static): "noroll" (round-4 — per-DMA cached int8 window,
    one-hot column compaction, XLA-side affine scalars; see
    _bad_kernel_noroll), "roll" (round-2/3 per-keypoint window rotation), or
    "pair" (round-5 — roll base with two keypoints block-diagonal in one
    full-tile box matmul; see _bad_kernel_pair).  Default is
    _BAD_FORMULATION; the on-chip A/B decides it (see BENCH_DETAIL
    bad_formulation)."""
    if formulation not in ("noroll", "roll", "pair"):
        raise ValueError(f"unknown formulation: {formulation!r}")
    if dma_mode not in ("group", "program"):
        raise ValueError(f"unknown dma_mode: {dma_mode!r}")
    h, w = image.shape
    geom = bad_geom(s_max)
    base_y, base_x, pad_h, pad_w = plan_windows(x, y, h, w, geom)
    padded = pad_image(image, pad_h, pad_w)

    order = jnp.argsort(_window_key(base_y, base_x, pad_w))
    srt = [jnp.take(a, order) for a in (base_y, base_x, x, y, size, angle)]
    (by, bx, kx, ky, ks, ka), n_pad, n = _pad_n(srt, _BAD_KPB)
    # group bookkeeping on the PADDED arrays so every started DMA is awaited
    # (the zero-padded tail forms its own final group)
    if dma_mode == "program":
        key = _window_key(by, bx, pad_w)
        changed = jnp.concatenate(
            [jnp.zeros(1, jnp.int32),
             (key[1:] != key[:-1]).astype(jnp.int32)])
        idx = jnp.arange(n_pad, dtype=jnp.int32)
        is_start = (changed == 1) | (idx % _BAD_KPB == 0)
        grp, start, nstart = _meta_parts_from_starts(is_start)
    else:
        grp, start, nstart = _window_groups(
            _window_key(by, bx, pad_w), _BAD_KPB)
    meta = ((grp & 1) | (start << 1)).astype(jnp.int32)
    if formulation in ("noroll", "pair"):
        # trig batched out of the in-kernel scalar core
        kp = _affine_block(kx, ky, ks, ka, scale_factor)
    else:
        kp = jnp.stack([kx, ky, ks, ka], axis=1)

    boxes, th = load_bad_params(nbits)
    # lane-concatenated box-pair rows (see _bad_bits_row): both corners of
    # every pair ride one in-kernel transform/matmul, no in-kernel concat
    par = np.zeros((8, 2 * nbits), np.float32)
    par[0, :nbits] = boxes[:, 0]
    par[0, nbits:] = boxes[:, 1]
    par[1, :nbits] = boxes[:, 2]
    par[1, nbits:] = boxes[:, 3]
    par[2, :nbits] = boxes[:, 4]
    par[2, nbits:] = boxes[:, 4]
    par[3, :nbits] = th

    # wide_boxes: the int32 cross products of the border compare can exceed
    # 2^31 once side^4 > 2^22 (cf. ops.bad) — only reachable at s >~ 3.2
    side_max = 2 * int(round(7.0 * s_max)) + 1
    wide = side_max ** 4 > (1 << 22)
    scratch = [pltpu.VMEM((2, geom.win_h, geom.win_w), jnp.uint8)]
    if formulation == "noroll":
        kernel = functools.partial(_bad_kernel_noroll, nbits=nbits,
                                   img_w=w, img_h=h,
                                   win_h=geom.win_h, win_w=geom.win_w,
                                   half=geom.half, wide_boxes=wide)
        kp_cols = 8
        scratch.append(pltpu.VMEM((2, geom.win_h, geom.win_w), jnp.int8))
    elif formulation == "pair":
        kernel = functools.partial(_bad_kernel_pair, nbits=nbits,
                                   img_w=w, img_h=h,
                                   win_h=geom.win_h, win_w=geom.win_w,
                                   half=geom.half, wide_boxes=wide)
        kp_cols = 8
    else:
        kernel = functools.partial(_bad_kernel, nbits=nbits,
                                   scale_factor=scale_factor,
                                   img_w=w, img_h=h,
                                   win_h=geom.win_h, win_w=geom.win_w,
                                   half=geom.half, wide_boxes=wide)
        kp_cols = 4
    scratch.append(pltpu.SemaphoreType.DMA((2,)))
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(n_pad // _BAD_KPB,),
            in_specs=[
                pl.BlockSpec((_BAD_KPB, kp_cols), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, 2 * nbits), lambda i, *_: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((_BAD_KPB, nbits // 8),
                                   lambda i, *_: (i, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=scratch,
        ),
        out_shape=jax.ShapeDtypeStruct((n_pad, nbits // 8), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(by, bx, meta, nstart, kp, jnp.asarray(par), padded)
    # un-sort back to caller order
    inv = jnp.zeros_like(order).at[order].set(
        jnp.arange(order.shape[0], dtype=order.dtype))
    desc = jnp.take(out[:n], inv, axis=0).astype(jnp.uint8)
    return jnp.where(valid[:, None], desc, 0)


# ---------------------------------------------------------------------------
# IC-angle kernel
# ---------------------------------------------------------------------------

_IC_KPB = 128
# IC only reads the 31px disc: row origins quantize to 32 (4x fewer distinct
# windows at high keypoint density), so a 64-row window (32 quantization
# slack + 31 disc rows) always covers it
_IC_WIN_H = 64


def _ic_kernel(by_ref, bx_ref, meta_ref, nstart_ref, kp_ref, umax_ref,
               img_hbm, out_ref, win_ref, winbf_ref, sem):
    i = pl.program_id(0)
    r = S.HALF_PATCH_SIZE
    npr = 2 * r + 1

    def get_dma(slot, idx):
        return pltpu.make_async_copy(
            img_hbm.at[pl.ds(pl.multiple_of(by_ref[idx], 8), _IC_WIN_H),
                       pl.ds(pl.multiple_of(bx_ref[idx], 128), WIN_W)],
            win_ref.at[slot], sem.at[slot])

    @pl.when(i == 0)
    def _():
        get_dma(meta_ref[0] & 1, 0).start()

    # keypoint-invariant builds hoisted out of the fori_loop body (loop
    # constants; XLA is not guaranteed to LICM full-tile iota
    # materializations out of a traced loop)
    rows_i = jax.lax.broadcasted_iota(jnp.int32, (npr, _IC_WIN_H), 1)
    p_i = jax.lax.broadcasted_iota(jnp.int32, (npr, _IC_WIN_H), 0)
    dyrow = p_i - r                                          # dy per row
    dyv = jax.lax.broadcasted_iota(jnp.int32, (npr, WIN_W), 0) - r
    cols = jax.lax.broadcasted_iota(jnp.int32, (npr, WIN_W), 1)
    umax = umax_ref[...][0:npr, 0:1]
    dyf_m = dyv.astype(jnp.float32)

    def body(k, carry):
        idx = i * _IC_KPB + k
        meta = meta_ref[idx]
        slot = meta & 1

        @pl.when((meta >> 1) == 1)
        def _():
            nxt = nstart_ref[idx]

            @pl.when(nxt < nstart_ref.shape[0])
            def _():
                get_dma(1 - slot, nxt).start()

            get_dma(slot, idx).wait()
            # cast once per window DMA (shared by all its keypoints; at
            # _IC_KPB=128 the former per-keypoint cast dominated the body)
            winbf_ref[slot] = win_ref[slot].astype(
                jnp.int32).astype(jnp.bfloat16)

        yloc = kp_ref[k, 0] - by_ref[idx]
        xloc = kp_ref[k, 1] - bx_ref[idx]
        # no column compaction: dxv = col - xloc is a broadcast compare
        # against a scalar, and the umax disc mask keeps |dxv| <= 15 so all
        # f32 moment sums stay exact integers — this avoids a per-keypoint
        # unaligned lane roll of the whole window
        onerow = (rows_i == dyrow + yloc).astype(jnp.bfloat16)

        t = jnp.dot(onerow, winbf_ref[slot],
                    preferred_element_type=jnp.float32)

        dxv = cols - xloc
        mask = (jnp.abs(dxv) <= umax).astype(jnp.float32)
        # one shared masked-t pass (round 5): t, mask, dxv are all exact
        # small integers, so (t*mask)*dxv == t*(dxv*mask) bit-for-bit while
        # saving one full (31, WIN_W) multiply per keypoint
        tm = t * mask
        m10 = (tm * dxv.astype(jnp.float32)).sum()
        m01 = (tm * dyf_m).sum()
        out_ref[pl.ds(k, 1), 0] = m01.reshape(1)
        out_ref[pl.ds(k, 1), 1] = m10.reshape(1)
        return carry

    jax.lax.fori_loop(0, _IC_KPB, body, 0)


@jax.jit
def _ic_angles_windows_impl(image, ys, xs, valid):
    """IC-angle via the window kernel; exact integer moments, f32 atan2."""
    h, w = image.shape
    # 32-quantized plan: base_y = ((y-15)//32)*32 puts the disc rows
    # [y-15, y+15] inside [base_y, base_y+63) for every interior keypoint
    pad_h = max(-(-h // 8) * 8, _IC_WIN_H)
    pad_w = max(-(-w // 128) * 128, WIN_W)
    base_y = jnp.clip(((ys.astype(jnp.int32) - S.HALF_PATCH_SIZE) // 32) * 32,
                      0, pad_h - _IC_WIN_H)
    base_x = jnp.clip(((xs.astype(jnp.int32) - 96) // 128) * 128,
                      0, pad_w - WIN_W)
    padded = pad_image(image, pad_h, pad_w)
    order = jnp.argsort(_window_key(base_y, base_x, pad_w))
    srt = [jnp.take(a, order) for a in
           (base_y, base_x, ys.astype(jnp.int32), xs.astype(jnp.int32))]
    (by, bx, kyi, kxi), n_pad, n = _pad_n(srt, _IC_KPB)
    grp, start, nstart = _window_groups(_window_key(by, bx, pad_w), _IC_KPB)
    meta = ((grp & 1) | (start << 1)).astype(jnp.int32)
    kp = jnp.stack([kyi, kxi], axis=1)
    umax = np.zeros((32, 8), np.int32)
    umax[:31, 0] = S.U_MAX[np.abs(np.arange(-15, 16))]

    out = pl.pallas_call(
        _ic_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(n_pad // _IC_KPB,),
            in_specs=[
                pl.BlockSpec((_IC_KPB, 2), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((32, 8), lambda i, *_: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((_IC_KPB, 2), lambda i, *_: (i, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, _IC_WIN_H, WIN_W), jnp.uint8),
                pltpu.VMEM((2, _IC_WIN_H, WIN_W), jnp.bfloat16),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((n_pad, 2), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(by, bx, meta, nstart, kp, jnp.asarray(umax), padded)
    inv = jnp.zeros_like(order).at[order].set(
        jnp.arange(order.shape[0], dtype=order.dtype))
    out = jnp.take(out[:n], inv, axis=0)
    m01 = out[:, 0]
    m10 = out[:, 1]
    ang = jnp.arctan2(m01, m10)
    ang = jnp.where(ang < 0, ang + np.float32(2 * np.pi), ang)
    deg = np.float32(180.0 / np.pi) * ang
    return jnp.where(valid, deg, 0.0).astype(jnp.float32)


# ---------------------------------------------------------------------------
# HashSIFT patch-warp kernel
# ---------------------------------------------------------------------------

_WARP_KPB = 8
# Warp-private window plan: patch samples stay within +-24 px of the keypoint
# (|u - kx| <= 16*sqrt(2)*s + 1 with s <= 0.945 from max_window_size).  Row
# origins quantize to 32 (4x fewer distinct windows -> 4x fewer DMAs at high
# keypoint counts): an 80-row window puts the keypoint row at offset
# [24, 56), and each keypoint takes an 8-aligned 56-row slice of the
# resident window (keypoint at slice offset [24, 32)) before compaction.
_WARP_WIN_H = 80
_WARP_SLICE_H = 56
# Columns are compacted to the 64 window columns [off, off+64) around the
# keypoint by a one-hot matmul (win @ P) instead of the former two
# per-keypoint pltpu.rolls; off is clamped so border keypoints' in-image
# support stays inside the slab (out-of-image samples are masked anyway).
_WARP_CW = 64

# Warp kernel body variant (trace-time A/B knob, like EFF_TPU_BAD_FORMULATION):
#   "select" — one (128, npx) build per pair stage, the two halves routed by
#              row-index selects (uu/vv/du/rr wheres over full-height arrays);
#   "split"  — per-half (64, npx) builds with the pair-invariant iota arrays
#              hoisted out of the unrolled pair loop; drops the full-height
#              where/broadcast passes at the cost of one X2 concat.  Both are
#              bit-identical (same per-keypoint arithmetic); which spends
#              fewer full-tile vector passes (the kernel's bounding resource,
#              SOL.md round-4 model) is a Mosaic scheduling question the
#              on-chip A/B decides.
_WARP_BODY = os.environ.get("EFF_TPU_WARP_BODY", "select")


def _warp_kernel_split(*args, **kw):
    """Distinctly-NAMED alias for the body_kind='split' warp kernel:
    compiled kernel binaries are cached per process by kernel identity
    (CLAUDE.md kernel-cache collision), so without its own def name a
    same-process select/split A/B or bit-identity test silently re-runs
    whichever binary compiled first — the round-9 'TIE, 0 differing
    bytes' A/B was void for exactly this reason."""
    return _warp_kernel(*args, **kw)


def _warp_kernel(by_ref, bx_ref, meta_ref, nstart_ref, kp_ref,
                 img_hbm, out_ref, win_ref, winbf_ref, sem, *,
                 img_w, img_h, body_kind=_WARP_BODY):
    """Patch warp, two keypoints per MXU pass.

    Keypoints are processed in PAIRS sharing (128,128)@(128,1024) matmuls:
    the pair's compacted 64-column windows sit in the two diagonal blocks of
    the LHS and their one-hot selectors stack along k, so the full 128-deep
    MXU contraction is used (a single keypoint only fills 64x64 of a tile).
    The window is cast to bf16 once per DMA (winbf scratch), not per
    keypoint, and the affine scalars arrive precomputed in the kp block
    (XLA-side _affine_scalars) so the scalar core runs no transcendentals."""
    i = pl.program_id(0)
    npx = 32 * 32

    # pair-invariant integer iota difference for the column-compaction
    # selector: hoisted so the unrolled pair loop re-uses one build
    Dsel = (jax.lax.broadcasted_iota(jnp.int32, (WIN_W, _WARP_CW), 0)
            - jax.lax.broadcasted_iota(jnp.int32, (WIN_W, _WARP_CW), 1))

    def get_dma(slot, idx):
        return pltpu.make_async_copy(
            img_hbm.at[pl.ds(pl.multiple_of(by_ref[idx], 8), _WARP_WIN_H),
                       pl.ds(pl.multiple_of(bx_ref[idx], 128), WIN_W)],
            win_ref.at[slot], sem.at[slot])

    @pl.when(i == 0)
    def _():
        get_dma(meta_ref[0] & 1, 0).start()

    def half(pair, j):
        """DMA bookkeeping + compacted 64-col window for keypoint j of the
        pair; returns (padded (64,64) bf16 window block, u_loc, v_loc,
        valid_px) — everything the shared pair matmul needs."""
        k = 2 * pair + j
        idx = i * _WARP_KPB + k
        meta = meta_ref[idx]
        slot = meta & 1

        @pl.when((meta >> 1) == 1)
        def _():
            nxt = nstart_ref[idx]

            @pl.when(nxt < nstart_ref.shape[0])
            def _():
                get_dma(1 - slot, nxt).start()

            get_dma(slot, idx).wait()
            # cast once per window DMA (shared by all its keypoints)
            winbf_ref[slot] = win_ref[slot].astype(
                jnp.int32).astype(jnp.bfloat16)

        _, _, _, cost, sint, m02, m12 = _affine_from_block(kp_ref, k)

        pidx = jax.lax.broadcasted_iota(jnp.int32, (1, npx), 1)
        pxf = (pidx % 32).astype(jnp.float32)
        pyf = (pidx // 32).astype(jnp.float32)
        u = cost * pxf - sint * pyf + m02
        v = sint * pxf + cost * pyf + m12

        ui = jnp.floor(u).astype(jnp.int32)
        vi = jnp.floor(v).astype(jnp.int32)
        valid_px = ((ui >= 0) & (ui + 1 < img_w) &
                    (vi >= 0) & (vi + 1 < img_h))

        # per-keypoint 8-aligned 56-row slice of the resident 80-row window
        # (keypoint row lands at slice offset [24, 32); border clamps keep
        # all in-image support rows inside the slice)
        yi_loc = jnp.floor(kp_ref[k, 1]).astype(jnp.int32) - by_ref[idx]
        row_off = jnp.clip(((yi_loc - 24) // 8) * 8, 0,
                           _WARP_WIN_H - _WARP_SLICE_H)
        win56 = winbf_ref[slot, pl.ds(pl.multiple_of(row_off, 8),
                                      _WARP_SLICE_H), :]

        # column compaction by one-hot matmul: select window columns
        # [off, off+64).  P is exact {0,1} with one nonzero per output
        # column, so win_c holds exact pixel integers.
        xi_loc = jnp.floor(kp_ref[k, 0]).astype(jnp.int32) - bx_ref[idx]
        off = jnp.clip(xi_loc - 32, 0, WIN_W - _WARP_CW)
        Pm = (Dsel == off).astype(jnp.bfloat16)
        win_c = jnp.dot(win56, Pm, preferred_element_type=jnp.float32)
        blk = jnp.concatenate(
            [win_c, jnp.zeros((64 - _WARP_SLICE_H, _WARP_CW), jnp.float32)],
            axis=0).astype(jnp.bfloat16)                  # (64, 64)

        u_loc = u - (bx_ref[idx] + off).astype(jnp.float32)   # (1, npx)
        v_loc = v - (by_ref[idx] + row_off).astype(jnp.float32)
        return blk, u_loc, v_loc, valid_px

    def _lhs(blk0, blk1):
        # block-diagonal LHS: [[blk0, 0], [0, blk1]] — one full (128,128)
        # tile; the zero blocks make each keypoint's rows see only its own
        # hat factors, so products stay exact
        z64 = jnp.zeros((64, _WARP_CW), jnp.bfloat16)
        return jnp.concatenate(
            [jnp.concatenate([blk0, z64], axis=1),
             jnp.concatenate([z64, blk1], axis=1)], axis=0)   # (128, 128)

    # "split"-body pair-invariant builds (see _WARP_BODY): one iota cast per
    # program, shared by all pairs and both halves
    if body_kind == "split":
        cc64 = jax.lax.broadcasted_iota(
            jnp.int32, (_WARP_CW, npx), 0).astype(jnp.float32)
        rr64 = jax.lax.broadcasted_iota(
            jnp.int32, (64, npx), 0).astype(jnp.float32)

    def sel64(ufl):
        # packed left/right bilinear selector for ONE keypoint: rows = its 64
        # compacted window columns; exact {0, 1, 4096} f32 (the same packing
        # as the "select" body's X2, one 64-row half at a time)
        return (jnp.where(cc64 == ufl, np.float32(1.0), np.float32(0.0))
                + jnp.where(cc64 == ufl + np.float32(1.0),
                            np.float32(4096.0), np.float32(0.0)))

    def body_split(pair):
        blk0, u0, v0, vp0 = half(pair, 0)
        blk1, u1, v1, vp1 = half(pair, 1)
        lhs = _lhs(blk0, blk1)

        ufl0 = jnp.floor(u0)
        ufl1 = jnp.floor(u1)
        X2 = jnp.concatenate([sel64(ufl0), sel64(ufl1)], axis=0)
        z2 = jnp.dot(lhs, X2.astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)      # (128, npx)
        z_r = jnp.floor(z2 * np.float32(1.0 / 4096.0))
        z_l = z2 - np.float32(4096.0) * z_r

        # per-half (64, npx) lerp + vertical hat: no full-height row-index
        # selects; du/v broadcast from (1, npx) rows
        for j, (u, v, ufl, vp, r0) in enumerate(
                ((u0, v0, ufl0, vp0, 0), (u1, v1, ufl1, vp1, 64))):
            du = u - ufl
            s = ((np.float32(1.0) - du)
                 * jax.lax.slice(z_l, (r0, 0), (r0 + 64, npx))
                 + du * jax.lax.slice(z_r, (r0, 0), (r0 + 64, npx)))
            Y = jnp.maximum(np.float32(1.0) - jnp.abs(rr64 - v),
                            np.float32(0.0))
            t = (Y * s).sum(axis=0, keepdims=True)            # (1, npx)
            val = jnp.minimum(jnp.trunc(t + np.float32(0.5)),
                              np.float32(255.0))
            out_ref[2 * pair + j:2 * pair + j + 1, :] = jnp.where(
                vp, val, 0.0).astype(jnp.int32).astype(jnp.uint8)

    def body(pair):
        blk0, u0, v0, vp0 = half(pair, 0)
        blk1, u1, v1, vp1 = half(pair, 1)
        lhs = _lhs(blk0, blk1)

        # the MXU does only EXACT one-hot gathers: X packs the left bilinear
        # pixel selector (c == floor(u), weight 1) and the right selector
        # (c == floor(u)+1, weight 4096) into ONE factor — {0, 1, 4096} are
        # bf16-exact, a column can't select both, pixels are <= 255 exact
        # integers, so z = z_l + 4096*z_r accumulates exactly (< 2^24) in
        # f32 and the fields unpack exactly with a power-of-two divide.
        # This halves the kernel's dominant (128,128)@(128,1024) MXU work
        # vs separate z_l/z_r matmuls.  ALL bilinear weighting then happens
        # on the VPU in full f32, matching the reference's float lerp (no
        # bf16 weight quantization anywhere).
        ksel = jax.lax.broadcasted_iota(jnp.int32, (2 * _WARP_CW, npx), 0)
        hi = (ksel >= _WARP_CW)
        cc = jnp.where(hi, ksel - _WARP_CW, ksel).astype(jnp.float32)
        uu = jnp.where(hi, u1, u0)
        ufl = jnp.floor(uu)
        X2 = (jnp.where(cc == ufl, np.float32(1.0), np.float32(0.0))
              + jnp.where(cc == ufl + np.float32(1.0),
                          np.float32(4096.0), np.float32(0.0)))
        z2 = jnp.dot(lhs, X2.astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)      # (128, npx)
        z_r = jnp.floor(z2 * np.float32(1.0 / 4096.0))
        z_l = z2 - np.float32(4096.0) * z_r

        # horizontal lerp on the VPU: du broadcast over rows (row blocks
        # [0:64) / [64:128) belong to kp0 / kp1); all weights full f32
        rsel = jax.lax.broadcasted_iota(jnp.int32, (128, npx), 0)
        rhi = (rsel >= 64)
        du = jnp.where(rhi, u1 - jnp.floor(u1), u0 - jnp.floor(u0))
        s = (np.float32(1.0) - du) * z_l + du * z_r           # (128, npx)

        # vertical factors on the VPU at full f32 precision, both keypoints
        # in one (128, npx) hat build
        rr = jnp.where(rhi, rsel - 64, rsel).astype(jnp.float32)
        vv = jnp.where(rhi, v1, v0)
        Y = jnp.maximum(np.float32(1.0) - jnp.abs(rr - vv), np.float32(0.0))
        prod = Y * s
        t0 = prod[0:64].sum(axis=0, keepdims=True)            # (1, npx)
        t1 = prod[64:128].sum(axis=0, keepdims=True)

        val0 = jnp.minimum(jnp.trunc(t0 + np.float32(0.5)), np.float32(255.0))
        val1 = jnp.minimum(jnp.trunc(t1 + np.float32(0.5)), np.float32(255.0))
        # u8 output (patches are u8-valued): the f32 version was OUTPUT-HBM
        # bound — 33 MB of patch writes per 8k keypoints measured 202 ms vs
        # 61 ms with u8 on the dev chip.  Static store offsets (unrolled pair
        # loop) keep the stores cheap.
        out_ref[2 * pair:2 * pair + 1, :] = jnp.where(
            vp0, val0, 0.0).astype(jnp.int32).astype(jnp.uint8)
        out_ref[2 * pair + 1:2 * pair + 2, :] = jnp.where(
            vp1, val1, 0.0).astype(jnp.int32).astype(jnp.uint8)

    for pair in range(_WARP_KPB // 2):
        (body_split if body_kind == "split" else body)(pair)


@functools.partial(jax.jit, static_argnums=(6, 7),
                   static_argnames=("body_kind",))
def _warp_patches_windows_impl(image, x, y, size, angle, valid,
                               cropping_scale: float,
                               body_kind: str = _WARP_BODY):
    """(N, 1024) uint8 warped patches via the window kernel.

    The MXU only gathers (exact one-hot factors); bilinear weights apply on
    the VPU in full f32, so patches match the oracle's reference-exact float
    lerp up to IEEE rounding order."""
    h, w = image.shape
    # 32-quantized 80-row plan: keypoint row lands at offset [24, 56)
    pad_h = max(-(-h // 8) * 8, _WARP_WIN_H)
    pad_w = max(-(-w // 128) * 128, WIN_W)
    yi = jnp.floor(y).astype(jnp.int32)
    xi = jnp.floor(x).astype(jnp.int32)
    base_y = jnp.clip(((yi - 24) // 32) * 32, 0, pad_h - _WARP_WIN_H)
    base_x = jnp.clip(((xi - 96) // 128) * 128, 0, pad_w - WIN_W)
    padded = pad_image(image, pad_h, pad_w)
    order = jnp.argsort(_window_key(base_y, base_x, pad_w))
    srt = [jnp.take(a, order) for a in (base_y, base_x, x, y, size, angle)]
    (by, bx, kx, ky, ks, ka), n_pad, n = _pad_n(srt, _WARP_KPB)
    grp, start, nstart = _window_groups(_window_key(by, bx, pad_w), _WARP_KPB)
    meta = ((grp & 1) | (start << 1)).astype(jnp.int32)
    kp = _affine_block(kx, ky, ks, ka, cropping_scale)

    kernel = functools.partial(
        _warp_kernel_split if body_kind == "split" else _warp_kernel,
        img_w=w, img_h=h, body_kind=body_kind)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(n_pad // _WARP_KPB,),
            in_specs=[
                pl.BlockSpec((_WARP_KPB, 8), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((_WARP_KPB, 1024), lambda i, *_: (i, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, _WARP_WIN_H, WIN_W), jnp.uint8),
                pltpu.VMEM((2, _WARP_WIN_H, WIN_W), jnp.bfloat16),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((n_pad, 1024), jnp.uint8),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(by, bx, meta, nstart, kp, padded)
    inv = jnp.zeros_like(order).at[order].set(
        jnp.arange(order.shape[0], dtype=order.dtype))
    return jnp.where(valid[:, None], jnp.take(out[:n], inv, axis=0), 0)


# ---------------------------------------------------------------------------
# FUSED HashSIFT kernel: warp + gradients + histogram + normalize in one pass
# ---------------------------------------------------------------------------
# The reference does the whole patch-SIFT in one kernel per keypoint
# (cuda_hash_sift.cu:380-412: smem patch + smem histogram + warp-reduce
# normalize); the round-2 TPU path round-tripped a (N, 1024) u8 patch array
# through HBM and ran the histogram as a separate XLA stage.  This kernel
# keeps everything in VMEM and emits only the (N, 128) u8 quantized SIFT
# descriptor (the learned projection GEMM stays in XLA, precision-highest).
#
# Gradient trick: the oracle differentiates the QUANTIZED patch
# (dx = p[y,x+1] - p[y,x-1]), and lane-shifting a patch row is slow on TPU.
# The round-3 kernel RECOMPUTED the four neighbor sample grids as extra
# warped samples (3.5x the bilinear work of the patch itself) and lost its
# A/B to the two-stage path.  This version samples the 32x32 patch ONCE
# (the exact _warp_kernel contract) and takes both gradients with a single
# constant-matrix MXU matmul q @ G (hash_sift._grad_shift_mat): G's {-1,0,1}
# entries and the <=255 integer patch values are exact in bf16 and each
# output is a two-term f32 accumulation, so the matmul equals the oracle's
# integer subtraction bit-for-bit.
#
# Mosaic has no atan2: orientation comes from a degree-9 (in t^2) least-squares atan
# polynomial (max |err| 9.7e-8 rad < the 1e-6 budget that keeps histogram
# bin flips ~1e-6, inside the 1e-4 descriptor-byte budget) with quadrant
# fixup; divisions use Newton-refined reciprocals (Mosaic f32 divide is a
# reciprocal approximation).

# atan(t)/t as a polynomial in t^2 on [0, 1] (least-squares on Chebyshev
# nodes, f64 fit / f32 Horner; max abs error 9.7e-8 rad over [0,1])
_ATAN_COEF = [np.float32(c) for c in (
    1.0, -0.33333296, 0.19998543, -0.1426439, 0.10953449,
    -0.084078744, 0.05804036, -0.031264406, 0.010962384, -0.0018044757)]
_PI = np.float32(np.pi)
_HALF_PI = np.float32(np.pi / 2)
_EPS32 = np.float32(np.finfo(np.float32).eps)


def _recip(d):
    """f32 reciprocal to ~0.5 ulp: two Newton steps on the hardware
    reciprocal approximation (a no-op wiggle on backends whose divide is
    already correctly rounded)."""
    r = np.float32(1.0) / d
    r = r * (np.float32(2.0) - d * r)
    r = r * (np.float32(2.0) - d * r)
    return r


def _atan2_poly(yv, xv):
    """atan2(yv, xv) in (-pi, pi]; |err| <= ~1.5e-7 rad.  yv==xv==0 -> 0."""
    ax = jnp.abs(xv)
    ay = jnp.abs(yv)
    mx = jnp.maximum(ax, ay)
    mn = jnp.minimum(ax, ay)
    den = jnp.where(mx == 0, np.float32(1.0), mx)
    t = mn * _recip(den)
    s2 = t * t
    acc = _ATAN_COEF[-1]
    for c in _ATAN_COEF[-2::-1]:
        acc = acc * s2 + c
    z = t * acc
    z = jnp.where(ay > ax, _HALF_PI - z, z)
    z = jnp.where(xv < 0, _PI - z, z)
    return jnp.where(yv < 0, -z, z)


def _hs_fused_kernel(by_ref, bx_ref, meta_ref, nstart_ref, kp_ref, wsp_ref,
                     dg_ref, img_hbm, out_ref, win_ref, winbf_ref, sem, *,
                     img_w, img_h):
    """Fused HashSIFT, two keypoints per MXU pass (see module comment)."""
    i = pl.program_id(0)
    npx = 1024            # padded interior-pixel grid (900 real)

    def get_dma(slot, idx):
        return pltpu.make_async_copy(
            img_hbm.at[pl.ds(pl.multiple_of(by_ref[idx], 8), _WARP_WIN_H),
                       pl.ds(pl.multiple_of(bx_ref[idx], 128), WIN_W)],
            win_ref.at[slot], sem.at[slot])

    @pl.when(i == 0)
    def _():
        get_dma(meta_ref[0] & 1, 0).start()

    def half(pair, j):
        """DMA bookkeeping + compacted 64-col window block for keypoint j of
        the pair (identical to _warp_kernel.half, minus the sample grid)."""
        k = 2 * pair + j
        idx = i * _WARP_KPB + k
        meta = meta_ref[idx]
        slot = meta & 1

        @pl.when((meta >> 1) == 1)
        def _():
            nxt = nstart_ref[idx]

            @pl.when(nxt < nstart_ref.shape[0])
            def _():
                get_dma(1 - slot, nxt).start()

            get_dma(slot, idx).wait()
            winbf_ref[slot] = win_ref[slot].astype(
                jnp.int32).astype(jnp.bfloat16)

        _, _, _, cost, sint, m02, m12 = _affine_from_block(kp_ref, k)

        yi_loc = jnp.floor(kp_ref[k, 1]).astype(jnp.int32) - by_ref[idx]
        row_off = jnp.clip(((yi_loc - 24) // 8) * 8, 0,
                           _WARP_WIN_H - _WARP_SLICE_H)
        win56 = winbf_ref[slot, pl.ds(pl.multiple_of(row_off, 8),
                                      _WARP_SLICE_H), :]
        xi_loc = jnp.floor(kp_ref[k, 0]).astype(jnp.int32) - bx_ref[idx]
        off = jnp.clip(xi_loc - 32, 0, WIN_W - _WARP_CW)
        csel = jax.lax.broadcasted_iota(jnp.int32, (WIN_W, _WARP_CW), 0)
        jsel = jax.lax.broadcasted_iota(jnp.int32, (WIN_W, _WARP_CW), 1)
        Pm = (csel == jsel + off).astype(jnp.bfloat16)
        win_c = jnp.dot(win56, Pm, preferred_element_type=jnp.float32)
        blk = jnp.concatenate(
            [win_c, jnp.zeros((64 - _WARP_SLICE_H, _WARP_CW), jnp.float32)],
            axis=0).astype(jnp.bfloat16)                  # (64, 64)
        ox = (bx_ref[idx] + off).astype(jnp.float32)
        oy = (by_ref[idx] + row_off).astype(jnp.float32)
        return blk, (cost, sint, m02, m12, ox, oy)

    def patch_uv(aff):
        """Local sample coords for the full 32x32 row-major patch grid
        (lane = y*32 + x, the _warp_kernel layout)."""
        cost, sint, m02, m12, ox, oy = aff
        pidx = jax.lax.broadcasted_iota(jnp.int32, (1, npx), 1)
        pxv = (pidx % 32).astype(jnp.float32)
        pyv = (pidx // 32).astype(jnp.float32)
        u = cost * pxv - sint * pyv + m02
        v = sint * pxv + cost * pyv + m12
        ui = jnp.floor(u).astype(jnp.int32)
        vi = jnp.floor(v).astype(jnp.int32)
        ok = ((ui >= 0) & (ui + 1 < img_w) & (vi >= 0) & (vi + 1 < img_h))
        return u - ox, v - oy, ok

    def sample_pair(lhs, uv0, uv1):
        """Quantized warped samples for both keypoints at their (1, npx)
        local sample coords: exact one-hot gathers + full-f32 VPU lerp +
        hat-sum + u8 quantization (the _warp_kernel contract)."""
        u0, v0, ok0 = uv0
        u1, v1, ok1 = uv1
        w2 = npx
        ksel = jax.lax.broadcasted_iota(jnp.int32, (2 * _WARP_CW, w2), 0)
        hi = (ksel >= _WARP_CW)
        cc = jnp.where(hi, ksel - _WARP_CW, ksel).astype(jnp.float32)
        uu = jnp.where(hi, u1, u0)
        ufl = jnp.floor(uu)
        # packed left/right one-hot gather: ONE matmul, exact fields
        # (see _warp_kernel)
        X2 = (jnp.where(cc == ufl, np.float32(1.0), np.float32(0.0))
              + jnp.where(cc == ufl + np.float32(1.0),
                          np.float32(4096.0), np.float32(0.0)))
        z2 = jnp.dot(lhs, X2.astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)
        z_r = jnp.floor(z2 * np.float32(1.0 / 4096.0))
        z_l = z2 - np.float32(4096.0) * z_r
        rsel = jax.lax.broadcasted_iota(jnp.int32, (128, w2), 0)
        rhi = (rsel >= 64)
        du = jnp.where(rhi, u1 - jnp.floor(u1), u0 - jnp.floor(u0))
        sres = (np.float32(1.0) - du) * z_l + du * z_r
        rr = jnp.where(rhi, rsel - 64, rsel).astype(jnp.float32)
        vv = jnp.where(rhi, v1, v0)
        Y = jnp.maximum(np.float32(1.0) - jnp.abs(rr - vv), np.float32(0.0))
        prod = Y * sres
        t0 = prod[0:64].sum(axis=0, keepdims=True)            # (1, npx)
        t1 = prod[64:128].sum(axis=0, keepdims=True)
        q0 = jnp.minimum(jnp.trunc(t0 + np.float32(0.5)), np.float32(255.0))
        q1 = jnp.minimum(jnp.trunc(t1 + np.float32(0.5)), np.float32(255.0))
        q0 = jnp.where(ok0, q0, np.float32(0.0))
        q1 = jnp.where(ok1, q1, np.float32(0.0))
        return q0, q1

    def sift_votes(dxv, dyv):
        """(oi, v_lo, v_hi) per pixel from quantized-gradient rows."""
        mag = jnp.sqrt(dxv * dxv + dyv * dyv)
        ori = _atan2_poly(dyv, dxv)
        scale_o = np.float32(8.0 / (2.0 * np.pi))
        ob = scale_o * ori
        oi = jnp.floor(ob).astype(jnp.int32)
        of = ob - oi.astype(jnp.float32)
        oi = jnp.where(oi < 0, oi + 8, oi)
        oi = jnp.where(oi >= 8, oi - 8, oi)
        v_hi = of * mag
        v_lo = mag - v_hi
        return oi, v_lo, v_hi

    # ---- phase 1: sample all 8 patches (the plain warp kernel's cost) ----
    qs = []
    for pair in range(_WARP_KPB // 2):
        blk0, aff0 = half(pair, 0)
        blk1, aff1 = half(pair, 1)
        z64 = jnp.zeros((64, _WARP_CW), jnp.bfloat16)
        lhs = jnp.concatenate(
            [jnp.concatenate([blk0, z64], axis=1),
             jnp.concatenate([z64, blk1], axis=1)], axis=0)   # (128, 128)
        q0, q1 = sample_pair(lhs, patch_uv(aff0), patch_uv(aff1))
        qs.extend((q0, q1))

    # ---- phase 2: both quantized-patch gradients for the whole block from
    # ONE exact constant matmul (see module comment; dg lane l packs
    # z = dx + 4096*dy on the padded interior layout — exact integer fields
    # < 2^24, see hash_sift._grad_shift_mat).  Block-batched on purpose:
    # these matmuls are VMEM weight-stream-bound (the MXU re-reads the whole
    # constant per call — 2 MB here, 0.5 MB for wsp), so per-pair calls
    # cost ~4x per keypoint.
    qq = jnp.concatenate(qs, axis=0).astype(jnp.bfloat16)     # (8, 1024)
    g2 = jnp.dot(qq, dg_ref[...],
                 preferred_element_type=jnp.float32)          # (8, 1024)

    # ---- phase 3: orientation votes -> one (64, 1024) vote matrix (rows =
    # (kp, orientation bin), circular bin 8 folded into 0 at vote time ==
    # the oracle's post-crop fold, up to f32 accumulation order) -> ONE
    # spatial-core histogram matmul for the block.
    Vs = []
    for k in range(_WARP_KPB):
        zg = jax.lax.slice(g2, (k, 0), (k + 1, npx))
        # exact unpack: |dx| <= 255 < 2048 -> nearest-int recovers dy
        dyv = jnp.floor(zg * np.float32(1.0 / 4096.0) + np.float32(0.5))
        dxv = zg - np.float32(4096.0) * dyv
        oi, vlo, vhi = sift_votes(dxv, dyv)                   # (1, npx)
        o_row = jax.lax.broadcasted_iota(jnp.int32, (8, npx), 0)
        oip1 = oi + 1
        oip1 = jnp.where(oip1 == 8, 0, oip1)
        Vs.append(jnp.where(o_row == oi, vlo, np.float32(0.0))
                  + jnp.where(o_row == oip1, vhi, np.float32(0.0)))
    V = jnp.concatenate(Vs, axis=0)                           # (64, 1024)

    # precision=HIGHEST: Mosaic's default f32 dot rounds through bf16
    # passes — measured ~1% of quantized desc entries flipping by 1 vs
    # the oracle on chip; the full-f32 path matches the XLA stage's
    # precision="highest" GEMM class (flips ~0.1%)
    H = jnp.dot(V, wsp_ref[...], preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)          # (64, 128)

    # ---- phase 4: per-keypoint normalize / quantize, then ONE block
    # flatten matmul.  The flatten's one-hot A is a constant: per-keypoint
    # M=8 calls re-stream it 8x (the round-3 weight-stream finding), so the
    # 8 quantized (8, 128) cores are stacked into one (64, 128) operand.
    qs4 = []
    for k in range(_WARP_KPB):
        hb = jax.lax.slice(H, (8 * k, 0), (8 * k + 8, 128))   # (8, 128)
        nrm = jnp.maximum(jnp.sqrt((hb * hb).sum()), _EPS32)
        d = hb * _recip(nrm)
        d = jnp.minimum(d, np.float32(0.2))
        nrm2 = jnp.maximum(jnp.sqrt((d * d).sum()), _EPS32)
        d = d * _recip(nrm2)
        qs4.append(jnp.clip(
            jnp.trunc(np.float32(512.0) * d + np.float32(0.5)), 0.0, 255.0))
    Q = jnp.concatenate(qs4, axis=0)                          # (64, 128)
    # orientation-major flatten (8, 16) -> (1, 128): e[o*16+rc] = q[o, rc].
    # Mosaic cannot concat/reshape sublanes into lanes; instead one exact
    # one-hot matmul replicates each 16-lane core across the row
    # (QA[r, l] = Q[r, l%16] — values are small exact ints, bf16-safe) and
    # a masked sublane sum picks row l//16 within each keypoint's 8 rows.
    # The XLA projection uses hs_fused_projection's permuted columns.
    csel2 = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    lsel2 = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    A = (csel2 == lsel2 % 16).astype(jnp.bfloat16)
    QA = jnp.dot(Q.astype(jnp.bfloat16), A,
                 preferred_element_type=jnp.float32)          # (64, 128)
    osel = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    osel_l = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1) // 16
    pick = (osel == osel_l)
    for k in range(_WARP_KPB):
        qa = jax.lax.slice(QA, (8 * k, 0), (8 * k + 8, 128))  # (8, 128)
        row = jnp.where(pick, qa, np.float32(0.0)).sum(
            axis=0, keepdims=True)                            # (1, 128)
        out_ref[k:k + 1, :] = row.astype(jnp.int32).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnums=(6,))
def _hs_desc_windows_impl(image, x, y, size, angle, valid,
                          cropping_scale: float):
    """(N, 128) uint8 quantized SIFT descriptors (orientation-major core
    layout) via the fused kernel; feed hs_fused_projection's permuted GEMM."""
    from . import hash_sift as _hs
    h, w = image.shape
    pad_h = max(-(-h // 8) * 8, _WARP_WIN_H)
    pad_w = max(-(-w // 128) * 128, WIN_W)
    yi = jnp.floor(y).astype(jnp.int32)
    xi = jnp.floor(x).astype(jnp.int32)
    base_y = jnp.clip(((yi - 24) // 32) * 32, 0, pad_h - _WARP_WIN_H)
    base_x = jnp.clip(((xi - 96) // 128) * 128, 0, pad_w - WIN_W)
    padded = pad_image(image, pad_h, pad_w)
    order = jnp.argsort(_window_key(base_y, base_x, pad_w))
    srt = [jnp.take(a, order) for a in (base_y, base_x, x, y, size, angle)]
    (by, bx, kx, ky, ks, ka), n_pad, n = _pad_n(srt, _WARP_KPB)
    grp, start, nstart = _window_groups(_window_key(by, bx, pad_w), _WARP_KPB)
    meta = ((grp & 1) | (start << 1)).astype(jnp.int32)
    kp = _affine_block(kx, ky, ks, ka, cropping_scale)
    wsp = jnp.asarray(_hs._spatial_weight_core())
    dg = jnp.asarray(_hs._grad_shift_mat()).astype(jnp.bfloat16)

    kernel = functools.partial(_hs_fused_kernel, img_w=w, img_h=h)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(n_pad // _WARP_KPB,),
            in_specs=[
                pl.BlockSpec((_WARP_KPB, 8), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1024, 128), lambda i, *_: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1024, 1024), lambda i, *_: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((_WARP_KPB, 128), lambda i, *_: (i, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, _WARP_WIN_H, WIN_W), jnp.uint8),
                pltpu.VMEM((2, _WARP_WIN_H, WIN_W), jnp.bfloat16),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((n_pad, 128), jnp.uint8),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(by, bx, meta, nstart, kp, wsp, dg, padded)
    inv = jnp.zeros_like(order).at[order].set(
        jnp.arange(order.shape[0], dtype=order.dtype))
    return jnp.where(valid[:, None], jnp.take(out[:n], inv, axis=0), 0)


# ---------------------------------------------------------------------------
# Standalone HashSIFT histogram kernel (patches -> quantized SIFT core)
# ---------------------------------------------------------------------------
# The two-stage HS path's histogram (ops.hash_sift.patch_sift_responses)
# is the one stage still above its SOL model: it materializes ~15
# (N, 900)-class f32 arrays through HBM (gradients, magnitude/orientation,
# trilinear vote splits, nine masked per-bin vote builds) around matmuls
# that measured precision-insensitive — i.e. the stage is HBM-traffic
# bound, not MXU bound.  This kernel runs the fused kernel's hist tail
# (phases 2-4 of _hs_fused_kernel: exact packed-gradient constant matmul,
# polynomial atan2, per-orientation-bin core matmuls, two-pass normalize /
# quantize) over the warp kernel's (N, 1024) u8 patch rows ENTIRELY in
# VMEM, N-blocked at M = _HS_HIST_NB rows per program.  HBM traffic drops
# to: read 1 B/pixel of patches + write 128 B/keypoint of descriptor.
#
# Why this wins where the FUSED kernel lost (decisions.hs_fused_kernel):
# the fused kernel's in-kernel constant matmuls ran at M = 8 (one warp
# block) and were VMEM weight-stream-bound — the same contractions here
# run at M = 256, amortizing the streams 32x, while the warp stage keeps
# its own proven two-stage shape.  The per-orientation matmuls contract
# against hash_sift._spatial_weight_core_shifted, whose row block o lands
# bin o's 16 core columns at lanes 16*o..16*o+15: the eight partial
# products occupy disjoint lanes, so their sum assembles the orientation-
# major (N, 128) core exactly — no lane shifts, no sublane->lane reshape.
#
# Exactness: the gradient matmul is exact (u8 pixels and {+-1, +-4096}
# entries are bf16-exact; every product/partial sum is an exact integer
# < 2^24 in the f32 accumulator — hash_sift._grad_shift_mat), so dx/dy
# equal the oracle's integer subtractions bit-for-bit.  Everything after
# (atan poly, Newton-reciprocal divides, HIGHEST-precision core matmuls)
# is the fused kernel's budget class: quantized bytes off by <= 1 on a
# ~1e-3 fraction vs the oracle (test_hs_hist_kernel_parity).

_HS_HIST_NB = 256  # keypoint rows per program (M of the in-kernel matmuls)


def _hs_hist_kernel(p_ref, dg_ref, wsp_ref, out_ref):
    """(NB, 1024) u8 patches -> (NB, 128) u8 orientation-major SIFT core."""
    nb = p_ref.shape[0]
    # no u8 -> bf16 cast on TPU; go via int32 (values <= 255, bf16-exact)
    q = p_ref[...].astype(jnp.int32).astype(jnp.bfloat16)
    z = jnp.dot(q, dg_ref[...],
                preferred_element_type=jnp.float32)           # (NB, 1024)
    # exact unpack of z = dx + 4096*dy: |dx| <= 255 < 2048
    dyv = jnp.floor(z * np.float32(1.0 / 4096.0) + np.float32(0.5))
    dxv = z - np.float32(4096.0) * dyv
    mag = jnp.sqrt(dxv * dxv + dyv * dyv)
    ori = _atan2_poly(dyv, dxv)
    scale_o = np.float32(8.0 / (2.0 * np.pi))
    ob = scale_o * ori
    oi = jnp.floor(ob).astype(jnp.int32)
    of = ob - oi.astype(jnp.float32)
    oi = jnp.where(oi < 0, oi + 8, oi)
    oi = jnp.where(oi >= 8, oi - 8, oi)
    v_hi = of * mag
    v_lo = mag - v_hi
    oip1 = oi + 1
    oip1 = jnp.where(oip1 == 8, 0, oip1)  # circular fold at vote time

    # eight (NB, 1024) @ (1024, 128) HIGHEST-precision matmuls; bin o's
    # shifted weight block lands its columns at lanes 16o..16o+15, so the
    # accumulated H is the orientation-major core (adds into exact zeros)
    H = jnp.zeros((nb, 128), jnp.float32)
    for o in range(8):
        V_o = (jnp.where(oi == o, v_lo, np.float32(0.0))
               + jnp.where(oip1 == o, v_hi, np.float32(0.0)))
        H = H + jnp.dot(V_o, wsp_ref[1024 * o:1024 * (o + 1), :],
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)

    # row-wise two-pass normalize + quantize (the fused kernel's phase 4,
    # batched over NB rows; lanes 16..127 of each shifted block were zero
    # only pre-sum — post-sum all 128 lanes carry real core values)
    nrm = jnp.maximum(jnp.sqrt((H * H).sum(axis=1, keepdims=True)), _EPS32)
    d = jnp.minimum(H * _recip(nrm), np.float32(0.2))
    nrm2 = jnp.maximum(jnp.sqrt((d * d).sum(axis=1, keepdims=True)), _EPS32)
    d = d * _recip(nrm2)
    qv = jnp.clip(jnp.trunc(np.float32(512.0) * d + np.float32(0.5)),
                  0.0, 255.0)
    out_ref[...] = qv.astype(jnp.int32).astype(jnp.uint8)


@jax.jit
def hs_hist_from_patches(patches):
    """(N, 128) uint8 quantized SIFT core rows (orientation-major layout,
    hs_fused_projection's GEMM) from (N, 1024) uint8 warped patch rows.

    Pallas replacement for ops.hash_sift.patch_sift_responses' histogram +
    normalize (the XLA stage stays the CPU/interpret oracle); see the
    section comment above for the traffic argument and exactness contract.
    Zero-padded rows (patch all-0) produce descriptor 0 exactly: dx = dy =
    0 -> mag 0 -> H 0 -> d = 0 * recip(eps) = 0."""
    n = patches.shape[0]
    nb = _HS_HIST_NB
    n_pad = -(-n // nb) * nb
    p = jnp.pad(patches, ((0, n_pad - n), (0, 0)))
    from . import hash_sift as _hs
    dg = jnp.asarray(_hs._grad_shift_mat(), jnp.bfloat16)
    wsp = jnp.asarray(_hs._spatial_weight_core_shifted())
    out = pl.pallas_call(
        _hs_hist_kernel,
        grid=(n_pad // nb,),
        in_specs=[pl.BlockSpec((nb, 1024), lambda i: (i, 0)),
                  pl.BlockSpec((1024, 1024), lambda i: (0, 0)),
                  pl.BlockSpec((8 * 1024, 128), lambda i: (0, 0))],
        out_specs=pl.BlockSpec((nb, 128), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n_pad, 128), jnp.uint8),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(p, dg, wsp)
    return out[:n]


# ---------------------------------------------------------------------------
# HashSIFT patch-warp kernel, large-keypoint buckets (single-keypoint mode)
# ---------------------------------------------------------------------------

_WARPB_KPB = 8  # (KPB, 8) kp block needs sublane divisible by 8


def _warp_kernel_big(by_ref, bx_ref, meta_ref, nstart_ref, kp_ref,
                     img_hbm, out_ref, win_ref, winbf_ref, sem, *,
                     img_w, img_h, win_h, win_w, half):
    """Patch warp for octave buckets beyond the pair kernel's 64-col
    compaction (affine scale > _S_BASE): one keypoint per MXU pass.

    Same exactness contract as _warp_kernel: the MXU does only exact one-hot
    gathers ({0,1} factors x integer pixels), all bilinear weights apply on
    the VPU in full f32.  The compacted window is (slice_h, 2*half): rows by
    an 8-aligned dynamic slice (keypoint row at slice offset [half, half+8)),
    columns by a one-hot compaction matmul (win @ P selects [off, off+2*half)
    around the keypoint; off is clamped so border keypoints' in-image support
    stays inside the slab — out-of-image samples are masked anyway)."""
    i = pl.program_id(0)
    npx = 32 * 32
    cwp = 2 * half
    slice_h = 2 * half + 8

    def get_dma(slot, idx):
        return pltpu.make_async_copy(
            img_hbm.at[pl.ds(pl.multiple_of(by_ref[idx], 8), win_h),
                       pl.ds(pl.multiple_of(bx_ref[idx], 128), win_w)],
            win_ref.at[slot], sem.at[slot])

    @pl.when(i == 0)
    def _():
        get_dma(meta_ref[0] & 1, 0).start()

    # keypoint-invariant iota builds hoisted out of the unrolled loop (full-
    # tile materializations are the bounding vector passes; Mosaic is not
    # guaranteed to CSE them across the 8 unrolled bodies)
    pidx = jax.lax.broadcasted_iota(jnp.int32, (1, npx), 1)
    pxf = (pidx % 32).astype(jnp.float32)
    pyf = (pidx // 32).astype(jnp.float32)
    Dsel = (jax.lax.broadcasted_iota(jnp.int32, (win_w, cwp), 0)
            - jax.lax.broadcasted_iota(jnp.int32, (win_w, cwp), 1))
    ccf = jax.lax.broadcasted_iota(
        jnp.int32, (cwp, npx), 0).astype(jnp.float32)
    rrf = jax.lax.broadcasted_iota(
        jnp.int32, (slice_h, npx), 0).astype(jnp.float32)

    def body(k):
        idx = i * _WARPB_KPB + k
        meta = meta_ref[idx]
        slot = meta & 1

        @pl.when((meta >> 1) == 1)
        def _():
            nxt = nstart_ref[idx]

            @pl.when(nxt < nstart_ref.shape[0])
            def _():
                get_dma(1 - slot, nxt).start()

            get_dma(slot, idx).wait()
            winbf_ref[slot] = win_ref[slot].astype(
                jnp.int32).astype(jnp.bfloat16)

        _, _, _, cost, sint, m02, m12 = _affine_from_block(kp_ref, k)

        u = cost * pxf - sint * pyf + m02
        v = sint * pxf + cost * pyf + m12
        ui = jnp.floor(u).astype(jnp.int32)
        vi = jnp.floor(v).astype(jnp.int32)
        valid_px = ((ui >= 0) & (ui + 1 < img_w) &
                    (vi >= 0) & (vi + 1 < img_h))

        yi_loc = jnp.floor(kp_ref[k, 1]).astype(jnp.int32) - by_ref[idx]
        row_off = jnp.clip(((yi_loc - half) // 8) * 8, 0, win_h - slice_h)
        winr = winbf_ref[slot, pl.ds(pl.multiple_of(row_off, 8), slice_h), :]

        xi_loc = jnp.floor(kp_ref[k, 0]).astype(jnp.int32) - bx_ref[idx]
        off = jnp.clip(xi_loc - half, 0, win_w - cwp)
        Pm = (Dsel == off).astype(jnp.bfloat16)
        win_c = jnp.dot(winr, Pm,
                        preferred_element_type=jnp.float32)  # exact ints
        win_c = win_c.astype(jnp.bfloat16)                   # (slice_h, cwp)

        u_loc = u - (bx_ref[idx] + off).astype(jnp.float32)  # (1, npx)
        v_loc = v - (by_ref[idx] + row_off).astype(jnp.float32)

        ufl = jnp.floor(u_loc)
        # packed left/right one-hot gather: ONE matmul, exact fields
        # (see _warp_kernel)
        X2 = (jnp.where(ccf == ufl, np.float32(1.0), np.float32(0.0))
              + jnp.where(ccf == ufl + np.float32(1.0),
                          np.float32(4096.0), np.float32(0.0)))
        z2 = jnp.dot(win_c, X2.astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)     # (slice_h, npx)
        z_r = jnp.floor(z2 * np.float32(1.0 / 4096.0))
        z_l = z2 - np.float32(4096.0) * z_r

        du = u_loc - ufl
        sres = (np.float32(1.0) - du) * z_l + du * z_r       # (slice_h, npx)
        Y = jnp.maximum(np.float32(1.0) - jnp.abs(rrf - v_loc),
                        np.float32(0.0))
        t = (Y * sres).sum(axis=0, keepdims=True)            # (1, npx)
        val = jnp.minimum(jnp.trunc(t + np.float32(0.5)), np.float32(255.0))
        # static store offsets (unrolled keypoint loop): dynamic (1, 1024)
        # sublane stores cost ~27us on this chip
        out_ref[k:k + 1, :] = jnp.where(
            valid_px, val, 0.0).astype(jnp.int32).astype(jnp.uint8)

    for k in range(_WARPB_KPB):
        body(k)


@functools.partial(jax.jit, static_argnums=(6, 7),
                   static_argnames=("s_max",))
def _warp_patches_windows_big_impl(image, x, y, size, angle, valid,
                                   cropping_scale: float, s_max: float):
    """(N, 1024) uint8 warped patches for large-keypoint octave buckets."""
    h, w = image.shape
    geom = warp_geom(s_max)
    base_y, base_x, pad_h, pad_w = plan_windows(x, y, h, w, geom)
    padded = pad_image(image, pad_h, pad_w)
    order = jnp.argsort(_window_key(base_y, base_x, pad_w))
    srt = [jnp.take(a, order) for a in (base_y, base_x, x, y, size, angle)]
    (by, bx, kx, ky, ks, ka), n_pad, n = _pad_n(srt, _WARPB_KPB)
    grp, start, nstart = _window_groups(
        _window_key(by, bx, pad_w), _WARPB_KPB)
    meta = ((grp & 1) | (start << 1)).astype(jnp.int32)
    kp = _affine_block(kx, ky, ks, ka, cropping_scale)

    kernel = functools.partial(_warp_kernel_big,
                               img_w=w, img_h=h, win_h=geom.win_h,
                               win_w=geom.win_w, half=geom.half)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(n_pad // _WARPB_KPB,),
            in_specs=[
                pl.BlockSpec((_WARPB_KPB, 8), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((_WARPB_KPB, 1024), lambda i, *_: (i, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, geom.win_h, geom.win_w), jnp.uint8),
                pltpu.VMEM((2, geom.win_h, geom.win_w), jnp.bfloat16),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((n_pad, 1024), jnp.uint8),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(by, bx, meta, nstart, kp, padded)
    inv = jnp.zeros_like(order).at[order].set(
        jnp.arange(order.shape[0], dtype=order.dtype))
    return jnp.where(valid[:, None], jnp.take(out[:n], inv, axis=0), 0)


bad_descriptors_windows = _chunked(_bad_descriptors_windows_impl, 5)
ic_angles_windows = _chunked(_ic_angles_windows_impl, 3)
warp_patches_windows = _chunked(_warp_patches_windows_impl, 5)
warp_patches_windows_big = _chunked(_warp_patches_windows_big_impl, 5)
hs_desc_windows = _chunked(_hs_desc_windows_impl, 5)
