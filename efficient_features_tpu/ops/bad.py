"""BAD descriptor on TPU (cuda_bad.cu:121-348).

TPU-first formulation: the per-(keypoint, bit) kernel becomes a fully
vectorized (N, nbits) computation — affine transforms as broadcast arithmetic,
the 16 integral-image reads as XLA gathers, the warp-shuffle bit packing as a
reshape-weighted sum.  Bit-identical to cpu.descriptors.bad_descriptors.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..models.params import load_bad_params

DEG2RAD = np.float32(0.017453292519943295)
MARGIN = np.float32(1.75)
PATCH_W = PATCH_H = 32


def affine_rows(x, y, size, angle, scale_factor, pw=PATCH_W, ph=PATCH_H):
    """Patch->image affine rows (float32); see cpu.descriptors._affine_rows."""
    s = np.float32(scale_factor) * size / np.float32(0.5 * (pw + ph))
    theta = angle * DEG2RAD
    has = angle >= 0
    cost = jnp.where(has, jnp.cos(theta), np.float32(1.0))
    sint = jnp.where(has, jnp.sin(theta), np.float32(0.0))
    m00 = s * cost
    m01 = -s * sint
    m02 = (-s * cost + s * sint) * np.float32(pw * 0.5) + x
    m10 = s * sint
    m11 = s * cost
    m12 = (-s * sint - s * cost) * np.float32(ph * 0.5) + y
    return m00, m01, m02, m10, m11, m12, s


def pack_bits_msb(bits: jax.Array) -> jax.Array:
    """(N, nbits) {0,1} int32 -> (N, nbits//8) uint8, MSB-first."""
    n, nbits = bits.shape
    b = bits.reshape(n, nbits // 8, 8)
    weights = jnp.asarray(1 << np.arange(7, -1, -1), jnp.int32)
    return (b * weights).sum(axis=2).astype(jnp.uint8)


def _round_num(v: jax.Array) -> jax.Array:
    """CV_ROUNDNUM: trunc(v + 0.5) (cuda_bad.cu:52)."""
    return jnp.trunc(v + np.float32(0.5)).astype(jnp.int32)


def _trunc12(v: jax.Array) -> jax.Array:
    """Truncate |v| to 12 significant bits (zero the low 12 mantissa bits).

    Products of two such values carry <= 24 significant bits and are therefore
    EXACT in f32 — immune to backend-dependent FMA contraction.  Used by the
    large-box border compare (see bad_descriptors)."""
    iv = jax.lax.bitcast_convert_type(v, jnp.int32)
    return jax.lax.bitcast_convert_type(iv & jnp.int32(~0xFFF), jnp.float32)


def bad_descriptors(integral: jax.Array, x, y, size, angle, valid, *,
                    nbits: int = 256, scale_factor: float = 1.0,
                    origin=(0, 0), frame_hw=None) -> jax.Array:
    """(N, nbits//8) uint8 descriptors from a precomputed int32 integral image.

    Invalid slots produce zero rows.

    `origin`/`frame_hw` support band-local integrals for sharded pipelines:
    the integral may cover only the rows/cols starting at global `origin`
    (oy, ox) of a `frame_hw`-sized image; keypoints stay in GLOBAL
    coordinates, and border clamps/tests use the global frame.  Defaults
    reproduce the whole-image behavior.
    """
    boxes_np, th_np = load_bad_params(nbits)
    fh, fw = integral.shape
    if frame_hw is None:
        img_h, img_w = fh - 1, fw - 1
    else:
        img_h, img_w = frame_hw
    oy, ox = origin

    x = x[:, None]
    y = y[:, None]
    size = size[:, None]
    angle = angle[:, None]
    m00, m01, m02, m10, m11, m12, s = affine_rows(x, y, size, angle, scale_factor)

    bx1 = jnp.asarray(boxes_np[:, 0], jnp.float32)[None, :]
    bx2 = jnp.asarray(boxes_np[:, 1], jnp.float32)[None, :]
    by1 = jnp.asarray(boxes_np[:, 2], jnp.float32)[None, :]
    by2 = jnp.asarray(boxes_np[:, 3], jnp.float32)[None, :]
    br = jnp.asarray(boxes_np[:, 4], jnp.float32)[None, :]
    th = jnp.asarray(th_np)[None, :]

    # transformed coords in integral-local space (global minus origin)
    tx1 = _round_num(m00 * bx1 + m01 * by1 + m02) - ox
    ty1 = _round_num(m10 * bx1 + m11 * by1 + m12) - oy
    tx2 = _round_num(m00 * bx2 + m01 * by2 + m02) - ox
    ty2 = _round_num(m10 * bx2 + m11 * by2 + m12) - oy
    tbr = _round_num(s * br)

    ii = integral
    # global clamp bounds expressed in local coords (match the reference's
    # [0, frame-2] / [1, frame-1] corner clamps, cuda_bad.cu:177-218)
    lo_y, hi_y = -oy, img_h + 1 - oy
    lo_x, hi_x = -ox, img_w + 1 - ox

    def gather(iy, ix):
        return ii[jnp.clip(iy, 0, fh - 1), jnp.clip(ix, 0, fw - 1)]

    def box_sum_clamped(cx, cy, r):
        x1 = jnp.clip(cx - r, lo_x, hi_x - 2)
        y1 = jnp.clip(cy - r, lo_y, hi_y - 2)
        x2 = jnp.clip(cx + r + 1, lo_x + 1, hi_x - 1)
        y2 = jnp.clip(cy + r + 1, lo_y + 1, hi_y - 1)
        ssum = (gather(y1, x1) + gather(y2, x2)
                - gather(y1, x2) - gather(y2, x1))
        area = (y2 - y1) * (x2 - x1)
        return ssum, area

    def box_sum_fast(cx, cy, r):
        # interior path; clip for memory safety only (reference relies on the
        # 1.75 margin keeping these in-bounds)
        return (gather(cy - r, cx - r) + gather(cy + r + 1, cx + r + 1)
                - gather(cy - r, cx + r + 1) - gather(cy + r + 1, cx - r))

    # division-free border compare (see cpu.descriptors.bad_descriptors):
    # TPU f32 division is a reciprocal approximation, so compare
    # s1*a2 - s2*a1 <= th * a1*a2 with exact int32 products.  The int32
    # products are exact only while a1*a2 < 2^22 (then |s*a| <= 255*a1*a2
    # < 2^30); for larger boxes (user keypoints with size ≳ 120) switch to
    # 12-significant-bit truncated f32 operands whose products are exact —
    # both branches are deterministic and bit-identical across backends.
    s1b, a1b = box_sum_clamped(tx1, ty1, tbr)
    s2b, a2b = box_sum_clamped(tx2, ty2, tbr)
    a1f = a1b.astype(jnp.float32)
    a2f = a2b.astype(jnp.float32)
    safe = a1f * a2f < np.float32(1 << 22)
    lhs_i = (s1b * a2b - s2b * a1b).astype(jnp.float32)
    rhs_i = th * (a1b * a2b).astype(jnp.float32)
    s1t = _trunc12(s1b.astype(jnp.float32))
    s2t = _trunc12(s2b.astype(jnp.float32))
    a1t = _trunc12(a1f)
    a2t = _trunc12(a2f)
    lhs_t = s1t * a2t - s2t * a1t
    rhs_t = th * (a1t * a2t)
    bit_border = jnp.where(safe, lhs_i <= rhs_i, lhs_t <= rhs_t)

    side = 1 + 2 * tbr
    area_resp = box_sum_fast(tx1, ty1, tbr) - box_sum_fast(tx2, ty2, tbr)
    bit_fast = (area_resp.astype(jnp.float32)
                <= th * (side * side).astype(jnp.float32))

    sb = np.float32(scale_factor) * size / np.float32(PATCH_W + PATCH_H)
    bw = np.float32(PATCH_W) * sb * MARGIN
    bh = np.float32(PATCH_H) * sb * MARGIN
    in_border = ((x < bw) | (x + bw >= np.float32(img_w)) |
                 (y < bh) | (y + bh >= np.float32(img_h)))

    bits = jnp.where(in_border, bit_border, bit_fast).astype(jnp.int32)
    bits = jnp.where(valid[:, None], bits, 0)
    return pack_bits_msb(bits)
