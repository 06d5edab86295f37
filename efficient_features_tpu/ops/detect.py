"""TPU keypoint detection ops: dense FAST-9, integer Harris, radius NMS, top-k.

TPU-first redesign of the reference's per-level detect pipeline
(cuda_efficient_features.cpp:244-273): instead of atomic compaction with host
count readbacks (the reference's two pipeline stalls, cuda_fast.cu:241-245 and
cuda_efficient_features.cu:337-339), everything is dense, fixed-shape and
masked, so the whole pipeline stays inside one jit with zero host syncs.

All outputs are exact integers (see utils/semantics.py), bit-identical to the
CPU oracle.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..utils import semantics as S

RESP_SENTINEL = np.float32(-np.inf)


def _shift2d(a: jax.Array, dy: int, dx: int, fill) -> jax.Array:
    """out[y, x] = a[y + dy, x + dx], `fill`-padded (any shift magnitude)."""
    h, w = a.shape
    if abs(dy) >= h or abs(dx) >= w:
        return jnp.full_like(a, fill)
    pad_y = (max(-dy, 0), max(dy, 0))
    pad_x = (max(-dx, 0), max(dx, 0))
    p = jnp.pad(a, (pad_y, pad_x), constant_values=fill)
    return jax.lax.slice(
        p, (pad_y[0] + dy, pad_x[0] + dx), (pad_y[0] + dy + h, pad_x[0] + dx + w))


# ---------------------------------------------------------------------------
# FAST-9 (cuda_fast.cu:42-222) — dense bitmask formulation
# ---------------------------------------------------------------------------


def fast_corner_mask(img: jax.Array, threshold) -> jax.Array:
    """Dense FAST-9 corner map (bool).  The 8KB LUT of the reference is
    replaced by an arithmetic rotate-AND run-of-9 test (VPU-friendly)."""
    v = img.astype(jnp.int16)
    th = jnp.asarray(threshold, jnp.int16)
    hi = v + th
    lo = v - th
    brighter = jnp.zeros(img.shape, jnp.uint16)
    darker = jnp.zeros(img.shape, jnp.uint16)
    for bit, (dy, dx) in enumerate(S.FAST_CIRCLE):
        sh = _shift2d(v, int(dy), int(dx), 0)
        brighter = brighter | (sh > hi).astype(jnp.uint16) << np.uint16(bit)
        darker = darker | (sh < lo).astype(jnp.uint16) << np.uint16(bit)

    def any_run9(m):
        acc = m
        for s in range(1, S.FAST_ARC_LEN):
            acc = acc & ((m >> np.uint16(s)) | (m << np.uint16(16 - s)))
        return acc != 0

    corner = any_run9(brighter) | any_run9(darker)
    h, w = img.shape
    edge = jnp.zeros(img.shape, bool).at[3:h - 3, 3:w - 3].set(True) \
        if h > 6 and w > 6 else jnp.zeros(img.shape, bool)
    return corner & edge


# ---------------------------------------------------------------------------
# Harris response (cuda_efficient_features.cu:99-139)
# ---------------------------------------------------------------------------
# Exact-integer Sobel + 7x7 window sums (int32), then FMA-immune f32 math:
# operand significands are truncated (utils/semantics.py, deviation 4) so that
# every multiply in det/trace is EXACT in f32 — an exact product is identical
# whether the compiler emits separate mul+sub or a contracted FMA, so the
# response map is bit-identical across NumPy / XLA-CPU / XLA-TPU regardless of
# codegen, and every NMS / top-k selection decision matches the CPU oracle.


def _trunc_mantissa(x: jax.Array, drop_bits: int) -> jax.Array:
    i = jax.lax.bitcast_convert_type(x, jnp.int32)
    mask = jnp.int32(~((1 << drop_bits) - 1))
    return jax.lax.bitcast_convert_type(i & mask, jnp.float32)


def harris_response(img: jax.Array) -> jax.Array:
    """Dense float32 Harris response; see cpu.reference.harris_response."""
    a = img.astype(jnp.int32)

    def sh(dy, dx):
        return _shift2d(a, dy, dx, 0)

    dx = ((sh(1, 1) + 2 * sh(0, 1) + sh(-1, 1))
          - (sh(1, -1) + 2 * sh(0, -1) + sh(-1, -1)))
    dy = ((sh(1, -1) + 2 * sh(1, 0) + sh(1, 1))
          - (sh(-1, -1) + 2 * sh(-1, 0) + sh(-1, 1)))

    def box7(m):
        # separable 7-tap window sum via shifts (int32-safe: |m| <= 1.04e6)
        rows = sum(_shift2d(m, 0, d, 0) for d in range(-3, 4))
        return sum(_shift2d(rows, d, 0, 0) for d in range(-3, 4))

    s2 = np.float32(S.HARRIS_SCALE) * np.float32(S.HARRIS_SCALE)
    # 12-bit significands -> 24-bit exact products
    sxx = _trunc_mantissa(s2 * box7(dx * dx).astype(jnp.float32), 12)
    sxy = _trunc_mantissa(s2 * box7(dx * dy).astype(jnp.float32), 12)
    syy = _trunc_mantissa(s2 * box7(dy * dy).astype(jnp.float32), 12)
    # 11-bit trace -> 22-bit square; k = 3/64 (2-bit) -> exact k*tr^2
    tr = _trunc_mantissa(sxx + syy, 13)
    det = sxx * syy - sxy * sxy          # products exact; one rounding
    return det - np.float32(S.HARRIS_K) * (tr * tr)  # exact q; one rounding


# ---------------------------------------------------------------------------
# Radius NMS (deterministic disc max-filter; see cpu.reference.radius_nms)
# ---------------------------------------------------------------------------


def radius_nms(resp: jax.Array, corner: jax.Array, radius: int) -> jax.Array:
    """Survivor mask: corner & (resp >= max over open disc).  Log-depth
    decomposition into per-dy centered row max-filters; float maxes are
    order-free, so results are bit-identical to the oracle."""
    masked = jnp.where(corner, resp, RESP_SENTINEL)
    h, w = masked.shape
    padded = jnp.pad(masked, ((0, 0), (radius, radius)),
                     constant_values=RESP_SENTINEL)

    def shx(arr, k):
        return _shift2d(arr, 0, k, RESP_SENTINEL)

    pows = {1: padded}
    p = 1
    while 2 * p <= 2 * radius + 1:
        pows[2 * p] = jnp.maximum(pows[p], shx(pows[p], p))
        p *= 2

    def centered_rowmax(wdx: int) -> jax.Array:
        width = 2 * wdx + 1
        k = 1
        while k * 2 <= width:
            k *= 2
        left = pows[k]
        if k != width:
            left = jnp.maximum(left, shx(pows[k], width - k))
        return jax.lax.slice(left, (0, radius - wdx), (h, radius - wdx + w))

    disc_max = jnp.full_like(masked, RESP_SENTINEL)
    # share identical-width row filters across dy values
    by_width: dict[int, list[int]] = {}
    for dy, wdx in S.disc_row_extents(radius):
        by_width.setdefault(wdx, []).append(dy)
    for wdx, dys in by_width.items():
        rm = centered_rowmax(wdx)
        for dy in dys:
            disc_max = jnp.maximum(disc_max, _shift2d(rm, dy, 0, RESP_SENTINEL))
    return corner & (masked >= disc_max)


# ---------------------------------------------------------------------------
# Fixed-shape top-k selection (replaces thrust sort + truncate,
# cuda_efficient_features.cu:344-358)
# ---------------------------------------------------------------------------


def select_topk(resp: jax.Array, survivor: jax.Array, quota: int,
                nms_radius: int | None = None):
    """Top `quota` survivors by (response desc, flat index asc).

    Returns (ys, xs, resp, valid) fixed-shape (quota,) arrays.  jax.lax.top_k
    is stable (ties resolved to the lowest index), matching the oracle's
    lexsort semantics exactly.

    A two-stage exact top-k runs first per row-aligned ~32K chunk and then
    over the per-chunk winners: any global top-k element is in its chunk's
    top-k, and chunk-major concatenation preserves the global index order of
    ties, so the result is identical to the flat top-k (~35% faster on large
    maps).  For large quotas the per-chunk k is instead capped by the NMS
    sparsity bound (untied survivors in one row are >= `nms_radius` apart,
    so a chunk of `rows` rows holds at most rows*(ceil(w/radius)+1) untied
    survivors); tied co-survivors can exceed the bound, so per-chunk survivor
    counts are checked and any overflow falls back to the flat exact top-k
    via lax.cond — the capped path is therefore bit-exact for every input.
    """
    h, w = resp.shape
    # canonicalize -0.0 -> +0.0: XLA sorts f32 by TOTAL order (+0 > -0)
    # while the numpy oracle's lexsort treats them equal; mixed-sign zero
    # ties would order differently.  (The Harris formulation never produces
    # -0.0; this keeps the selection contract exact for arbitrary inputs.)
    resp = jnp.where(resp == 0, jnp.float32(0.0), resp)
    masked = jnp.where(survivor, resp, RESP_SENTINEL).reshape(-1)
    n = h * w
    quota = min(quota, n)

    def flat(_=None):
        v, i = jax.lax.top_k(masked, quota)
        return v, i

    # NMS 8x8 block reduction: with nonmax_radius >= 10, any two pixels in
    # one 8x8 block are < 10 px apart (diag 9.9), so a block holds at most
    # ONE untied survivor — reduce the map 64x (block max + its lowest
    # global index), then an exact (value desc, index asc) two-key sort of
    # the tiny reduced set.  Tied co-survivors inside one block would be
    # merged, so per-block survivor counts gate a lax.cond fallback to the
    # dense top-k — bit-exact for every input.
    if (nms_radius is not None and nms_radius >= 10 and n >= 4 * 65536
            and quota <= (h // 8 + 1) * (w // 8 + 1)):
        hp = -(-h // 8) * 8
        wp = -(-w // 8) * 8
        m2 = jnp.pad(masked.reshape(h, w), ((0, hp - h), (0, wp - w)),
                     constant_values=RESP_SENTINEL)
        blk = m2.reshape(hp // 8, 8, wp // 8, 8)
        bmax = blk.max(axis=(1, 3))                     # (hp/8, wp/8)
        alive = blk != RESP_SENTINEL
        counts = alive.sum(axis=(1, 3))
        gidx = (jax.lax.broadcasted_iota(jnp.int32, (hp, wp), 0) * w
                + jax.lax.broadcasted_iota(jnp.int32, (hp, wp), 1)
                ).reshape(hp // 8, 8, wp // 8, 8)
        cand = (blk == bmax[:, None, :, None]) & alive
        bidx = jnp.where(cand, gidx, jnp.int32(n)).min(axis=(1, 3))

        def reduced(_=None):
            nb = bmax.size
            kq = min(quota, nb)
            negv, gi = jax.lax.sort(
                (-bmax.reshape(-1), bidx.reshape(-1)), num_keys=2)
            v = -negv[:kq]
            gi = gi[:kq]
            if kq < quota:
                v = jnp.pad(v, (0, quota - kq),
                            constant_values=RESP_SENTINEL)
                gi = jnp.pad(gi, (0, quota - kq))
            return v, gi

        vals, idx = jax.lax.cond(jnp.any(counts > 1), flat, reduced, None)
        valid = vals != RESP_SENTINEL
        ys = (idx // w).astype(jnp.int32)
        xs = (idx % w).astype(jnp.int32)
        return (jnp.where(valid, ys, 0), jnp.where(valid, xs, 0),
                jnp.where(valid, vals, jnp.float32(0)), valid)

    chunk0 = 32768
    vals = idx = None
    if n >= 4 * chunk0 and w <= chunk0 // 2:
        rows = max(1, chunk0 // w)
        csize = rows * w
        nchunks = -(-n // csize)
        k1 = checked = None
        if quota <= csize // 4:
            k1, checked = quota, False
        elif nms_radius is not None:
            cap = min(csize // 2,
                      -(-(rows * (-(-w // nms_radius) + 1)) // 128) * 128)
            if cap < quota and nchunks * cap >= quota:
                k1, checked = cap, True
        if k1 is not None:
            m = jnp.pad(masked, (0, nchunks * csize - n),
                        constant_values=RESP_SENTINEL).reshape(nchunks, csize)
            v1, i1 = jax.lax.top_k(m, k1)
            gidx = i1 + (jnp.arange(nchunks, dtype=jnp.int32)
                         * csize)[:, None]

            def merged(_=None):
                v, i2 = jax.lax.top_k(v1.reshape(-1), quota)
                return v, jnp.take(gidx.reshape(-1), i2)

            if checked:
                counts = (m != RESP_SENTINEL).sum(axis=1)
                vals, idx = jax.lax.cond(jnp.any(counts > k1), flat, merged,
                                         None)
            else:
                vals, idx = merged()
    if vals is None:
        vals, idx = flat()
    valid = vals != RESP_SENTINEL
    ys = (idx // w).astype(jnp.int32)
    xs = (idx % w).astype(jnp.int32)
    return (jnp.where(valid, ys, 0), jnp.where(valid, xs, 0),
            jnp.where(valid, vals, jnp.float32(0)), valid)


def select_topk_cells(cellmax, cellrow, cellcnt, h, w, quota,
                      dense_fallback):
    """Exact top-`quota` selection from `fast_harris_nms_cells` outputs.

    Combines the kernel's 8-row cells into 8x8 blocks (<= 1 untied survivor
    per block for nonmax_radius >= 10) and two-key sorts (value desc, global
    index asc) the tiny block set — the dense suppressed map never exists.
    `dense_fallback` is a traced thunk returning the exact dense
    (vals, flat_idx) selection; it runs only when some block holds tied
    co-survivors (counts > 1), keeping the result bit-exact for all inputs.
    """
    n = h * w
    quota = min(quota, n)
    big = jnp.int32(2147483647)
    # -0.0 canonicalization (see select_topk)
    cellmax = jnp.where(cellmax == 0, jnp.float32(0.0), cellmax)
    cm = cellmax[:, :w]
    cr = cellrow[:, :w]
    cc = cellcnt[:, :w]
    H8 = cm.shape[0]
    w8 = -(-w // 8)
    padc = w8 * 8 - w
    if padc:
        cm = jnp.pad(cm, ((0, 0), (0, padc)), constant_values=RESP_SENTINEL)
        cr = jnp.pad(cr, ((0, 0), (0, padc)), constant_values=big)
        cc = jnp.pad(cc, ((0, 0), (0, padc)))
    b_m = cm.reshape(H8, w8, 8)
    alive = b_m != RESP_SENTINEL
    bmax = b_m.max(axis=2)
    counts = cc.reshape(H8, w8, 8).sum(axis=2)
    cols = jnp.arange(w8 * 8, dtype=jnp.int32).reshape(1, w8, 8)
    g3 = jnp.where(alive, cr.reshape(H8, w8, 8) * jnp.int32(w) + cols,
                   jnp.int32(n))
    cand = (b_m == bmax[..., None]) & alive
    bidx = jnp.where(cand, g3, jnp.int32(n)).min(axis=2)

    def reduced(_=None):
        nb = bmax.size
        kq = min(quota, nb)
        negv, gi = jax.lax.sort(
            (-bmax.reshape(-1), bidx.reshape(-1)), num_keys=2)
        v = -negv[:kq]
        gi = gi[:kq]
        if kq < quota:
            v = jnp.pad(v, (0, quota - kq), constant_values=RESP_SENTINEL)
            gi = jnp.pad(gi, (0, quota - kq))
        return v, gi

    vals, idx = jax.lax.cond(jnp.any(counts > 1),
                             lambda _: tuple(dense_fallback(_)), reduced,
                             None)
    valid = vals != RESP_SENTINEL
    ys = (idx // w).astype(jnp.int32)
    xs = (idx % w).astype(jnp.int32)
    return (jnp.where(valid, ys, 0), jnp.where(valid, xs, 0),
            jnp.where(valid, vals, jnp.float32(0)), valid)
