"""Pallas TPU kernels for the dense detection stages.

Kernel 1 (fast_harris): fuses the reference's calcKeypointsKernel
(cuda_fast.cu:168-222) and calcResponsesKernel (cuda_efficient_features.cu:
218-225) into one tiled pass: per VMEM tile, FAST-9 segment test + exact-int
Harris structure tensor + FMA-immune response quantization + border mask,
emitting a dense f32 response map (-inf at non-corners).  One u8 read + one
f32 write of HBM per pixel — the reference needs several kernel round trips
plus two host count readbacks.

Kernel 2 (radius_nms): disc max-filter over the response map (replacing the
reference's grid-bucketed atomic NMS, cuda_efficient_features.cu:174-216),
decomposed into per-dy centered row max-filters built from power-of-2 running
maxima — all in VMEM, bit-identical to the oracle (float max is order-free).

Halo handling: the input lives in HBM (BlockSpec memory_space=ANY) and each
program DMAs its tile + halo into VMEM scratch — BlockSpec blocks cannot
overlap, so automatic pipelining is traded for explicit halo copies.  Inputs
are pre-padded so every halo load is in-bounds; true dimensions arrive as
scalar prefetch and drive the border mask.  On non-TPU backends the kernels
run in interpreter mode (used by the CPU-mesh test suite).
"""
from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils import semantics as S

NEG_INF = np.float32(-np.inf)

_FH_HALO = 4        # FAST circle 3; Harris sobel(1) + window(3)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _trunc_mantissa(x, drop):
    i = pltpu.bitcast(x, jnp.int32)
    return pltpu.bitcast(i & jnp.int32(~((1 << drop) - 1)), jnp.float32)


def _fast_corner(tap, threshold):
    """FAST-9 segment test as full-tile vector ops (cuda_fast.cu:42-166
    semantics; the 8 KB LUT is replaced by bit algebra): per mask the
    cyclic run-of-9 test is AND_{s=0..8} rot16(mask, s) != 0 on the
    brighter / darker indicator words.

    HISTORY (round 5): a "log-doubled dual-field" variant (both masks in
    one int32, darker in bits 16..31, 4 field-wise rotate-AND steps)
    replaced this chain in round 9 and turned out to MISCOMPILE under
    Mosaic — its compiled binary deterministically misses corners whose
    run WRAPS the index-0 tap (e.g. darker = 0x80FF: oracle corner, kernel
    miss; 675 misses on the 200x280 test scene, 1021 at FHD), while the
    same algebra is exhaustively correct in numpy/interpret over all 2^16
    masks.  The regression shipped because the validating A/B compared the
    two variants IN ONE PROCESS: compiled kernel binaries are cached by
    (kernel name, signature), not content, so the second variant silently
    re-ran the first variant's binary and measured "bit-identical"
    (CLAUDE.md: Mosaic kernel-cache collision).  Caught by the compiled
    TPU tier vs the oracle.  The chain below is the rounds-1-8 formulation
    with compiled-vs-oracle parity at every size; do NOT reintroduce the
    packed form without a decollided (renamed-kernel or cross-process)
    compiled parity check."""
    center = tap(0, 0)
    hi = center + threshold
    lo = center - threshold
    brighter = jnp.zeros_like(center)
    darker = jnp.zeros_like(center)
    for bit, (dy, dx) in enumerate(S.FAST_CIRCLE):
        v = tap(int(dy), int(dx))
        brighter = brighter | ((v > hi).astype(jnp.int32) << bit)
        darker = darker | ((v < lo).astype(jnp.int32) << bit)

    def any_run(m):
        acc = m
        for s in range(1, S.FAST_ARC_LEN):
            acc = acc & (((m >> s) | (m << (16 - s))) & 0xFFFF)
        return acc != 0

    return any_run(brighter) | any_run(darker)


# ---------------------------------------------------------------------------
# Kernel 1: fused FAST + Harris
# ---------------------------------------------------------------------------


def _fast_harris_kernel(dims_ref, img_hbm, out_ref, win_ref, sem,
                        *, threshold, tile_h, tile_w, halo_y, halo_x):
    ti = pl.program_id(0)
    tj = pl.program_id(1)
    ph = tile_h + 2 * halo_y
    pw = tile_w + 2 * halo_x

    copy = pltpu.make_async_copy(
        img_hbm.at[pl.ds(ti * tile_h, ph), pl.ds(tj * tile_w, pw)],
        win_ref, sem)
    copy.start()
    copy.wait()

    win = win_ref[...].astype(jnp.int32)

    def sh(dy, dx, hh, ww, oy, ox):
        return jax.lax.slice(win, (oy + dy, ox + dx),
                             (oy + dy + hh, ox + dx + ww))

    # ---- FAST-9 ----
    corner = _fast_corner(
        lambda dy, dx: sh(dy, dx, tile_h, tile_w, halo_y, halo_x), threshold)

    # ---- Harris (exact int32 sums, FMA-immune f32 combine) ----
    eh = tile_h + 6
    ew = tile_w + 6

    def shd(dy, dx):
        return sh(dy, dx, eh, ew, halo_y - 3, halo_x - 3)

    gx = ((shd(1, 1) + 2 * shd(0, 1) + shd(-1, 1))
          - (shd(1, -1) + 2 * shd(0, -1) + shd(-1, -1)))
    gy = ((shd(1, -1) + 2 * shd(1, 0) + shd(1, 1))
          - (shd(-1, -1) + 2 * shd(-1, 0) + shd(-1, 1)))

    def box7(m):
        rows = sum(jax.lax.slice(m, (0, 3 + d), (eh, 3 + d + tile_w))
                   for d in range(-3, 4))
        return sum(jax.lax.slice(rows, (3 + d, 0), (3 + d + tile_h, tile_w))
                   for d in range(-3, 4))

    s2 = np.float32(S.HARRIS_SCALE) * np.float32(S.HARRIS_SCALE)
    sxx = _trunc_mantissa(s2 * box7(gx * gx).astype(jnp.float32), 12)
    sxy = _trunc_mantissa(s2 * box7(gx * gy).astype(jnp.float32), 12)
    syy = _trunc_mantissa(s2 * box7(gy * gy).astype(jnp.float32), 12)
    tr = _trunc_mantissa(sxx + syy, 13)
    resp = (sxx * syy - sxy * sxy) - np.float32(S.HARRIS_K) * (tr * tr)

    # ---- border mask ----
    true_h = dims_ref[0]
    true_w = dims_ref[1]
    gy_ids = jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 0) \
        + ti * tile_h
    gx_ids = jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 1) \
        + tj * tile_w
    b = S.HALF_PATCH_SIZE
    inb = ((gy_ids >= b) & (gy_ids < true_h - b)
           & (gx_ids >= b) & (gx_ids < true_w - b))

    out_ref[...] = jnp.where(corner & inb, resp, NEG_INF)


def _tile_dims(h, w, h_step=8):
    # per-tile fixed cost (window DMA issue + grid step) is significant, so
    # prefer wide tiles: 4K at (128, 1024) runs ~30% faster than (128, 512)
    # while all live VMEM temporaries stay well under the raised vmem limit.
    # Round 4: fit the tile to the level dims — a fixed (128, 1024) tile
    # padded up to 28% of the window area at mid-pyramid levels (e.g. a
    # 3200-wide level costs 4x(1024+halos) columns; 896-wide tiles cover it
    # in 4x(896+halos)).  Cost model per axis: tiles x (tile + window
    # overhang + FIXED), FIXED charging the measured per-tile issue cost
    # (round 3: (128,512) ran ~30% slower than (128,1024) at equal bytes);
    # ties prefer the larger tile.  tile_w stays a 128 multiple (DMA start
    # alignment), tile_h an `h_step` multiple: 8 for the dense kernels
    # (sublanes), 64 for the cells kernel — its (tile_h/8, tile_w) output
    # blocks must keep the sublane dim a multiple of 8 whenever the grid
    # has more than one row (Mosaic block-shape rule; a 120-row tile at FHD
    # fails to lower).
    def fit(n, step, cap, overhang, fixed):
        best = None
        for t in range(step, cap + 1, step):
            cost = -(-n // t) * (t + overhang + fixed)
            if best is None or cost < best[0] or \
                    (cost == best[0] and t > best[1]):
                best = (cost, t)
        return best[1]

    # EFF_TPU_CELLS_TILE_CAP: A/B knob for taller tiles (e.g. 256 halves
    # the vertical halo+extension overhang share; VMEM allows it after the
    # raised limit) — read at trace time like EFF_TPU_BAD_FORMULATION
    h_cap = int(os.environ.get("EFF_TPU_CELLS_TILE_CAP", "128"))
    tile_h = min(h_cap, max(8, -(-h // 8) * 8))
    if h > h_cap:
        tile_h = fit(h, h_step, h_cap, 48, 16)
    tile_w = min(1024, max(128, -(-w // 128) * 128))
    if w > 1024:
        tile_w = fit(w, 128, 1024, 128, 128)
    return tile_h, tile_w


@functools.partial(jax.jit, static_argnums=(1,))
def fast_harris(image: jax.Array, threshold: int) -> jax.Array:
    """Dense masked response map: f32, -inf where not a border-valid FAST
    corner.  Bit-identical to where(corner & border, harris_response, -inf)
    from the oracle."""
    h, w = image.shape
    tile_h, tile_w = _tile_dims(h, w)
    gh = -(-h // tile_h)
    gw = -(-w // tile_w)
    # Mosaic DMA slices must be lane/sublane aligned: 8-row / 128-col halos
    halo_y, halo_x = 8, 128
    padded = jnp.pad(image, ((halo_y, gh * tile_h - h + halo_y),
                             (halo_x, gw * tile_w - w + halo_x)))
    dims = jnp.array([h, w], jnp.int32)

    kernel = functools.partial(_fast_harris_kernel, threshold=threshold,
                               tile_h=tile_h, tile_w=tile_w,
                               halo_y=halo_y, halo_x=halo_x)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(gh, gw),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((tile_h, tile_w), lambda i, j, *_: (i, j),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((tile_h + 2 * halo_y, tile_w + 2 * halo_x),
                           jnp.uint8),
                pltpu.SemaphoreType.DMA,
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((gh * tile_h, gw * tile_w), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(dims, padded)
    return out[:h, :w]


# ---------------------------------------------------------------------------
# Kernel 2: radius NMS (disc max-filter)
# ---------------------------------------------------------------------------


def _nms_kernel(resp_hbm, out_ref, win_ref, sem, *, radius, tile_h, tile_w,
                halo_y, halo_x):
    ti = pl.program_id(0)
    tj = pl.program_id(1)
    ph = tile_h + 2 * halo_y
    pw = tile_w + 2 * halo_x

    copy = pltpu.make_async_copy(
        resp_hbm.at[pl.ds(ti * tile_h, ph), pl.ds(tj * tile_w, pw)],
        win_ref, sem)
    copy.start()
    copy.wait()

    a = win_ref[...]

    # power-of-2 left-aligned running row maxima on the full (ph, pw) window
    def shx(arr, k, width):
        # out[y, x] = arr[y, x + k] over a width-`width` result
        return jax.lax.slice(arr, (0, k), (ph, k + width))

    pows = {1: a}
    p = 1
    while 2 * p <= 2 * radius + 1:
        prev = pows[p]
        wprev = prev.shape[1]
        wnew = wprev - p
        pows[2 * p] = jnp.maximum(
            jax.lax.slice(prev, (0, 0), (ph, wnew)),
            jax.lax.slice(prev, (0, p), (ph, p + wnew)))
        p *= 2

    center = jax.lax.slice(a, (halo_y, halo_x),
                           (halo_y + tile_h, halo_x + tile_w))
    disc_max = jnp.full((tile_h, tile_w), NEG_INF)
    for dy, wdx in S.disc_row_extents(radius):
        width = 2 * wdx + 1
        k = 1
        while k * 2 <= width:
            k *= 2
        left = pows[k]
        if k != width:
            wk = left.shape[1]
            wnew = wk - (width - k)
            left = jnp.maximum(
                jax.lax.slice(left, (0, 0), (ph, wnew)),
                jax.lax.slice(left, (0, width - k), (ph, width - k + wnew)))
        # left[y, x] = max a[y, x : x + width]; center window starts at
        # (halo_y + dy, halo_x - wdx) in window coords
        contrib = jax.lax.slice(left, (halo_y + dy, halo_x - wdx),
                                (halo_y + dy + tile_h, halo_x - wdx + tile_w))
        disc_max = jnp.maximum(disc_max, contrib)

    out_ref[...] = (center != NEG_INF) & (center >= disc_max)


@functools.partial(jax.jit, static_argnums=(1,))
def radius_nms(resp: jax.Array, radius: int) -> jax.Array:
    """Survivor mask over a -inf-masked response map; ties co-survive."""
    h, w = resp.shape
    tile_h, tile_w = _tile_dims(h, w)
    gh = -(-h // tile_h)
    gw = -(-w // tile_w)
    halo_y = -(-radius // 8) * 8
    halo_x = 128
    assert radius <= 128, "radius > 128 unsupported by the Pallas NMS kernel"
    padded = jnp.pad(resp, ((halo_y, gh * tile_h - h + halo_y),
                            (halo_x, gw * tile_w - w + halo_x)),
                     constant_values=NEG_INF)

    kernel = functools.partial(_nms_kernel, radius=radius,
                               tile_h=tile_h, tile_w=tile_w,
                               halo_y=halo_y, halo_x=halo_x)
    out = pl.pallas_call(
        kernel,
        grid=(gh, gw),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((tile_h, tile_w), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((tile_h + 2 * halo_y, tile_w + 2 * halo_x),
                       jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        out_shape=jax.ShapeDtypeStruct((gh * tile_h, gw * tile_w), bool),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(padded)
    return out[:h, :w]


# ---------------------------------------------------------------------------
# Fused kernel: FAST + Harris + radius NMS in one pass
# ---------------------------------------------------------------------------
# Computes the masked response on an extended region (tile + NMS disc reach)
# and suppresses in-VMEM, so the dense detect path writes only the final
# suppressed response map to HBM — the unfused pair round-trips the full
# response map once more.


def _disc_max(masked, radius, R, eh, tile_h, tile_w):
    """Disc max-filter of the extended masked response, evaluated on the
    tile.  f32 max is exactly associative/commutative (no NaNs here), so
    any reduction tree is bit-identical to the per-row loop; this one
    minimizes full-tile vector passes (the kernel's bounding resource):

    - horizontal: one shared pow-2 ladder, then ONE row-max per distinct
      disc half-width (rows sharing a width reuse it);
    - vertical: per width, the disc rows form 1-2 contiguous dy bands
      (widths shrink monotonically with |dy|); each band is covered by a
      shared per-width vertical pow-2 ladder + <=2 combines instead of
      one slice+max per row.  At radius 15 this is 21 vertical steps for
      29 rows (the per-row loop paid 29)."""
    pows = {1: masked}
    p = 1
    while 2 * p <= 2 * radius + 1:
        prev = pows[p]
        wprev = prev.shape[1]
        pows[2 * p] = jnp.maximum(
            jax.lax.slice(prev, (0, 0), (eh, wprev - p)),
            jax.lax.slice(prev, (0, p), (eh, wprev)))
        p *= 2

    rows_by_w = {}
    for dy, wdx in S.disc_row_extents(radius):
        rows_by_w.setdefault(wdx, []).append(dy)

    disc_max = jnp.full((tile_h, tile_w), NEG_INF)
    for wdx, dys in sorted(rows_by_w.items()):
        width = 2 * wdx + 1
        k = 1
        while k * 2 <= width:
            k *= 2
        rm = pows[k]
        if k != width:
            wk = rm.shape[1]
            rm = jnp.maximum(
                jax.lax.slice(rm, (0, 0), (eh, wk - (width - k))),
                jax.lax.slice(rm, (0, width - k), (eh, wk)))
        # contiguous dy runs for this width (symmetric around 0)
        dys = sorted(dys)
        runs = [[dys[0], dys[0]]]
        for d in dys[1:]:
            if d == runs[-1][1] + 1:
                runs[-1][1] = d
            else:
                runs.append([d, d])
        # shared vertical ladder on rm: vpows[q][r] = max over rows [r, r+q)
        vpows = {1: rm}
        wrm = rm.shape[1]

        def vgrow(q):
            while q not in vpows:
                # build the smallest missing power bottom-up
                qq = 1
                while 2 * qq in vpows:
                    qq *= 2
                prev = vpows[qq]
                hr = prev.shape[0]
                vpows[2 * qq] = jnp.maximum(
                    jax.lax.slice(prev, (0, 0), (hr - qq, wrm)),
                    jax.lax.slice(prev, (qq, 0), (hr, wrm)))
            return vpows[q]

        for a, b in runs:
            n = b - a + 1
            q = 1
            while q * 2 <= n:
                q *= 2
            v = vgrow(q)
            starts = [a] if q == n else [a, b - q + 1]
            for start in starts:               # 1 combine if q == n, else 2
                disc_max = jnp.maximum(disc_max, jax.lax.slice(
                    v, (R + start, R - wdx),
                    (R + start + tile_h, R - wdx + tile_w)))
    return disc_max


def _fast_harris_nms_kernel(dims_ref, img_hbm, out_ref, win_ref, sem, *,
                            threshold, radius, tile_h, tile_w,
                            halo_y, halo_x):
    ti = pl.program_id(0)
    tj = pl.program_id(1)
    ph = tile_h + 2 * halo_y
    pw = tile_w + 2 * halo_x
    R = radius - 1                      # disc reach: dy*dy+dx*dx < ceil(r^2)
    eh = tile_h + 2 * R                 # extended (suppressor) region
    ew = tile_w + 2 * R

    copy = pltpu.make_async_copy(
        img_hbm.at[pl.ds(ti * tile_h, ph), pl.ds(tj * tile_w, pw)],
        win_ref, sem)
    copy.start()
    copy.wait()

    win = win_ref[...].astype(jnp.int32)
    oy = halo_y - R                     # ext origin inside the window
    ox = halo_x - R

    def sh(dy, dx, hh, ww, o_y, o_x):
        return jax.lax.slice(win, (o_y + dy, o_x + dx),
                             (o_y + dy + hh, o_x + dx + ww))

    # ---- FAST-9 on the extended region ----
    corner = _fast_corner(
        lambda dy, dx: sh(dy, dx, eh, ew, oy, ox), threshold)

    # ---- Harris on the extended region ----
    gh2 = eh + 6
    gw2 = ew + 6

    # memoized: see _fast_harris_nms_reduced_kernel (slices are full-tile
    # vector passes; gx/gy share the 4 diagonal taps)
    shd_cache = {}

    def shd(dy, dx):
        if (dy, dx) not in shd_cache:
            shd_cache[(dy, dx)] = sh(dy, dx, gh2, gw2, oy - 3, ox - 3)
        return shd_cache[(dy, dx)]

    gx = ((shd(1, 1) + 2 * shd(0, 1) + shd(-1, 1))
          - (shd(1, -1) + 2 * shd(0, -1) + shd(-1, -1)))
    gy = ((shd(1, -1) + 2 * shd(1, 0) + shd(1, 1))
          - (shd(-1, -1) + 2 * shd(-1, 0) + shd(-1, 1)))

    def box7(m):
        rows = sum(jax.lax.slice(m, (0, 3 + d), (gh2, 3 + d + ew))
                   for d in range(-3, 4))
        return sum(jax.lax.slice(rows, (3 + d, 0), (3 + d + eh, ew))
                   for d in range(-3, 4))

    s2 = np.float32(S.HARRIS_SCALE) * np.float32(S.HARRIS_SCALE)
    sxx = _trunc_mantissa(s2 * box7(gx * gx).astype(jnp.float32), 12)
    sxy = _trunc_mantissa(s2 * box7(gx * gy).astype(jnp.float32), 12)
    syy = _trunc_mantissa(s2 * box7(gy * gy).astype(jnp.float32), 12)
    tr = _trunc_mantissa(sxx + syy, 13)
    resp = (sxx * syy - sxy * sxy) - np.float32(S.HARRIS_K) * (tr * tr)

    # ---- border mask on the extended region (suppressors outside the image
    # border never participate, matching createMask -> FAST order) ----
    true_h = dims_ref[0]
    true_w = dims_ref[1]
    gy_ids = jax.lax.broadcasted_iota(jnp.int32, (eh, ew), 0) \
        + ti * tile_h - R
    gx_ids = jax.lax.broadcasted_iota(jnp.int32, (eh, ew), 1) \
        + tj * tile_w - R
    b = S.HALF_PATCH_SIZE
    inb = ((gy_ids >= b) & (gy_ids < true_h - b)
           & (gx_ids >= b) & (gx_ids < true_w - b))
    masked = jnp.where(corner & inb, resp, NEG_INF)

    # ---- disc max-filter over the extended map, evaluated on the tile ----
    center_resp = jax.lax.slice(masked, (R, R), (R + tile_h, R + tile_w))
    disc_max = _disc_max(masked, radius, R, eh, tile_h, tile_w)

    survive = (center_resp != NEG_INF) & (center_resp >= disc_max)
    out_ref[...] = jnp.where(survive, center_resp, NEG_INF)


@functools.partial(jax.jit, static_argnums=(1, 2))
def fast_harris_nms(image: jax.Array, threshold: int, radius: int) -> jax.Array:
    """Fused dense detect: f32 response where a border-valid FAST corner
    survives radius NMS, -inf elsewhere.  Bit-identical to
    radius_nms(fast_harris(...)) composed with the oracle."""
    h, w = image.shape
    tile_h, tile_w = _tile_dims(h, w)
    gh = -(-h // tile_h)
    gw = -(-w // tile_w)
    # halo: NMS reach (radius-1) + harris/FAST support (4), aligned 8 rows;
    # columns aligned 64 so the DMA window width (tile_w + 2*halo_x) stays a
    # 128 multiple — at the default radius this is 64, not 128, which cuts
    # the column-halo share of DMA bytes from ~25% to ~12.5% at tile_w=1024
    need = radius - 1 + _FH_HALO
    halo_y = -(-need // 8) * 8
    halo_x = -(-need // 64) * 64
    assert halo_x >= need
    padded = jnp.pad(image, ((halo_y, gh * tile_h - h + halo_y),
                             (halo_x, gw * tile_w - w + halo_x)))
    dims = jnp.array([h, w], jnp.int32)

    kernel = functools.partial(_fast_harris_nms_kernel, threshold=threshold,
                               radius=radius, tile_h=tile_h, tile_w=tile_w,
                               halo_y=halo_y, halo_x=halo_x)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(gh, gw),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((tile_h, tile_w), lambda i, j, *_: (i, j),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((tile_h + 2 * halo_y, tile_w + 2 * halo_x),
                           jnp.uint8),
                pltpu.SemaphoreType.DMA,
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((gh * tile_h, gw * tile_w), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(dims, padded)
    return out[:h, :w]


# Horizontal box7 backend for the cells kernel (trace-time A/B knob, like
# EFF_TPU_CELLS_TILE_CAP): "vpu" (shipped slice+add chain) or "mxu"
# (round-5 verdict A/B: banded one-hot matmuls per 128-column block).
#
# The MXU variant answers the round-4 verdict's structural question — can
# the horizontal stencils ride the idle MXU and break the vector-pass
# floor?  Exactness forces the answer's shape: box7 inputs (gx*gx etc.)
# are ints up to ~2^20 and the 49-tap total reaches ~2^25.6, so bf16
# operands (exact only <= 2^8) need a 3-limb base-256 decomposition and
# f32 accumulation (exact only <= 2^24) pins the contraction to <= 7 taps
# per matmul.  The limb build + recombine costs ~21 full-tile vector
# passes per channel against the ~13 horizontal passes removed — the
# on-chip A/B (tools/ab_cells_mxu.py) measures whether the MXU's free
# FLOPs outrun that limb tax.  Unlike resize (u8 inputs, one bf16-exact
# "limb"), wide-integer exact stencils pay the tax structurally.
# (The env var is read at trace time inside fast_harris_nms_cells.)


def _box7_widths(ew):
    """Distinct block widths of the 128-column tiling of ew (ordered)."""
    widths = []
    x = 0
    while x < ew:
        bw = min(128, ew - x)
        if bw not in widths:
            widths.append(bw)
        x += bw
    return tuple(widths)


def _box7_h_band(bw):
    """Banded one-hot constant for the per-block horizontal 7-tap sum:
    out[:, x] = sum in[:, x..x+6], as a (bw+6, bw) 0/1 bf16 matrix (passed
    to the kernel as a VMEM operand — Pallas kernels cannot capture traced
    constants)."""
    k = np.arange(bw + 6)[:, None]
    c = np.arange(bw)[None, :]
    return jnp.asarray(((k >= c) & (k <= c + 6)).astype(np.float32),
                       jnp.bfloat16)


def _box7_mxu(m, eh, ew, bands):
    """Exact box7 with the HORIZONTAL pass on the MXU.

    Vertical first (int32 slice+add chain, exact); then the horizontal
    7-tap sum rides banded one-hot bf16 matmuls on a base-256 3-limb
    decomposition (every limb value < 2^8 is bf16-exact; per-limb
    contraction of 7 terms < 2^16 is f32-exact), limbs M-stacked so each
    128-column block is ONE matmul against a resident (134, 128) band
    constant; int32 recombine (a<<16)+(b<<8)+c is exact for the signed
    gx*gy channel via two's-complement limb algebra.  Bit-identical to
    the vpu path's int32 box7 by construction."""
    gw2 = m.shape[1]
    v = sum(jax.lax.slice(m, (3 + d, 0), (3 + d + eh, gw2))
            for d in range(-3, 4))                    # (eh, gw2) int32
    # |v| <= 7*1020^2 ~ 2^22.8, so the high limb spans ~[-112, 111] —
    # comfortably bf16-exact (|x| <= 256), but only ~2.3x of headroom:
    # re-derive this bound before changing the radius or input width
    a = (v >> 16).astype(jnp.bfloat16)
    b = ((v >> 8) & 255).astype(jnp.bfloat16)
    c = (v & 255).astype(jnp.bfloat16)
    stack = jnp.concatenate([a, b, c], axis=0)        # (3*eh, gw2)
    blocks = []
    x = 0
    while x < ew:
        bw = min(128, ew - x)
        lhs = jax.lax.slice(stack, (0, x), (3 * eh, x + bw + 6))
        blocks.append(jnp.dot(lhs, bands[bw],
                              preferred_element_type=jnp.float32))
        x += bw
    rows = jnp.concatenate(blocks, axis=1)            # (3*eh, ew) f32
    ra = jax.lax.slice(rows, (0, 0), (eh, ew)).astype(jnp.int32)
    rb = jax.lax.slice(rows, (eh, 0), (2 * eh, ew)).astype(jnp.int32)
    rc = jax.lax.slice(rows, (2 * eh, 0), (3 * eh, ew)).astype(jnp.int32)
    return (ra << 16) + (rb << 8) + rc


# ---------------------------------------------------------------------------
# Kernel 3b: fused FAST+Harris+NMS with CELL-REDUCED output
# ---------------------------------------------------------------------------
# With nonmax_radius >= 10 an 8x8 image block holds at most one untied NMS
# survivor (diag 9.9 < radius), so the dense f32 map (33 MB at 4K) never
# needs to exist: the kernel reduces each 8-row x 1-col cell to (max value,
# lowest global row of a maximal survivor, survivor count) while the tile is
# still in VMEM, and the selection stage works on the 8x-smaller cell arrays
# (the final 8-lane combine happens in XLA on ~4 MB).  Tied co-survivors in
# one 8x8 block are detected from the counts and the caller falls back to
# the dense path, keeping selection bit-exact for every input.


def _fast_harris_nms_reduced_kernel_mxu(*args, **kw):
    """Distinctly-NAMED alias for the box7_kind='mxu' cells kernel.

    Compiled kernel binaries are cached by (kernel name, signature), not
    content (CLAUDE.md: Mosaic kernel-cache collision — the round-5 mxu
    A/B initially "compiled" in 0.2 s and silently re-ran the vpu binary).
    Routing the mxu variant through its own def gives it its own cache
    identity so same-process A/Bs and the compiled-tier parity test
    exercise the real binary."""
    return _fast_harris_nms_reduced_kernel(*args, **kw)


def _fast_harris_nms_reduced_kernel(dims_ref, *refs,
                                    threshold, radius, tile_h, tile_w,
                                    halo_y, halo_x, with_mask=False,
                                    box7_kind="vpu", band_widths=()):
    refs = list(refs)
    img_hbm = refs.pop(0)
    mask_hbm = refs.pop(0) if with_mask else None
    bands = {bw: refs.pop(0)[...] for bw in band_widths}
    if with_mask:
        max_ref, row_ref, cnt_ref, win_ref, mwin_ref, sem, msem = refs
    else:
        max_ref, row_ref, cnt_ref, win_ref, sem = refs
        mwin_ref = msem = None
    ti = pl.program_id(0)
    tj = pl.program_id(1)
    ph = tile_h + 2 * halo_y
    pw = tile_w + 2 * halo_x
    R = radius - 1
    eh = tile_h + 2 * R
    ew = tile_w + 2 * R

    copy = pltpu.make_async_copy(
        img_hbm.at[pl.ds(ti * tile_h, ph), pl.ds(tj * tile_w, pw)],
        win_ref, sem)
    copy.start()
    if with_mask:
        # user ROI mask rides the same halo'd window (masked-out corners
        # must not suppress neighbors, so it applies BEFORE the NMS)
        mcopy = pltpu.make_async_copy(
            mask_hbm.at[pl.ds(ti * tile_h, ph), pl.ds(tj * tile_w, pw)],
            mwin_ref, msem)
        mcopy.start()
    copy.wait()

    win = win_ref[...].astype(jnp.int32)
    oy = halo_y - R
    ox = halo_x - R

    def sh(dy, dx, hh, ww, o_y, o_x):
        return jax.lax.slice(win, (o_y + dy, o_x + dx),
                             (o_y + dy + hh, o_x + dx + ww))

    corner = _fast_corner(
        lambda dy, dx: sh(dy, dx, eh, ew, oy, ox), threshold)

    gh2 = eh + 6
    gw2 = ew + 6

    # memoized: gx/gy share the 4 diagonal taps — every slice of a VMEM
    # array is a full-tile vector pass, the kernel's bounding resource
    # (round-4 finding), so duplicate slices are pure waste
    shd_cache = {}

    def shd(dy, dx):
        if (dy, dx) not in shd_cache:
            shd_cache[(dy, dx)] = sh(dy, dx, gh2, gw2, oy - 3, ox - 3)
        return shd_cache[(dy, dx)]

    gx = ((shd(1, 1) + 2 * shd(0, 1) + shd(-1, 1))
          - (shd(1, -1) + 2 * shd(0, -1) + shd(-1, -1)))
    gy = ((shd(1, -1) + 2 * shd(1, 0) + shd(1, 1))
          - (shd(-1, -1) + 2 * shd(-1, 0) + shd(-1, 1)))

    def box7(m):
        if box7_kind == "mxu":
            return _box7_mxu(m, eh, ew, bands)
        rows = sum(jax.lax.slice(m, (0, 3 + d), (gh2, 3 + d + ew))
                   for d in range(-3, 4))
        return sum(jax.lax.slice(rows, (3 + d, 0), (3 + d + eh, ew))
                   for d in range(-3, 4))

    s2 = np.float32(S.HARRIS_SCALE) * np.float32(S.HARRIS_SCALE)
    sxx = _trunc_mantissa(s2 * box7(gx * gx).astype(jnp.float32), 12)
    sxy = _trunc_mantissa(s2 * box7(gx * gy).astype(jnp.float32), 12)
    syy = _trunc_mantissa(s2 * box7(gy * gy).astype(jnp.float32), 12)
    tr = _trunc_mantissa(sxx + syy, 13)
    resp = (sxx * syy - sxy * sxy) - np.float32(S.HARRIS_K) * (tr * tr)

    true_h = dims_ref[0]
    true_w = dims_ref[1]
    gy_ids = jax.lax.broadcasted_iota(jnp.int32, (eh, ew), 0) \
        + ti * tile_h - R
    gx_ids = jax.lax.broadcasted_iota(jnp.int32, (eh, ew), 1) \
        + tj * tile_w - R
    b = S.HALF_PATCH_SIZE
    inb = ((gy_ids >= b) & (gy_ids < true_h - b)
           & (gx_ids >= b) & (gx_ids < true_w - b))
    if with_mask:
        mcopy.wait()
        mok = jax.lax.slice(mwin_ref[...], (oy, ox),
                            (oy + eh, ox + ew)).astype(jnp.int32) != 0
        inb = inb & mok
    masked = jnp.where(corner & inb, resp, NEG_INF)

    center_resp = jax.lax.slice(masked, (R, R), (R + tile_h, R + tile_w))
    disc_max = _disc_max(masked, radius, R, eh, tile_h, tile_w)

    survive = (center_resp != NEG_INF) & (center_resp >= disc_max)
    mfin = jnp.where(survive, center_resp, NEG_INF)

    # per-cell (8 rows x 1 col) reduction while the tile is in VMEM
    m3 = mfin.reshape(tile_h // 8, 8, tile_w)
    alive3 = survive.reshape(tile_h // 8, 8, tile_w)
    cellmax = m3.max(axis=1)                               # (th/8, tw)
    rows3 = (jax.lax.broadcasted_iota(jnp.int32, (tile_h // 8, 8, tile_w), 0)
             * 8
             + jax.lax.broadcasted_iota(jnp.int32, (tile_h // 8, 8, tile_w),
                                        1)
             + ti * tile_h)
    cand = (m3 == cellmax[:, None, :]) & alive3
    big = jnp.int32(2147483647)
    max_ref[...] = cellmax
    row_ref[...] = jnp.where(cand, rows3, big).min(axis=1)
    cnt_ref[...] = alive3.sum(axis=1).astype(jnp.int32)


@functools.partial(jax.jit, static_argnums=(1, 2, 4, 5))
def fast_harris_nms_cells(image: jax.Array, threshold: int, radius: int,
                          mask: jax.Array | None = None,
                          halo_x: int | None = None,
                          box7_kind: str | None = None):
    """Fused dense detect with cell-reduced output: returns
    (cellmax (ceil8(h)/8, wpad) f32, cellrow (same) i32 global row of the
    lowest maximal survivor, cellcnt (same) i32 survivor count), each cell
    covering 8 image rows x 1 column.  Selection-equivalent to
    fast_harris_nms when every 8x8 block holds <= 1 survivor (the caller
    checks counts and falls back otherwise).

    `mask` (optional bool (h, w)): user ROI — corners outside it are dropped
    BEFORE the NMS (they neither survive nor suppress), riding the same
    halo'd window DMA as the image.

    `halo_x` (static; A/B knob): column-halo width override, must be >= the
    kernel support and keep tile_w + 2*halo_x a 128 multiple.

    `box7_kind` (static; A/B knob): "vpu" (default) or "mxu" — horizontal
    box7 backend (see _box7_mxu); None reads EFF_TPU_CELLS_BOX7 at trace
    time.  Bit-identical outputs BY ALGEBRA; the round-5 first A/B of the
    mxu form was VOID (kernel-cache collision re-ran the vpu binary —
    see _fast_harris_nms_reduced_kernel_mxu), so mxu stays opt-in until
    the decollided A/B both validates compiled parity and wins."""
    h, w = image.shape
    if box7_kind is None:
        box7_kind = os.environ.get("EFF_TPU_CELLS_BOX7", "vpu")
    if box7_kind not in ("vpu", "mxu"):
        raise ValueError(f"box7_kind must be 'vpu' or 'mxu', got "
                         f"{box7_kind!r}")
    # h_step=64: the (tile_h/8, tile_w) output blocks need a sublane dim
    # divisible by 8 when the grid has >1 row (see _tile_dims)
    tile_h, tile_w = _tile_dims(h, w, h_step=64)
    gh = -(-h // tile_h)
    gw = -(-w // tile_w)
    # column halo aligned 64 (see fast_harris_nms): DMA width stays a 128
    # multiple while the halo share of window bytes halves at the default
    # radius — the cells kernel is ~85% of detect's DMA traffic at 4K/8K
    need = radius - 1 + _FH_HALO
    halo_y = -(-need // 8) * 8
    if halo_x is None:
        halo_x = -(-need // 64) * 64
    assert halo_x >= need and (2 * halo_x) % 128 == 0
    pads = ((halo_y, gh * tile_h - h + halo_y),
            (halo_x, gw * tile_w - w + halo_x))
    padded = jnp.pad(image, pads)
    dims = jnp.array([h, w], jnp.int32)
    with_mask = mask is not None
    operands = [dims, padded]
    in_specs = [pl.BlockSpec(memory_space=pl.ANY)]
    scratch = [pltpu.VMEM((tile_h + 2 * halo_y, tile_w + 2 * halo_x),
                          jnp.uint8),
               pltpu.SemaphoreType.DMA]
    if with_mask:
        operands.append(jnp.pad(mask.astype(jnp.uint8), pads))
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        scratch = scratch[:1] + [
            pltpu.VMEM((tile_h + 2 * halo_y, tile_w + 2 * halo_x),
                       jnp.uint8)] + scratch[1:] + [pltpu.SemaphoreType.DMA]
    band_widths = ()
    if box7_kind == "mxu":
        # banded one-hot constants ride as broadcast VMEM operands (one
        # per distinct 128-column block width of ew = tile_w + 2*(radius-1))
        band_widths = _box7_widths(tile_w + 2 * (radius - 1))
        for bw in band_widths:
            band = _box7_h_band(bw)
            operands.append(band)
            in_specs.append(pl.BlockSpec(band.shape,
                                         lambda i, j, *_: (0, 0),
                                         memory_space=pltpu.VMEM))

    kernel_fn = (_fast_harris_nms_reduced_kernel_mxu if box7_kind == "mxu"
                 else _fast_harris_nms_reduced_kernel)
    kernel = functools.partial(kernel_fn,
                               threshold=threshold, radius=radius,
                               tile_h=tile_h, tile_w=tile_w,
                               halo_y=halo_y, halo_x=halo_x,
                               with_mask=with_mask, box7_kind=box7_kind,
                               band_widths=band_widths)
    th8 = tile_h // 8
    outs = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(gh, gw),
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((th8, tile_w), lambda i, j, *_: (i, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((th8, tile_w), lambda i, j, *_: (i, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((th8, tile_w), lambda i, j, *_: (i, j),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=scratch,
        ),
        out_shape=[
            jax.ShapeDtypeStruct((gh * th8, gw * tile_w), jnp.float32),
            jax.ShapeDtypeStruct((gh * th8, gw * tile_w), jnp.int32),
            jax.ShapeDtypeStruct((gh * th8, gw * tile_w), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(*operands)
    return outs
