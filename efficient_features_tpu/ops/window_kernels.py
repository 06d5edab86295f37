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


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def plan_windows(x: jax.Array, y: jax.Array, img_h: int, img_w: int):
    """Aligned window origins per keypoint + padded image dims.

    Row origins quantize to 32 (not the round-1 8): the BAD row support is
    keypoint +-24 px, so a 96-row window with the keypoint row at offset
    [32, 64) always covers it, and 4x fewer distinct windows exist at high
    keypoint density — one window DMA now serves ~4x more keypoints."""
    pad_h = max(-(-img_h // 8) * 8, WIN_H)
    pad_w = max(-(-img_w // 128) * 128, WIN_W)
    xi = jnp.floor(x).astype(jnp.int32)
    yi = jnp.floor(y).astype(jnp.int32)
    base_y = jnp.clip(((yi - 32) // 32) * 32, 0, pad_h - WIN_H)
    base_x = jnp.clip(((xi - 96) // 128) * 128, 0, pad_w - WIN_W)
    return base_y, base_x, pad_h, pad_w


def pad_image(image: jax.Array, pad_h: int, pad_w: int) -> jax.Array:
    h, w = image.shape
    return jnp.pad(image, ((0, pad_h - h), (0, pad_w - w)))


def max_window_size(scale: float) -> float:
    """Largest keypoint `size` the 31px window margin supports."""
    return 29.0 * 32.0 / (30.7 * max(scale, 1e-6))


def _pad_n(arrs, kpb):
    n = arrs[0].shape[0]
    np_ = -(-n // kpb) * kpb
    return [jnp.pad(a, (0, np_ - n)) for a in arrs], np_, n


def _affine_scalars(kx, ky, ksize, kang, scale):
    """getAffineTransform scalars (cuda_hash_sift.cu:136-155); s folded in."""
    s = np.float32(scale) * ksize / np.float32(32.0)
    theta = kang * DEG2RAD
    has = kang >= 0
    cost = jnp.where(has, jnp.cos(theta), np.float32(1.0)) * s
    sint = jnp.where(has, jnp.sin(theta), np.float32(0.0)) * s
    m02 = (-cost + sint) * np.float32(16.0) + kx
    m12 = (-sint - cost) * np.float32(16.0) + ky
    return s, cost, sint, m02, m12


# ---------------------------------------------------------------------------
# BAD descriptor kernel
# ---------------------------------------------------------------------------

_BAD_KPB = 32


def _bad_kernel(by_ref, bx_ref, meta_ref, nstart_ref,
                kp_ref, par_ref, img_hbm, out_ref, win_ref, sem, *,
                nbits, scale_factor, img_w, img_h):
    # SMEM budget is 1MB: only the DMA-addressing arrays ride scalar
    # prefetch (by, bx, meta = slot|start<<1, nstart); keypoint params come
    # in as a per-program VMEM block.
    i = pl.program_id(0)
    par = par_ref[...]                    # (8, nbits): x1 x2 y1 y2 r th rows
    bx1 = par[0:1, :]
    bx2 = par[1:2, :]
    by1 = par[2:3, :]
    by2 = par[3:4, :]
    br = par[4:5, :]
    thv = par[5:6, :]

    cw = 64                               # compacted window: 64 rows x 64
    ch = 64                               # cols (box corners stay within
                                          # +-24 of the keypoint, clamps
                                          # included — see _warp_kernel)
    rows_t = jax.lax.broadcasted_iota(jnp.int32, (ch, nbits), 0)
    cols_t = jax.lax.broadcasted_iota(jnp.int32, (cw, nbits), 0)
    pr = jax.lax.broadcasted_iota(jnp.int32, (nbits, nbits // 8), 0)
    pc = jax.lax.broadcasted_iota(jnp.int32, (nbits, nbits // 8), 1)
    pack = jnp.where(pr // 8 == pc,
                     jnp.exp2((7 - pr % 8).astype(jnp.float32)), 0.0)

    def get_dma(slot, idx):
        return pltpu.make_async_copy(
            img_hbm.at[pl.ds(pl.multiple_of(by_ref[idx], 8), WIN_H),
                       pl.ds(pl.multiple_of(bx_ref[idx], 128), WIN_W)],
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

        def rnd(v):
            return jnp.trunc(v + np.float32(0.5)).astype(jnp.int32)

        oy = by_ref[idx]
        ox = bx_ref[idx]
        # window compaction (see _warp_kernel): rotate the keypoint to
        # (row 32, col 32) and keep 64x64 — every box corner, image-bound
        # clamps included, stays within +-24 of the keypoint (clamping pulls
        # corners toward the keypoint), halving the cc factor build and the
        # matmul contraction vs the round-1 128-column slab
        shift_x = jnp.floor(kx).astype(jnp.int32) - ox - 32
        shift_y = jnp.floor(ky).astype(jnp.int32) - oy - 32
        oxc = ox + shift_x
        oyc = oy + shift_y
        # transformBoxPairParams (cuda_bad.cu:149-157), compacted local coords
        tx1 = rnd(cost * bx1 - sint * by1 + m02) - oxc
        ty1 = rnd(sint * bx1 + cost * by1 + m12) - oyc
        tx2 = rnd(cost * bx2 - sint * by2 + m02) - oxc
        ty2 = rnd(sint * bx2 + cost * by2 + m12) - oyc
        tbr = rnd(s * br)

        # clamped integral corners; for interior keypoints the clamps never
        # bind (1.75 margin), so these sums serve both paths exactly
        lo_y = -oyc
        hi_y = jnp.int32(img_h) - oyc
        lo_x = -oxc
        hi_x = jnp.int32(img_w) - oxc

        win_rot = pltpu.roll(win_ref[slot].astype(jnp.int32),
                             (WIN_W - shift_x) % WIN_W, 1)
        win_rot = pltpu.roll(win_rot, (WIN_H - shift_y) % WIN_H, 0)
        # int8 MXU path (2x the bf16 rate): pixels re-biased to [-128, 127];
        # the -128 bias contributes exactly -128*area to each box sum (every
        # selected cell is biased by -128 and valid box ranges stay inside
        # the compacted sub-window), undone below.  All values stay exact
        # int32: box sums <= 255*63*63 ~ 1.0e6.
        win8 = (jax.lax.slice(win_rot, (0, 0), (ch, cw))
                - 128).astype(jnp.int8)

        def box_sums(cy, cx):
            iy1 = jnp.clip(cy - tbr, lo_y, hi_y - 1)
            iy2 = jnp.clip(cy + tbr + 1, lo_y + 1, hi_y)
            ix1 = jnp.clip(cx - tbr, lo_x, hi_x - 1)
            ix2 = jnp.clip(cx + tbr + 1, lo_x + 1, hi_x)
            cc = ((cols_t >= ix1) & (cols_t < ix2)).astype(jnp.int32)
            rr = ((rows_t >= iy1) & (rows_t < iy2)).astype(jnp.int32)
            z = jnp.dot(win8, cc.astype(jnp.int8),
                        preferred_element_type=jnp.int32)
            area = (iy2 - iy1) * (ix2 - ix1)                # (1, nbits)
            ssum = (rr * z).sum(axis=0, keepdims=True) + 128 * area
            return ssum, area                               # exact int32

        s1i, a1i = box_sums(ty1, tx1)
        s2i, a2i = box_sums(ty2, tx2)
        side = (1 + 2 * tbr).astype(jnp.float32)
        bit_fast = ((s1i - s2i).astype(jnp.float32)
                    <= thv * (side * side))
        # division-free border compare in exact int32 (TPU f32 division is a
        # reciprocal approximation; see cpu.descriptors.bad_descriptors)
        lhs = (s1i * a2i - s2i * a1i).astype(jnp.float32)
        bit_border = lhs <= thv * (a1i * a2i).astype(jnp.float32)

        sb = np.float32(scale_factor) * ksize / np.float32(64.0)
        bw = np.float32(32.0) * sb * MARGIN
        in_border = ((kx < bw) | (kx + bw >= np.float32(img_w)) |
                     (ky < bw) | (ky + bw >= np.float32(img_h)))

        # Mosaic cannot select between i1 vectors; select on f32
        bits = jnp.where(in_border, bit_border.astype(jnp.float32),
                         bit_fast.astype(jnp.float32))
        bytes_row = jnp.dot(bits, pack, preferred_element_type=jnp.float32)
        out_ref[pl.ds(k, 1), :] = bytes_row
        return carry

    jax.lax.fori_loop(0, _BAD_KPB, body, 0)


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
    grp = jnp.cumsum(changed).astype(jnp.int32)
    is_start = (changed == 1) | (jnp.arange(n, dtype=jnp.int32) == 0)
    idxs = jnp.where(is_start, jnp.arange(n, dtype=jnp.int32), jnp.int32(n))
    # next_start[j] = min index > j that is a start (or n, past the end)
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


@functools.partial(jax.jit, static_argnums=(6, 7))
def _bad_descriptors_windows_impl(image, x, y, size, angle, valid,
                                  nbits: int, scale_factor: float):
    """(N, nbits//8) uint8 BAD descriptors via the window kernel; exact."""
    h, w = image.shape
    base_y, base_x, pad_h, pad_w = plan_windows(x, y, h, w)
    padded = pad_image(image, pad_h, pad_w)

    order = jnp.argsort(_window_key(base_y, base_x, pad_w))
    srt = [jnp.take(a, order) for a in (base_y, base_x, x, y, size, angle)]
    (by, bx, kx, ky, ks, ka), n_pad, n = _pad_n(srt, _BAD_KPB)
    # group bookkeeping on the PADDED arrays so every started DMA is awaited
    # (the zero-padded tail forms its own final group)
    grp, start, nstart = _window_groups(_window_key(by, bx, pad_w), _BAD_KPB)
    meta = ((grp & 1) | (start << 1)).astype(jnp.int32)
    kp = jnp.stack([kx, ky, ks, ka], axis=1)

    boxes, th = load_bad_params(nbits)
    par = np.zeros((8, nbits), np.float32)
    par[0] = boxes[:, 0]
    par[1] = boxes[:, 1]
    par[2] = boxes[:, 2]
    par[3] = boxes[:, 3]
    par[4] = boxes[:, 4]
    par[5] = th

    kernel = functools.partial(_bad_kernel, nbits=nbits,
                               scale_factor=scale_factor, img_w=w, img_h=h)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(n_pad // _BAD_KPB,),
            in_specs=[
                pl.BlockSpec((_BAD_KPB, 4), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, nbits), lambda i, *_: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((_BAD_KPB, nbits // 8),
                                   lambda i, *_: (i, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, WIN_H, WIN_W), jnp.uint8),
                pltpu.SemaphoreType.DMA((2,)),
            ],
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
               img_hbm, out_ref, win_ref, sem):
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

        yloc = kp_ref[k, 0] - by_ref[idx]
        xloc = kp_ref[k, 1] - bx_ref[idx]
        # no column compaction: dxv = col - xloc is a broadcast compare
        # against a scalar, and the umax disc mask keeps |dxv| <= 15 so all
        # f32 moment sums stay exact integers — this avoids a per-keypoint
        # unaligned lane roll of the whole window
        rows_i = jax.lax.broadcasted_iota(jnp.int32, (npr, _IC_WIN_H), 1)
        p_i = jax.lax.broadcasted_iota(jnp.int32, (npr, _IC_WIN_H), 0)
        onerow = (rows_i == p_i + (yloc - r)).astype(jnp.bfloat16)

        win = win_ref[slot].astype(jnp.int32).astype(jnp.bfloat16)
        t = jnp.dot(onerow, win, preferred_element_type=jnp.float32)

        dyv = jax.lax.broadcasted_iota(jnp.int32, (npr, WIN_W), 0) - r
        dxv = jax.lax.broadcasted_iota(jnp.int32, (npr, WIN_W), 1) - xloc
        umax = umax_ref[...][0:npr, 0:1]
        mask = (jnp.abs(dxv) <= umax).astype(jnp.float32)
        m10 = (t * (dxv.astype(jnp.float32) * mask)).sum()
        m01 = (t * (dyv.astype(jnp.float32) * mask)).sum()
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


def _warp_kernel(by_ref, bx_ref, meta_ref, nstart_ref, kp_ref,
                 img_hbm, out_ref, win_ref, winbf_ref, sem, *,
                 cropping_scale, img_w, img_h):
    """Patch warp, two keypoints per MXU pass.

    Keypoints are processed in PAIRS sharing (128,128)@(128,1024) matmuls:
    the pair's compacted 64-column windows sit in the two diagonal blocks of
    the LHS and their one-hot selectors stack along k, so the full 128-deep
    MXU contraction is used (a single keypoint only fills 64x64 of a tile).
    The window is cast to bf16 once per DMA (winbf scratch), not per
    keypoint."""
    i = pl.program_id(0)
    npx = 32 * 32

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

        _, cost, sint, m02, m12 = _affine_scalars(
            kp_ref[k, 0], kp_ref[k, 1], kp_ref[k, 2], kp_ref[k, 3],
            cropping_scale)

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
        csel = jax.lax.broadcasted_iota(jnp.int32, (WIN_W, _WARP_CW), 0)
        jsel = jax.lax.broadcasted_iota(jnp.int32, (WIN_W, _WARP_CW), 1)
        Pm = (csel == jsel + off).astype(jnp.bfloat16)
        win_c = jnp.dot(win56, Pm, preferred_element_type=jnp.float32)
        blk = jnp.concatenate(
            [win_c, jnp.zeros((64 - _WARP_SLICE_H, _WARP_CW), jnp.float32)],
            axis=0).astype(jnp.bfloat16)                  # (64, 64)

        u_loc = u - (bx_ref[idx] + off).astype(jnp.float32)   # (1, npx)
        v_loc = v - (by_ref[idx] + row_off).astype(jnp.float32)
        return blk, u_loc, v_loc, valid_px

    def body(pair):
        blk0, u0, v0, vp0 = half(pair, 0)
        blk1, u1, v1, vp1 = half(pair, 1)

        # block-diagonal LHS: [[blk0, 0], [0, blk1]] — one full (128,128)
        # tile; the zero blocks make each keypoint's rows see only its own
        # hat factors, so products stay exact
        z64 = jnp.zeros((64, _WARP_CW), jnp.bfloat16)
        lhs = jnp.concatenate(
            [jnp.concatenate([blk0, z64], axis=1),
             jnp.concatenate([z64, blk1], axis=1)], axis=0)   # (128, 128)

        # the MXU does only EXACT one-hot gathers: Xl selects the left
        # bilinear pixel column (c == floor(u)), Xr the right — {0,1}
        # factors x exact <=255 pixels, one nonzero per column, so z_l/z_r
        # are exact pixel integers.  ALL bilinear weighting then happens on
        # the VPU in full f32, matching the reference's float lerp (no bf16
        # weight quantization anywhere).
        ksel = jax.lax.broadcasted_iota(jnp.int32, (2 * _WARP_CW, npx), 0)
        hi = (ksel >= _WARP_CW)
        cc = jnp.where(hi, ksel - _WARP_CW, ksel).astype(jnp.float32)
        uu = jnp.where(hi, u1, u0)
        ufl = jnp.floor(uu)
        Xl = (cc == ufl).astype(jnp.bfloat16)                 # (128, npx)
        Xr = (cc == ufl + np.float32(1.0)).astype(jnp.bfloat16)
        z_l = jnp.dot(lhs, Xl, preferred_element_type=jnp.float32)
        z_r = jnp.dot(lhs, Xr, preferred_element_type=jnp.float32)

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
        body(pair)


@functools.partial(jax.jit, static_argnums=(6,))
def _warp_patches_windows_impl(image, x, y, size, angle, valid,
                               cropping_scale: float):
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
    kp = jnp.stack([kx, ky, ks, ka], axis=1)

    kernel = functools.partial(_warp_kernel, cropping_scale=cropping_scale,
                               img_w=w, img_h=h)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(n_pad // _WARP_KPB,),
            in_specs=[
                pl.BlockSpec((_WARP_KPB, 4), lambda i, *_: (i, 0),
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


bad_descriptors_windows = _chunked(_bad_descriptors_windows_impl, 5)
ic_angles_windows = _chunked(_ic_angles_windows_impl, 3)
warp_patches_windows = _chunked(_warp_patches_windows_impl, 5)
