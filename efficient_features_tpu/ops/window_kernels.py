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
are exact int32; for the HashSIFT warp the column factor is the
horizontal bilinear weight split into bf16 hi+lo (a 16-bit quantization the
CPU oracle mirrors) and the row factor is the full-precision vertical weight
on the VPU; for IC-angle both factors are integer masks.  All arithmetic is
bit-identical to the oracle; residual differences come only from backend
cos/sin/atan2 ULPs in the per-keypoint affine (the same class the reference's
own CPU-vs-GPU tests budget at 2e-5/1e-4 nonzero bytes — observed ~1 byte per
30k at random angles).

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

WIN_H = 80
WIN_W = 256
DEG2RAD = np.float32(0.017453292519943295)
MARGIN = np.float32(1.75)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def plan_windows(x: jax.Array, y: jax.Array, img_h: int, img_w: int):
    """Aligned window origins per keypoint + padded image dims."""
    pad_h = max(-(-img_h // 8) * 8, WIN_H)
    pad_w = max(-(-img_w // 128) * 128, WIN_W)
    xi = jnp.floor(x).astype(jnp.int32)
    yi = jnp.floor(y).astype(jnp.int32)
    base_y = jnp.clip(((yi - 36) // 8) * 8, 0, pad_h - WIN_H)
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

    cw = 128                              # compacted window: 64 rows x 128
    ch = 64                               # cols (boxes reach <= +-31 of kp)
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

    # Keypoints arrive sorted by window origin: one DMA per DISTINCT window
    # group, double-buffered across groups (prefetch the next group's window
    # while this group's keypoints compute).
    first = i * _BAD_KPB
    get_dma(meta_ref[first] & 1, first).start()

    def body(k, carry):
        idx = i * _BAD_KPB + k
        meta = meta_ref[idx]
        slot = meta & 1

        @pl.when((meta >> 1) == 1)
        def _():
            nxt = nstart_ref[idx]

            @pl.when(nxt < (i + 1) * _BAD_KPB)
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
        # (row 32, col 64) and keep 64x128 — all box ranges and image-bound
        # clamps of valid keypoints stay inside the sub-window
        shift_x = jnp.floor(kx).astype(jnp.int32) - ox - 64
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


def _window_groups(by, bx, kpb):
    """Per-keypoint window-group bookkeeping for window-sorted keypoints.

    Returns (grp, is_start, next_start): `grp` is the 0-based group id (its
    parity selects the DMA buffer slot), `is_start` marks group and program
    starts (where the kernel waits for the window DMA), `next_start` is the
    index of the following start (prefetch target; past-the-end when none).
    Must be called on the final padded arrays so every DMA start has a
    matching wait."""
    n = by.shape[0]
    key = by.astype(jnp.int32) * jnp.int32(1 << 15) + bx.astype(jnp.int32)
    changed = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), (key[1:] != key[:-1]).astype(jnp.int32)])
    grp = jnp.cumsum(changed).astype(jnp.int32)
    prog_start = (jnp.arange(n, dtype=jnp.int32) % kpb) == 0
    is_start = (changed == 1) | prog_start
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

    order = jnp.argsort(base_y.astype(jnp.int32) * jnp.int32(1 << 15)
                        + base_x.astype(jnp.int32))
    srt = [jnp.take(a, order) for a in (base_y, base_x, x, y, size, angle)]
    (by, bx, kx, ky, ks, ka), n_pad, n = _pad_n(srt, _BAD_KPB)
    # group bookkeeping on the PADDED arrays so every started DMA is awaited
    # (the zero-padded tail forms its own final group)
    grp, start, nstart = _window_groups(by, bx, _BAD_KPB)
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
                pl.BlockSpec(memory_space=pltpu.ANY),
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
# IC only reads the 31px disc: a 40-row window (8-row base alignment slack
# + 31 rows) halves the per-keypoint DMA traffic vs the shared 80-row plan
_IC_WIN_H = 40


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

    first = i * _IC_KPB
    get_dma(meta_ref[first] & 1, first).start()   # grouped window prefetch

    def body(k, carry):
        idx = i * _IC_KPB + k
        meta = meta_ref[idx]
        slot = meta & 1

        @pl.when((meta >> 1) == 1)
        def _():
            nxt = nstart_ref[idx]

            @pl.when(nxt < (i + 1) * _IC_KPB)
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
    # private 40-row plan: base_y = ((y-15)//8)*8 puts the disc rows
    # [y-15, y+15] inside [base_y, base_y+38) for every interior keypoint
    pad_h = max(-(-h // 8) * 8, _IC_WIN_H)
    pad_w = max(-(-w // 128) * 128, WIN_W)
    base_y = jnp.clip(((ys.astype(jnp.int32) - S.HALF_PATCH_SIZE) // 8) * 8,
                      0, pad_h - _IC_WIN_H)
    base_x = jnp.clip(((xs.astype(jnp.int32) - 96) // 128) * 128,
                      0, pad_w - WIN_W)
    padded = pad_image(image, pad_h, pad_w)
    order = jnp.argsort(base_y.astype(jnp.int32) * jnp.int32(1 << 15)
                        + base_x.astype(jnp.int32))
    srt = [jnp.take(a, order) for a in
           (base_y, base_x, ys.astype(jnp.int32), xs.astype(jnp.int32))]
    (by, bx, kyi, kxi), n_pad, n = _pad_n(srt, _IC_KPB)
    grp, start, nstart = _window_groups(by, bx, _IC_KPB)
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
                pl.BlockSpec(memory_space=pltpu.ANY),
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


def _warp_kernel(by_ref, bx_ref, meta_ref, nstart_ref, kp_ref,
                 img_hbm, out_ref, win_ref, sem, *,
                 cropping_scale, img_w, img_h):
    i = pl.program_id(0)
    npx = 32 * 32

    def get_dma(slot, idx):
        return pltpu.make_async_copy(
            img_hbm.at[pl.ds(pl.multiple_of(by_ref[idx], 8), WIN_H),
                       pl.ds(pl.multiple_of(bx_ref[idx], 128), WIN_W)],
            win_ref.at[slot], sem.at[slot])

    first = i * _WARP_KPB
    get_dma(meta_ref[first] & 1, first).start()   # grouped window prefetch

    def body(k, carry):
        idx = i * _WARP_KPB + k
        meta = meta_ref[idx]
        slot = meta & 1

        @pl.when((meta >> 1) == 1)
        def _():
            nxt = nstart_ref[idx]

            @pl.when(nxt < (i + 1) * _WARP_KPB)
            def _():
                get_dma(1 - slot, nxt).start()

            get_dma(slot, idx).wait()

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
        du = u - ui.astype(jnp.float32)
        dv = v - vi.astype(jnp.float32)
        valid_px = ((ui >= 0) & (ui + 1 < img_w) &
                    (vi >= 0) & (vi + 1 < img_h))

        # window compaction: all patch samples lie within +-29 of the keypoint
        # pixel, so rotate the keypoint to (row 32, col 64) and keep a 64x128
        # sub-window — quarters the factor matrices and the MXU work.  Wrapped
        # rows/columns are only ever addressed by out-of-image samples, which
        # valid_px masks.
        xi_loc = jnp.floor(kp_ref[k, 0]).astype(jnp.int32) - bx_ref[idx]
        yi_loc = jnp.floor(kp_ref[k, 1]).astype(jnp.int32) - by_ref[idx]
        shift_x = xi_loc - 64
        shift_y = yi_loc - 32
        cw = 128
        ch = 64

        # bilinear one-hot pairs as hat functions: relu(1 - |c - u|) equals
        # (1-du) at floor(u) and du at floor(u)+1 EXACTLY (local-scale f32
        # fractions are representable), replacing compare+select chains with
        # two arithmetic ops per factor matrix
        u_loc = (u - bx_ref[idx].astype(jnp.float32)
                 - shift_x.astype(jnp.float32))           # (1, npx), compacted
        v_loc = (v - by_ref[idx].astype(jnp.float32)
                 - shift_y.astype(jnp.float32))

        cols_f = jax.lax.broadcasted_iota(
            jnp.int32, (cw, npx), 0).astype(jnp.float32)
        X = jnp.maximum(np.float32(1.0) - jnp.abs(cols_f - u_loc),
                        np.float32(0.0))
        Xhi = X.astype(jnp.bfloat16)
        Xlo = (X - Xhi.astype(jnp.float32)).astype(jnp.bfloat16)

        win_full = win_ref[slot].astype(jnp.int32)
        win_rot = pltpu.roll(win_full, (WIN_W - shift_x) % WIN_W, 1)
        win_rot = pltpu.roll(win_rot, (WIN_H - shift_y) % WIN_H, 0)
        win = jax.lax.slice(win_rot, (0, 0), (ch, cw)).astype(jnp.bfloat16)
        z = (jnp.dot(win, Xhi, preferred_element_type=jnp.float32)
             + jnp.dot(win, Xlo, preferred_element_type=jnp.float32))

        # vertical factor on the VPU at full f32 precision
        rows_f = jax.lax.broadcasted_iota(
            jnp.int32, (ch, npx), 0).astype(jnp.float32)
        Y = jnp.maximum(np.float32(1.0) - jnp.abs(rows_f - v_loc),
                        np.float32(0.0))
        t2 = (Y * z).sum(axis=0, keepdims=True)           # (1, npx)

        val = jnp.minimum(jnp.trunc(t2 + np.float32(0.5)), np.float32(255.0))
        out_ref[pl.ds(k, 1), :] = jnp.where(valid_px, val, 0.0)
        return carry

    jax.lax.fori_loop(0, _WARP_KPB, body, 0)


@functools.partial(jax.jit, static_argnums=(6,))
def _warp_patches_windows_impl(image, x, y, size, angle, valid,
                               cropping_scale: float):
    """(N, 1024) f32 u8-valued warped patches via the window kernel.

    Horizontal bilinear weights are bf16 hi+lo quantized (16-bit significand);
    the oracle mirrors this, so patches match across backends up to one final
    IEEE rounding in the vertical lerp."""
    h, w = image.shape
    base_y, base_x, pad_h, pad_w = plan_windows(x, y, h, w)
    padded = pad_image(image, pad_h, pad_w)
    order = jnp.argsort(base_y.astype(jnp.int32) * jnp.int32(1 << 15)
                        + base_x.astype(jnp.int32))
    srt = [jnp.take(a, order) for a in (base_y, base_x, x, y, size, angle)]
    (by, bx, kx, ky, ks, ka), n_pad, n = _pad_n(srt, _WARP_KPB)
    grp, start, nstart = _window_groups(by, bx, _WARP_KPB)
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
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec((_WARP_KPB, 1024), lambda i, *_: (i, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, WIN_H, WIN_W), jnp.uint8),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((n_pad, 1024), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(by, bx, meta, nstart, kp, padded)
    inv = jnp.zeros_like(order).at[order].set(
        jnp.arange(order.shape[0], dtype=order.dtype))
    return jnp.where(valid[:, None], jnp.take(out[:n], inv, axis=0), 0.0)


bad_descriptors_windows = _chunked(_bad_descriptors_windows_impl, 5)
ic_angles_windows = _chunked(_ic_angles_windows_impl, 3)
warp_patches_windows = _chunked(_warp_patches_windows_impl, 5)
