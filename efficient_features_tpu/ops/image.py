"""TPU image ops: fixed-point resize, separable Gaussian, integral image.

XLA-first formulation of the reference's image stages:
  - pyramid resize: cv::cuda::resize INTER_LINEAR chain (cuda_efficient_features.cpp:136-157)
  - 7x7 sigma=2 Gaussian, REFLECT_101 (cuda_efficient_features.cpp:193)
  - integral image (cuda_bad.cu:350-363)

All selection-feeding stages use the exact integer semantics shared with the
CPU oracle (utils/semantics.py), so pyramid levels are bit-identical across
backends.  Everything is shape-static and fuses under jit.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils import semantics as S


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def resize_u8(src: jax.Array, dst_hw: tuple[int, int]) -> jax.Array:
    """Separable bilinear resize of a uint8 image, 11-bit fixed point.

    Bit-identical to cpu.reference.resize_u8.  Coefficients are computed at
    trace time (static shapes).
    """
    h, w = dst_hw
    sh, sw = src.shape
    x0, x1, wx1 = S.resize_axis_coeffs(w, sw)
    y0, y1, wy1 = S.resize_axis_coeffs(h, sh)
    one = np.int32(1 << S.RESIZE_BITS)
    a = src.astype(jnp.int32)
    wx1 = jnp.asarray(wx1, jnp.int32)
    wy1 = jnp.asarray(wy1, jnp.int32)
    hpass = (jnp.take(a, jnp.asarray(x0), axis=1) * (one - wx1)[None, :]
             + jnp.take(a, jnp.asarray(x1), axis=1) * wx1[None, :])
    acc = (jnp.take(hpass, jnp.asarray(y0), axis=0) * (one - wy1)[:, None]
           + jnp.take(hpass, jnp.asarray(y1), axis=0) * wy1[:, None])
    out = (acc + (1 << (2 * S.RESIZE_BITS - 1))) >> (2 * S.RESIZE_BITS)
    return out.astype(jnp.uint8)


def build_pyramid(image: jax.Array, scale_factor: float, nlevels: int,
                  pallas_resize: bool | None = None) -> list[jax.Array]:
    """Iterated resize chain; level s from level s-1.

    pallas_resize: force the tiled MXU resize on (True) / off (False);
    None defers to the environment default (_use_pallas_resize)."""
    shapes = S.pyramid_shapes(image.shape[0], image.shape[1], scale_factor, nlevels)
    levels = [image]
    for s in range(1, nlevels):
        levels.append(resize_u8_fast(levels[-1], shapes[s], pallas_resize))
    return levels


# ---------------------------------------------------------------------------
# Pallas tiled resize: kills the HBM hpass intermediate
# ---------------------------------------------------------------------------
# The XLA resize above lowers its two jnp.take gathers to real HBM traffic: a
# src_h x dst_w int32 intermediate is written and re-read per level (27 MB at
# 4K — ~35 ms of the round-1 detect on the dev chip).  The resize is really a
# BANDED matrix product per axis (each dst column reads 2 adjacent src
# columns), so tile the destination 128x128 and contract each tile against
# per-tile banded coefficient blocks ON THE INT8 MXU with exact int32
# accumulation:
#
#   hp  = (src - 128) @ [Mh_lo + 64*Mh_hi] + 128*2048      (2 int8 matmuls)
#   acc = sum_limbs 2^shift * (Mv_limb @ hp_limb)          (6 int8 matmuls)
#   dst = (acc + 2^21) >> 22                               (exact fixed point)
#
# Weights are 0..2048 (12 bits) split into 6+6-bit limbs; hp <= 255*2048
# (19 bits) splits into three 7-bit limbs — every int8 product accumulates
# exactly in int32, so the result is BIT-IDENTICAL to resize_u8 / the oracle.
# All coefficient blocks and window origins are trace-time constants.


def _resize_tiles(dst_n, src_n, tile, align):
    """Per-tile banded coefficient blocks + aligned src origins (numpy).

    Returns (origins (nt,) int32, M (nt, win, tile) int32, win).  Dst
    positions beyond dst_n replicate the last real column (their outputs are
    sliced away; replication keeps every column's weights summing to 2048 so
    the int8 rebias stays exact)."""
    i0, i1, w1 = S.resize_axis_coeffs(dst_n, src_n)
    one = 1 << S.RESIZE_BITS
    nt = -(-dst_n // tile)
    pad = nt * tile - dst_n
    i0 = np.pad(i0, (0, pad), mode="edge")
    i1 = np.pad(i1, (0, pad), mode="edge")
    w1 = np.pad(w1, (0, pad), mode="edge")
    origins = np.zeros(nt, np.int32)
    win = 0
    for t in range(nt):
        lo = (i0[t * tile:(t + 1) * tile].min() // align) * align
        hi = i1[t * tile:(t + 1) * tile].max()
        origins[t] = lo
        win = max(win, int(hi - lo + 1))
    win = -(-win // align) * align
    M = np.zeros((nt, win, tile), np.int32)
    for t in range(nt):
        j = np.arange(tile)
        np.add.at(M[t], (i0[t * tile + j] - origins[t], j), one - w1[t * tile + j])
        np.add.at(M[t], (i1[t * tile + j] - origins[t], j), w1[t * tile + j])
    return origins, M, win


def _resize_kernel(sy_ref, sx_ref, mh_l, mh_h, mv_l, mv_h, src_hbm,
                   out_ref, src_ref, sem, *, wr, wc):
    # grid is (nct, nrt) COLUMN-MAJOR (rt fastest): the horizontal
    # coefficient block mh_*[ct] then stays resident for a whole column of
    # row tiles (Mosaic only refetches blocked inputs on index change),
    # keeping coefficient HBM traffic at ~one copy of each block.
    ct = pl.program_id(0)
    rt = pl.program_id(1)
    nrt = pl.num_programs(1)

    def dma(slot, r, c):
        return pltpu.make_async_copy(
            src_hbm.at[pl.ds(pl.multiple_of(sy_ref[r], 8), wr),
                       pl.ds(pl.multiple_of(sx_ref[c], 128), wc)],
            src_ref.at[slot], sem.at[slot])

    step = ct * nrt + rt
    slot = jax.lax.rem(step, 2)

    @pl.when(step == 0)
    def _():
        dma(slot, rt, ct).start()

    # prefetch the next tile's source block while this one computes
    nxt_rt = jax.lax.rem(rt + 1, nrt)
    nxt_ct = ct + (rt + 1) // nrt

    @pl.when(step + 1 < pl.num_programs(0) * nrt)
    def _():
        dma(1 - slot, nxt_rt, nxt_ct).start()

    dma(slot, rt, ct).wait()

    a = (src_ref[slot].astype(jnp.int32) - 128).astype(jnp.int8)
    one = jnp.int32(1 << S.RESIZE_BITS)

    def i8dot(x, y):
        return jax.lax.dot_general(x, y, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.int32)

    mhl = mh_l[0]
    mhh = mh_h[0]
    mvl = mv_l[0]
    mvh = mv_h[0]
    # horizontal: (wr, wc) @ (wc, TC); bias undo is exact because every
    # dst column's weights sum to 2048
    hp = (i8dot(a, mhl) + (i8dot(a, mhh) << 6)
          + (one << 7))                                    # (wr, TC) int32
    l0 = (hp & 127).astype(jnp.int8)
    l1 = ((hp >> 7) & 127).astype(jnp.int8)
    l2 = (hp >> 14).astype(jnp.int8)
    acc = (i8dot(mvl, l0) + (i8dot(mvh, l0) << 6)
           + ((i8dot(mvl, l1) + (i8dot(mvh, l1) << 6)) << 7)
           + ((i8dot(mvl, l2) + (i8dot(mvh, l2) << 6)) << 14))
    rnd = jnp.int32(1 << (2 * S.RESIZE_BITS - 1))
    out_ref[...] = ((acc + rnd) >> (2 * S.RESIZE_BITS)).astype(jnp.uint8)


def resize_u8_pallas(src: jax.Array, dst_hw: tuple[int, int]) -> jax.Array:
    """Tiled MXU resize, bit-identical to resize_u8 (see block comment).

    Round 3: rectangular (<=256, <=512) dst tiles — the round-2 128x128
    tiling put 375 programs on a 4K level and per-program grid overhead
    dominated; 8x fewer programs with the same arithmetic.  Coefficient
    blocks are blocked VMEM inputs fetched per index (column-major grid
    keeps each horizontal block resident across a column of row tiles)."""
    h, w = dst_hw
    sh, sw = src.shape
    tr = min(256, -(-h // 8) * 8)
    tc = min(512, -(-w // 128) * 128)
    sy, Mv, wr = _resize_tiles(h, sh, tr, 8)
    sx, Mh, wc = _resize_tiles(w, sw, tc, 128)
    nrt, nct = len(sy), len(sx)
    # pad the source so every (wr, wc) window is in bounds
    ph = max(-(-sh // 8) * 8, int(sy.max()) + wr)
    pw = max(-(-sw // 128) * 128, int(sx.max()) + wc)
    padded = jnp.pad(src, ((0, ph - sh), (0, pw - sw)))

    def limbs_h(M):  # (nct, wc, tc) int32 weights -> 6+6 bit int8 limbs
        return (jnp.asarray((M & 63).astype(np.int8)),
                jnp.asarray((M >> 6).astype(np.int8)))

    mh_l, mh_h = limbs_h(Mh)
    # vertical blocks contract over rows: transpose to (nrt, tr, wr)
    MvT = np.swapaxes(Mv, 1, 2)
    mv_l, mv_h = (jnp.asarray((MvT & 63).astype(np.int8)),
                  jnp.asarray((MvT >> 6).astype(np.int8)))

    kernel = functools.partial(_resize_kernel, wr=wr, wc=wc)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nct, nrt),
            in_specs=[
                pl.BlockSpec((1, wc, tc), lambda c, r, *_: (c, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, wc, tc), lambda c, r, *_: (c, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tr, wr), lambda c, r, *_: (r, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tr, wr), lambda c, r, *_: (r, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((tr, tc), lambda c, r, *_: (r, c),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, wr, wc), jnp.uint8),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((nrt * tr, nct * tc), jnp.uint8),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(jnp.asarray(sy), jnp.asarray(sx), mh_l, mh_h, mv_l, mv_h, padded)
    return out[:h, :w]


def resize_u8_fast(src: jax.Array, dst_hw: tuple[int, int],
                   pallas_resize: bool | None = None) -> jax.Array:
    """resize_u8 via the Pallas tile kernel on TPU (bit-identical), XLA
    gathers elsewhere / for tiny levels.

    `pallas_resize=True` is a TPU-only accelerator switch: on any other
    backend (e.g. the CPU test mesh) the XLA gather resize still runs —
    outputs are bit-identical either way, so only timing differs.  A/B the
    kernel itself off-chip with resize_u8_pallas (interpret mode)."""
    use = _use_pallas_resize() if pallas_resize is None else (
        pallas_resize and jax.default_backend() == "tpu")
    if use and min(dst_hw) >= 16:
        return resize_u8_pallas(src, dst_hw)
    return resize_u8(src, dst_hw)


def _use_pallas_resize() -> bool:
    # opt-in: with the round-1 dense-topk pipeline, combining all 7 resize
    # kernels with the detect kernels in one 4K jit hit a >10-min XLA
    # compile; with the cell-reduced pipeline it compiles in ~80 s but
    # measures runtime-parity with the XLA gathers on the dev chip (both
    # are HBM-bound there; on healthy HBM both are sub-ms).  Kept opt-in to
    # hold detect compile times down; fully tested either way (interpret +
    # compiled -m tpu tier).
    import os
    return (jax.default_backend() == "tpu"
            and os.environ.get("EFF_TPU_PALLAS_RESIZE", "0") == "1")


def gaussian_blur7_u8(img: jax.Array) -> jax.Array:
    """7x7 sigma=2 separable Gaussian, REFLECT_101, 16-bit fixed point.

    Bit-identical to cpu.reference.gaussian_blur7_u8.  jnp.pad(mode='reflect')
    IS BORDER_REFLECT_101 (no edge duplication) and avoids gather ops.
    """
    k = S.gaussian_kernel7_fixed()
    h, w = img.shape
    half = np.int32(1 << (S.BLUR_BITS - 1))

    a = jnp.pad(img.astype(jnp.int32), ((0, 0), (3, 3)), mode="reflect")
    hp = sum(np.int32(k[i]) * jax.lax.slice_in_dim(a, i, i + w, axis=1)
             for i in range(7))
    hp = (hp + half) >> S.BLUR_BITS
    vp = jnp.pad(hp, ((3, 3), (0, 0)), mode="reflect")
    out = sum(np.int32(k[i]) * jax.lax.slice_in_dim(vp, i, i + h, axis=0)
              for i in range(7))
    out = (out + half) >> S.BLUR_BITS
    return out.astype(jnp.uint8)


def integral_image_i32(img: jax.Array) -> jax.Array:
    """(H+1, W+1) int32 integral, zero top row/left col, wrapping overflow.

    Matches cpu.reference.integral_image_i32 / gpu::calcIntegralImage.
    """
    c = jnp.cumsum(jnp.cumsum(img.astype(jnp.int32), axis=0, dtype=jnp.int32),
                   axis=1, dtype=jnp.int32)
    return jnp.pad(c, ((1, 0), (1, 0)))
