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

import numpy as np
import jax
import jax.numpy as jnp

from ..utils import semantics as S


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


def build_pyramid(image: jax.Array, scale_factor: float, nlevels: int) -> list[jax.Array]:
    """Iterated resize chain; level s from level s-1."""
    shapes = S.pyramid_shapes(image.shape[0], image.shape[1], scale_factor, nlevels)
    levels = [image]
    for s in range(1, nlevels):
        levels.append(resize_u8(levels[-1], shapes[s]))
    return levels


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
