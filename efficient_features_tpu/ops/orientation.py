"""IC-angle orientation on TPU (cuda_efficient_features.cu:141-172).

Vectorized gather over the circular 31x31 patch; integer moments are exact and
identical to the CPU oracle; the final atan2 is float32 (ULP-level backend
differences, absorbed by descriptor parity budgets).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..utils import semantics as S


def _offsets():
    offs = []
    for dy in range(-S.HALF_PATCH_SIZE, S.HALF_PATCH_SIZE + 1):
        d = int(S.U_MAX[abs(dy)])
        for dx in range(-d, d + 1):
            offs.append((dy, dx))
    o = np.array(offs, dtype=np.int32)
    return o[:, 0], o[:, 1]


_IC_DY, _IC_DX = _offsets()


def ic_angles(img: jax.Array, ys: jax.Array, xs: jax.Array,
              valid: jax.Array) -> jax.Array:
    """Angles in degrees [0, 360) for (quota,) keypoint slots.

    Invalid slots gather from clamped indices and return 0.  Valid keypoints
    are guaranteed >= 15px from borders by the detector mask, so no clamping
    distortion occurs for them.
    """
    h, w = img.shape
    dy = jnp.asarray(_IC_DY)
    dx = jnp.asarray(_IC_DX)
    gy = jnp.clip(ys[:, None] + dy[None, :], 0, h - 1)
    gx = jnp.clip(xs[:, None] + dx[None, :], 0, w - 1)
    vals = img[gy, gx].astype(jnp.int32)
    m10 = (vals * dx[None, :]).sum(axis=1)      # |m10| <= 255 * sum|dx| < 2^21
    m01 = (vals * dy[None, :]).sum(axis=1)
    ang = jnp.arctan2(m01.astype(jnp.float32), m10.astype(jnp.float32))
    ang = jnp.where(ang < 0, ang + np.float32(2 * np.pi), ang)
    deg = np.float32(180.0 / np.pi) * ang
    return jnp.where(valid, deg, 0.0).astype(jnp.float32)
