"""Multi-chip scaling: device meshes + sharded batch/spatial pipelines.

The CUDA reference is single-GPU (no NCCL/MPI anywhere — SURVEY.md §2); its
concurrency axes are CUDA streams and intra-kernel SIMT.  The TPU-native
scaling axes are:

  dp ("batch"): a batch of images sharded across chips with shard_map — the
      throughput axis for serving (sample_image_sequence-style streams).
      Zero collectives in steady state: each chip runs the full pipeline on
      its shard; results stay sharded until fetched.

  sp ("rows"): one huge image (8K+) row-sharded across chips.  Dense stages
      (FAST / Harris / NMS) need a halo of 15px; we exchange halos once with
      jax.lax.ppermute over the ICI ring, then each chip detects in its own
      row band.  Selection is per-band top-k followed by a cross-chip
      all_gather + merge (quota keypoints total).

Both compile on a virtual CPU mesh (xla_force_host_platform_device_count) and
on real TPU slices unchanged.
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P_, NamedSharding

from .. import pipeline as P
from ..ops import detect as OD
from ..utils import semantics as S


def make_mesh(n_devices: int | None = None, axis: str = "dp") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


# ---------------------------------------------------------------------------
# dp: batched images sharded over chips
# ---------------------------------------------------------------------------


def detect_and_compute_batch(images: jax.Array, cfg: P.FeatureConfig,
                             mesh: Mesh):
    """Batched detect+compute, batch axis sharded over the mesh.

    images: (B, H, W) uint8, B divisible by mesh size.  Returns sharded slot
    arrays (B, nslots, ...) and descriptors (B, nslots, bytes).
    """
    def single(image):
        slots, desc = P.detect_and_compute_core(image, cfg, True)
        slots.pop("x_level")
        slots.pop("y_level")
        return slots, desc

    batched = jax.vmap(single)

    axis = mesh.axis_names[0]
    in_spec = P_(axis, None, None)
    sharded = jax.shard_map(batched, mesh=mesh, in_specs=(in_spec,),
                            out_specs=(P_(axis), P_(axis)), check_vma=False)
    return jax.jit(sharded)(images)


# ---------------------------------------------------------------------------
# sp: one image row-sharded with halo exchange
# ---------------------------------------------------------------------------

# Halo: an owned pixel's NMS disc reaches |dy| <= 14 into the halo, and those
# neighbours need their own correct FAST (+3) / Harris (+4) support: >= 18.
_HALO = 24


def detect_rows_sharded(image: jax.Array, cfg: P.FeatureConfig, mesh: Mesh,
                        quota: int | None = None):
    """Single-level FAST+Harris+NMS detection over a row-sharded image.

    Demonstrates the sp axis: halo exchange with ppermute over ICI, dense
    detection per band, per-band top-k, all_gather merge.  (Pyramid levels
    can each be sharded the same way; single-level here keeps the collective
    pattern clear.)  Returns (ys, xs, resp, valid) of global top `quota`.
    """
    axis = mesh.axis_names[0]
    n = mesh.devices.size
    h, w = image.shape
    assert h % n == 0, "image rows must divide the mesh"
    quota = quota or cfg.nfeatures

    def band_fn(band):  # band: (h/n, w)
        i = jax.lax.axis_index(axis)
        bh = band.shape[0]
        # halo exchange over the ICI ring: send bottom rows down, top rows up
        top_halo = jax.lax.ppermute(band[-_HALO:], axis,
                                    [(j, (j + 1) % n) for j in range(n)])
        bot_halo = jax.lax.ppermute(band[:_HALO], axis,
                                    [(j, (j - 1) % n) for j in range(n)])
        # first/last band have no real neighbour: zero the wrapped halo
        top_halo = jnp.where(i == 0, 0, top_halo)
        bot_halo = jnp.where(i == n - 1, 0, bot_halo)
        ext = jnp.concatenate([top_halo, band, bot_halo], axis=0)

        corner = OD.fast_corner_mask(ext, cfg.fast_threshold)
        # the global border mask applies BEFORE NMS: border-excluded corners
        # never enter the candidate set (createMask feeds the FAST kernel,
        # cuda_efficient_features.cpp:250,259) and so cannot suppress anyone
        row_ids = jnp.arange(ext.shape[0]) - _HALO + i * bh
        gborder = (row_ids >= S.HALF_PATCH_SIZE) & \
                  (row_ids < h - S.HALF_PATCH_SIZE)
        col_ok = jnp.zeros((w,), bool).at[
            S.HALF_PATCH_SIZE:w - S.HALF_PATCH_SIZE].set(True)
        corner = corner & gborder[:, None] & col_ok[None, :]
        resp = OD.harris_response(ext)
        surv = OD.radius_nms(resp, corner, cfg.nonmax_radius)
        # keep only detections in the owned band
        owned = (jnp.arange(ext.shape[0]) >= _HALO) & \
                (jnp.arange(ext.shape[0]) < _HALO + bh)
        surv = surv & owned[:, None]

        ys_l, xs_l, r_l, v_l = OD.select_topk(resp, surv, quota)
        ys_g = jnp.where(v_l, ys_l - _HALO + i * bh, 0)
        # gather all bands' candidates and merge to global top-k
        ys_all = jax.lax.all_gather(ys_g, axis).reshape(-1)
        xs_all = jax.lax.all_gather(xs_l, axis).reshape(-1)
        r_all = jax.lax.all_gather(jnp.where(v_l, r_l, OD.RESP_SENTINEL),
                                   axis).reshape(-1)
        # order by (resp desc, global flat index asc): sort two keys
        flat = ys_all.astype(jnp.int32) * w + xs_all.astype(jnp.int32)
        neg, _, ys_s, xs_s = jax.lax.sort(
            (-r_all, flat, ys_all, xs_all), num_keys=2)
        r_s = -neg[:quota]
        valid = r_s > OD.RESP_SENTINEL
        return (ys_s[:quota], xs_s[:quota],
                jnp.where(valid, r_s, jnp.float32(0)), valid)

    sharded = jax.shard_map(band_fn, mesh=mesh, in_specs=(P_(axis, None),),
                            out_specs=(P_(None), P_(None), P_(None), P_(None)),
                            check_vma=False)
    return jax.jit(sharded)(image)


def shard_batch(images: np.ndarray, mesh: Mesh) -> jax.Array:
    """Place a host batch onto the mesh, batch-axis sharded."""
    spec = NamedSharding(mesh, P_(mesh.axis_names[0], None, None))
    return jax.device_put(images, spec)
