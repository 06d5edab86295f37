"""Multi-chip scaling: device meshes + sharded batch/spatial pipelines.

The CUDA reference is single-GPU (no NCCL/MPI anywhere — SURVEY.md §2); its
concurrency axes are CUDA streams and intra-kernel SIMT.  The TPU-native
scaling axes are:

  dp ("batch"): a batch of images sharded across chips with shard_map — the
      throughput axis for serving (sample_image_sequence-style streams).
      Zero collectives in steady state: each chip runs the full pipeline on
      its shard; results stay sharded until fetched.

  sp ("rows"): one huge image (8K+) row-sharded across chips.  Dense stages
      (FAST / Harris / NMS) need a 24px halo exchanged with jax.lax.ppermute
      over the ICI ring; each chip detects in its own row band and candidates
      merge to the global quota with all_gather + a two-key sort.  Two entry
      points: detect_rows_sharded (single level, the minimal pattern) and
      detect_pyramid_rows_sharded (the FULL pyramid pipeline, per-level
      sharded resize included, bit-identical to detect_jit).

Both compile on a virtual CPU mesh (xla_force_host_platform_device_count) and
on real TPU slices unchanged.
"""
from __future__ import annotations

import functools

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


@functools.lru_cache(maxsize=None)
def _batch_jit(cfg: P.FeatureConfig, mesh: Mesh):
    """One jitted executable per (cfg, mesh): repeated batch calls reuse the
    trace/compile (the jit cache is keyed on the function object, so the
    shard_map closure must be built once, not per call)."""
    def single(image):
        slots, desc = P.detect_and_compute_core(image, cfg, True)
        slots.pop("x_level")
        slots.pop("y_level")
        return slots, desc

    def batched(images):
        # sequential per image on each chip (lax.map): one detect already
        # saturates a chip, and the Pallas kernels' ANY-space inputs cannot
        # be vmapped; cross-image parallelism comes from the mesh axis
        return jax.lax.map(single, images)

    axis = mesh.axis_names[0]
    in_spec = P_(axis, None, None)
    sharded = jax.shard_map(batched, mesh=mesh, in_specs=(in_spec,),
                            out_specs=(P_(axis), P_(axis)), check_vma=False)
    return jax.jit(sharded)


def detect_and_compute_batch(images: jax.Array, cfg: P.FeatureConfig,
                             mesh: Mesh):
    """Batched detect+compute, batch axis sharded over the mesh.

    images: (B, H, W) uint8, B divisible by mesh size.  Returns sharded slot
    arrays (B, nslots, ...) and descriptors (B, nslots, bytes).
    """
    return _batch_jit(cfg, mesh)(images)


def compute_sharded(image: jax.Array, keypoints_xysa: jax.Array,
                    valid: jax.Array, mesh: Mesh, *, nbits: int = 256,
                    kind: str = "bad", scale: float = 1.0,
                    windows_ok: bool = False, ranges=None):
    """Descriptor-only compute with the KEYPOINT axis sharded over the mesh
    (descriptor extraction is embarrassingly parallel per keypoint — the
    serving-throughput axis for 100k+ keypoint workloads).  The image is
    replicated; each device runs the standard compute path on its keypoint
    shard.  Output rows align with the (padded) input slots.

    keypoints_xysa: (N, 4) [x, y, size, angle]; N is padded up to a mesh
    multiple internally.  `windows_ok` as in pipeline.compute_jit (static;
    use only when every keypoint fits the base window geometry).

    ranges: optional static octave-bucket layout ((start, stop,
    smax_or_None), ...) tiling [0, N) in order — the
    pipeline.compute_bucketed_jit contract (detector slot layout mapped
    through the API's bucket scales, or host size-sorted buckets).  With
    ranges, multi-octave detector keypoints run the octave-bucketed WINDOW
    kernels on every shard instead of silently falling to the gather path:
    each bucket is dealt round-robin across devices host-side (a static
    permutation), so every device sees the same static per-bucket layout,
    and rows are gathered back to input order afterwards — byte-identical
    to single-chip compute_bucketed_jit."""
    n_dev = mesh.devices.size
    n = keypoints_xysa.shape[0]
    if ranges is not None:
        return _compute_sharded_bucketed(image, keypoints_xysa, valid, mesh,
                                         nbits, kind, scale, tuple(ranges))
    n_pad = -(-n // n_dev) * n_dev
    kp = jnp.pad(keypoints_xysa.astype(jnp.float32),
                 ((0, n_pad - n), (0, 0)))
    v = jnp.pad(valid.astype(bool), (0, n_pad - n))
    fn = _compute_sharded_jit(mesh, nbits, kind, scale, windows_ok)
    return fn(image, kp, v)[:n]


def _compute_sharded_bucketed(image, keypoints_xysa, valid, mesh: Mesh,
                              nbits: int, kind: str, scale: float, ranges):
    n_dev = mesh.devices.size
    n = keypoints_xysa.shape[0]
    ranges = tuple((int(a), int(b), None if s is None else float(s))
                   for (a, b, s) in ranges)
    if not ranges or ranges[0][0] != 0 or ranges[-1][1] != n or any(
            ranges[i][1] != ranges[i + 1][0] for i in range(len(ranges) - 1)):
        raise ValueError(f"ranges must tile [0, {n}) in order, got {ranges}")
    # deal each bucket round-robin across devices: device d's contiguous
    # shard holds rows [a + d*l_r, a + (d+1)*l_r) of every bucket r (padded
    # with sentinel n = an always-invalid zero keypoint), so the per-shard
    # bucket layout is STATIC and identical on all devices
    lens = [-(-(b - a) // n_dev) for (a, b, _) in ranges]
    total = sum(lens)
    perm = np.full((n_dev, total), n, np.int64)
    local_ranges = []
    off = 0
    for (a, b, smax), lr in zip(ranges, lens):
        idx = np.concatenate([np.arange(a, b),
                              np.full(n_dev * lr - (b - a), n, np.int64)])
        perm[:, off:off + lr] = idx.reshape(n_dev, lr)
        local_ranges.append((off, off + lr, smax))
        off += lr
    perm = perm.reshape(-1)
    kp1 = jnp.concatenate([keypoints_xysa.astype(jnp.float32),
                           jnp.zeros((1, 4), jnp.float32)])
    v1 = jnp.concatenate([valid.astype(bool), jnp.zeros((1,), bool)])
    fn = _compute_sharded_bucketed_jit(mesh, nbits, kind, scale,
                                       tuple(local_ranges))
    out_perm = fn(image, kp1[perm], v1[perm])
    # invert the (bijective on real rows) permutation back to input order
    real = perm < n
    inv = np.empty(n, np.int64)
    inv[perm[real]] = np.flatnonzero(real)
    return jnp.take(out_perm, jnp.asarray(inv), axis=0)


@functools.lru_cache(maxsize=None)
def _compute_sharded_bucketed_jit(mesh: Mesh, nbits: int, kind: str,
                                  scale: float, local_ranges):
    axis = mesh.axis_names[0]

    def shard_fn(image, kp_blk, v_blk):
        return P.compute_bucketed_jit(image, kp_blk, v_blk, nbits, kind,
                                      scale, local_ranges)

    fn = jax.shard_map(shard_fn, mesh=mesh,
                       in_specs=(P_(None, None), P_(axis, None), P_(axis)),
                       out_specs=P_(axis, None), check_vma=False)
    return jax.jit(fn)


@functools.lru_cache(maxsize=None)
def _compute_sharded_jit(mesh: Mesh, nbits: int, kind: str, scale: float,
                         windows_ok: bool):
    """Cached jitted executable per static config (see _batch_jit): the image
    rides as a replicated argument so repeated serving calls hit the same
    trace."""
    axis = mesh.axis_names[0]

    def shard_fn(image, kp_blk, v_blk):
        return P.compute_jit(image, kp_blk, v_blk, nbits, kind, scale,
                             windows_ok)

    fn = jax.shard_map(shard_fn, mesh=mesh,
                       in_specs=(P_(None, None), P_(axis, None), P_(axis)),
                       out_specs=P_(axis, None), check_vma=False)
    return jax.jit(fn)


# ---------------------------------------------------------------------------
# sp: one image row-sharded with halo exchange
# ---------------------------------------------------------------------------

# Halo: an owned pixel's NMS disc reaches |dy| <= nonmax_radius into the halo,
# and those neighbours need their own correct FAST (+3) / Harris (+4) support;
# IC-angle support needs 15 rows.  Derived per config, min 24 (covers the
# default radius 15 and IC angles), rounded up to a sublane multiple of 8.


def _halo_rows(cfg) -> int:
    need = cfg.nonmax_radius + 4
    return max(24, -(-need // 8) * 8)


def detect_rows_sharded(image: jax.Array, cfg: P.FeatureConfig, mesh: Mesh,
                        quota: int | None = None):
    """Single-level FAST+Harris+NMS detection over a row-sharded image.

    Demonstrates the sp axis: halo exchange with ppermute over ICI, dense
    detection per band, per-band top-k, all_gather merge.  (Pyramid levels
    can each be sharded the same way; single-level here keeps the collective
    pattern clear.)  Returns (ys, xs, resp, valid) of global top `quota`.
    """
    h, w = image.shape
    return _rows_sharded_jit(h, w, cfg, mesh, quota or cfg.nfeatures)(image)


@functools.lru_cache(maxsize=None)
def _rows_sharded_jit(h: int, w: int, cfg: P.FeatureConfig, mesh: Mesh,
                      quota: int):
    """Cached jitted executable per (shape, cfg, mesh, quota) — see
    _batch_jit for why the shard_map closure must be built once."""
    axis = mesh.axis_names[0]
    n = mesh.devices.size
    assert h % n == 0, "image rows must divide the mesh"
    halo = _halo_rows(cfg)

    def band_fn(band):  # band: (h/n, w)
        i = jax.lax.axis_index(axis)
        bh = band.shape[0]
        # halo exchange over the ICI ring: send bottom rows down, top rows up
        top_halo = jax.lax.ppermute(band[-halo:], axis,
                                    [(j, (j + 1) % n) for j in range(n)])
        bot_halo = jax.lax.ppermute(band[:halo], axis,
                                    [(j, (j - 1) % n) for j in range(n)])
        # first/last band have no real neighbour: zero the wrapped halo
        top_halo = jnp.where(i == 0, 0, top_halo)
        bot_halo = jnp.where(i == n - 1, 0, bot_halo)
        ext = jnp.concatenate([top_halo, band, bot_halo], axis=0)

        corner = OD.fast_corner_mask(ext, cfg.fast_threshold)
        # the global border mask applies BEFORE NMS: border-excluded corners
        # never enter the candidate set (createMask feeds the FAST kernel,
        # cuda_efficient_features.cpp:250,259) and so cannot suppress anyone
        row_ids = jnp.arange(ext.shape[0]) - halo + i * bh
        gborder = (row_ids >= S.HALF_PATCH_SIZE) & \
                  (row_ids < h - S.HALF_PATCH_SIZE)
        col_ok = jnp.zeros((w,), bool).at[
            S.HALF_PATCH_SIZE:w - S.HALF_PATCH_SIZE].set(True)
        corner = corner & gborder[:, None] & col_ok[None, :]
        resp = OD.harris_response(ext)
        surv = OD.radius_nms(resp, corner, cfg.nonmax_radius)
        # keep only detections in the owned band
        owned = (jnp.arange(ext.shape[0]) >= halo) & \
                (jnp.arange(ext.shape[0]) < halo + bh)
        surv = surv & owned[:, None]

        ys_l, xs_l, r_l, v_l = OD.select_topk(resp, surv, quota,
                                              nms_radius=cfg.nonmax_radius)
        ys_g = jnp.where(v_l, ys_l - halo + i * bh, 0)
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
    return jax.jit(sharded)


def shard_batch(images: np.ndarray, mesh: Mesh) -> jax.Array:
    """Place a host batch onto the mesh, batch-axis sharded."""
    spec = NamedSharding(mesh, P_(mesh.axis_names[0], None, None))
    return jax.device_put(images, spec)


# ---------------------------------------------------------------------------
# sp: full multi-level pyramid detection over a row-sharded image
# ---------------------------------------------------------------------------
# Each chip owns a row band of every pyramid level.  Per level: the band is
# resized from the previous level's band plus a ppermute halo (the bilinear
# row tables are global trace-time constants sliced per band, so pixels are
# bit-identical to the single-device pyramid); FAST+Harris+NMS run on a
# 24-row halo; candidates are merged to the global per-level quota with an
# all_gather + two-key sort.  Output slots are bit-identical to detect_jit.


def detect_pyramid_rows_sharded(image: jax.Array, cfg: P.FeatureConfig,
                                mesh: Mesh, with_descriptors: bool = False,
                                mask: jax.Array | None = None):
    """Full-pyramid detect over a row-sharded image (detect_jit-compatible
    slot dict; descriptors optional).  Requires every level height >= 2x the
    mesh size.

    With descriptors: each band blurs its rows (with the global REFLECT_101
    emulated at image edges via a row remap), computes descriptors for the
    merged keypoints that fall in its band (band-local integrals/patches with
    global border semantics via the ops' origin/frame parameters), and a psum
    combines the disjoint rows — bit-compatible with detect_and_compute_jit.

    With a user ROI mask: the (h, w) mask is replicated (masks are u8-cheap
    next to the image pipeline) and each band gathers its level-s mask rows
    through the same trace-time nearest-neighbour tables the single-chip
    mask pyramid uses — applied to the corner mask BEFORE the NMS, so
    masked-out corners cannot suppress neighbours (pipeline semantics).
    """
    h, w = image.shape
    fn, pad_h = _pyramid_sharded_jit(h, w, cfg, mesh, with_descriptors,
                                     mask is not None)
    padded = jnp.pad(image, ((0, pad_h), (0, 0)))
    if mask is not None:
        return fn(padded, jnp.asarray(mask) != 0)
    return fn(padded)


@functools.lru_cache(maxsize=None)
def _pyramid_sharded_jit(h: int, w: int, cfg: P.FeatureConfig, mesh: Mesh,
                         with_descriptors: bool, with_mask: bool = False):
    """Cached jitted executable per (shape, cfg, mesh) — see _batch_jit: the
    shard_map closure (and its trace-time resize tables) must be built once
    so repeated mesh= API calls reuse the trace/compile."""
    axis = mesh.axis_names[0]
    n = mesh.devices.size
    band_fn, pad_h = _pyramid_band_builder(h, w, cfg, axis, n,
                                           with_descriptors, with_mask)
    in_specs = (P_(axis, None), P_(None, None)) if with_mask \
        else (P_(axis, None),)
    sharded = jax.shard_map(band_fn, mesh=mesh, in_specs=in_specs,
                            out_specs=P_(), check_vma=False)
    return jax.jit(sharded), pad_h


def _pyramid_band_builder(h: int, w: int, cfg: P.FeatureConfig, axis: str,
                          n: int, with_descriptors: bool, with_mask: bool):
    """Per-band pyramid detect(+describe) body over mesh axis `axis` with
    `n` bands; returns (band_fn, pad_h).  band_fn is shard_map-able directly
    (1D sp mesh) or under vmap (dp x sp 2D mesh — every collective names
    `axis`, so a leading batch dim rides for free)."""
    from ..ops import image as OI
    from ..ops import bad as OB
    from ..ops import hash_sift as OHS
    shapes = S.pyramid_shapes(h, w, cfg.scale_factor, cfg.nlevels)
    scales = S.pyramid_scales(cfg.scale_factor, cfg.nlevels)
    quotas = S.features_per_level(cfg.nfeatures, cfg.scale_factor,
                                  cfg.nlevels)
    bh_min = min(-(-hs // n) for hs, _ in shapes)
    halo_rs_req = max(16, int(np.ceil((n - 1) * cfg.scale_factor)) + 4)
    if bh_min < max(_halo_rows(cfg), halo_rs_req):
        raise ValueError(
            "pyramid bands shorter than the exchange halo; fewer levels, a "
            "smaller mesh, or detect_jit are required for this image size")

    # per-level band geometry + global resize tables (trace-time, float64 —
    # identical to ops.image.resize_u8 / the oracle)
    bh = [-(-hs // n) for hs, _ in shapes]
    halo_rs = max(16, int(np.ceil((n - 1) * cfg.scale_factor)) + 4)
    halo = _halo_rows(cfg)
    tables = []
    for s in range(1, cfg.nlevels):
        hs, ws = shapes[s]
        hp, wp = shapes[s - 1]
        y0, y1, wy = S.resize_axis_coeffs(hs, hp)
        x0, x1, wx = S.resize_axis_coeffs(ws, wp)
        pad = n * bh[s] - hs
        y0 = np.pad(y0, (0, pad), mode="edge")
        y1 = np.pad(y1, (0, pad), mode="edge")
        wy = np.pad(wy, (0, pad), mode="edge")
        tables.append((jnp.asarray(y0), jnp.asarray(y1), jnp.asarray(wy),
                       jnp.asarray(x0), jnp.asarray(x1), jnp.asarray(wx)))

    one = np.int32(1 << S.RESIZE_BITS)
    rnd = np.int32(1 << (2 * S.RESIZE_BITS - 1))

    # trace-time nearest-neighbour mask-pyramid index tables (exactly
    # pipeline._mask_pyramid / cpu.reference.mask_pyramid)
    if with_mask:
        mask_tabs = [None]
        for (hs, ws) in shapes[1:]:
            yy = np.clip((np.arange(hs) * 2 + 1) * h // (2 * hs), 0, h - 1)
            xx = np.clip((np.arange(ws) * 2 + 1) * w // (2 * ws), 0, w - 1)
            mask_tabs.append((jnp.asarray(yy.astype(np.int32)),
                              jnp.asarray(xx.astype(np.int32))))

    def halo_exchange(band, H, i):
        top = jax.lax.ppermute(band[-H:], axis,
                               [(j, (j + 1) % n) for j in range(n)])
        bot = jax.lax.ppermute(band[:H], axis,
                               [(j, (j - 1) % n) for j in range(n)])
        top = jnp.where(i == 0, jnp.zeros_like(top), top)
        bot = jnp.where(i == n - 1, jnp.zeros_like(bot), bot)
        return jnp.concatenate([top, band, bot], axis=0)

    def band_fn(band0, *maybe_mask):
        mask0 = maybe_mask[0] if with_mask else None
        i = jax.lax.axis_index(axis)
        per_level = []
        cur = band0
        for s in range(cfg.nlevels):
            hs, ws = shapes[s]
            if s > 0:
                y0t, y1t, wyt, x0t, x1t, wxt = tables[s - 1]
                ext = halo_exchange(cur, halo_rs, i).astype(jnp.int32)
                hp = (jnp.take(ext, x0t, axis=1) * (one - wxt)[None, :]
                      + jnp.take(ext, x1t, axis=1) * wxt[None, :])
                base = i * bh[s - 1] - halo_rs
                y0b = jax.lax.dynamic_slice(y0t, (i * bh[s],), (bh[s],))
                y1b = jax.lax.dynamic_slice(y1t, (i * bh[s],), (bh[s],))
                wyb = jax.lax.dynamic_slice(wyt, (i * bh[s],), (bh[s],))
                loc0 = jnp.clip(y0b - base, 0, ext.shape[0] - 1)
                loc1 = jnp.clip(y1b - base, 0, ext.shape[0] - 1)
                acc = (hp[loc0] * (one - wyb)[:, None]
                       + hp[loc1] * wyb[:, None])
                cur = ((acc + rnd) >> (2 * S.RESIZE_BITS)).astype(jnp.uint8)

            # --- per-level detection on the band (cf. detect_rows_sharded) ---
            quota = quotas[s]
            ext = halo_exchange(cur, halo, i)
            corner = OD.fast_corner_mask(ext, cfg.fast_threshold)
            row_ids = jnp.arange(ext.shape[0]) - halo + i * bh[s]
            gborder = (row_ids >= S.HALF_PATCH_SIZE) & \
                      (row_ids < hs - S.HALF_PATCH_SIZE)
            col_ok = jnp.zeros((ws,), bool).at[
                S.HALF_PATCH_SIZE:ws - S.HALF_PATCH_SIZE].set(True)
            corner = corner & gborder[:, None] & col_ok[None, :]
            if with_mask:
                # level-s mask rows for this band's extended window, gathered
                # straight from the replicated level-0 mask (rows outside
                # [0, hs) are already dead via gborder)
                rid = jnp.clip(row_ids, 0, hs - 1)
                if s == 0:
                    m_ext = mask0[rid]
                else:
                    yy_t, xx_t = mask_tabs[s]
                    m_ext = mask0[yy_t[rid]][:, xx_t]
                corner = corner & m_ext
            resp = OD.harris_response(ext)
            surv = OD.radius_nms(resp, corner, cfg.nonmax_radius)
            owned = (jnp.arange(ext.shape[0]) >= halo) & \
                    (jnp.arange(ext.shape[0]) < halo + bh[s])
            surv = surv & owned[:, None]

            ys_l, xs_l, r_l, v_l = OD.select_topk(resp, surv, quota,
                                              nms_radius=cfg.nonmax_radius)
            from ..ops import orientation as OO
            ang_l = OO.ic_angles(ext, ys_l, xs_l, v_l)
            ys_g = jnp.where(v_l, ys_l - halo + i * bh[s], 0)

            ys_all = jax.lax.all_gather(ys_g, axis).reshape(-1)
            xs_all = jax.lax.all_gather(xs_l, axis).reshape(-1)
            an_all = jax.lax.all_gather(ang_l, axis).reshape(-1)
            r_all = jax.lax.all_gather(
                jnp.where(v_l, r_l, OD.RESP_SENTINEL), axis).reshape(-1)
            flat = ys_all.astype(jnp.int32) * ws + xs_all.astype(jnp.int32)
            neg, _, ys_s, xs_s, an_s = jax.lax.sort(
                (-r_all, flat, ys_all, xs_all, an_all), num_keys=2)
            r_s = -neg[:quota]
            valid = r_s > OD.RESP_SENTINEL
            ys_s = ys_s[:quota]
            xs_s = xs_s[:quota]
            an_s = an_s[:quota] * valid

            desc = None
            if with_descriptors and bh[s] >= 48:
                # band-local blurred window with global REFLECT_101 edges
                HB = 48
                ext = halo_exchange(cur, HB, i)
                g_rows = jnp.arange(ext.shape[0]) - HB + i * bh[s]
                refl = jnp.abs(g_rows)
                refl = jnp.where(refl >= hs, 2 * (hs - 1) - refl, refl)
                src = jnp.clip(refl - (i * bh[s] - HB), 0, ext.shape[0] - 1)
                blurred = OI.gaussian_blur7_u8(ext[src])
                winr = bh[s] + 80
                win = jax.lax.slice(blurred, (HB - 40, 0), (HB - 40 + winr, ws))
                oy = i * bh[s] - 40
            elif with_descriptors:
                # short bands: rebuild the small level via all_gather (cheap)
                full = jax.lax.all_gather(cur, axis).reshape(-1, ws)
                win = OI.gaussian_blur7_u8(
                    jax.lax.slice(full, (0, 0), (hs, ws)))
                oy = 0

            if with_descriptors:
                in_band = valid & (ys_s >= i * bh[s]) & (ys_s < (i + 1) * bh[s])
                kxf = xs_s.astype(jnp.float32)
                kyf = ys_s.astype(jnp.float32)
                ksz = jnp.full(kxf.shape, np.float32(S.PATCH_SIZE),
                               jnp.float32)
                kind, bits = cfg.descriptor_type.rsplit("_", 1)
                if kind == "bad":
                    from ..ops.image import integral_image_i32
                    integ = integral_image_i32(win)
                    d = OB.bad_descriptors(integ, kxf, kyf, ksz, an_s,
                                           in_band, nbits=int(bits),
                                           scale_factor=1.0,
                                           origin=(oy, 0), frame_hw=(hs, ws))
                else:
                    d = OHS.hash_sift_descriptors(
                        win, kxf, kyf, ksz, an_s, in_band, nbits=int(bits),
                        cropping_scale=1.0, origin=(oy, 0), frame_hw=(hs, ws))
                # rows are disjoint across bands; psum combines
                desc = jax.lax.psum(d.astype(jnp.int32), axis
                                    ).astype(jnp.uint8)

            per_level.append((s, ys_s, xs_s,
                              jnp.where(valid, r_s, jnp.float32(0)),
                              an_s, valid, desc))

        # --- assemble detect_jit-compatible slots ---
        outs = {k: [] for k in ("x", "y", "response", "angle", "octave",
                                "size", "valid")}
        descs = []
        for (s, ys, xs, r, ang, valid, desc) in per_level:
            if desc is not None:
                descs.append(desc)
            sc = np.float32(scales[s])
            outs["x"].append(jnp.trunc(sc * xs.astype(jnp.float32)
                                       + np.float32(0.5)))
            outs["y"].append(jnp.trunc(sc * ys.astype(jnp.float32)
                                       + np.float32(0.5)))
            outs["response"].append(r)
            outs["angle"].append(ang)
            outs["octave"].append(jnp.full(ys.shape, s, jnp.int32))
            outs["size"].append(jnp.full(ys.shape,
                                         sc * np.float32(S.PATCH_SIZE),
                                         jnp.float32))
            outs["valid"].append(valid)
        slots = {k: jnp.concatenate(v) for k, v in outs.items()}
        slots["count"] = slots["valid"].sum(dtype=jnp.int32)
        if with_descriptors:
            return slots, jnp.concatenate(descs, axis=0)
        return slots

    return band_fn, n * bh[0] - h


def make_mesh_2d(dp: int, sp: int) -> Mesh:
    """(dp, sp) 2D mesh: batch axis x image-row axis."""
    devs = jax.devices()
    if dp * sp > len(devs):
        raise ValueError(f"need {dp * sp} devices, have {len(devs)}")
    return Mesh(np.array(devs[:dp * sp]).reshape(dp, sp), ("dp", "sp"))


def detect_and_compute_batch_2d(images: jax.Array, cfg: P.FeatureConfig,
                                mesh: Mesh, mask: jax.Array | None = None):
    """Batched detect+compute over a 2D (dp, sp) mesh: the batch axis
    shards over `dp` and each image's rows shard over `sp` (the full
    pyramid pipeline of detect_pyramid_rows_sharded, vmapped over the local
    batch — collectives ride the sp rings of the mesh).  images: (B, H, W)
    uint8, B divisible by mesh.shape['dp'].  Optional per-image masks
    (B, H, W).  Returns (slots dict with leading batch dim, descriptors),
    each bit-identical to the single-chip per-image results."""
    b, h, w = images.shape
    fn, pad_h = _pyramid_batch2d_jit(h, w, cfg, mesh, mask is not None)
    padded = jnp.pad(images, ((0, 0), (0, pad_h), (0, 0)))
    if mask is not None:
        return fn(padded, jnp.asarray(mask) != 0)
    return fn(padded)


@functools.lru_cache(maxsize=None)
def _pyramid_batch2d_jit(h: int, w: int, cfg: P.FeatureConfig, mesh: Mesh,
                         with_mask: bool):
    dp_ax, sp_ax = mesh.axis_names
    n = mesh.shape[sp_ax]
    band_fn, pad_h = _pyramid_band_builder(h, w, cfg, sp_ax, n,
                                           with_descriptors=True,
                                           with_mask=with_mask)
    vband = jax.vmap(band_fn)
    in_specs = (P_(dp_ax, sp_ax, None), P_(dp_ax, None, None)) if with_mask \
        else (P_(dp_ax, sp_ax, None),)
    sharded = jax.shard_map(vband, mesh=mesh, in_specs=in_specs,
                            out_specs=P_(dp_ax), check_vma=False)
    return jax.jit(sharded), pad_h


# ---------------------------------------------------------------------------
# Matching with the QUERY axis sharded over the mesh
# ---------------------------------------------------------------------------


def knn2_match_sharded(desc1: jax.Array, valid1: jax.Array,
                       desc2: jax.Array, valid2: jax.Array, mesh: Mesh,
                       max_ratio: float = 0.8):
    """knn2 ratio+cross-check matching with BOTH descriptor sets sharded
    over the mesh (the serving axis for multi-image map/localization
    backends matching 100k+ descriptors per frame pair).

    Each device all_gathers the packed uint8 descriptors (N*nbits/8 bytes —
    2.6 MB at 40k/512, riding ICI) and runs the streaming fused kernel
    (ops/matcher._fused_topk2) on its query shard against the full train
    set, plus the reverse direction on its train shard for the cross check;
    the (N2,) reverse-best index vector is all_gathered.  Compute and the
    dominant descriptor-stream traffic scale 1/n_dev; outputs match
    ops.matcher.knn2_ratio_match_masked_fused rows exactly.

    Returns (j, best, ok) aligned with desc1 rows (same contract as
    knn2_ratio_match_masked)."""
    n_dev = mesh.devices.size
    n1 = desc1.shape[0]
    n2 = desc2.shape[0]
    n1p = -(-n1 // n_dev) * n_dev
    n2p = -(-n2 // n_dev) * n_dev
    d1 = jnp.pad(desc1, ((0, n1p - n1), (0, 0)))
    v1 = jnp.pad(valid1.astype(bool), (0, n1p - n1))
    d2 = jnp.pad(desc2, ((0, n2p - n2), (0, 0)))
    v2 = jnp.pad(valid2.astype(bool), (0, n2p - n2))
    from ..ops import matcher as OM
    # EFF_TPU_MATCH_QB resolved HERE, in the un-jitted entry, and threaded
    # through the lru_cache key — inside shard_map the env read would bind
    # at first trace only (the round-4 advisor finding, which the matcher
    # entry points already fix; this path regressed when _fused_topk2's
    # default became a fixed 1024)
    qb = OM._resolve_qb(None)
    j, best, ok = _match_sharded_jit(mesh, float(max_ratio), qb)(d1, v1,
                                                                 d2, v2)
    return j[:n1], best[:n1], ok[:n1]


@functools.lru_cache(maxsize=None)
def _match_sharded_jit(mesh: Mesh, max_ratio: float, qb: int = 1024):
    from ..ops import matcher as OM

    axis = mesh.axis_names[0]

    def body(d1, v1, d2, v2):
        nbits = d1.shape[1] * 8
        d1f = jax.lax.all_gather(d1, axis, tiled=True)
        v1f = jax.lax.all_gather(v1, axis, tiled=True)
        d2f = jax.lax.all_gather(d2, axis, tiled=True)
        v2f = jax.lax.all_gather(v2, axis, tiled=True)
        j, bdot, sdot = OM._fused_topk2(d1, d2f, v2f, qb=qb)
        best = OM._dot_to_hamming(bdot, nbits)
        second = OM._dot_to_hamming(sdot, nbits)
        ib, _, _ = OM._fused_topk2(d2, d1f, v1f, qb=qb)
        i_back = jax.lax.all_gather(ib, axis, tiled=True)
        off = jax.lax.axis_index(axis) * d1.shape[0]
        ratio_ok = (best.astype(jnp.float32)
                    <= max_ratio * second.astype(jnp.float32))
        cross_ok = i_back[j] == (jnp.arange(d1.shape[0]) + off)
        ok = ratio_ok & cross_ok & v1 & (bdot > -OM._MASK_PENALTY * 0.5)
        return j, best, ok

    sharded = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P_(axis, None), P_(axis), P_(axis, None), P_(axis)),
        out_specs=(P_(axis), P_(axis), P_(axis)), check_vma=False)
    return jax.jit(sharded)
