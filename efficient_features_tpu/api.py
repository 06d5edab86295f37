"""Public API: EfficientFeatures / BAD / HashSIFT.

Mirrors the reference's cv::Feature2D-shaped surface
(cuda_efficient_features.h:28-98, cuda_efficient_descriptors.h:27-121):
  detect / compute / detect_and_compute + *_async variants, convert,
  and the seven parameter getter/setter pairs.

Async semantics, TPU-style: JAX dispatch is asynchronous — the *_async methods
return device-resident results immediately (the analogue of enqueueing on a
CUDA stream) and `.block()` / host conversion forces completion (the analogue
of Stream::waitForCompletion).  Buffers are fixed-shape, so repeated calls at
the same image size reuse the compiled executable and allocations (the role of
the reference's DeviceBuffer grow-only allocator, device_buffer.cpp).

Keypoints are fixed-capacity slot arrays with a validity mask; `KeyPoints`
wraps them and compacts lazily on host access.
"""
from __future__ import annotations


from dataclasses import replace

import numpy as np
import jax
import jax.numpy as jnp

from . import pipeline as P
from .utils import semantics as S

_PAD = 256  # keypoint-count padding granularity for standalone compute()


class KeyPoints:
    """Device-resident keypoint set (fixed-capacity slots + validity mask).

    Fields mirror the reference's 5-row SoA layout
    (cuda_efficient_features.h:32-37) plus octave/size.
    """

    def __init__(self, slots: dict, max_size: float | None = None,
                 level_ranges: tuple | None = None):
        self._slots = slots
        self._host = None
        # static upper bound on kp.size, known at trace time for detector
        # output (31 * scale_factor**(nlevels-1)); lets compute() pick the
        # window-kernel path without a device->host size reduction
        self._max_size = max_size
        # static per-level slot layout ((start, stop, size), ...) from
        # pipeline.level_slot_ranges: each range holds one pyramid level's
        # fixed-size keypoints, letting compute() run the octave-bucketed
        # window kernels with per-level geometry
        self._level_ranges = level_ranges

    @property
    def max_size(self) -> float | None:
        """Static keypoint-size bound (None when unknown, e.g. user slots)."""
        return self._max_size

    @property
    def level_ranges(self) -> tuple | None:
        """Static ((start, stop, size), ...) slot layout (detector output)."""
        return self._level_ranges

    def block(self) -> "KeyPoints":
        jax.block_until_ready(self._slots)
        return self

    @property
    def capacity(self) -> int:
        return int(self._slots["x"].shape[0])

    @property
    def count(self) -> int:
        """Number of valid keypoints.

        WARNING: reads a device scalar, so it SYNCS the device (waits for the
        whole async chain; ~30 ms host round trip under the axon tunnel).  In
        async pipelines prefer `capacity` (static) or keep using the slot
        arrays device-side; call count/len only at the end of a chain."""
        return int(self._slots["count"])

    def _compact(self):
        if self._host is None:
            h = {k: np.asarray(v) for k, v in self._slots.items() if k != "count"}
            m = h.pop("valid")
            self._host = {k: v[m] for k, v in h.items()}
        return self._host

    def as_arrays(self):
        """Compacted host arrays: dict(x, y, response, angle, octave, size)."""
        return dict(self._compact())

    def xysa(self) -> np.ndarray:
        """(N, 4) float32 [x, y, size, angle] — descriptor-input layout
        (convertKeypoints, cuda_efficient_features.cu:250-263)."""
        h = self._compact()
        return np.stack([h["x"], h["y"], h["size"], h["angle"]],
                        axis=1).astype(np.float32)

    def cv_keypoints(self):
        """Convert to a list of cv2.KeyPoint (the reference `convert`,
        cuda_efficient_features.cpp:323-349).  Without cv2 installed, returns
        duck-typed keypoints with the same attributes (pt, size, angle,
        response, octave)."""
        h = self._compact()
        try:
            import cv2
            make = lambda x, y, sz, a, r, o: cv2.KeyPoint(  # noqa: E731
                float(x), float(y), float(sz), float(a), float(r), int(o))
        except ImportError:
            from types import SimpleNamespace
            make = lambda x, y, sz, a, r, o: SimpleNamespace(  # noqa: E731
                pt=(float(x), float(y)), size=float(sz), angle=float(a),
                response=float(r), octave=int(o), class_id=-1)
        return [make(x, y, sz, a, r, o)
                for x, y, sz, a, r, o in zip(h["x"], h["y"], h["size"],
                                             h["angle"], h["response"],
                                             h["octave"])]

    def __bool__(self):
        # truthiness must NOT silently sync the device (len() would);
        # a KeyPoints object is always "some result" — test emptiness
        # explicitly with .count
        return True

    def __len__(self):
        """REMOVED as a silent-sync footgun: `len(kps)` (and anything that
        calls it implicitly) would read a device scalar and stall the whole
        async chain (~30 ms host round trip under a tunneled chip).  Use
        `.count` when you accept the sync, or `.capacity` for the static
        slot count."""
        raise TypeError(
            "len(KeyPoints) is disabled: it would silently sync the device. "
            "Use .count (syncs; number of valid keypoints) or .capacity "
            "(static slot count).")


def _as_u8_image(image) -> jax.Array:
    img = jnp.asarray(image)
    if img.dtype != jnp.uint8 or img.ndim != 2:
        raise ValueError("image must be a 2-D uint8 (grayscale) array")
    return img


def _keypoints_to_xysa(keypoints) -> np.ndarray:
    """Accept KeyPoints, (N,4) array, or a list of cv2.KeyPoint-likes."""
    if isinstance(keypoints, KeyPoints):
        return keypoints.xysa()
    if isinstance(keypoints, (list, tuple)):
        return np.array([[k.pt[0], k.pt[1], k.size, k.angle]
                         for k in keypoints], np.float32).reshape(-1, 4)
    a = np.asarray(keypoints, np.float32)
    if a.ndim != 2 or a.shape[1] != 4:
        raise ValueError("keypoints must be (N, 4) [x, y, size, angle]")
    return a


class _DescriptorBase:
    """Shared compute path for BAD / HashSIFT (EfficientDescriptorsAsync,
    cuda_efficient_descriptors.h:27-57)."""

    _kind: str
    _scale: float
    _nbits: int

    def compute(self, image, keypoints) -> np.ndarray:
        out = self.compute_async(image, keypoints)
        if isinstance(keypoints, KeyPoints):
            # compact slot-aligned rows to the valid keypoints
            return np.asarray(out)[np.asarray(keypoints._slots["valid"])]
        return np.asarray(out)

    def compute_async(self, image, keypoints) -> jax.Array:
        """Descriptors for `keypoints` on `image`.

        `KeyPoints` input stays DEVICE-RESIDENT end to end (the reference's
        device 5-row-mat path, cuda_efficient_features.cpp:102-129): the slot
        arrays feed the descriptor jit directly — zero host transfers in a
        detect_async -> compute_async chain — and the result rows align with
        the keypoint SLOTS (invalid slots give zero rows; compact with the
        valid mask, as compute() does).  Host inputs ((N,4) arrays / cv2
        keypoint lists) return compacted (N, bytes) rows as before."""
        from .ops import window_kernels as WK
        from .ops.window_kernels import max_window_size
        img = _as_u8_image(image)
        if isinstance(keypoints, KeyPoints):
            s = keypoints._slots
            kp_dev = jnp.stack(
                [s["x"], s["y"], s["size"], s["angle"]], axis=1
            ).astype(jnp.float32)
            # static bound decides the kernel path — no device max() stall;
            # unknown bound falls back to the always-correct gather path
            ms = keypoints.max_size
            if ms is not None and ms <= max_window_size(self._scale):
                return P.compute_jit(img, kp_dev, s["valid"], self._nbits,
                                     self._kind, self._scale, True)
            ranges = keypoints.level_ranges
            if ranges is not None:
                # multi-octave detector output: per-level static slot ranges
                # run the window kernels at their octave-bucket geometry
                br = tuple(
                    (a, b, self._bucket_smax(sz)) for (a, b, sz) in ranges)
                return P.compute_bucketed_jit(img, kp_dev, s["valid"],
                                              self._nbits, self._kind,
                                              self._scale, br)
            return P.compute_jit(img, kp_dev, s["valid"], self._nbits,
                                 self._kind, self._scale, False)
        if isinstance(keypoints, jax.Array):
            # device-resident (N, 4) [x, y, size, angle] array: stays on
            # device (the descriptor-input layout of the reference's device
            # path); without a static size bound the always-correct gather
            # path is used — wrap detector output in KeyPoints to get the
            # window-kernel path
            if keypoints.ndim != 2 or keypoints.shape[1] != 4:
                raise ValueError(
                    "device keypoints must be (N, 4) [x, y, size, angle]")
            n = int(keypoints.shape[0])
            if n == 0:
                return jnp.zeros((0, self.descriptor_size()), jnp.uint8)
            cap = -(-n // _PAD) * _PAD
            kp_dev = jnp.pad(keypoints.astype(jnp.float32),
                             ((0, cap - n), (0, 0)))
            valid = jnp.arange(cap) < n
            out = P.compute_jit(img, kp_dev, valid, self._nbits, self._kind,
                                self._scale, False)
            return out[:n]
        kp = _keypoints_to_xysa(keypoints)
        n = kp.shape[0]
        if n == 0:
            return jnp.zeros((0, self.descriptor_size()), jnp.uint8)
        if bool(kp[:, 2].max() <= max_window_size(self._scale)):
            # every keypoint fits the base window geometry: one call
            cap = -(-n // _PAD) * _PAD
            padded = np.zeros((cap, 4), np.float32)
            padded[:n] = kp
            valid = np.zeros(cap, bool)
            valid[:n] = True
            out = P.compute_jit(img, jnp.asarray(padded), jnp.asarray(valid),
                                self._nbits, self._kind, self._scale, True)
            return out[:n]
        # multi-scale host keypoints: size-sort into octave buckets so each
        # bucket runs the window kernel at its geometry (oversized buckets
        # take the gather path inside compute_bucketed_jit)
        svals = kp[:, 2].astype(np.float64) * self._scale / 32.0
        # one ladder definition: WK.bucket_scale maps each affine scale to
        # its bucket's static s_max (the same values _bucket_smax and the
        # detector path use); beyond _S_CAP the exact gather path takes over
        uniq, inv = np.unique(svals, return_inverse=True)
        usmax = np.array([WK.bucket_scale(float(s)) for s in uniq])
        kb = usmax[inv]
        kb[svals > WK._S_CAP] = np.inf         # gather bucket, sorts last
        order = np.argsort(kb, kind="stable")
        ranges = []
        padded_rows = []
        pos = np.zeros(n, np.int64)            # padded row of each input kp
        off = 0
        for k in np.unique(kb):
            sel = order[kb[order] == k]
            cap = -(-len(sel) // _PAD) * _PAD
            blk = np.zeros((cap, 4), np.float32)
            blk[:len(sel)] = kp[sel]
            padded_rows.append(blk)
            pos[sel] = off + np.arange(len(sel))
            smax = None if not np.isfinite(k) else float(k)
            ranges.append((off, off + cap, smax))
            off += cap
        padded = np.concatenate(padded_rows, axis=0)
        valid = np.zeros(off, bool)
        valid[pos] = True
        out = P.compute_bucketed_jit(img, jnp.asarray(padded),
                                     jnp.asarray(valid), self._nbits,
                                     self._kind, self._scale, tuple(ranges))
        return jnp.asarray(out)[jnp.asarray(pos)]

    def _bucket_smax(self, size_bound: float):
        """Static octave-bucket scale bound for keypoints of size <=
        size_bound (None -> beyond the bucketed window path's cap)."""
        from .ops import window_kernels as WK
        if size_bound > WK.max_bucketed_size(self._scale):
            return None
        return WK.bucket_scale(self._scale * float(size_bound) / 32.0)

    def descriptor_size(self) -> int:
        return self._nbits // 8

    def descriptor_type(self):
        return np.uint8

    def default_norm(self) -> str:
        return "hamming"


class BAD(_DescriptorBase):
    """Box Average Difference descriptor (cuda_efficient_descriptors.h:67-90).

    scale_factor: sampling-window scale (1.0 for ORB-like keypoints)."""

    SIZE_512_BITS = 512
    SIZE_256_BITS = 256
    _kind = "bad"

    def __init__(self, scale_factor: float = 1.0, nbits: int = 256):
        if nbits not in (256, 512):
            raise ValueError("BAD supports 256 or 512 bits")
        self._scale = float(scale_factor)
        self._nbits = nbits

    @staticmethod
    def create(scale_factor: float = 1.0, nbits: int = 256) -> "BAD":
        return BAD(scale_factor, nbits)


class HashSIFT(_DescriptorBase):
    """HashSIFT descriptor (cuda_efficient_descriptors.h:101-121).

    cropping_scale: patch diameter = cropping_scale * kp.size.
    sigma: accepted for API parity with the CPU reference
    (efficient_descriptors.h:89) but a documented no-op — the GPU reference
    ignores it too (the Gaussian pre-blur call is commented out,
    cuda_hash_sift.cu:392)."""

    SIZE_512_BITS = 512
    SIZE_256_BITS = 256
    _kind = "hash_sift"

    def __init__(self, cropping_scale: float = 1.0, nbits: int = 256,
                 sigma: float = 0.0):
        if nbits not in (256, 512):
            raise ValueError("HashSIFT supports 256 or 512 bits")
        self._scale = float(cropping_scale)
        self._nbits = nbits
        self._sigma = float(sigma)

    @staticmethod
    def create(cropping_scale: float = 1.0, nbits: int = 256,
               sigma: float = 0.0) -> "HashSIFT":
        return HashSIFT(cropping_scale, nbits, sigma)


class EfficientFeatures:
    """Multi-scale FAST+Harris detector with BAD/HashSIFT descriptors
    (cuda_efficient_features.h:28-98)."""

    def __init__(self, nfeatures: int = 5000, scale_factor: float = 1.2,
                 nlevels: int = 8, first_level: int = 0,
                 fast_threshold: int = 20, nonmax_radius: int = 15,
                 descriptor_type: str = "hash_sift_256"):
        # every parameter is validated eagerly by FeatureConfig.__post_init__
        # (descriptor_type like the reference's createDescriber call in the
        # impl constructor, cuda_efficient_features.cpp:48-69; the numeric
        # params with clear ValueErrors the reference lacks)
        self._cfg = P.FeatureConfig(
            nfeatures=nfeatures, scale_factor=scale_factor, nlevels=nlevels,
            first_level=first_level, fast_threshold=fast_threshold,
            nonmax_radius=nonmax_radius, descriptor_type=descriptor_type)

    create = staticmethod(lambda *a, **kw: EfficientFeatures(*a, **kw))

    # -- detection ---------------------------------------------------------

    def detect(self, image, mask=None, mesh=None) -> KeyPoints:
        return self.detect_async(image, mask, mesh).block()

    def detect_async(self, image, mask=None, mesh=None) -> KeyPoints:
        """Keypoints for one image.

        mesh (optional jax.sharding.Mesh): row-shard the image (and the
        whole pyramid) across the mesh's devices — halo exchange over ICI,
        per-level quota merges by all_gather; byte-identical slots to the
        single-chip path (parallel/sharding.detect_pyramid_rows_sharded).
        For images too small for the band halos a ValueError is raised.
        No reference analogue (the CUDA library is single-GPU)."""
        img = _as_u8_image(image)
        P.validate_image_shape(self._cfg, *img.shape)
        ranges = P.level_slot_ranges(self._cfg, *img.shape)
        if mesh is not None:
            from .parallel import sharding as SH
            if mask is not None:
                mask = self._as_mask(mask, img.shape)
            slots = SH.detect_pyramid_rows_sharded(img, self._cfg, mesh,
                                                   mask=mask)
            return KeyPoints(slots, max_size=self._max_kp_size(),
                             level_ranges=ranges)
        if mask is not None:
            mask = self._as_mask(mask, img.shape)
            return KeyPoints(P.detect_masked_jit(img, mask, self._cfg),
                             max_size=self._max_kp_size(),
                             level_ranges=ranges)
        return KeyPoints(P.detect_jit(img, self._cfg),
                         max_size=self._max_kp_size(), level_ranges=ranges)

    def _max_kp_size(self) -> float:
        """Trace-time bound on detector keypoint sizes (top pyramid level)."""
        return float(S.PATCH_SIZE
                     * self._cfg.scale_factor ** (self._cfg.nlevels - 1))

    def compute(self, image, keypoints) -> np.ndarray:
        return self._describer().compute(image, keypoints)

    def compute_async(self, image, keypoints) -> jax.Array:
        return self._describer().compute_async(image, keypoints)

    def detect_and_compute(self, image, mask=None, mesh=None):
        kps, desc = self.detect_and_compute_async(image, mask, mesh)
        kps.block()
        # compact descriptor rows to valid keypoints
        return kps, np.asarray(desc)[np.asarray(kps._slots["valid"])]

    def detect_and_compute_async(self, image, mask=None, mesh=None):
        img = _as_u8_image(image)
        P.validate_image_shape(self._cfg, *img.shape)
        if mesh is not None:
            from .parallel import sharding as SH
            if mask is not None:
                mask = self._as_mask(mask, img.shape)
            slots, descs = SH.detect_pyramid_rows_sharded(
                img, self._cfg, mesh, with_descriptors=True, mask=mask)
            return KeyPoints(slots, max_size=self._max_kp_size(),
                             level_ranges=P.level_slot_ranges(
                                 self._cfg, *img.shape)), descs
        if mask is not None:
            mask = self._as_mask(mask, img.shape)
            slots, descs = P.detect_and_compute_masked_jit(img, mask, self._cfg)
        else:
            slots, descs = P.detect_and_compute_jit(img, self._cfg)
        return KeyPoints(slots, max_size=self._max_kp_size(),
                         level_ranges=P.level_slot_ranges(
                             self._cfg, *img.shape)), descs

    def convert(self, keypoints: KeyPoints):
        """KeyPoints -> list of cv2.KeyPoint (reference `convert`,
        cuda_efficient_features.cpp:323-349)."""
        return keypoints.cv_keypoints()

    # -- multi-chip scaling (no reference analogue: it is single-GPU) --------

    def detect_and_compute_batch(self, images, mesh=None, as_host=False):
        """Batched detect+compute sharded over a device mesh.  images:
        (B, H, W) uint8.  A 1-axis mesh shards the batch (dp; B divisible
        by the mesh size); a 2-axis mesh additionally row-shards each
        image's pyramid over the second axis (dp x sp, B divisible by the
        dp size — see sharding.detect_and_compute_batch_2d).  Returns
        (slot dict with leading batch dim, descriptors) sharded on device;
        see parallel/sharding.py.  A single-device mesh is the single-chip
        throughput path: B frames run inside ONE executable (lax.map),
        amortizing per-dispatch overhead.

        as_host=True instead fetches everything and returns a list of
        (KeyPoints, descriptors) per image, descriptor rows compacted to the
        valid keypoints — `detect_and_compute` ergonomics for batches."""
        from .parallel import sharding as SH
        images = np.asarray(images)
        if images.ndim != 3 or images.dtype != np.uint8:
            raise ValueError("images must be (B, H, W) uint8")
        mesh = mesh or SH.make_mesh()
        if len(mesh.axis_names) == 2:
            # dp x sp: batch over dp, each image's pyramid row-sharded
            # over sp (see sharding.detect_and_compute_batch_2d)
            slots, desc = SH.detect_and_compute_batch_2d(
                jnp.asarray(images), self._cfg, mesh)
        else:
            slots, desc = SH.detect_and_compute_batch(
                SH.shard_batch(images, mesh), self._cfg, mesh)
        if not as_host:
            return slots, desc
        ranges = P.level_slot_ranges(self._cfg, *images.shape[1:])
        host = {k: np.asarray(v) for k, v in slots.items()}
        desc = np.asarray(desc)
        return [(KeyPoints({k: v[i] for k, v in host.items()},
                           max_size=self._max_kp_size(), level_ranges=ranges),
                 desc[i][host["valid"][i]])
                for i in range(images.shape[0])]

    @staticmethod
    def _as_mask(mask, shape):
        """Validate a user ROI mask (8-bit, nonzero = search here).

        NOTE: the CUDA reference accepts this argument but silently ignores it
        (detectAndComputeAsync never reads _mask); we implement the documented
        behavior: keypoints are only detected where the mask is nonzero, and
        masked-out corners do not take part in non-max suppression.
        """
        m = jnp.asarray(mask)
        if m.shape != shape:
            raise ValueError(f"mask shape {m.shape} != image shape {shape}")
        return (m != 0)

    def _describer(self):
        kind, bits = self._cfg.descriptor_type.rsplit("_", 1)
        cls = BAD if kind == "bad" else HashSIFT
        return cls(1.0, int(bits))

    # -- descriptor metadata -------------------------------------------------

    def descriptor_size(self) -> int:
        return self._cfg.descriptor_bytes

    def descriptor_type(self):
        return np.uint8

    def default_norm(self) -> str:
        return "hamming"

    # -- parameters (7 getter/setter pairs, cuda_efficient_features.h:78-97) --

    def set_max_features(self, v: int):
        self._cfg = replace(self._cfg, nfeatures=int(v))

    def get_max_features(self) -> int:
        return self._cfg.nfeatures

    def set_scale_factor(self, v: float):
        self._cfg = replace(self._cfg, scale_factor=float(v))

    def get_scale_factor(self) -> float:
        return self._cfg.scale_factor

    def set_n_levels(self, v: int):
        self._cfg = replace(self._cfg, nlevels=int(v))

    def get_n_levels(self) -> int:
        return self._cfg.nlevels

    def set_first_level(self, v: int):
        self._cfg = replace(self._cfg, first_level=int(v))

    def get_first_level(self) -> int:
        return self._cfg.first_level

    def set_fast_threshold(self, v: int):
        self._cfg = replace(self._cfg, fast_threshold=int(v))

    def get_fast_threshold(self) -> int:
        return self._cfg.fast_threshold

    def set_nonmax_radius(self, v: int):
        self._cfg = replace(self._cfg, nonmax_radius=int(v))

    def get_nonmax_radius(self) -> int:
        return self._cfg.nonmax_radius

    def set_descriptor_type(self, v: str):
        if v not in P.DESCRIPTOR_TYPES:
            raise ValueError(f"descriptor_type must be one of {P.DESCRIPTOR_TYPES}")
        self._cfg = replace(self._cfg, descriptor_type=v)

    def get_descriptor_type(self) -> str:
        return self._cfg.descriptor_type
