"""Octave-bucketed multi-scale compute path (round-3).

The reference's descriptor kernels handle any keypoint size at full speed
(cuda_bad.cu:246-316 reads the integral image regardless of scale); the TPU
window kernels cover multi-octave keypoints with per-bucket window geometry
(ops/window_kernels.bad_geom / warp_geom).  These tests pin:
  - bucket window kernels vs the NumPy oracle at detector octave sizes
    (size 31*1.2^L up to ~111) and odd in-between sizes,
  - the wide-box exact border branch (trunc-12) vs ops.bad,
  - the API-level bucketed dispatch (KeyPoints level ranges and host-array
    size sorting) returning rows in caller order.
"""
import numpy as np
import pytest

import efficient_features_tpu  # noqa: F401
import jax.numpy as jnp

from efficient_features_tpu.cpu import descriptors as DC
from efficient_features_tpu.ops import window_kernels as WK
from efficient_features_tpu.ops import bad as OB
from efficient_features_tpu.ops import image as OI
from efficient_features_tpu import pipeline as P
from efficient_features_tpu.api import EfficientFeatures, BAD, HashSIFT

from util import make_test_image


@pytest.fixture(scope="module")
def img():
    return make_test_image(300, 400, seed=31)


def _kps(h, w, n, sizes, seed=0, margin=10):
    rng = np.random.default_rng(seed)
    x = rng.uniform(margin, w - margin, n).astype(np.float32)
    y = rng.uniform(margin, h - margin, n).astype(np.float32)
    size = np.asarray(sizes, np.float32)
    angle = rng.uniform(0, 360, n).astype(np.float32)
    angle[::5] = -1.0
    return x, y, size, angle


def test_geom_derivation():
    assert WK.bad_geom(WK._S_BASE) == WK.WinGeom(96, 256, 32)
    g = WK.bad_geom(3.4723)  # level-7 detector keypoints (size ~111)
    assert g.half >= int(np.ceil(22.2133 * 3.4723 + 2))
    assert g.win_h == 2 * g.half + 32 and g.win_w % 128 == 0
    assert g.c0 >= g.half
    # bucket rounding is monotone, covers s, and is idempotent
    for s in (0.5, 0.97, 1.2, 2.3, 3.47, 5.9):
        b = WK.bucket_scale(s)
        assert b >= min(s, WK._S_BASE) - 1e-6
        assert WK.bucket_scale(b) == b


@pytest.mark.parametrize("nbits", [256, 512])
def test_bad_bucket_kernel_octaves(img, nbits):
    """Window kernel at each octave geometry vs the oracle (includes border
    keypoints; sizes are the exact detector ladder)."""
    h, w = img.shape
    for lvl in (1, 3, 5, 7):
        size_v = 31.0 * 1.2 ** lvl
        n = 12
        x, y, size, angle = _kps(h, w, n, np.full(n, size_v), seed=40 + lvl)
        x[:3] = [2, w - 3, w / 2]
        y[:3] = [h / 2, 3, h - 2]
        valid = np.ones(n, bool)
        smax = WK.bucket_scale(size_v / 32.0)
        a = DC.bad_descriptors(img, x, y, size, angle, nbits=nbits)
        b = np.asarray(WK.bad_descriptors_windows(
            jnp.asarray(img), jnp.asarray(x), jnp.asarray(y),
            jnp.asarray(size), jnp.asarray(angle), jnp.asarray(valid),
            nbits, 1.0, smax))
        budget = int(2e-5 * a.size) + 1
        assert (a != b).sum() <= budget, f"level {lvl}"


def test_bad_bucket_kernel_wide_border_exact(img):
    """The trunc-12 wide-box branch in the kernel must match ops.bad (and the
    oracle) bit-for-bit: no-rotation border keypoints at the largest bucket
    kill trig ULPs, leaving only the border-compare arithmetic."""
    h, w = img.shape
    n = 16
    rng = np.random.default_rng(77)
    size = np.full(n, 110.0, np.float32)
    x = rng.uniform(0, w - 1, n).astype(np.float32)
    y = rng.uniform(0, h - 1, n).astype(np.float32)
    angle = np.full(n, -1.0, np.float32)
    valid = np.ones(n, bool)
    a = DC.bad_descriptors(img, x, y, size, angle, nbits=256)
    integral = OI.integral_image_i32(jnp.asarray(img))
    g = np.asarray(OB.bad_descriptors(
        integral, jnp.asarray(x), jnp.asarray(y), jnp.asarray(size),
        jnp.asarray(angle), jnp.asarray(valid), nbits=256))
    b = np.asarray(WK.bad_descriptors_windows(
        jnp.asarray(img), jnp.asarray(x), jnp.asarray(y), jnp.asarray(size),
        jnp.asarray(angle), jnp.asarray(valid), 256, 1.0,
        WK.bucket_scale(110.0 / 32.0)))
    np.testing.assert_array_equal(a, g)
    np.testing.assert_array_equal(a, b)


def test_warp_big_bucket_octaves(img):
    h, w = img.shape
    for lvl in (2, 5, 7):
        size_v = 31.0 * 1.2 ** lvl
        n = 8
        x, y, size, angle = _kps(h, w, n, np.full(n, size_v), seed=50 + lvl)
        x[0], y[0] = 2.0, h / 2          # border keypoint
        valid = np.ones(n, bool)
        smax = WK.bucket_scale(size_v / 32.0)
        a = DC.warp_patches(img, x, y, size, angle, 1.0)
        b = np.asarray(WK.warp_patches_windows_big(
            jnp.asarray(img), jnp.asarray(x), jnp.asarray(y),
            jnp.asarray(size), jnp.asarray(angle), jnp.asarray(valid),
            1.0, smax)).reshape(n, 32, 32)
        assert np.abs(a.astype(int) - b.astype(int)).max() <= 1, f"lvl {lvl}"
        assert (a != b).mean() < 1e-3, f"lvl {lvl}"


@pytest.mark.parametrize("kind", ["bad", "hash_sift"])
def test_compute_bucketed_jit_mixed_ranges(img, kind):
    """compute_bucketed_jit with mixed window/gather ranges == the plain
    gather path, rows in slot order (on the CPU mesh every range takes the
    gather branch; the dispatch and concat order is what's under test)."""
    h, w = img.shape
    n = 24
    sizes = np.concatenate([np.full(8, 31.0), np.full(8, 64.0),
                            np.full(8, 300.0)])
    x, y, size, angle = _kps(h, w, n, sizes, seed=60)
    kp = jnp.asarray(np.stack([x, y, size, angle], 1))
    valid = jnp.ones(n, bool)
    ranges = ((0, 8, WK._S_BASE), (8, 16, WK.bucket_scale(2.0)),
              (16, 24, None))
    a = np.asarray(P.compute_bucketed_jit(jnp.asarray(img), kp, valid,
                                          256, kind, 1.0, ranges))
    b = np.asarray(P.compute_jit(jnp.asarray(img), kp, valid, 256, kind,
                                 1.0, False))
    np.testing.assert_array_equal(a, b)


def test_host_array_bucketed_order(img):
    """Host (N,4) arrays with mixed sizes: the size-sorted bucket dispatch
    must return rows in the caller's original order."""
    h, w = img.shape
    n = 30
    rng = np.random.default_rng(61)
    sizes = rng.choice([25.0, 31.0, 45.0, 90.0, 250.0], n)
    x, y, size, angle = _kps(h, w, n, sizes, seed=62)
    kp = np.stack([x, y, size, angle], 1)
    for extractor in (BAD(1.0, 256), HashSIFT(1.0, 256)):
        got = extractor.compute(img, kp)
        # oracle: one gather-path call in original order
        want = np.asarray(P.compute_jit(
            jnp.asarray(img), jnp.asarray(kp), jnp.ones(n, bool), 256,
            extractor._kind, 1.0, False))
        np.testing.assert_array_equal(got, want)


def test_keypoints_level_ranges_first_level(img):
    """first_level=1 shifts the slot layout; ranges must still tile it and
    the bucketed compute must equal the gather path."""
    feat = EfficientFeatures(nfeatures=400, first_level=1,
                             descriptor_type="bad_256")
    kps = feat.detect(img)
    ranges = kps.level_ranges
    assert ranges[0][0] == 0 and ranges[-1][1] == kps.capacity
    assert len(ranges) == 7                      # levels 1..7
    assert ranges[0][2] == pytest.approx(31.0 * 1.2, rel=1e-4)
    d = feat.compute(img, kps)
    s = kps._slots
    kp_dev = jnp.stack([s["x"], s["y"], s["size"], s["angle"]], 1)
    want = np.asarray(P.compute_jit(jnp.asarray(img), kp_dev, s["valid"],
                                    256, "bad", 1.0, False))
    np.testing.assert_array_equal(d, want[np.asarray(s["valid"])])


def test_bucketed_ranges_must_tile():
    img = jnp.zeros((64, 128), jnp.uint8)
    kp = jnp.zeros((16, 4), jnp.float32)
    valid = jnp.ones(16, bool)
    with pytest.raises(ValueError):
        P.compute_bucketed_jit(img, kp, valid, 256, "bad", 1.0,
                               ((0, 8, None), (9, 16, None)))
    with pytest.raises(ValueError):
        P.compute_bucketed_jit(img, kp, valid, 256, "bad", 1.0,
                               ((0, 8, None),))


def test_keypoints_level_ranges_compute(img):
    """detect() -> compute() on the slot layout: level_ranges must tile the
    slot array and the bucketed compute must equal the gather path."""
    feat = EfficientFeatures(nfeatures=600, descriptor_type="bad_256")
    kps = feat.detect(img)
    ranges = kps.level_ranges
    assert ranges is not None and ranges[0][0] == 0
    assert all(a2 == b1 for (_, a2, _), (b1, _, _)
               in zip(ranges[:-1], ranges[1:]))
    assert ranges[-1][1] == kps.capacity
    d = feat.compute(img, kps)
    s = kps._slots
    kp_dev = jnp.stack([s["x"], s["y"], s["size"], s["angle"]], 1)
    want = np.asarray(P.compute_jit(jnp.asarray(img), kp_dev, s["valid"],
                                    256, "bad", 1.0, False))
    np.testing.assert_array_equal(d, want[np.asarray(s["valid"])])
