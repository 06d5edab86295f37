"""API-surface tests (EfficientFeatures / BAD / HashSIFT / KeyPoints)."""
import numpy as np
import pytest

import jax.numpy as jnp

from efficient_features_tpu import EfficientFeatures, BAD, HashSIFT, KeyPoints
from efficient_features_tpu.cpu import reference as R
from efficient_features_tpu.cpu import descriptors as DC

from util import make_test_image, make_keypoints


@pytest.fixture(scope="module")
def img():
    return make_test_image(240, 320, seed=50)


def test_detect_matches_oracle(img):
    feat = EfficientFeatures(nfeatures=800)
    kps = feat.detect(img)
    oracle = R.detect(img, nfeatures=800)
    assert kps.count == oracle.count
    h = kps.as_arrays()
    np.testing.assert_array_equal(h["x"], oracle.x)
    np.testing.assert_array_equal(h["y"], oracle.y)


def test_detect_and_compute_all_descriptor_types(img):
    for dt, nbytes in [("bad_256", 32), ("bad_512", 64),
                       ("hash_sift_256", 32), ("hash_sift_512", 64)]:
        feat = EfficientFeatures(nfeatures=300, descriptor_type=dt)
        kps, desc = feat.detect_and_compute(img)
        assert desc.shape == (kps.count, nbytes)
        assert desc.dtype == np.uint8
        assert feat.descriptor_size() == nbytes


def test_compute_matches_oracle(img):
    x, y, size, angle = make_keypoints(*img.shape, 40, seed=9)
    kp = np.stack([x, y, size, angle], 1)
    for cls, fn in [(BAD, DC.bad_descriptors),
                    (HashSIFT, DC.hash_sift_descriptors)]:
        d = cls(1.0, 256).compute(img, kp)
        e = fn(img, x, y, size, angle, nbits=256)
        budget = int(1e-4 * e.size) + 1
        assert (d != e).sum() <= budget, cls.__name__


def test_empty_keypoints(img):
    d = BAD(1.0, 256).compute(img, np.zeros((0, 4), np.float32))
    assert d.shape == (0, 32)


def test_param_setters():
    feat = EfficientFeatures()
    assert feat.get_max_features() == 5000
    feat.set_max_features(123)
    assert feat.get_max_features() == 123
    feat.set_scale_factor(1.5)
    assert feat.get_scale_factor() == 1.5
    feat.set_n_levels(4)
    assert feat.get_n_levels() == 4
    feat.set_first_level(1)
    assert feat.get_first_level() == 1
    feat.set_fast_threshold(30)
    assert feat.get_fast_threshold() == 30
    feat.set_nonmax_radius(7)
    assert feat.get_nonmax_radius() == 7
    feat.set_descriptor_type("bad_512")
    assert feat.get_descriptor_type() == "bad_512"
    assert feat.descriptor_size() == 64
    with pytest.raises(ValueError):
        feat.set_descriptor_type("orb")
    # the constructor gates eagerly too (the reference's createDescriber
    # runs in the impl constructor, cuda_efficient_features.cpp:48-69)
    with pytest.raises(ValueError):
        EfficientFeatures(descriptor_type="bad_128")


def test_first_level_skips_level0(img):
    f0 = EfficientFeatures(nfeatures=400, first_level=1)
    kps = f0.detect(img)
    assert kps.count > 0
    assert (kps.as_arrays()["octave"] >= 1).all()


def test_nonstandard_params_pipeline(img):
    feat = EfficientFeatures(nfeatures=200, scale_factor=1.5, nlevels=4,
                             fast_threshold=35, nonmax_radius=7)
    kps = feat.detect(img)
    oracle = R.detect(img, nfeatures=200, scale_factor=1.5, nlevels=4,
                      fast_threshold=35, nonmax_radius=7)
    assert kps.count == oracle.count
    np.testing.assert_array_equal(kps.as_arrays()["x"], oracle.x)


def test_invalid_inputs(img):
    feat = EfficientFeatures()
    with pytest.raises(ValueError):
        feat.detect(img.astype(np.float32))
    with pytest.raises(ValueError):
        BAD(1.0, 256).compute(img, np.zeros((3, 3), np.float32))
    with pytest.raises(ValueError):
        BAD(1.0, 128)


def test_config_validation():
    """Degenerate factory parameters raise clear ValueErrors eagerly (the
    reference's contract is cuda_efficient_features.h:47-48; its impl would
    silently mis-execute — ours used to reach a raw ZeroDivisionError from
    the quota math at first use)."""
    for kw in (dict(scale_factor=1.0), dict(scale_factor=0.5),
               dict(nlevels=0), dict(nlevels=-2), dict(nfeatures=0),
               dict(fast_threshold=0), dict(nonmax_radius=0),
               dict(first_level=8), dict(first_level=-1),
               dict(descriptor_type="orb")):
        with pytest.raises(ValueError):
            EfficientFeatures(**kw)
    # the setters re-validate (replace() re-runs __post_init__)
    feat = EfficientFeatures()
    with pytest.raises(ValueError):
        feat.set_scale_factor(1.0)
    with pytest.raises(ValueError):
        feat.set_n_levels(0)
    with pytest.raises(ValueError):
        feat.set_max_features(0)
    with pytest.raises(ValueError):
        feat.set_descriptor_type("sift")
    # a failed set leaves the config untouched and usable
    assert feat.get_scale_factor() == 1.2


def test_image_too_small_for_pyramid():
    """Images whose pyramid would degenerate (top level < 8 px a side) are
    rejected with a clear error naming the fix, in detect and dAC."""
    feat = EfficientFeatures(nfeatures=100, nlevels=8)  # 16/1.2^7 -> 4 px
    tiny = make_test_image(16, 16, seed=1)
    with pytest.raises(ValueError, match="too small.*nlevels"):
        feat.detect(tiny)
    with pytest.raises(ValueError, match="too small.*nlevels"):
        feat.detect_and_compute(tiny)
    # the same image is fine with a shallower pyramid
    feat2 = EfficientFeatures(nfeatures=100, nlevels=2)
    assert feat2.detect(tiny).count >= 0


def test_len_is_disabled_sync_trap(img):
    """len(KeyPoints) is a silent device sync; it raises with guidance.
    Truthiness stays usable without syncing."""
    feat = EfficientFeatures(nfeatures=100)
    kps = feat.detect(img)
    with pytest.raises(TypeError, match="count"):
        len(kps)
    assert bool(kps) is True          # __bool__ must not fall back to __len__
    assert kps.count > 0              # the documented (syncing) escape hatch
    assert kps.capacity >= kps.count  # the static one


def test_mask_restricts_detection(img):
    """User ROI masks are honored (the CUDA reference accepts but silently
    ignores its mask argument; we implement the documented behavior) and
    match the oracle bit-exactly."""
    feat = EfficientFeatures(nfeatures=400)
    mask = np.zeros_like(img)
    mask[:, : img.shape[1] // 2] = 255          # left half only
    kps = feat.detect(img, mask=mask)
    h = kps.as_arrays()
    assert kps.count > 0
    # all keypoints originate from masked-in level-0 area (scaled coords can
    # drift by a pixel at higher octaves; check level-0 half-plane loosely)
    assert (h["x"] <= img.shape[1] // 2 + 2).all()
    oracle = R.detect(img, nfeatures=400, mask=mask)
    assert kps.count == oracle.count
    np.testing.assert_array_equal(h["x"], oracle.x)
    np.testing.assert_array_equal(h["y"], oracle.y)
    # full mask == no mask
    kps_full = feat.detect(img, mask=np.full_like(img, 255))
    kps_none = feat.detect(img)
    np.testing.assert_array_equal(kps_full.as_arrays()["x"],
                                  kps_none.as_arrays()["x"])
    with pytest.raises(ValueError):
        feat.detect(img, mask=np.ones((3, 3), np.uint8))


def test_tiny_image():
    tiny = make_test_image(40, 50, seed=3)
    feat = EfficientFeatures(nfeatures=100)
    kps, desc = feat.detect_and_compute(tiny)
    oracle = R.detect(tiny, nfeatures=100)
    assert kps.count == oracle.count


def test_device_resident_compute_chain(img):
    """detect_async -> compute_async with KeyPoints input runs with ZERO
    host<->device transfers (the reference's device 5-row-mat path,
    cuda_efficient_features.cpp:102-129) and matches the host-input path."""
    import jax
    import numpy as np
    from efficient_features_tpu import BAD

    feat = EfficientFeatures(nfeatures=400)
    bad = BAD(1.0, 256)
    jimg = jnp.asarray(img)
    kps = feat.detect_async(jimg)
    # warm both jits (first call moves trace constants to device)
    _ = bad.compute_async(jimg, kps)
    kps2 = feat.detect_async(jimg)
    with jax.transfer_guard("disallow"):
        kps3 = feat.detect_async(jimg)
        out = bad.compute_async(jimg, kps3)
    dev = np.asarray(out)[np.asarray(kps2._slots["valid"])]
    host = bad.compute(img, kps2.xysa())
    np.testing.assert_array_equal(dev, host)


def test_device_resident_compute_rows_align_with_slots(img):
    """KeyPoints-input compute_async rows align with slots; invalid slots
    give zero rows."""
    import numpy as np
    from efficient_features_tpu import HashSIFT

    feat = EfficientFeatures(nfeatures=200)
    hs = HashSIFT(1.0, 256)
    kps = feat.detect(img)
    out = np.asarray(hs.compute_async(jnp.asarray(img), kps))
    valid = np.asarray(kps._slots["valid"])
    assert out.shape[0] == kps.capacity
    assert (out[~valid] == 0).all()
    np.testing.assert_array_equal(out[valid], hs.compute(img, kps))


def test_convert_roundtrip_without_cv2(img):
    """convert() (reference cuda_efficient_features.cpp:323-349) works
    without cv2 via duck-typed keypoints, and the keypoint list roundtrips
    through _keypoints_to_xysa."""
    from efficient_features_tpu.api import _keypoints_to_xysa

    feat = EfficientFeatures(nfeatures=150)
    kps = feat.detect(img)
    lst = feat.convert(kps)
    assert len(lst) == kps.count
    k0 = lst[0]
    assert hasattr(k0, "pt") and hasattr(k0, "angle")
    xysa = _keypoints_to_xysa(lst)
    np.testing.assert_allclose(xysa, kps.xysa(), rtol=0, atol=0)


def test_streaming_step_donated_state(img):
    """streaming_step_fn: donated-state step runs, matches consecutive
    frames, and keeps its state buffers fresh."""
    import sys
    import os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "samples"))
    from sample_image_sequence import streaming_step_fn
    from efficient_features_tpu import pipeline as P

    cfg = P.FeatureConfig(nfeatures=300, nlevels=3,
                          descriptor_type="bad_256")
    step, state = streaming_step_fn(cfg, img.shape)
    c1, m1 = step(img)
    assert int(np.asarray(m1)) == 0            # empty prev state
    c2, m2 = step(img)                         # identical frame
    n1, n2 = int(np.asarray(c1)), int(np.asarray(c2))
    nm = int(np.asarray(m2))
    assert n1 == n2 > 50
    assert nm > 0.9 * n1                       # same frame: almost all match


def test_device_array_keypoints_compute(img):
    """A device-resident (N, 4) keypoint array computes without host
    marshalling and matches the host-array path."""
    from efficient_features_tpu import BAD

    bad = BAD(1.0, 256)
    kp = np.stack(make_keypoints(*img.shape, 70, seed=12), axis=1)
    host = bad.compute(img, kp)
    dev = np.asarray(bad.compute_async(jnp.asarray(img), jnp.asarray(kp)))
    np.testing.assert_array_equal(host, dev)
