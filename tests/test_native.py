"""Native C++ backend parity vs the NumPy oracle."""
import numpy as np
import pytest

from efficient_features_tpu.cpu import native as NT
from efficient_features_tpu.cpu import reference as R
from efficient_features_tpu.cpu import descriptors as DC

from util import make_test_image, make_keypoints

if not NT.available():
    try:
        NT.build()
    except Exception:
        pass

pytestmark = pytest.mark.skipif(not NT.available(),
                                reason="native module not built")


def test_native_fast_identical():
    img = make_test_image(200, 260, seed=41)
    assert np.array_equal(R.fast_corner_mask(img, 20),
                          NT.fast_corner_mask(img, 20))


def test_native_integral_identical():
    img = make_test_image(120, 200, seed=42)
    assert np.array_equal(R.integral_image_i32(img),
                          NT.integral_image_i32(img))


@pytest.mark.parametrize("nbits", [256, 512])
def test_native_bad_identical(nbits):
    img = make_test_image(220, 300, seed=43)
    x, y, size, angle = make_keypoints(220, 300, 60, seed=7)
    x[:3] = [1, 296, 150]
    y[:3] = [2, 216, 1]
    a = DC.bad_descriptors(img, x, y, size, angle, nbits=nbits)
    b = NT.bad_descriptors(img, x, y, size, angle, nbits=nbits)
    np.testing.assert_array_equal(a, b)


def test_native_warp_close():
    img = make_test_image(220, 300, seed=44)
    x, y, size, angle = make_keypoints(220, 300, 60, seed=8)
    a = DC.warp_patches(img, x, y, size, angle, 1.0)
    b = NT.warp_patches(img, x, y, size, angle, 1.0)
    d = np.abs(a.astype(int) - b.astype(int))
    # libm trig ULPs can flip isolated pixels by one gray level
    assert d.max() <= 1
    assert (d != 0).mean() < 1e-3


@pytest.mark.parametrize("nbits", [256, 512])
def test_native_hash_sift_close(nbits):
    img = make_test_image(220, 300, seed=45)
    x, y, size, angle = make_keypoints(220, 300, 60, seed=9)
    a = DC.hash_sift_descriptors(img, x, y, size, angle, nbits=nbits)
    b = NT.hash_sift_descriptors(img, x, y, size, angle, nbits=nbits)
    # libm-vs-numpy cos/sin ULPs shift a few bilinear samples by one gray
    # level (same class the reference budgets at 1e-4 nonzero bytes over
    # 100k keypoints); with only 60 keypoints the proportional budget rounds
    # to ~0, so give it the reference-rate floor of a few bytes
    assert (a != b).sum() <= max(8, int(1e-4 * a.size))


def test_native_detect_bit_exact():
    """The native C++ full detector matches the oracle bit-for-bit
    (x, y, response, octave, size; angle within libm atan2 ULPs).  The
    reference's own CPU module has no detector at all."""
    for seed, hw, nf in [(20, (300, 400), 1500), (21, (143, 219), 400)]:
        img = make_test_image(*hw, seed=seed)
        a = NT.detect(img, nfeatures=nf)
        b = R.detect(img, nfeatures=nf)
        assert a.count == b.count
        np.testing.assert_array_equal(a.x, b.x)
        np.testing.assert_array_equal(a.y, b.y)
        np.testing.assert_array_equal(a.response, b.response)
        np.testing.assert_array_equal(a.octave, b.octave)
        np.testing.assert_array_equal(a.size, b.size)
        d = np.abs(a.angle - b.angle)
        assert np.minimum(d, 360 - d).max() < 1e-3


def test_native_detect_real_photo():
    import os
    from PIL import Image

    photo = np.asarray(Image.open(
        os.path.join(os.path.dirname(__file__), "data", "real_photo.png")))
    a = NT.detect(photo, nfeatures=2000)
    b = R.detect(photo, nfeatures=2000)
    assert a.count == b.count > 300
    np.testing.assert_array_equal(a.x, b.x)
    np.testing.assert_array_equal(a.response, b.response)
