"""Matching-quality eval (tools/eval_matching.py) on a real fixture.

The reference's descriptor-quality evidence is the external
hpatches-benchmark (README.md:112); this tier asserts the in-repo
analogue end-to-end: under a known homography the full
detect+describe+match pipeline must be repeatable and its cross-checked
Hamming matches geometrically consistent.
"""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from eval_matching import apply_homography, evaluate_pair, _homographies, project


@pytest.fixture(scope="module")
def photo():
    from PIL import Image
    path = os.path.join(os.path.dirname(__file__), "data", "real_photo.png")
    return np.asarray(Image.open(path))


def test_homography_warp_roundtrip(photo):
    """project() and apply_homography() agree: a warped image's pixel at a
    projected location matches the source pixel (interior, smooth areas)."""
    H = _homographies(photo.shape[1], photo.shape[0])["rigid"]
    img2 = apply_homography(photo, H)
    rng = np.random.default_rng(0)
    xs = rng.uniform(60, photo.shape[1] - 60, 64)
    ys = rng.uniform(60, photo.shape[0] - 60, 64)
    px, py = project(H, xs, ys)
    inb = (px >= 1) & (px < photo.shape[1] - 1) & \
          (py >= 1) & (py < photo.shape[0] - 1)
    src = photo[ys[inb].round().astype(int), xs[inb].round().astype(int)]
    dst = img2[py[inb].round().astype(int), px[inb].round().astype(int)]
    # nearest-px lookup across a bilinear warp: most samples within a small
    # intensity budget (texture edges can differ)
    close = np.abs(src.astype(int) - dst.astype(int)) <= 24
    assert close.mean() > 0.8


@pytest.mark.parametrize("dt", ["bad_256", "hash_sift_256"])
def test_matching_quality(photo, dt):
    H = _homographies(photo.shape[1], photo.shape[0])["rigid"]
    r = evaluate_pair(photo, H, nfeatures=1500, descriptor_type=dt)
    # real_photo measured ~0.84 repeatability / ~0.95 inlier rate (BAD256);
    # generous floors so share/texture noise can't flake the tier
    assert r["n_kp1"] > 200 and r["n_kp2"] > 200
    assert r["repeatability"] > 0.5, r
    assert r["n_matches"] > 100, r
    assert r["inlier_rate"] > 0.7, r
