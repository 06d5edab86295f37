"""RANSAC homography estimation (ops/ransac.py) on the CPU mesh."""
import numpy as np
import pytest

import efficient_features_tpu  # noqa: F401  (backend setup via conftest)
from efficient_features_tpu.ops import ransac as RS


def _apply_h(H, pts):
    ph = np.concatenate([pts, np.ones((len(pts), 1))], axis=1) @ H.T
    return ph[:, :2] / ph[:, 2:3]


def _scene(seed=0, n=400, outlier_frac=0.3, noise=0.4):
    rng = np.random.default_rng(seed)
    H = np.array([[0.9, 0.12, 30.0],
                  [-0.08, 1.05, -12.0],
                  [1e-4, -5e-5, 1.0]])
    src = rng.uniform(0, 1000, (n, 2))
    dst = _apply_h(H, src) + rng.normal(0, noise, (n, 2))
    n_out = int(n * outlier_frac)
    out_idx = rng.choice(n, n_out, replace=False)
    dst[out_idx] = rng.uniform(0, 1000, (n_out, 2))
    is_inlier = np.ones(n, bool)
    is_inlier[out_idx] = False
    return H, src, dst, is_inlier


def test_recovers_homography_with_outliers():
    H_true, src, dst, gt_inl = _scene()
    H, inl, n_inl = RS.find_homography_ransac(src, dst, thresh=3.0)
    H, inl = np.asarray(H), np.asarray(inl)
    # compare by action on a grid, not by matrix entries
    grid = np.stack(np.meshgrid(np.linspace(0, 1000, 7),
                                np.linspace(0, 1000, 7)), -1).reshape(-1, 2)
    err = np.linalg.norm(_apply_h(H, grid) - _apply_h(H_true, grid), axis=1)
    assert err.max() < 1.5
    # essentially all true inliers kept, outliers rejected
    assert inl[gt_inl].mean() > 0.97
    assert inl[~gt_inl].mean() < 0.03
    assert int(n_inl) == inl.sum()


def test_deterministic_across_calls():
    _, src, dst, _ = _scene(seed=3)
    a = RS.find_homography_ransac(src, dst, seed=7)
    b = RS.find_homography_ransac(src, dst, seed=7)
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
    np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))


def test_valid_mask_excludes_rows():
    H_true, src, dst, _ = _scene(seed=5, outlier_frac=0.0, noise=0.2)
    valid = np.ones(len(src), bool)
    valid[::4] = False
    # poison the masked rows: if they leaked into sampling/scoring the
    # estimate would collapse
    dst[::4] = 1e6
    H, inl, _ = RS.find_homography_ransac(src, dst, valid=valid)
    inl = np.asarray(inl)
    assert not inl[::4].any()
    grid = np.stack(np.meshgrid(np.linspace(0, 1000, 5),
                                np.linspace(0, 1000, 5)), -1).reshape(-1, 2)
    err = np.linalg.norm(_apply_h(np.asarray(H), grid)
                         - _apply_h(H_true, grid), axis=1)
    assert err.max() < 1.5


def test_exact_on_clean_minimal_data():
    H_true, src, dst, _ = _scene(seed=9, outlier_frac=0.0, noise=0.0)
    H, inl, n_inl = RS.find_homography_ransac(src, dst, thresh=1.0,
                                              iters=64)
    assert int(n_inl) == len(src)
    grid = np.stack(np.meshgrid(np.linspace(0, 1000, 5),
                                np.linspace(0, 1000, 5)), -1).reshape(-1, 2)
    err = np.linalg.norm(_apply_h(np.asarray(H), grid)
                         - _apply_h(H_true, grid), axis=1)
    assert err.max() < 1e-2


def test_input_validation():
    with pytest.raises(ValueError):
        RS.find_homography_ransac(np.zeros((3, 2)), np.zeros((3, 2)))
    with pytest.raises(ValueError):
        RS.find_homography_ransac(np.zeros((5, 3)), np.zeros((5, 3)))


def test_degenerate_too_few_valid():
    """< 4 valid matches cannot determine a homography: the fixed-shape
    program must not crash and must not report a confident inlier set."""
    _, src, dst, _ = _scene(seed=11, n=64)
    valid = np.zeros(64, bool)
    valid[:3] = True
    _, inl, n_inl = RS.find_homography_ransac(src, dst, valid=valid,
                                              iters=32)
    inl = np.asarray(inl)
    assert int(n_inl) <= 3 and not inl[~valid].any()


def test_degenerate_all_invalid():
    _, src, dst, _ = _scene(seed=12, n=32)
    _, inl, n_inl = RS.find_homography_ransac(
        src, dst, valid=np.zeros(32, bool), iters=32)
    assert int(n_inl) == 0 and not np.asarray(inl).any()
