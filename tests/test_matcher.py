"""Hamming matcher tests vs NumPy brute force."""
import numpy as np

import efficient_features_tpu  # noqa: F401
import jax.numpy as jnp

from efficient_features_tpu.ops import matcher


def np_hamming(d1, d2):
    b1 = np.unpackbits(d1, axis=1)
    b2 = np.unpackbits(d2, axis=1)
    return (b1[:, None, :] != b2[None, :, :]).sum(axis=2)


def test_hamming_matrix_exact():
    rng = np.random.default_rng(0)
    d1 = rng.integers(0, 256, (37, 32), dtype=np.uint8)
    d2 = rng.integers(0, 256, (53, 32), dtype=np.uint8)
    expect = np_hamming(d1, d2)
    got = np.asarray(matcher.hamming_matrix(jnp.asarray(d1), jnp.asarray(d2)))
    np.testing.assert_array_equal(expect, got)


def test_cross_check_match():
    rng = np.random.default_rng(1)
    d2 = rng.integers(0, 256, (40, 32), dtype=np.uint8)
    # queries = noisy copies of train rows -> should match back
    d1 = d2.copy()
    d1[:, 0] ^= 1  # flip one bit
    j, dist, valid = matcher.match(jnp.asarray(d1), jnp.asarray(d2))
    j, dist, valid = map(np.asarray, (j, dist, valid))
    assert (j[valid] == np.arange(40)[valid]).all()
    assert (dist[valid] == 1).all()
    assert valid.mean() > 0.9


def test_knn_ratio_match_masked():
    rng = np.random.default_rng(3)
    d2 = rng.integers(0, 256, (64, 32), dtype=np.uint8)
    d1 = d2.copy()
    v1 = np.ones(64, bool)
    v1[10:20] = False
    v2 = np.ones(64, bool)
    v2[30:40] = False
    j, best, ok = matcher.knn2_ratio_match_masked(
        jnp.asarray(d1), jnp.asarray(v1), jnp.asarray(d2), jnp.asarray(v2),
        0.8)
    j, best, ok = map(np.asarray, (j, best, ok))
    # invalid queries never match; invalid train rows never matched
    assert not ok[10:20].any()
    assert not np.isin(j[ok], np.arange(30, 40)).any()
    # valid identical pairs outside the masked train range match themselves
    good = np.ones(64, bool)
    good[10:20] = False
    good[30:40] = False
    assert (j[good & ok] == np.arange(64)[good & ok]).all()
    assert (best[good & ok] == 0).all()


def test_fused_topk2_bit_exact_multitile():
    """Streaming Pallas top-2 == dense hamming_matrix top-2, including
    cross-tile merge steps and duplicate-distance tie-breaking (lowest
    index, matching argmin/top_k)."""
    rng = np.random.default_rng(7)
    pool = rng.integers(0, 256, (6, 64), dtype=np.uint8)  # heavy ties
    d1 = pool[rng.integers(0, 6, 513)]                    # 3 query tiles
    d2 = pool[rng.integers(0, 6, 1700)]                   # 4 train tiles
    d2[1500] = d2[100]            # exact duplicate ACROSS train tiles
    d1j, d2j = jnp.asarray(d1), jnp.asarray(d2)
    d = np.asarray(matcher.hamming_matrix(d1j, d2j))
    srt = np.sort(d, axis=1)
    j, bd, sd = map(np.asarray, matcher._fused_topk2(d1j, d2j, None))
    np.testing.assert_array_equal(j, d.argmin(1))
    np.testing.assert_array_equal(((512 - bd) / 2).astype(int), srt[:, 0])
    np.testing.assert_array_equal(((512 - sd) / 2).astype(int), srt[:, 1])


def test_fused_match_parity():
    rng = np.random.default_rng(8)
    pool = rng.integers(0, 256, (8, 32), dtype=np.uint8)
    d1 = jnp.asarray(pool[rng.integers(0, 8, 300)])
    d2 = jnp.asarray(pool[rng.integers(0, 8, 437)])
    for cc in (True, False):
        a = list(map(np.asarray, matcher.match(d1, d2, cc, fused=False)))
        b = list(map(np.asarray, matcher.match_fused(d1, d2, cc)))
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x, y)
    a = list(map(np.asarray,
                 matcher.knn2_ratio_match(d1, d2, 0.8, fused=False)))
    b = list(map(np.asarray, matcher.knn2_ratio_match_fused(d1, d2, 0.8)))
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


def test_fused_masked_parity():
    """Masked fused matcher agrees with the XLA path on ok, and on j/best
    wherever ok (all-invalid rows return sentinel distances by design)."""
    rng = np.random.default_rng(9)
    pool = rng.integers(0, 256, (6, 64), dtype=np.uint8)
    d1 = jnp.asarray(pool[rng.integers(0, 6, 513)])
    d2 = jnp.asarray(pool[rng.integers(0, 6, 1100)])
    v1 = jnp.asarray(rng.random(513) > 0.2)
    v2 = jnp.asarray(rng.random(1100) > 0.2)
    a = list(map(np.asarray,
                 matcher.knn2_ratio_match_masked(d1, v1, d2, v2, 0.8,
                                                 fused=False)))
    b = list(map(np.asarray,
                 matcher.knn2_ratio_match_masked_fused(d1, v1, d2, v2, 0.8)))
    ok = a[2]
    np.testing.assert_array_equal(ok, b[2])
    assert ok.any()
    np.testing.assert_array_equal(a[0][ok], b[0][ok])
    np.testing.assert_array_equal(a[1][ok], b[1][ok])


def test_knn_ratio_match():
    rng = np.random.default_rng(2)
    d2 = rng.integers(0, 256, (64, 64), dtype=np.uint8)
    d1 = d2[:32].copy()
    j, best, ok = matcher.knn2_ratio_match(jnp.asarray(d1), jnp.asarray(d2),
                                           0.8)
    j, best, ok = map(np.asarray, (j, best, ok))
    # exact copies: distance 0, ratio 0 <= 0.8 * second -> kept
    assert (j[ok] == np.arange(32)[ok]).all()
    assert (best[ok] == 0).all()
    assert ok.sum() > 25
