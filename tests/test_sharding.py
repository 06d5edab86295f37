"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""
import numpy as np
import pytest

import efficient_features_tpu  # noqa: F401
import jax
import jax.numpy as jnp


@pytest.fixture(autouse=True, scope="module")
def _no_persistent_compile_cache():
    """Keep sharded compiles OUT of the persistent compile cache.

    Serializing multi-device XLA:CPU executables segfaults in this jaxlib
    (observed hard crashes in both compilation_cache.put_executable_and_time
    while caching test_sp_pyramid_sharded_with_descriptors and
    get_executable_and_time while loading test_api_mesh_detect...); every
    other module's single-device executables round-trip fine.

    Merely clearing jax_compilation_cache_dir is NOT enough: jax memoizes
    is_cache_used() after the first compile, so the flag flip must be
    followed by compilation_cache.reset_cache() to take effect.

    jax.clear_caches() drops the full suite's live jitted executables before
    this module's huge 8-device compiles: with hundreds of executables still
    resident, XLA:CPU's backend_compile_and_load segfaults on the first big
    multi-device module (reproduced deterministically at
    test_sp_pyramid_sharded_with_descriptors in full-suite runs, never in
    isolation; unlimited stack does not help — the correlate is live
    compiled-code volume)."""
    from jax._src import compilation_cache as cc

    jax.config.update("jax_enable_compilation_cache", False)
    cc.reset_cache()
    jax.clear_caches()
    yield
    jax.config.update("jax_enable_compilation_cache", True)
    cc.reset_cache()

from efficient_features_tpu import pipeline as P
from efficient_features_tpu.parallel import sharding as SH
from efficient_features_tpu.cpu import reference as R
from efficient_features_tpu.ops import detect as OD

from util import make_test_image


def test_dp_batch_matches_single_image():
    assert len(jax.devices()) >= 8
    mesh = SH.make_mesh(8)
    cfg = P.FeatureConfig(nfeatures=300, nlevels=3,
                          descriptor_type="bad_256")
    images = np.stack([make_test_image(96, 128, seed=100 + i)
                       for i in range(8)])
    slots, descs = SH.detect_and_compute_batch(
        SH.shard_batch(images, mesh), cfg, mesh)
    slots = {k: np.asarray(v) for k, v in slots.items()}
    descs = np.asarray(descs)

    for i in range(8):
        s1, d1 = P.detect_and_compute_jit(jnp.asarray(images[i]), cfg)
        s1 = {k: np.asarray(v) for k, v in s1.items()}
        assert int(slots["count"][i]) == int(s1["count"])
        np.testing.assert_array_equal(slots["x"][i], s1["x"])
        np.testing.assert_array_equal(descs[i], np.asarray(d1))


def test_sp_pyramid_sharded_matches_oracle():
    """Full-pyramid row-sharded detection is bit-identical to the oracle."""
    assert len(jax.devices()) >= 8
    mesh = SH.make_mesh(8)
    cfg = P.FeatureConfig(nfeatures=600, nlevels=4)
    img = make_test_image(400, 512, seed=91)
    slots = {k: np.asarray(v) for k, v in
             SH.detect_pyramid_rows_sharded(jnp.asarray(img), cfg,
                                            mesh).items()}
    oracle = R.detect(img, nfeatures=600, nlevels=4)
    m = slots["valid"]
    assert int(slots["count"]) == oracle.count
    np.testing.assert_array_equal(slots["x"][m], oracle.x)
    np.testing.assert_array_equal(slots["y"][m], oracle.y)
    np.testing.assert_array_equal(slots["response"][m], oracle.response)
    np.testing.assert_array_equal(slots["octave"][m], oracle.octave)
    d = np.abs(slots["angle"][m] - oracle.angle)
    assert np.minimum(d, 360 - d).max() < 1e-3


def test_sp_pyramid_sharded_with_descriptors():
    """Row-sharded detectAndCompute is byte-identical to the single-device
    pipeline for both descriptor families."""
    assert len(jax.devices()) >= 8
    mesh = SH.make_mesh(8)
    img = make_test_image(400, 512, seed=92)
    for dt in ("bad_256", "hash_sift_256"):
        cfg = P.FeatureConfig(nfeatures=400, nlevels=3, descriptor_type=dt)
        slots, desc = SH.detect_pyramid_rows_sharded(
            jnp.asarray(img), cfg, mesh, with_descriptors=True)
        s1, d1 = P.detect_and_compute_jit(jnp.asarray(img), cfg)
        np.testing.assert_array_equal(np.asarray(slots["x"]),
                                      np.asarray(s1["x"]))
        assert (np.asarray(desc) != np.asarray(d1)).sum() <= \
            int(1e-4 * np.asarray(d1).size) + 1


def test_sp_rows_sharded_matches_dense():
    assert len(jax.devices()) >= 8
    mesh = SH.make_mesh(8)
    cfg = P.FeatureConfig(nfeatures=128, fast_threshold=20, nonmax_radius=15)
    img = make_test_image(8 * 40, 256, seed=77)

    ys, xs, resp, valid = SH.detect_rows_sharded(
        jnp.asarray(img), cfg, mesh, quota=128)
    ys, xs, resp, valid = map(np.asarray, (ys, xs, resp, valid))

    # dense single-device reference: same single-level pipeline
    corner = R.fast_corner_mask(img, 20)
    border = np.zeros_like(corner)
    border[15:-15, 15:-15] = True
    corner &= border
    rmap = R.harris_response(img)
    surv = R.radius_nms(rmap, corner, 15)
    eys, exs, er = R.select_topk(rmap, surv, 128)

    n = valid.sum()
    assert n == len(eys)
    np.testing.assert_array_equal(ys[:n], eys)
    np.testing.assert_array_equal(xs[:n], exs)
    np.testing.assert_array_equal(resp[:n], er.astype(np.float32))


def test_sp_rows_sharded_large_radius():
    """nonmax_radius beyond the old fixed 24-row halo (ADVICE r1): the halo is
    derived from the config, so radius 30 must still match the dense path."""
    assert len(jax.devices()) >= 8
    mesh = SH.make_mesh(8)
    radius = 30
    cfg = P.FeatureConfig(nfeatures=64, fast_threshold=20,
                          nonmax_radius=radius)
    img = make_test_image(8 * 48, 256, seed=78)

    ys, xs, resp, valid = SH.detect_rows_sharded(
        jnp.asarray(img), cfg, mesh, quota=64)
    ys, xs, resp, valid = map(np.asarray, (ys, xs, resp, valid))

    corner = R.fast_corner_mask(img, 20)
    border = np.zeros_like(corner)
    border[15:-15, 15:-15] = True
    corner &= border
    rmap = R.harris_response(img)
    surv = R.radius_nms(rmap, corner, radius)
    eys, exs, er = R.select_topk(rmap, surv, 64)

    n = valid.sum()
    assert n == len(eys)
    np.testing.assert_array_equal(ys[:n], eys)
    np.testing.assert_array_equal(xs[:n], exs)
    np.testing.assert_array_equal(resp[:n], er.astype(np.float32))


def test_api_mesh_detect_matches_single_chip():
    """EfficientFeatures.detect(image, mesh=...) — the public sp entry —
    matches detect_jit byte-for-byte (round-3: sharded pyramid detect is a
    user feature, not a test-only artifact)."""
    from efficient_features_tpu import EfficientFeatures

    assert len(jax.devices()) >= 8
    mesh = SH.make_mesh(8)
    img = make_test_image(512, 256, seed=140)
    feat = EfficientFeatures(nfeatures=600, nlevels=4,
                             descriptor_type="bad_256")
    kps = feat.detect(img, mesh=mesh)
    ref = {k: np.asarray(v)
           for k, v in P.detect_jit(jnp.asarray(img), feat._cfg).items()}
    got = kps._slots
    assert int(got["count"]) == int(ref["count"])
    for k in ("x", "y", "response", "octave", "valid"):
        np.testing.assert_array_equal(np.asarray(got[k]), ref[k])

    kps2, desc2 = feat.detect_and_compute(img, mesh=mesh)
    s1, d1 = P.detect_and_compute_jit(jnp.asarray(img), feat._cfg)
    np.testing.assert_array_equal(np.asarray(kps2._slots["x"]),
                                  np.asarray(s1["x"]))
    # detect_and_compute compacts descriptor rows to the valid keypoints
    valid = np.asarray(s1["valid"])
    got_d = np.asarray(desc2)
    want_d = np.asarray(d1)[valid]
    assert (got_d != want_d).sum() <= int(1e-4 * want_d.size) + 1


def test_api_mesh_masked_detect_matches_single_chip():
    """detect(image, mask=..., mesh=...) — the sharded ROI-mask path —
    matches the single-chip masked pipeline byte-for-byte (round 4; was a
    ValueError before)."""
    from efficient_features_tpu import EfficientFeatures

    assert len(jax.devices()) >= 8
    mesh = SH.make_mesh(8)
    img = make_test_image(512, 256, seed=141)
    mask = np.zeros(img.shape, np.uint8)
    mask[64:400, 32:200] = 1
    mask[128:160, :] = 0                      # a hole crossing band borders
    feat = EfficientFeatures(nfeatures=600, nlevels=4,
                             descriptor_type="bad_256")
    kps = feat.detect(img, mask=mask, mesh=mesh)
    ref = {k: np.asarray(v) for k, v in P.detect_masked_jit(
        jnp.asarray(img), jnp.asarray(mask), feat._cfg).items()}
    got = kps._slots
    assert int(got["count"]) == int(ref["count"]) > 0
    for k in ("x", "y", "response", "octave", "valid"):
        np.testing.assert_array_equal(np.asarray(got[k]), ref[k])

    kps2, desc2 = feat.detect_and_compute(img, mask=mask, mesh=mesh)
    s1, d1 = P.detect_and_compute_masked_jit(jnp.asarray(img),
                                             jnp.asarray(mask), feat._cfg)
    np.testing.assert_array_equal(np.asarray(kps2._slots["x"]),
                                  np.asarray(s1["x"]))
    valid = np.asarray(s1["valid"])
    # the sync API compacts descriptor rows to valid keypoints
    np.testing.assert_array_equal(np.asarray(desc2), np.asarray(d1)[valid])


def test_batch2d_dp_sp_matches_single_chip():
    """dp x sp composition: a (2, 4) mesh shards the batch over dp and each
    image's full pyramid over sp; every image's slots and descriptors are
    bit-identical to the single-chip path."""
    assert len(jax.devices()) >= 8
    mesh = SH.make_mesh_2d(2, 4)
    cfg = P.FeatureConfig(nfeatures=600, nlevels=4,
                          descriptor_type="bad_256")
    images = np.stack([make_test_image(512, 256, seed=150 + i)
                       for i in range(4)])
    slots, desc = SH.detect_and_compute_batch_2d(
        jnp.asarray(images), cfg, mesh)
    for i in range(4):
        s1, d1 = P.detect_and_compute_jit(jnp.asarray(images[i]), cfg)
        for k in ("x", "y", "response", "octave", "valid", "count"):
            np.testing.assert_array_equal(np.asarray(slots[k])[i],
                                          np.asarray(s1[k]))
        v = np.asarray(s1["valid"])
        np.testing.assert_array_equal(np.asarray(desc)[i][v],
                                      np.asarray(d1)[v])


def test_compute_sharded_keypoint_axis():
    """Descriptor-only compute with keypoints sharded over the mesh equals
    the single-chip gather path, rows in caller order."""
    assert len(jax.devices()) >= 8
    mesh = SH.make_mesh(8)
    img = make_test_image(200, 256, seed=150)
    rng = np.random.default_rng(151)
    n = 333                                   # not a mesh multiple
    kp = np.stack([
        rng.uniform(5, 250, n), rng.uniform(5, 195, n),
        rng.uniform(20, 120, n), rng.uniform(-1, 360, n)],
        axis=1).astype(np.float32)
    valid = np.ones(n, bool)
    for kind in ("bad", "hash_sift"):
        got = np.asarray(SH.compute_sharded(
            jnp.asarray(img), jnp.asarray(kp), jnp.asarray(valid), mesh,
            nbits=256, kind=kind))
        want = np.asarray(P.compute_jit(
            jnp.asarray(img), jnp.asarray(kp), jnp.asarray(valid), 256,
            kind, 1.0, False))
        np.testing.assert_array_equal(got, want)


def test_compute_sharded_bucketed_matches_single_chip():
    """Keypoint-sharded compute with octave-bucket ranges (the serving path
    for multi-octave detector output) is byte-identical to single-chip
    compute_bucketed_jit, rows in caller order — the buckets route through
    the WINDOW kernels on every shard, not the gather fallback."""
    from efficient_features_tpu import EfficientFeatures, BAD
    from efficient_features_tpu.ops import window_kernels as WK

    assert len(jax.devices()) >= 8
    mesh = SH.make_mesh(8)
    img = make_test_image(256, 320, seed=152)
    feat = EfficientFeatures(nfeatures=900, nlevels=4,
                             descriptor_type="bad_256")
    kps = feat.detect(img)
    s = kps._slots
    kp = jnp.stack([s["x"], s["y"], s["size"], s["angle"]],
                   axis=1).astype(jnp.float32)
    # detector slot layout -> bucket ranges, exactly as the API layer does
    bad = BAD(1.0, 256)
    br = tuple((a, b, bad._bucket_smax(sz)) for (a, b, sz) in
               kps.level_ranges)
    for kind in ("bad", "hash_sift"):
        got = np.asarray(SH.compute_sharded(
            jnp.asarray(img), kp, s["valid"], mesh, nbits=256, kind=kind,
            ranges=br))
        want = np.asarray(P.compute_bucketed_jit(
            jnp.asarray(img), kp, s["valid"], 256, kind, 1.0, br))
        np.testing.assert_array_equal(got, want)
    with pytest.raises(ValueError):    # ranges must tile [0, N)
        SH.compute_sharded(jnp.asarray(img), kp, s["valid"], mesh,
                           nbits=256, kind="bad", ranges=((0, 5, None),))


def test_api_batch_as_host_matches_single():
    """detect_and_compute_batch(as_host=True) returns per-image KeyPoints +
    compacted descriptors identical to single-image detect_and_compute, and
    the returned KeyPoints carry the static level layout (bucketed
    compute() works on them)."""
    from efficient_features_tpu import EfficientFeatures

    feat = EfficientFeatures(nfeatures=300, nlevels=3,
                             descriptor_type="bad_256")
    images = np.stack([make_test_image(96, 128, seed=200 + i)
                       for i in range(2)])
    out = feat.detect_and_compute_batch(images, mesh=SH.make_mesh(2),
                                        as_host=True)
    assert len(out) == 2
    for i, (kps, desc) in enumerate(out):
        k1, d1 = feat.detect_and_compute(images[i])
        assert kps.count == k1.count
        a, b = kps.as_arrays(), k1.as_arrays()
        np.testing.assert_array_equal(a["x"], b["x"])
        np.testing.assert_array_equal(a["y"], b["y"])
        np.testing.assert_array_equal(desc, d1)
        np.testing.assert_array_equal(feat.compute(images[i], kps),
                                      feat.compute(images[i], k1))


def test_knn2_match_sharded_matches_single_chip():
    """Query/train-axis sharded matcher == the single-chip masked XLA path
    (ok exactly; j/best wherever ok — all-invalid rows carry sentinels)."""
    from efficient_features_tpu.ops import matcher as M

    rng = np.random.default_rng(21)
    pool = rng.integers(0, 256, (7, 64), dtype=np.uint8)  # tie-heavy
    d1 = pool[rng.integers(0, 7, 333)]          # not mesh/tile multiples
    d2 = pool[rng.integers(0, 7, 517)]
    v1 = rng.random(333) > 0.15
    v2 = rng.random(517) > 0.15
    mesh = SH.make_mesh(8)
    j, best, ok = map(np.asarray, SH.knn2_match_sharded(
        jnp.asarray(d1), jnp.asarray(v1), jnp.asarray(d2), jnp.asarray(v2),
        mesh, 0.8))
    jr, br, okr = map(np.asarray, M.knn2_ratio_match_masked(
        jnp.asarray(d1), jnp.asarray(v1), jnp.asarray(d2), jnp.asarray(v2),
        0.8))
    np.testing.assert_array_equal(ok, okr)
    assert ok.any()
    np.testing.assert_array_equal(j[ok], jr[ok])
    np.testing.assert_array_equal(best[ok], br[ok])
