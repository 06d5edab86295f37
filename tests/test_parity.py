"""Parity tests: JAX/TPU path vs the NumPy oracle.

Mirrors the reference's test strategy (tests/descriptor_test.cpp): the oracle
plays the CPU `efficient_features` module, the JAX path plays the CUDA module.
Stronger than the reference where our exact-integer semantics allow:
  - pyramid, blur, FAST, Harris, NMS, top-k selection: BIT-IDENTICAL
  - descriptors: nonzero-byte budgets 2e-5 (BAD) / 1e-4 (HashSIFT)
    (descriptor_test.cpp:40-45,69-74)
"""
import numpy as np
import pytest

import efficient_features_tpu  # noqa: F401
import jax.numpy as jnp

from efficient_features_tpu.cpu import reference as R
from efficient_features_tpu.cpu import descriptors as DC
from efficient_features_tpu.ops import image as OI
from efficient_features_tpu.ops import detect as OD
from efficient_features_tpu.ops import orientation as OO
from efficient_features_tpu.ops import bad as OB
from efficient_features_tpu.ops import hash_sift as OH
from efficient_features_tpu import pipeline as P

from util import make_test_image, make_keypoints


@pytest.fixture(scope="module")
def img():
    return make_test_image(300, 400, seed=20)


def test_resize_bit_exact(img):
    for hw in [(250, 333), (150, 200), (37, 53)]:
        a = R.resize_u8(img, hw)
        b = np.asarray(OI.resize_u8(jnp.asarray(img), hw))
        np.testing.assert_array_equal(a, b)


def test_blur_bit_exact(img):
    a = R.gaussian_blur7_u8(img)
    b = np.asarray(OI.gaussian_blur7_u8(jnp.asarray(img)))
    np.testing.assert_array_equal(a, b)


def test_integral_bit_exact(img):
    a = R.integral_image_i32(img)
    b = np.asarray(OI.integral_image_i32(jnp.asarray(img)))
    np.testing.assert_array_equal(a, b)


def test_fast_bit_exact(img):
    for th in (10, 20, 40):
        a = R.fast_corner_mask(img, th)
        b = np.asarray(OD.fast_corner_mask(jnp.asarray(img), th))
        np.testing.assert_array_equal(a, b)


def test_harris_bit_exact(img):
    a = R.harris_response(img)
    b = np.asarray(OD.harris_response(jnp.asarray(img)))
    # compare only where the 9x9 support is in-bounds (detector masks borders)
    np.testing.assert_array_equal(a[5:-5, 5:-5], b[5:-5, 5:-5])


def test_nms_bit_exact(img):
    corner = R.fast_corner_mask(img, 20)
    resp = R.harris_response(img)
    for radius in (3, 7, 15):
        a = R.radius_nms(resp, corner, radius)
        b = np.asarray(OD.radius_nms(jnp.asarray(resp), jnp.asarray(corner),
                                     radius))
        np.testing.assert_array_equal(a, b)


def test_topk_selection_identical(img):
    corner = R.fast_corner_mask(img, 20)
    # restrict to border-valid region as the pipeline does
    border = np.zeros_like(corner)
    border[15:-15, 15:-15] = True
    corner &= border
    resp = R.harris_response(img)
    surv = R.radius_nms(resp, corner, 15)
    ys, xs, r = R.select_topk(resp, surv, 500)
    jys, jxs, jr, jv = OD.select_topk(jnp.asarray(resp), jnp.asarray(surv), 500)
    n = int(np.asarray(jv).sum())
    assert n == len(ys)
    np.testing.assert_array_equal(np.asarray(jys)[:n], ys)
    np.testing.assert_array_equal(np.asarray(jxs)[:n], xs)
    np.testing.assert_array_equal(np.asarray(jr)[:n], r)


def test_topk_capped_path_exact():
    """Large-quota select_topk uses the NMS-sparsity-capped per-chunk k with
    an exact lax.cond fallback; both arms must match the flat lexsort."""
    rng = np.random.default_rng(11)
    h, w = 384, 1024   # n = 4*96K >= 4*32K triggers the chunked path

    def oracle(resp, surv, quota):
        flat = np.where(surv, resp, -np.inf).reshape(-1)
        order = np.lexsort((np.arange(flat.size), -flat))[:quota]
        keep = flat[order] != -np.inf
        return order[keep], flat[order][keep]

    # sparse survivors (capped path, no overflow): quota > csize//4
    resp = rng.standard_normal((h, w)).astype(np.float32)
    surv = rng.random((h, w)) < 0.01
    quota = 16384
    jys, jxs, jr, jv = OD.select_topk(jnp.asarray(resp), jnp.asarray(surv),
                                      quota, nms_radius=15)
    oidx, ovals = oracle(resp, surv, quota)
    n = int(np.asarray(jv).sum())
    assert n == len(oidx)
    got = np.asarray(jys)[:n].astype(np.int64) * w + np.asarray(jxs)[:n]
    np.testing.assert_array_equal(got, oidx)
    np.testing.assert_array_equal(np.asarray(jr)[:n], ovals)

    # dense tied survivors (per-chunk counts overflow the cap -> flat
    # fallback): every pixel survives with one of two tied responses
    resp2 = np.where((np.arange(h * w) % 3 == 0).reshape(h, w),
                     np.float32(2.0), np.float32(1.0))
    surv2 = np.ones((h, w), bool)
    jys, jxs, jr, jv = OD.select_topk(jnp.asarray(resp2), jnp.asarray(surv2),
                                      quota, nms_radius=15)
    oidx, ovals = oracle(resp2, surv2, quota)
    n = int(np.asarray(jv).sum())
    assert n == len(oidx) == quota
    got = np.asarray(jys)[:n].astype(np.int64) * w + np.asarray(jxs)[:n]
    np.testing.assert_array_equal(got, oidx)
    np.testing.assert_array_equal(np.asarray(jr)[:n], ovals)


def test_ic_angles_close(img):
    corner = R.fast_corner_mask(img, 20)
    border = np.zeros_like(corner)
    border[15:-15, 15:-15] = True
    ys, xs = np.nonzero(corner & border)
    ys, xs = ys[:200].astype(np.int32), xs[:200].astype(np.int32)
    a = R.ic_angles(img, ys, xs)
    b = np.asarray(OO.ic_angles(jnp.asarray(img), jnp.asarray(ys),
                                jnp.asarray(xs), jnp.ones(len(ys), bool)))
    # integer moments are exact; atan2 may differ by ULPs
    d = np.abs(a - b)
    d = np.minimum(d, 360 - d)
    assert d.max() < 1e-3


def test_detect_pipeline_keypoints_identical(img):
    cfg = P.FeatureConfig(nfeatures=1500)
    slots = {k: np.asarray(v) for k, v in P.detect_jit(jnp.asarray(img), cfg).items()}
    oracle = R.detect(img, nfeatures=1500)
    m = slots["valid"]
    assert int(slots["count"]) == oracle.count
    np.testing.assert_array_equal(slots["x"][m], oracle.x)
    np.testing.assert_array_equal(slots["y"][m], oracle.y)
    np.testing.assert_array_equal(slots["octave"][m], oracle.octave)
    np.testing.assert_allclose(slots["response"][m], oracle.response, rtol=0)
    np.testing.assert_allclose(slots["size"][m], oracle.size, rtol=0)
    d = np.abs(slots["angle"][m] - oracle.angle)
    assert np.minimum(d, 360 - d).max() < 1e-3


@pytest.mark.parametrize("cfgkw", [
    # off-default configs: small radius takes the non-fused NMS path
    # (radius < 10), single level skips the pyramid, coarse pyramid changes
    # quota math, low threshold floods candidates past the quota
    dict(nfeatures=700, nonmax_radius=5),
    dict(nfeatures=900, nlevels=1),
    dict(nfeatures=1200, scale_factor=1.5, nlevels=4),
    dict(nfeatures=400, fast_threshold=9, nonmax_radius=21),
    dict(nfeatures=2500, fast_threshold=35, nlevels=3, nonmax_radius=10),
])
def test_detect_pipeline_config_fuzz(img, cfgkw):
    """Bit-exact selection parity holds at EVERY config corner, not just the
    reference defaults (the reference has no detector unit tests at all —
    SURVEY.md section 4)."""
    cfg = P.FeatureConfig(**cfgkw)
    slots = {k: np.asarray(v)
             for k, v in P.detect_jit(jnp.asarray(img), cfg).items()}
    oracle = R.detect(img, nfeatures=cfg.nfeatures,
                      scale_factor=cfg.scale_factor, nlevels=cfg.nlevels,
                      fast_threshold=cfg.fast_threshold,
                      nonmax_radius=cfg.nonmax_radius)
    m = slots["valid"]
    assert int(slots["count"]) == oracle.count
    np.testing.assert_array_equal(slots["x"][m], oracle.x)
    np.testing.assert_array_equal(slots["y"][m], oracle.y)
    np.testing.assert_array_equal(slots["octave"][m], oracle.octave)
    np.testing.assert_allclose(slots["response"][m], oracle.response, rtol=0)
    d = np.abs(slots["angle"][m] - oracle.angle)
    assert np.minimum(d, 360 - d).max() < 1e-3


@pytest.mark.parametrize("nbits", [256, 512])
def test_bad_parity_budget(img, nbits):
    x, y, size, angle = make_keypoints(*img.shape, 400, seed=5)
    x[:5] = [1, 395, 5, 200, 390]
    y[:5] = [2, 3, 295, 1, 290]
    a = DC.bad_descriptors(img, x, y, size, angle, nbits=nbits)
    integral = OI.integral_image_i32(jnp.asarray(img))
    b = np.asarray(OB.bad_descriptors(
        integral, jnp.asarray(x), jnp.asarray(y), jnp.asarray(size),
        jnp.asarray(angle), jnp.ones(len(x), bool), nbits=nbits))
    nz = (a != b).sum()
    budget = int(2e-5 * a.size) + 1  # reference budget (descriptor_test.cpp:43)
    assert nz <= budget, f"{nz} differing bytes > budget {budget}"


@pytest.mark.parametrize("nbits", [256, 512])
def test_bad_parity_large_sizes(img, nbits):
    """User keypoints with size >= 120 overflow int32 products in the border
    compare; the contract switches to truncated-f32 operands there — both
    backends must still agree within the reference budget."""
    rng = np.random.default_rng(9)
    n = 64
    x = rng.uniform(0, img.shape[1], n).astype(np.float32)
    y = rng.uniform(0, img.shape[0], n).astype(np.float32)
    size = rng.uniform(120.0, 500.0, n).astype(np.float32)
    angle = rng.uniform(-1.0, 360.0, n).astype(np.float32)
    a = DC.bad_descriptors(img, x, y, size, angle, nbits=nbits)
    integral = OI.integral_image_i32(jnp.asarray(img))
    b = np.asarray(OB.bad_descriptors(
        integral, jnp.asarray(x), jnp.asarray(y), jnp.asarray(size),
        jnp.asarray(angle), jnp.ones(n, bool), nbits=nbits))
    nz = (a != b).sum()
    budget = int(2e-5 * a.size) + 1
    assert nz <= budget, f"{nz} differing bytes > budget {budget}"


@pytest.mark.parametrize("nbits", [256, 512])
def test_hash_sift_parity_budget(img, nbits):
    x, y, size, angle = make_keypoints(*img.shape, 300, seed=6)
    a = DC.hash_sift_descriptors(img, x, y, size, angle, nbits=nbits)
    b = np.asarray(OH.hash_sift_descriptors(
        jnp.asarray(img), jnp.asarray(x), jnp.asarray(y), jnp.asarray(size),
        jnp.asarray(angle), jnp.ones(len(x), bool), nbits=nbits))
    nz = (a != b).sum()
    budget = int(1e-4 * a.size) + 1  # descriptor_test.cpp:72
    assert nz <= budget, f"{nz} differing bytes > budget {budget}"


def test_warp_patches_parity(img):
    x, y, size, angle = make_keypoints(*img.shape, 50, seed=7)
    a = DC.warp_patches(img, x, y, size, angle, 1.0)
    b = np.asarray(OH.warp_patches(jnp.asarray(img), jnp.asarray(x),
                                   jnp.asarray(y), jnp.asarray(size),
                                   jnp.asarray(angle), 1.0)).astype(np.uint8)
    # bilinear in f32: allow off-by-one quantization on a tiny fraction
    diff = (a.astype(int) - b.astype(int))
    assert np.abs(diff).max() <= 1
    assert (diff != 0).mean() < 1e-3


def test_end_to_end_detect_and_compute(img):
    """Full pipeline vs oracle detect + oracle descriptors on blurred levels."""
    cfg = P.FeatureConfig(nfeatures=800, descriptor_type="bad_256")
    slots, desc = P.detect_and_compute_jit(jnp.asarray(img), cfg)
    slots = {k: np.asarray(v) for k, v in slots.items()}
    desc = np.asarray(desc)[slots["valid"]]

    oracle = R.detect(img, nfeatures=800)
    assert int(slots["count"]) == oracle.count

    # oracle descriptors: recompute per-level detection to get level coords,
    # then BAD on the blurred level image (detectAndCompute semantics)
    import efficient_features_tpu.utils.semantics as S
    levels = R.build_pyramid(img, cfg.scale_factor, cfg.nlevels)
    quotas = S.features_per_level(cfg.nfeatures, cfg.scale_factor, cfg.nlevels)
    all_desc = []
    for s in range(cfg.nlevels):
        lv = levels[s]
        corner = R.fast_corner_mask(lv, cfg.fast_threshold)
        border = np.zeros_like(corner)
        if min(lv.shape) > 30:
            border[15:-15, 15:-15] = True
        corner &= border
        resp = R.harris_response(lv)
        surv = R.radius_nms(resp, corner, cfg.nonmax_radius)
        ys, xs, r = R.select_topk(resp, surv, quotas[s])
        ang = R.ic_angles(lv, ys, xs)
        blurred = R.gaussian_blur7_u8(lv)
        d = DC.bad_descriptors(blurred, xs.astype(np.float32),
                               ys.astype(np.float32),
                               np.full(len(xs), 31.0, np.float32), ang,
                               nbits=256)
        all_desc.append(d)
    oracle_desc = np.concatenate(all_desc, axis=0)
    assert oracle_desc.shape == desc.shape
    nz = (oracle_desc != desc).sum()
    budget = int(2e-5 * desc.size) + 1
    assert nz <= budget, f"{nz} differing bytes > budget {budget}"


def test_topk_block_reduced_path_exact():
    """nms_radius >= 10 block-reduction top-k: bit-exact vs the flat
    lexsort, including the tie-inside-one-block fallback."""
    rng = np.random.default_rng(21)
    h, w = 512, 1024   # n >= 4*65536 triggers the reduced path

    def oracle(resp, surv, quota):
        flat = np.where(surv, resp, -np.inf).reshape(-1)
        order = np.lexsort((np.arange(flat.size), -flat))[:quota]
        keep = flat[order] != -np.inf
        return order[keep], flat[order][keep]

    # NMS-spaced survivors (radius 15: at most one per 8x8 block)
    resp = rng.standard_normal((h, w)).astype(np.float32)
    surv = np.zeros((h, w), bool)
    ys = rng.integers(0, h // 16, 300) * 16
    xs = rng.integers(0, w // 16, 300) * 16
    surv[ys, xs] = True
    quota = 256
    jys, jxs, jr, jv = OD.select_topk(jnp.asarray(resp), jnp.asarray(surv),
                                      quota, nms_radius=15)
    oidx, ovals = oracle(resp, surv, quota)
    nn = int(np.asarray(jv).sum())
    assert nn == len(oidx)
    got = np.asarray(jys)[:nn].astype(np.int64) * w + np.asarray(jxs)[:nn]
    np.testing.assert_array_equal(got, oidx)
    np.testing.assert_array_equal(np.asarray(jr)[:nn], ovals)

    # tied co-survivors inside one 8x8 block -> lax.cond dense fallback
    resp2 = resp.copy()
    surv2 = surv.copy()
    surv2[100, 200] = surv2[102, 203] = True
    resp2[100, 200] = resp2[102, 203] = np.float32(7.25)
    jys, jxs, jr, jv = OD.select_topk(jnp.asarray(resp2), jnp.asarray(surv2),
                                      quota, nms_radius=15)
    oidx, ovals = oracle(resp2, surv2, quota)
    nn = int(np.asarray(jv).sum())
    assert nn == len(oidx)
    got = np.asarray(jys)[:nn].astype(np.int64) * w + np.asarray(jxs)[:nn]
    np.testing.assert_array_equal(got, oidx)
    np.testing.assert_array_equal(np.asarray(jr)[:nn], ovals)


def test_topk_strategies_fuzz():
    """All select_topk strategies (flat, chunked, NMS-capped, 8x8
    block-reduced) must agree with the lexsort oracle on randomized maps
    with adversarial ties."""
    rng = np.random.default_rng(33)

    def oracle(resp, surv, quota):
        flat = np.where(surv, resp, -np.inf).reshape(-1)
        order = np.lexsort((np.arange(flat.size), -flat))[:quota]
        keep = flat[order] != -np.inf
        return order[keep], flat[order][keep]

    cases = []
    for trial in range(6):
        h, w = int(rng.integers(64, 600)), int(rng.integers(128, 1100))
        resp = rng.standard_normal((h, w)).astype(np.float32)
        # quantize to force value ties
        resp = np.round(resp * 4) / 4
        surv = rng.random((h, w)) < rng.uniform(0.001, 0.05)
        quota = int(rng.integers(16, 3000))
        radius = [None, 5, 12, 15, 30][trial % 5]
        cases.append((resp, surv, quota, radius))
    for resp, surv, quota, radius in cases:
        h, w = resp.shape
        jys, jxs, jr, jv = OD.select_topk(
            jnp.asarray(resp), jnp.asarray(surv), quota, nms_radius=radius)
        oidx, ovals = oracle(resp, surv, quota)
        n = int(np.asarray(jv).sum())
        assert n == len(oidx), (h, w, quota, radius)
        got = np.asarray(jys)[:n].astype(np.int64) * w + np.asarray(jxs)[:n]
        np.testing.assert_array_equal(got, oidx)
        np.testing.assert_array_equal(np.asarray(jr)[:n], ovals)
