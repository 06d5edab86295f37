"""Pallas kernel parity tests (interpreter mode on the CPU mesh).

The production TPU path runs these kernels compiled; here they run through the
Pallas interpreter against the oracle.  The same checks were validated
compiled on a real TPU chip (bit-identical results).
"""
import numpy as np
import pytest

import efficient_features_tpu  # noqa: F401
import jax.numpy as jnp

from efficient_features_tpu.cpu import reference as R
from efficient_features_tpu.cpu import descriptors as DC
from efficient_features_tpu.ops import pallas_kernels as PK
from efficient_features_tpu.ops import window_kernels as WK

from util import make_test_image, make_keypoints


@pytest.fixture(scope="module")
def img():
    return make_test_image(200, 280, seed=33)


def test_fast_harris_kernel_bit_exact(img):
    h, w = img.shape
    border = np.zeros((h, w), bool)
    border[15:-15, 15:-15] = True
    corner = R.fast_corner_mask(img, 20) & border
    expect = np.where(corner, R.harris_response(img), np.float32(-np.inf))
    got = np.asarray(PK.fast_harris(jnp.asarray(img), 20))
    np.testing.assert_array_equal(expect, got)


def test_fast_wrap_run_corner():
    """FAST-9 arc WRAPPING the index-0 tap (darker bits 15,0..7 class).

    Regression guard for the round-5 miscompile: a packed dual-field
    log-doubled run-9 form shipped in round 9 whose COMPILED binary
    missed every wrap-run corner (interpret/numpy were exhaustively
    correct, and the validating A/B was voided by the kernel-binary
    cache collision — see CLAUDE.md).  This pins the exact failure
    class; it must pass compiled (-m tpu re-collection), not just
    interpreted."""
    from efficient_features_tpu.utils import semantics as S

    img = np.full((48, 64), 160, np.uint8)
    cy, cx = 24, 32
    # darken exactly 9 circle taps spanning the index wrap: 12..15, 0..4
    for idx in list(range(12, 16)) + list(range(0, 5)):
        dy, dx = S.FAST_CIRCLE[idx]
        img[cy + dy, cx + dx] = 100
    corner = R.fast_corner_mask(img, 20)
    assert corner[cy, cx], "oracle must see the wrap-run corner"
    expect = np.where(corner & _border(img.shape), R.harris_response(img),
                      np.float32(-np.inf))
    got = np.asarray(PK.fast_harris(jnp.asarray(img), 20))
    assert np.isfinite(got[cy, cx]), "compiled kernel missed the wrap run"
    np.testing.assert_array_equal(expect, got)


def _border(shape):
    b = np.zeros(shape, bool)
    b[15:-15, 15:-15] = True
    return b


def test_nms_kernel_bit_exact(img):
    h, w = img.shape
    border = np.zeros((h, w), bool)
    border[15:-15, 15:-15] = True
    corner = R.fast_corner_mask(img, 20) & border
    resp = R.harris_response(img)
    masked = np.where(corner, resp, np.float32(-np.inf))
    for radius in (7, 15):
        expect = R.radius_nms(resp, corner, radius)
        got = np.asarray(PK.radius_nms(jnp.asarray(masked), radius))
        np.testing.assert_array_equal(expect, got)


@pytest.mark.parametrize("formulation", ["noroll", "roll", "pair"])
def test_bad_window_kernel_exact(img, formulation):
    h, w = img.shape
    x, y, size, angle = make_keypoints(h, w, 16, seed=4)
    x[:4] = [1, w - 5, 5, w / 2]
    y[:4] = [2, 3, h - 5, 1]
    valid = np.ones(16, bool)
    for nbits in (256, 512):
        a = DC.bad_descriptors(img, x, y, size, angle, nbits=nbits)
        b = np.asarray(WK.bad_descriptors_windows(
            jnp.asarray(img), jnp.asarray(x), jnp.asarray(y),
            jnp.asarray(size), jnp.asarray(angle), jnp.asarray(valid),
            nbits, 1.0, formulation=formulation))
        budget = int(2e-5 * a.size) + 1
        assert (a != b).sum() <= budget


@pytest.mark.parametrize("formulation", ["noroll", "roll", "pair"])
def test_bad_window_kernel_pixel_extremes(formulation):
    """int8 MXU path: pixels re-biased to [-128, 127] must stay exact at the
    saturated ends (0 -> -128, 255 -> 127) and across hard 0/255 edges —
    with angle=-1 (no trig) every formulation must match the oracle
    BIT-FOR-BIT, not just within budget."""
    img = np.zeros((160, 256), np.uint8)
    img[:, 128:] = 255
    img[40:80, 40:80] = 255
    img[100:140, 160:200] = 0
    n = 24
    rng = np.random.default_rng(9)
    x = rng.uniform(34, 222, n).astype(np.float32)
    y = rng.uniform(34, 126, n).astype(np.float32)
    size = np.full(n, 31.0, np.float32)
    angle = np.full(n, -1.0, np.float32)   # no rotation: no trig ULPs
    valid = np.ones(n, bool)
    for nbits in (256, 512):
        a = DC.bad_descriptors(img, x, y, size, angle, nbits=nbits)
        b = np.asarray(WK.bad_descriptors_windows(
            jnp.asarray(img), jnp.asarray(x), jnp.asarray(y),
            jnp.asarray(size), jnp.asarray(angle), jnp.asarray(valid),
            nbits, 1.0, formulation=formulation))
        np.testing.assert_array_equal(a, b)


def test_warp_window_kernel_exact(img):
    h, w = img.shape
    x, y, size, angle = make_keypoints(h, w, 12, seed=5)
    valid = np.ones(12, bool)
    a = DC.warp_patches(img, x, y, size, angle, 1.0)
    b = np.asarray(WK.warp_patches_windows(
        jnp.asarray(img), jnp.asarray(x), jnp.asarray(y), jnp.asarray(size),
        jnp.asarray(angle), jnp.asarray(valid), 1.0)).reshape(12, 32, 32)
    assert np.abs(a.astype(int) - b.astype(int)).max() <= 1
    assert (a != b).mean() < 1e-3


def test_warp_body_variants_bit_identical(img):
    """The two warp kernel bodies (EFF_TPU_WARP_BODY: 'select' full-height
    row-index wheres vs 'split' per-half builds with hoisted invariant
    iotas) run identical per-keypoint arithmetic and must agree BYTE-FOR-
    BYTE — including corner keypoints (the m02/u=0 cancellation class) and
    arbitrary angles."""
    h, w = img.shape
    n = 16
    x, y, size, angle = make_keypoints(h, w, n, seed=9)
    x[:4] = [15.0, w - 16.0, 15.0, w - 16.0]
    y[:4] = [15.0, 15.0, h - 16.0, h - 16.0]
    angle[4:8] = -1.0
    valid = np.ones(n, bool)
    args = [jnp.asarray(a) for a in (x, y, size, angle, valid)]
    a = np.asarray(WK.warp_patches_windows(
        jnp.asarray(img), *args, 1.0, body_kind="select"))
    b = np.asarray(WK.warp_patches_windows(
        jnp.asarray(img), *args, 1.0, body_kind="split"))
    np.testing.assert_array_equal(a, b)


def test_warp_window_kernel_saturated_edges():
    """Packed one-hot gather extremes: hard 0/255 edges drive the packed
    field z = z_l + 4096*z_r to its corners (0, 255, 4096*255, 255+4096*255);
    angle=-1 (no trig ULPs) must reproduce the oracle EXACTLY."""
    img = np.zeros((160, 256), np.uint8)
    img[:, 128:] = 255
    img[40:80, 40:80] = 255
    img[100:140, 160:200] = 0
    n = 24
    rng = np.random.default_rng(11)
    # non-integer positions: bilinear lerp straddles the 0/255 edges
    x = (rng.uniform(34, 222, n) + 0.31).astype(np.float32)
    y = (rng.uniform(34, 126, n) + 0.47).astype(np.float32)
    size = np.full(n, 31.0, np.float32)
    angle = np.full(n, -1.0, np.float32)
    valid = np.ones(n, bool)
    a = DC.warp_patches(img, x, y, size, angle, 1.0).reshape(n, -1)
    b = np.asarray(WK.warp_patches_windows(
        jnp.asarray(img), jnp.asarray(x), jnp.asarray(y), jnp.asarray(size),
        jnp.asarray(angle), jnp.asarray(valid), 1.0))
    np.testing.assert_array_equal(a, b)
    # fused kernel on the same extremes: packed gradients hit |dx|=|dy|=255;
    # angle=-1 still exercises the atan polynomial inside SIFT, so compare
    # at the quantized-descriptor budget
    want_d = DC.patch_sift_responses(a.reshape(n, 32, 32))[:, 1:]
    perm = np.array([(l % 16) * 8 + l // 16 for l in range(128)])
    got = np.asarray(WK.hs_desc_windows(
        jnp.asarray(img), jnp.asarray(x), jnp.asarray(y), jnp.asarray(size),
        jnp.asarray(angle), jnp.asarray(valid), 1.0)).astype(np.float32)
    assert np.abs(got - want_d[:, perm]).max() <= 1.0
    assert (got != want_d[:, perm]).mean() < 2e-3


def test_hs_fused_kernel_desc_parity(img):
    """Fused HashSIFT kernel (warp+grad+hist+normalize in one pass) vs the
    oracle's quantized 128-d SIFT descriptor.  The kernel emits the
    orientation-major core layout e[o*16+rc] = d[rc*8+o]; tolerance covers
    trig/atan-poly/reciprocal ULP classes (quantized values off by <= 1, on
    a tiny fraction of entries)."""
    h, w = img.shape
    x, y, size, angle = make_keypoints(h, w, 24, seed=8)
    x[:3] = [2, w - 3, w / 2]
    y[:3] = [h / 2, 2, h - 3]
    valid = np.ones(24, bool)
    patches = DC.warp_patches(img, x, y, size, angle, 1.0)
    want_d = DC.patch_sift_responses(patches)[:, 1:]          # (N, 128)
    perm = np.array([(l % 16) * 8 + l // 16 for l in range(128)])
    want_e = want_d[:, perm]
    got = np.asarray(WK.hs_desc_windows(
        jnp.asarray(img), jnp.asarray(x), jnp.asarray(y), jnp.asarray(size),
        jnp.asarray(angle), jnp.asarray(valid), 1.0)).astype(np.float32)
    assert np.abs(got - want_e).max() <= 1.0
    assert (got != want_e).mean() < 2e-3


def test_hs_fused_end_to_end_budget(img):
    """Fused path end-to-end (kernel + permuted projection) vs the oracle
    HashSIFT bytes, at the reference's 1e-4 budget."""
    from efficient_features_tpu import pipeline as P

    h, w = img.shape
    x, y, size, angle = make_keypoints(h, w, 200, seed=9)
    valid = np.ones(200, bool)
    for nbits in (256, 512):
        a = DC.hash_sift_descriptors(img, x, y, size, angle, nbits=nbits)
        desc = WK.hs_desc_windows(
            jnp.asarray(img), jnp.asarray(x), jnp.asarray(y),
            jnp.asarray(size), jnp.asarray(angle), jnp.asarray(valid), 1.0)
        b = np.asarray(P._hs_from_fused(desc, jnp.asarray(valid), nbits))
        budget = int(1e-4 * a.size) + 1
        assert (a != b).sum() <= budget


def test_hs_hist_kernel_parity(img):
    """Standalone Pallas hist kernel (warp patches -> quantized SIFT core,
    window_kernels._hs_hist_kernel) vs the oracle's histogram+normalize.
    Interpret mode measured bit-identical; compiled keeps the fused
    kernel's atan-poly/FMA budget (bytes off by <= 1, ~1e-3 fraction)."""
    h, w = img.shape
    x, y, size, angle = make_keypoints(h, w, 24, seed=12)
    x[:3] = [2, w - 3, w / 2]
    y[:3] = [h / 2, 2, h - 3]
    valid = np.ones(24, bool)
    patches = np.asarray(WK.warp_patches_windows(
        jnp.asarray(img), jnp.asarray(x), jnp.asarray(y), jnp.asarray(size),
        jnp.asarray(angle), jnp.asarray(valid), 1.0))         # (N, 1024) u8
    want_d = DC.patch_sift_responses(
        patches.astype(np.float32).reshape(-1, 32, 32))[:, 1:]
    perm = np.array([(l % 16) * 8 + l // 16 for l in range(128)])
    want_e = want_d[:, perm]
    got = np.asarray(WK.hs_hist_from_patches(
        jnp.asarray(patches))).astype(np.float32)
    assert np.abs(got - want_e).max() <= 1.0
    assert (got != want_e).mean() < 2e-3
    # N-padding path (N % 256 != 0 pads with zero patches -> desc 0)
    got17 = np.asarray(WK.hs_hist_from_patches(jnp.asarray(patches[:17])))
    np.testing.assert_array_equal(got17, got[:17].astype(np.uint8))


def test_hs_hist_end_to_end_budget(img):
    """Pallas-hist two-stage path end-to-end (warp kernel -> hist kernel ->
    permuted projection) vs the oracle HashSIFT bytes at the reference's
    1e-4 budget — the EFF_TPU_HS_HIST='pallas' pipeline tail."""
    from efficient_features_tpu import pipeline as P

    h, w = img.shape
    x, y, size, angle = make_keypoints(h, w, 200, seed=13)
    valid = np.ones(200, bool)
    patches = WK.warp_patches_windows(
        jnp.asarray(img), jnp.asarray(x), jnp.asarray(y), jnp.asarray(size),
        jnp.asarray(angle), jnp.asarray(valid), 1.0)
    desc = WK.hs_hist_from_patches(patches.reshape(-1, 1024))
    for nbits in (256, 512):
        a = DC.hash_sift_descriptors(img, x, y, size, angle, nbits=nbits)
        b = np.asarray(P._hs_from_fused(desc, jnp.asarray(valid), nbits))
        budget = int(1e-4 * a.size) + 1
        assert (a != b).sum() <= budget


def test_atan2_poly_accuracy():
    """Hand-rolled Mosaic atan2 vs numpy over all quadrants and axes."""
    import jax

    rng = np.random.default_rng(3)
    dx = np.concatenate([rng.uniform(-300, 300, 4000),
                         np.array([0, 0, 1, -1, 0, 255, -255, 3])])
    dy = np.concatenate([rng.uniform(-300, 300, 4000),
                         np.array([0, 1, 0, 0, -1, -3, 255, 255])])
    got = np.asarray(jax.jit(WK._atan2_poly)(
        jnp.asarray(dy, jnp.float32)[None, :],
        jnp.asarray(dx, jnp.float32)[None, :]))[0]
    want = np.arctan2(dy, dx).astype(np.float32)
    err = np.abs(got - want)
    err = np.minimum(err, np.abs(err - 2 * np.pi))  # -pi vs pi seam
    assert err.max() < 1.5e-6


def test_ic_window_kernel_exact(img):
    h, w = img.shape
    rng = np.random.default_rng(2)
    ys = rng.integers(15, h - 15, 20).astype(np.int32)
    xs = rng.integers(15, w - 15, 20).astype(np.int32)
    valid = np.ones(20, bool)
    a = R.ic_angles(img, ys, xs)
    b = np.asarray(WK.ic_angles_windows(jnp.asarray(img), jnp.asarray(ys),
                                        jnp.asarray(xs), jnp.asarray(valid)))
    d = np.abs(a - b)
    assert np.minimum(d, 360 - d).max() < 1e-3


def test_bad_window_kernel_100k_chunked():
    """The reference's own tests run 100k keypoints (descriptor_test.cpp:28);
    the chunked wrapper must handle that scale (SMEM limits per chunk) — on a
    REAL image (tests/data), full 100k, in the CPU tier."""
    import os
    from PIL import Image
    img = np.asarray(Image.open(os.path.join(
        os.path.dirname(__file__), "data", "real_montage.png")))
    h, w = img.shape
    rng = np.random.default_rng(6)
    n = 100_000
    x = rng.uniform(0, w - 1, n).astype(np.float32)
    y = rng.uniform(0, h - 1, n).astype(np.float32)
    size = np.full(n, 31.0, np.float32)
    angle = rng.uniform(0, 360, n).astype(np.float32)
    valid = np.ones(n, bool)
    d = np.asarray(WK.bad_descriptors_windows(
        jnp.asarray(img), jnp.asarray(x), jnp.asarray(y), jnp.asarray(size),
        jnp.asarray(angle), jnp.asarray(valid), 256, 1.0))
    assert d.shape == (n, 32)
    # verify slices spanning chunk boundaries against the oracle
    for sub in (slice(16384 - 50, 16384 + 50), slice(98304 - 50, 98304 + 50)):
        a = DC.bad_descriptors(img, x[sub], y[sub], size[sub], angle[sub],
                               nbits=256)
        budget = int(2e-5 * a.size) + 1
        assert (a != d[sub]).sum() <= budget


def test_fast_harris_nms_cells_selection_exact(img):
    """Cell-reduced fused detect + cell top-k == oracle selection."""
    import jax
    from efficient_features_tpu.ops import detect as OD

    h, w = img.shape
    radius, quota = 15, 300
    border = np.zeros((h, w), bool)
    border[15:-15, 15:-15] = True
    corner = R.fast_corner_mask(img, 20) & border
    resp = R.harris_response(img)
    surv = R.radius_nms(resp, corner, radius)
    eys, exs, er = R.select_topk(resp, surv, quota)

    cm, crow, ccnt = PK.fast_harris_nms_cells(jnp.asarray(img), 20, radius)

    def dense_fallback(_=None):
        masked = jnp.where(jnp.asarray(surv), jnp.asarray(resp),
                           jnp.float32(-jnp.inf))
        return jax.lax.top_k(masked.reshape(-1), min(quota, h * w))

    ys, xs, r, valid = OD.select_topk_cells(cm, crow, ccnt, h, w, quota,
                                            dense_fallback)
    n = int(np.asarray(valid).sum())
    assert n == len(eys)
    np.testing.assert_array_equal(np.asarray(ys)[:n], eys)
    np.testing.assert_array_equal(np.asarray(xs)[:n], exs)
    np.testing.assert_array_equal(np.asarray(r)[:n], er)


def test_fast_harris_nms_cells_tie_fallback():
    """Tied co-survivors inside one 8x8 block must route through the dense
    fallback and still match the oracle."""
    import jax
    from efficient_features_tpu.ops import detect as OD

    # two identical corner patterns 4 px apart -> equal Harris responses
    # inside one 8x8 block survive NMS together (ties co-survive)
    img = np.full((96, 160), 40, np.uint8)
    img[40:44, 60:64] = 220
    img[44:48, 64:68] = 220
    h, w = img.shape
    radius, quota = 15, 64
    border = np.zeros((h, w), bool)
    border[15:-15, 15:-15] = True
    corner = R.fast_corner_mask(img, 20) & border
    resp = R.harris_response(img)
    surv = R.radius_nms(resp, corner, radius)
    eys, exs, er = R.select_topk(resp, surv, quota)

    cm, crow, ccnt = PK.fast_harris_nms_cells(jnp.asarray(img), 20, radius)

    def dense_fallback(_=None):
        masked = jnp.where(jnp.asarray(surv), jnp.asarray(resp),
                           jnp.float32(-jnp.inf))
        return jax.lax.top_k(masked.reshape(-1), min(quota, h * w))

    ys, xs, r, valid = OD.select_topk_cells(cm, crow, ccnt, h, w, quota,
                                            dense_fallback)
    n = int(np.asarray(valid).sum())
    assert n == len(eys)
    np.testing.assert_array_equal(np.asarray(ys)[:n], eys)
    np.testing.assert_array_equal(np.asarray(xs)[:n], exs)


def test_bad_window_kernel_fuzz_extremes():
    """Randomized edge-case fuzz for the BAD window path: positions at image
    corners/edges, angles outside [0, 360), sizes up to the window gate."""
    from efficient_features_tpu.ops.window_kernels import max_window_size

    rng = np.random.default_rng(77)
    img = make_test_image(260, 340, seed=13)
    h, w = img.shape
    n = 96
    x = rng.uniform(0, w - 1, n).astype(np.float32)
    y = rng.uniform(0, h - 1, n).astype(np.float32)
    # force exact corners / edges / fractional-boundary positions
    x[:8] = [0, w - 1, 0, w - 1, 0.5, w - 1.5, 17.999, 18.0]
    y[:8] = [0, 0, h - 1, h - 1, 0.5, h - 1.5, 17.999, 18.0]
    size = rng.uniform(5.0, max_window_size(1.0) - 0.01, n).astype(np.float32)
    angle = rng.uniform(-3.0, 420.0, n).astype(np.float32)
    angle[:4] = [-1.0, 0.0, 359.999, 360.0]
    valid = np.ones(n, bool)
    for nbits in (256, 512):
        a = DC.bad_descriptors(img, x, y, size, angle, nbits=nbits)
        b = np.asarray(WK.bad_descriptors_windows(
            jnp.asarray(img), jnp.asarray(x), jnp.asarray(y),
            jnp.asarray(size), jnp.asarray(angle), jnp.asarray(valid),
            nbits, 1.0))
        assert (a != b).sum() <= max(4, int(2e-5 * a.size))


def test_warp_window_kernel_fuzz_extremes():
    """Same edge-case fuzz for the patch-warp window path."""
    from efficient_features_tpu.ops.window_kernels import max_window_size

    rng = np.random.default_rng(78)
    img = make_test_image(260, 340, seed=14)
    h, w = img.shape
    n = 64
    x = rng.uniform(0, w - 1, n).astype(np.float32)
    y = rng.uniform(0, h - 1, n).astype(np.float32)
    x[:4] = [0, w - 1, 0.25, w - 16.5]
    y[:4] = [0, h - 1, h - 16.5, 0.25]
    size = rng.uniform(5.0, max_window_size(1.0) - 0.01, n).astype(np.float32)
    angle = rng.uniform(-3.0, 420.0, n).astype(np.float32)
    valid = np.ones(n, bool)
    a = DC.warp_patches(img, x, y, size, angle, 1.0).reshape(n, -1)
    b = np.asarray(WK.warp_patches_windows(
        jnp.asarray(img), jnp.asarray(x), jnp.asarray(y), jnp.asarray(size),
        jnp.asarray(angle), jnp.asarray(valid), 1.0))
    d = np.abs(a.astype(int) - b.astype(int))
    assert d.max() <= 1
    assert (d != 0).mean() < 1e-3


def test_disc_max_band_ladder_bit_exact():
    """The shared band-ladder disc max (`PK._disc_max`) must equal the
    brute-force per-(dy,dx) disc maximum bit-exactly for every radius: f32
    max is exactly associative, so any tree is valid — this guards the
    ladder's band/offset arithmetic."""
    from efficient_features_tpu.utils import semantics as S
    rng = np.random.default_rng(7)
    for radius in (3, 7, 10, 15, 21):
        R_ = radius - 1
        tile_h, tile_w = 24, 40
        eh, ew = tile_h + 2 * R_, tile_w + 2 * R_
        m = rng.standard_normal((eh, ew)).astype(np.float32)
        m[rng.random((eh, ew)) < 0.5] = PK.NEG_INF
        got = np.asarray(PK._disc_max(jnp.asarray(m), radius, R_, eh,
                                      tile_h, tile_w))
        want = np.full((tile_h, tile_w), PK.NEG_INF, np.float32)
        for dy, wdx in S.disc_row_extents(radius):
            for dx in range(-wdx, wdx + 1):
                want = np.maximum(
                    want, m[R_ + dy:R_ + dy + tile_h,
                            R_ + dx:R_ + dx + tile_w])
        np.testing.assert_array_equal(got, want)


def test_cells_box7_mxu_bit_identical(img):
    """The opt-in MXU horizontal box7 (banded one-hot bf16 matmuls on a
    3-limb base-256 decomposition, exact by construction — see
    PK._box7_mxu) must be bit-identical to the vpu slice+add chain,
    masked and unmasked.  Any 1-ulp drift is a limb/recombine bug.

    Compiled (-m tpu) this is only sound because the mxu variant routes
    through its own kernel def name (the kernel-binary cache collision,
    CLAUDE.md): with a shared name the second variant would silently
    re-run the first's binary and this test would compare a binary with
    itself."""
    im = jnp.asarray(img)
    a = PK.fast_harris_nms_cells(im, 20, 15, None, None, "vpu")
    b = PK.fast_harris_nms_cells(im, 20, 15, None, None, "mxu")
    for name, x, y in zip(("max", "row", "cnt"), a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y),
                                      err_msg=name)
    rng = np.random.default_rng(9)
    mask = jnp.asarray(rng.uniform(size=img.shape) > 0.4)
    a = PK.fast_harris_nms_cells(im, 20, 15, mask, None, "vpu")
    b = PK.fast_harris_nms_cells(im, 20, 15, mask, None, "mxu")
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_tile_dims_h_step_invariant():
    """The cells kernel's (tile_h/8, tile_w) output blocks need the sublane
    dim divisible by 8 whenever the grid has >1 row, i.e. tile_h % 64 == 0
    (Mosaic block-shape rule; a 120-row tile at FHD fails to lower)."""
    for h in (128, 129, 512, 1080, 1081, 2160, 4320, 333):
        for w in (640, 1920, 3840, 7680):
            th, tw = PK._tile_dims(h, w, h_step=64)
            if h > th:                      # multi-row grid
                assert th % 64 == 0, (h, w, th)
            assert th % 8 == 0 and tw % 128 == 0
            # default (dense kernels): 8-row granularity only
            th8, _ = PK._tile_dims(h, w)
            assert th8 % 8 == 0
