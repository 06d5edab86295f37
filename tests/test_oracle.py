"""Unit tests for the CPU oracle against brute-force re-implementations.

The brute-force code here is written loop-style, directly from the reference's
kernel semantics, independent of the vectorized oracle — so a bug in the
oracle's vectorization cannot hide.
"""
import numpy as np
import pytest

from efficient_features_tpu.cpu import reference as R
from efficient_features_tpu.cpu import descriptors as D
from efficient_features_tpu.utils import semantics as S
from efficient_features_tpu.models.params import load_bad_params, load_hash_sift_matrix

from util import make_test_image, make_keypoints

cv2 = pytest.importorskip("cv2", reason="cv2 only used as independent oracle")


# ---------------------------------------------------------------------------
# FAST
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("threshold", [10, 20, 40])
def test_fast_matches_opencv(threshold):
    img = make_test_image(240, 320, seed=3)
    det = cv2.FastFeatureDetector_create(
        threshold=threshold, nonmaxSuppression=False,
        type=cv2.FastFeatureDetector_TYPE_9_16)
    cvset = {(int(k.pt[1]), int(k.pt[0])) for k in det.detect(img)}
    mask = R.fast_corner_mask(img, threshold)
    myset = set(zip(*map(lambda a: a.tolist(), np.nonzero(mask))))
    assert myset == cvset


# ---------------------------------------------------------------------------
# Harris (integer form) vs float brute force
# ---------------------------------------------------------------------------

def brute_harris_float(img, y0, x0):
    """Direct transcription of calcResponse (cuda_efficient_features.cu:99-139)."""
    SCALE = np.float32(1.0 / (4 * 7 * 255))
    sxx = syy = sxy = np.float32(0)
    a = img.astype(np.int64)
    for iy in range(-3, 4):
        for ix in range(-3, 4):
            x, y = x0 + ix, y0 + iy
            dxv = ((a[y - 1, x + 1] + 2 * a[y, x + 1] + a[y + 1, x + 1])
                   - (a[y - 1, x - 1] + 2 * a[y, x - 1] + a[y + 1, x - 1]))
            dyv = ((a[y + 1, x - 1] + 2 * a[y + 1, x] + a[y + 1, x + 1])
                   - (a[y - 1, x - 1] + 2 * a[y - 1, x] + a[y - 1, x + 1]))
            fdx = SCALE * np.float32(dxv)
            fdy = SCALE * np.float32(dyv)
            sxx += fdx * fdx
            sxy += fdx * fdy
            syy += fdy * fdy
    det = sxx * syy - sxy * sxy
    tr = sxx + syy
    return float(det - np.float32(S.HARRIS_K) * tr * tr)


def test_harris_matches_reference_float():
    img = make_test_image(120, 160, seed=4)
    resp = R.harris_response(img)
    rng = np.random.default_rng(0)
    pts = [(int(rng.integers(16, 104)), int(rng.integers(16, 144)))
           for _ in range(50)]
    mine = np.array([resp[y, x] for y, x in pts], dtype=np.float64)
    ref = np.array([brute_harris_float(img, y, x) for y, x in pts])
    # ours quantizes tensor entries to 12-bit significands (semantics
    # deviation 4) and scales integer sums once; the reference accumulates
    # scaled floats per-term — values agree to the quantization level
    # cancellation in det amplifies the quantization slightly; 1% is the
    # documented ranking granularity
    np.testing.assert_allclose(mine, ref, rtol=1e-2, atol=1e-9)


# ---------------------------------------------------------------------------
# Radius NMS vs brute force
# ---------------------------------------------------------------------------

def brute_nms(resp, corner, radius):
    r2 = int(np.ceil(radius * radius))
    h, w = resp.shape
    out = np.zeros_like(corner)
    ys, xs = np.nonzero(corner)
    pts = list(zip(ys.tolist(), xs.tolist()))
    for y, x in pts:
        ok = True
        for y2, x2 in pts:
            if (y2, x2) == (y, x):
                continue
            if (y2 - y) ** 2 + (x2 - x) ** 2 < r2 and resp[y2, x2] > resp[y, x]:
                ok = False
                break
        out[y, x] = ok
    return out


@pytest.mark.parametrize("radius", [3, 7, 15])
def test_radius_nms_matches_bruteforce(radius):
    img = make_test_image(120, 160, seed=5)
    corner = R.fast_corner_mask(img, 20)
    resp = R.harris_response(img)
    fast = R.radius_nms(resp, corner, radius)
    brute = brute_nms(np.where(corner, resp, R.RESP_SENTINEL), corner, radius)
    assert np.array_equal(fast, brute)


def test_radius_nms_ties_cosurvive():
    resp = np.full((40, 40), R.RESP_SENTINEL, dtype=np.float32)
    corner = np.zeros((40, 40), bool)
    for y, x in [(10, 10), (10, 20), (30, 30)]:
        corner[y, x] = True
        resp[y, x] = 100.0
    surv = R.radius_nms(resp, corner, 15)
    # (10,10) and (10,20) are 10px apart with equal response: both survive
    assert surv[10, 10] and surv[10, 20] and surv[30, 30]


# ---------------------------------------------------------------------------
# IC-angle vs brute force (direct transcription of IC_Angle)
# ---------------------------------------------------------------------------

def brute_ic_angle(img, y, x):
    a = img.astype(np.int64)
    m01 = m10 = 0
    for dx in range(-15, 16):
        m10 += dx * a[y, x + dx]
    for dy in range(1, 16):
        d = int(S.U_MAX[dy])
        ysum = 0
        for dx in range(-d, d + 1):
            vT = a[y - dy, x + dx]
            vB = a[y + dy, x + dx]
            ysum += vB - vT
            m10 += dx * (vB + vT)
        m01 += dy * ysum
    ang = np.arctan2(np.float32(m01), np.float32(m10))
    if ang < 0:
        ang += np.float32(2 * np.pi)
    return np.float32(180.0 / np.pi) * ang


def test_ic_angle_matches_bruteforce():
    img = make_test_image(100, 120, seed=6)
    rng = np.random.default_rng(1)
    ys = rng.integers(16, 84, 30).astype(np.int32)
    xs = rng.integers(16, 104, 30).astype(np.int32)
    mine = R.ic_angles(img, ys, xs)
    ref = np.array([brute_ic_angle(img, int(y), int(x)) for y, x in zip(ys, xs)])
    np.testing.assert_allclose(mine, ref, atol=1e-3)


# ---------------------------------------------------------------------------
# Host math: quotas, pyramid shapes
# ---------------------------------------------------------------------------

def test_features_per_level_matches_reference_math():
    # transcription of calcNumFeaturesPerLevel (cuda_efficient_features.cpp:159-174)
    total, sf, nl = 5000, 1.2, 8
    factor = 1 / sf
    n = total * (1 - factor) / (1 - factor ** nl)
    expect, acc = [], 0
    for _ in range(nl - 1):
        q = int(np.rint(n))
        expect.append(q)
        acc += q
        n *= factor
    expect.append(max(total - acc, 0))
    assert S.features_per_level(total, sf, nl) == expect
    assert sum(S.features_per_level(total, sf, nl)) == total


def test_pyramid_shapes_shrink():
    shapes = S.pyramid_shapes(1080, 1920, 1.2, 8)
    assert shapes[0] == (1080, 1920)
    for (h1, w1), (h2, w2) in zip(shapes, shapes[1:]):
        assert h2 < h1 and w2 < w1


# ---------------------------------------------------------------------------
# BAD vs brute force
# ---------------------------------------------------------------------------

def brute_bad_bit(img, integral, kp, box, th, scale_factor=1.0):
    """Direct transcription of computeBADKernel (cuda_bad.cu:246-316)."""
    x, y, size, angle = kp
    fh, fw = integral.shape
    s = np.float32(scale_factor) * np.float32(size) / np.float32(32.0)
    if angle >= 0:
        cost = np.float32(np.cos(np.float32(angle) * D.DEG2RAD))
        sint = np.float32(np.sin(np.float32(angle) * D.DEG2RAD))
    else:
        cost, sint = np.float32(1), np.float32(0)
    m00, m01 = s * cost, -s * sint
    m02 = (-s * cost + s * sint) * np.float32(16) + np.float32(x)
    m10, m11 = s * sint, s * cost
    m12 = (-s * sint - s * cost) * np.float32(16) + np.float32(y)

    def rnd(v):
        return int(np.trunc(v + np.float32(0.5)))

    bx1, bx2, by1, by2, br = box
    tx1 = rnd(m00 * bx1 + m01 * by1 + m02)
    ty1 = rnd(m10 * bx1 + m11 * by1 + m12)
    tx2 = rnd(m00 * bx2 + m01 * by2 + m02)
    ty2 = rnd(m10 * bx2 + m11 * by2 + m12)
    tbr = rnd(s * np.float32(br))

    sb = np.float32(scale_factor) * np.float32(size) / np.float32(64.0)
    bw = np.float32(32) * sb * np.float32(1.75)
    in_border = (x < bw or x + bw >= fw - 1 or y < bw or y + bw >= fh - 1)

    ii = integral.astype(np.int64)
    if in_border:
        # our documented semantics: division-free cross-multiplied compare
        # (equivalent to the reference's avg1-avg2 <= th up to the division
        # rounding; see cpu.descriptors.bad_descriptors)
        def sum_area(cx, cy):
            x1 = min(max(cx - tbr, 0), fw - 2)
            y1 = min(max(cy - tbr, 0), fh - 2)
            x2 = min(max(cx + tbr + 1, 1), fw - 1)
            y2 = min(max(cy + tbr + 1, 1), fh - 1)
            ssum = int(ii[y1, x1] + ii[y2, x2] - ii[y1, x2] - ii[y2, x1])
            return ssum, (y2 - y1) * (x2 - x1)
        s1, a1 = sum_area(tx1, ty1)
        s2, a2 = sum_area(tx2, ty2)
        return np.float32(s1 * a2 - s2 * a1) <= np.float32(th) * np.float32(a1 * a2)
    side = 1 + 2 * tbr
    resp = np.int32(ii[ty1 - tbr, tx1 - tbr] + ii[ty1 + tbr + 1, tx1 + tbr + 1]
                    - ii[ty1 - tbr, tx1 + tbr + 1] - ii[ty1 + tbr + 1, tx1 - tbr]
                    - ii[ty2 - tbr, tx2 - tbr] - ii[ty2 + tbr + 1, tx2 + tbr + 1]
                    + ii[ty2 - tbr, tx2 + tbr + 1] + ii[ty2 + tbr + 1, tx2 - tbr])
    return np.float32(resp) <= np.float32(th) * np.float32(side * side)


@pytest.mark.parametrize("nbits", [256, 512])
def test_bad_matches_bruteforce(nbits):
    img = make_test_image(200, 260, seed=7)
    integral = R.integral_image_i32(img)
    boxes, ths = load_bad_params(nbits)
    # include border keypoints on purpose
    x, y, size, angle = make_keypoints(200, 260, 20, seed=2)
    x[:4] = [2, 255, 10, 130]
    y[:4] = [3, 5, 190, 2]
    desc = D.bad_descriptors(img, x, y, size, angle, nbits=nbits)
    for i in range(len(x)):
        bits = []
        for b in range(nbits):
            bits.append(brute_bad_bit(img, integral,
                                      (x[i], y[i], size[i], angle[i]),
                                      boxes[b].tolist(), float(ths[b])))
        expect = np.packbits(np.array(bits, np.uint8))
        np.testing.assert_array_equal(desc[i], expect)


# ---------------------------------------------------------------------------
# HashSIFT vs brute force (sequential per-pixel transcription)
# ---------------------------------------------------------------------------

def brute_patch_sift(patch):
    """Direct transcription of computePatchSIFT (hash_sift.cpp:200-331)."""
    h = w = 32
    kp_scale = 1.0 / 6
    kp_radius = kp_scale * h * 0.5
    kernel_sigma = 0.5 * 4 * 3.0 * kp_radius
    dist_scale = -1.0 / (2 * kernel_sigma ** 2)
    hist = np.zeros((6, 6, 10), np.float32)
    scale_rc = 1.0 / (3.0 * (kp_scale * h * 0.5))
    scale_o = 8 / (2 * np.pi)
    p = patch.astype(np.float32)
    for yy in range(1, h - 1):
        for xx in range(1, w - 1):
            mag_scale = np.float32(np.exp(np.float32(dist_scale)
                                          * np.float32((xx - 16) ** 2 + (yy - 16) ** 2)))
            dx = p[yy, xx + 1] - p[yy, xx - 1]
            dy = p[yy - 1, xx] - p[yy + 1, xx]
            mag = mag_scale * np.float32(np.sqrt(dx * dx + dy * dy))
            ori = np.float32(np.arctan2(dy, dx))
            rbin = np.float32(scale_rc) * (yy - np.float32(16)) + np.float32(1.5)
            cbin = np.float32(scale_rc) * (xx - np.float32(16)) + np.float32(1.5)
            ri, rf = int(np.floor(rbin)), rbin - np.floor(rbin)
            ci, cf = int(np.floor(cbin)), cbin - np.floor(cbin)
            ob = np.float32(scale_o) * ori
            oi, of = int(np.floor(ob)), ob - np.floor(ob)
            if oi < 0:
                oi += 8
            if oi >= 8:
                oi -= 8
            v1 = rf * mag
            v0 = mag - v1
            v01, v00 = cf * v0, v0 - cf * v0
            v11, v10 = cf * v1, v1 - cf * v1
            for (dr, dc, val) in ((0, 0, v00), (0, 1, v01), (1, 0, v10), (1, 1, v11)):
                vhi = of * val
                vlo = val - vhi
                hist[ri + 1 + dr, ci + 1 + dc, oi] += vlo
                hist[ri + 1 + dr, ci + 1 + dc, oi + 1] += vhi
    core = hist[1:5, 1:5, :].copy()
    core[..., 0] += core[..., 8]
    core[..., 1] += core[..., 9]
    desc = core[..., :8].reshape(128)
    for _ in range(2):
        nrm = max(np.sqrt((desc * desc).sum()), np.finfo(np.float32).eps)
        desc = desc / nrm
        if _ == 0:
            desc = np.minimum(desc, 0.2)
    desc = np.clip(np.trunc(512.0 * desc + 0.5), 0, 255)
    return desc


def test_hash_sift_responses_match_bruteforce():
    img = make_test_image(200, 260, seed=8)
    x, y, size, angle = make_keypoints(200, 260, 5, seed=3)
    patches = D.warp_patches(img, x, y, size, angle, 1.0)
    responses = D.patch_sift_responses(patches)
    for i in range(len(x)):
        expect = brute_patch_sift(patches[i])
        assert responses[i, 0] == 1.0
        np.testing.assert_allclose(responses[i, 1:], expect, atol=1.0)
        # uchar quantization: allow off-by-one from float order, but mostly equal
        assert (responses[i, 1:] != expect).mean() < 0.02


def test_hash_sift_bits_stable():
    img = make_test_image(200, 260, seed=9)
    x, y, size, angle = make_keypoints(200, 260, 50, seed=4)
    d256 = D.hash_sift_descriptors(img, x, y, size, angle, nbits=256)
    d512 = D.hash_sift_descriptors(img, x, y, size, angle, nbits=512)
    assert d256.shape == (50, 32) and d512.shape == (50, 64)
    # deterministic
    again = D.hash_sift_descriptors(img, x, y, size, angle, nbits=256)
    np.testing.assert_array_equal(d256, again)
