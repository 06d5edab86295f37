"""Matching-quality evaluation over the committed real fixtures.

The reference delegates descriptor-quality evaluation to the external
hpatches-benchmark (via samples/hpatches_description.cpp CSV export,
/root/reference/README.md:112); this tool is the in-repo analogue: for
each committed fixture it synthesizes a view pair under a KNOWN
homography, runs the full detect+describe+match pipeline, and reports

  - repeatability: fraction of view-1 keypoints whose ground-truth
    projection has a view-2 keypoint within `eps` px (both sides capped
    at the same detector quota),
  - inlier rate: fraction of cross-checked Hamming matches consistent
    with the ground-truth homography within `eps` px,
  - match count / keypoint counts.

Numbers are recorded in tools/EVAL.json so descriptor usefulness (not
just CPU<->TPU byte parity) is a committed, re-runnable artifact.

    python tools/eval_matching.py [--backend cpu] [--out tools/EVAL.json]

Works on any backend; the CPU path is what the test tier runs.
"""
import argparse
import json
import os
import sys

import numpy as np

here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, here)

FIXTURES = ("real_montage", "real_photo", "real_hitex",
            "real_lowtex", "real_saturated")

# real_lowtex has no corner passing the default FAST threshold 20
# (tests/test_realimages.py detects it at threshold 2)
FIXTURE_THRESHOLD = {"real_lowtex": 2}

# One rigid-ish and one projective view change per pair (hpatches has
# "viewpoint" sequences; two Hs keep the tool fast while exercising both
# a pure rotation+shift and a perspective tilt).
def _homographies(w, h):
    cx, cy = w / 2.0, h / 2.0
    th = np.deg2rad(8.0)
    c, s = np.cos(th), np.sin(th)
    # rotate 8 deg about center, shift (12, -7), scale 1.05
    T1 = np.array([[1, 0, cx], [0, 1, cy], [0, 0, 1.0]])
    R = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]]) * 1.0
    S = np.diag([1.05, 1.05, 1.0])
    T0 = np.array([[1, 0, -cx], [0, 1, -cy], [0, 0, 1.0]])
    D = np.array([[1, 0, 12.0], [0, 1, -7.0], [0, 0, 1.0]])
    H_rigid = D @ T1 @ R @ S @ T0
    # mild perspective tilt
    H_proj = np.array([[1.02, 0.03, 5.0],
                       [-0.02, 0.98, 3.0],
                       [4e-5, -3e-5, 1.0]])
    return {"rigid": H_rigid, "proj": H_proj}


def apply_homography(img: np.ndarray, H: np.ndarray) -> np.ndarray:
    """Bilinear inverse-map warp of a u8 image under forward homography H
    (dst(x2) = src(H^-1 x2)); out-of-bounds samples clamp to the border."""
    h, w = img.shape
    Hi = np.linalg.inv(H)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    d = Hi[2, 0] * xx + Hi[2, 1] * yy + Hi[2, 2]
    sx = (Hi[0, 0] * xx + Hi[0, 1] * yy + Hi[0, 2]) / d
    sy = (Hi[1, 0] * xx + Hi[1, 1] * yy + Hi[1, 2]) / d
    x0 = np.clip(np.floor(sx).astype(int), 0, w - 2)
    y0 = np.clip(np.floor(sy).astype(int), 0, h - 2)
    fx = np.clip(sx - x0, 0.0, 1.0)
    fy = np.clip(sy - y0, 0.0, 1.0)
    f = img.astype(np.float64)
    v = ((1 - fy) * ((1 - fx) * f[y0, x0] + fx * f[y0, x0 + 1])
         + fy * ((1 - fx) * f[y0 + 1, x0] + fx * f[y0 + 1, x0 + 1]))
    return np.clip(np.round(v), 0, 255).astype(np.uint8)


def project(H: np.ndarray, x: np.ndarray, y: np.ndarray):
    d = H[2, 0] * x + H[2, 1] * y + H[2, 2]
    return ((H[0, 0] * x + H[0, 1] * y + H[0, 2]) / d,
            (H[1, 0] * x + H[1, 1] * y + H[1, 2]) / d)


def _host_xy(kps):
    s = kps._slots
    valid = np.asarray(s["valid"])
    return np.asarray(s["x"])[valid], np.asarray(s["y"])[valid]


def evaluate_pair(img1: np.ndarray, H: np.ndarray, *, nfeatures=2000,
                  descriptor_type="bad_256", eps=3.0, threshold=20):
    """Detect+describe both views of the pair (img1, warp(img1, H)) and
    return the metric dict.  Keypoints whose projection leaves the second
    view (15 px border margin) are excluded from repeatability."""
    from efficient_features_tpu import EfficientFeatures
    from efficient_features_tpu.ops import matcher

    img2 = apply_homography(img1, H)
    h, w = img1.shape
    feat = EfficientFeatures(nfeatures=nfeatures, fast_threshold=threshold,
                             descriptor_type=descriptor_type)
    kps1, d1 = feat.detect_and_compute(img1)
    kps2, d2 = feat.detect_and_compute(img2)
    x1, y1 = _host_xy(kps1)
    x2, y2 = _host_xy(kps2)
    if len(x1) == 0 or len(x2) == 0:
        return {"n_kp1": int(len(x1)), "n_kp2": int(len(x2)),
                "n_proj_in_bounds": 0, "repeatability": 0.0,
                "n_matches": 0, "inlier_rate": 0.0}

    px, py = project(H, x1, y1)
    m = 15.0
    inb = (px >= m) & (px < w - m) & (py >= m) & (py < h - m)

    # repeatability: nearest view-2 keypoint within eps of the projection
    if inb.sum() and len(x2):
        dx = px[inb, None] - x2[None, :]
        dy = py[inb, None] - y2[None, :]
        nearest = np.sqrt((dx * dx + dy * dy).min(axis=1))
        repeatability = float((nearest <= eps).mean())
    else:
        repeatability = 0.0

    # cross-checked Hamming matches -> ground-truth residuals
    import jax.numpy as jnp
    j, _dist, valid_m = (np.asarray(a) for a in matcher.match(
        jnp.asarray(d1), jnp.asarray(d2), cross_check=True))
    i1 = np.nonzero(valid_m)[0]
    i2 = j[valid_m]
    mx, my = project(H, x1[i1], y1[i1])
    resid = np.sqrt((mx - x2[i2]) ** 2 + (my - y2[i2]) ** 2)
    # only score matches whose ground truth lands in view 2 at all
    scoreable = ((mx >= 0) & (mx < w) & (my >= 0) & (my < h))
    n_matches = int(scoreable.sum())
    inlier_rate = float((resid[scoreable] <= eps).mean()) if n_matches else 0.0

    return {
        "n_kp1": int(len(x1)), "n_kp2": int(len(x2)),
        "n_proj_in_bounds": int(inb.sum()),
        "repeatability": round(repeatability, 4),
        "n_matches": n_matches,
        "inlier_rate": round(inlier_rate, 4),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--backend", default=None,
                    help="jax platform override (e.g. cpu)")
    ap.add_argument("--nfeatures", type=int, default=2000)
    ap.add_argument("--eps", type=float, default=3.0)
    ap.add_argument("--out", default=os.path.join(here, "tools", "EVAL.json"))
    args = ap.parse_args()

    if args.backend:
        import jax
        jax.config.update("jax_platforms", args.backend)

    from PIL import Image

    rows = {}
    for name in FIXTURES:
        img1 = np.asarray(Image.open(
            os.path.join(here, "tests", "data", name + ".png")))
        hs = _homographies(img1.shape[1], img1.shape[0])
        for hname, H in hs.items():
            for dt in ("bad_256", "hash_sift_256"):
                key = f"{name}.{hname}.{dt}"
                rows[key] = evaluate_pair(
                    img1, H, nfeatures=args.nfeatures, descriptor_type=dt,
                    eps=args.eps,
                    threshold=FIXTURE_THRESHOLD.get(name, 20))
                print(key, rows[key], file=sys.stderr)

    def mean(metric, sel):
        vals = [v[metric] for k, v in rows.items() if sel in k]
        return round(float(np.mean(vals)), 4)

    summary = {
        "repeatability_mean": mean("repeatability", "."),
        "bad256_inlier_rate_mean": mean("inlier_rate", ".bad_256"),
        "hash_sift256_inlier_rate_mean": mean("inlier_rate", ".hash_sift_256"),
        "config": {"nfeatures": args.nfeatures, "eps_px": args.eps,
                   "fast_threshold": 20,
                   "pairs": "rigid(8deg,1.05x,+12,-7) + projective tilt"},
    }
    out = {"summary": summary, "rows": rows}
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
