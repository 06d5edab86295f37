"""Streaming image-sequence demo (samples/sample_image_sequence.cpp).

Runs detect+compute over a stream of frames with async dispatch (the TPU
analogue of the reference's CUDA-stream pipeline), matching consecutive frames
with a knn ratio test + cross check (sample_image_sequence.cpp:114-144).

    python samples/sample_image_sequence.py [glob-or-dir] [--frames N]
"""
import argparse
import glob
import os
import time

import numpy as np

from sample_common import load_gray, descriptor_type, warp_image


def frame_iter(src, n_frames):
    if src:
        paths = sorted(glob.glob(os.path.join(src, "*"))
                       if os.path.isdir(src) else glob.glob(src))
        for p in paths[:n_frames]:
            yield load_gray(p)
    else:
        base = load_gray(None, 720, 1280, seed=9)
        rng = np.random.default_rng(0)
        for i in range(n_frames):
            yield warp_image(base, angle_deg=2.0 * i,
                             tx=5.0 * i, ty=float(rng.uniform(-3, 3)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("source", nargs="?", default=None)
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--max-keypoints", type=int, default=3000)
    ap.add_argument("--descriptor-type", type=int, default=0)
    ap.add_argument("--descriptor-bits", type=int, default=256)
    ap.add_argument("--max-ratio", type=float, default=0.8)
    args = ap.parse_args()

    from efficient_features_tpu import EfficientFeatures
    from efficient_features_tpu.ops import matcher
    import jax.numpy as jnp

    feat = EfficientFeatures(
        nfeatures=args.max_keypoints,
        descriptor_type=descriptor_type(args.descriptor_type,
                                        args.descriptor_bits))

    # fully device-resident stream: detect+describe+match chain on fixed-
    # capacity slot arrays; the only host transfer per frame is the match
    # count (the reference's CUDA-stream loop needs keypoint downloads)
    prev = None
    t_all = []
    for fi, frame in enumerate(frame_iter(args.source, args.frames)):
        t0 = time.perf_counter()
        kps, desc = feat.detect_and_compute_async(frame)
        valid = kps._slots["valid"]
        if prev is not None:
            pd, pv = prev
            j, dist, ok = matcher.knn2_ratio_match_masked(
                pd, pv, desc, valid, args.max_ratio)
            nmatch = int(np.asarray(ok.sum()))
        else:
            nmatch = 0
        nk = int(np.asarray(kps._slots["count"]))
        dt = time.perf_counter() - t0
        t_all.append(dt)
        print(f"frame {fi}: {nk} kps, {nmatch} matches, {dt*1e3:.1f} ms")
        prev = (desc, valid)

    if len(t_all) > 2:
        steady = np.mean(t_all[2:]) * 1e3
        print(f"steady-state per frame: {steady:.1f} ms "
              f"({1e3/steady:.1f} fps)")


if __name__ == "__main__":
    main()
