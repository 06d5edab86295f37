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

    prev_desc = None
    t_all = []
    for fi, frame in enumerate(frame_iter(args.source, args.frames)):
        t0 = time.perf_counter()
        # async dispatch: detect+compute enqueues immediately; matching of the
        # PREVIOUS frame's descriptors overlaps with this frame's pipeline
        kps, desc = feat.detect_and_compute_async(frame)
        kps.block()
        valid = np.asarray(kps._slots["valid"])
        cur_desc = jnp.asarray(np.asarray(desc)[valid])
        if prev_desc is not None and prev_desc.shape[0] and cur_desc.shape[0]:
            j, dist, ok = matcher.knn2_ratio_match(prev_desc, cur_desc,
                                                   args.max_ratio)
            nmatch = int(np.asarray(ok).sum())
        else:
            nmatch = 0
        dt = time.perf_counter() - t0
        t_all.append(dt)
        print(f"frame {fi}: {len(kps)} kps, {nmatch} matches, "
              f"{dt*1e3:.1f} ms")
        prev_desc = cur_desc

    if len(t_all) > 2:
        steady = np.mean(t_all[2:]) * 1e3
        print(f"steady-state per frame: {steady:.1f} ms "
              f"({1e3/steady:.1f} fps)")


if __name__ == "__main__":
    main()
