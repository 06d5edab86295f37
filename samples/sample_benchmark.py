"""Benchmark CLI mirroring the reference's sample_benchmark
(samples/sample_benchmark.cpp:27-37 CLI keys).

    python samples/sample_benchmark.py [image] --benchmark-type {0,1,2}
        0: detect-and-compute   1: detect-only   2: compute-only
"""
import argparse
import time

import numpy as np

from sample_common import load_gray, descriptor_type


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("image", nargs="?", default=None)
    ap.add_argument("--max-keypoints", type=int, default=10000)
    ap.add_argument("--fast-threshold", type=int, default=20)
    ap.add_argument("--num-levels", type=int, default=8)
    ap.add_argument("--nonmax-radius", type=int, default=15)
    ap.add_argument("--descriptor-type", type=int, default=0)
    ap.add_argument("--descriptor-bits", type=int, default=256)
    ap.add_argument("--benchmark-type", type=int, default=0)
    ap.add_argument("--num-iterations", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from efficient_features_tpu import EfficientFeatures, pipeline as P

    img = load_gray(args.image)
    dtype = descriptor_type(args.descriptor_type, args.descriptor_bits)
    feat = EfficientFeatures(
        nfeatures=args.max_keypoints, nlevels=args.num_levels,
        fast_threshold=args.fast_threshold, nonmax_radius=args.nonmax_radius,
        descriptor_type=dtype)
    cfg = feat._cfg
    img_j = jnp.asarray(img)

    def read(out):
        np.asarray(jax.tree_util.tree_leaves(out)[0])

    names = ["detect-and-compute", "detect-only", "compute-only"]
    print("=== configuration ===")
    print(f"image size      : {img.shape[1]}x{img.shape[0]}")
    print(f"descriptor type : {dtype}")
    print(f"max keypoints   : {args.max_keypoints}")
    print(f"num levels      : {args.num_levels}")
    print(f"benchmark type  : {names[args.benchmark_type]}")

    if args.benchmark_type == 0:
        fn = lambda: P.detect_and_compute_jit(img_j, cfg)
    elif args.benchmark_type == 1:
        fn = lambda: P.detect_jit(img_j, cfg)
    else:
        # the reference's compute-only protocol: detector keypoints
        # (sample_benchmark.cpp:125-133).  Multi-octave sizes (up to
        # 31*1.2^7 ~ 111 at 8 levels) route through the octave-bucketed
        # window path; KeyPoints input keeps everything device-resident.
        kps = feat.detect(img)
        fn = lambda: feat.compute_async(img_j, kps)

    read(fn())  # warmup / compile (excluded, like the reference's iter 0)
    t0 = time.perf_counter()
    for _ in range(args.num_iterations):
        out = fn()
    read(out)
    ms = (time.perf_counter() - t0) * 1e3 / args.num_iterations

    kps = feat.detect(img)
    print(f"{kps.count} keypoints found.")
    print(f"processing time: {ms:.1f}[milli sec]")


if __name__ == "__main__":
    main()
