"""Feature extraction demo (samples/sample_feature_extraction.cpp).

Detects keypoints and computes descriptors, comparing the sync and async
paths; draws keypoints if cv2 is available.

    python samples/sample_feature_extraction.py [image] [--descriptor-type N]
           [--descriptor-bits N] [--max-keypoints N] [--out out.png]
"""
import argparse
import time

import numpy as np

from sample_common import load_gray, descriptor_type


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("image", nargs="?", default=None)
    ap.add_argument("--max-keypoints", type=int, default=10000)
    ap.add_argument("--descriptor-type", type=int, default=0,
                    help="0:BAD 1:HashSIFT")
    ap.add_argument("--descriptor-bits", type=int, default=256)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from efficient_features_tpu import EfficientFeatures

    img = load_gray(args.image)
    feat = EfficientFeatures(
        nfeatures=args.max_keypoints,
        descriptor_type=descriptor_type(args.descriptor_type,
                                        args.descriptor_bits))

    # sync path
    t0 = time.perf_counter()
    kps, desc = feat.detect_and_compute(img)
    t_sync = time.perf_counter() - t0

    # async path: dispatch returns immediately, block explicitly
    t0 = time.perf_counter()
    kps2, desc2 = feat.detect_and_compute_async(img)
    t_dispatch = time.perf_counter() - t0
    kps2.block()
    t_async = time.perf_counter() - t0

    print(f"image {img.shape[1]}x{img.shape[0]}: {kps.count} keypoints, "
          f"descriptors {desc.shape}")
    print(f"sync {t_sync*1e3:.1f} ms | async dispatch {t_dispatch*1e3:.1f} ms,"
          f" total {t_async*1e3:.1f} ms")
    h = kps.as_arrays()
    print("first keypoints:",
          [(round(float(x), 1), round(float(y), 1), int(o))
           for x, y, o in zip(h["x"][:5], h["y"][:5], h["octave"][:5])])

    if args.out:
        try:
            import cv2
            vis = cv2.drawKeypoints(
                cv2.cvtColor(img, cv2.COLOR_GRAY2BGR), kps.cv_keypoints(),
                None, flags=cv2.DRAW_MATCHES_FLAGS_DRAW_RICH_KEYPOINTS)
            cv2.imwrite(args.out, vis)
            print("wrote", args.out)
        except ImportError:
            print("cv2 unavailable; skipping drawing")


if __name__ == "__main__":
    main()
