"""HPatches descriptor exporter (samples/hpatches_description.cpp).

Reads HPatches patch-column images (65x65 patches stacked vertically,
hpatches_description.cpp:231-242), synthesizes one centered keypoint per
patch, computes BAD/HashSIFT descriptors and writes CSV bit rows
(hpatches_description.cpp:76-105) for the public hpatches-benchmark.

    python samples/hpatches_description.py <hpatches_seq_dir> <out_dir>
        [--descriptor-type N] [--descriptor-bits N] [--use-orientation]
"""
import argparse
import os
import glob

import numpy as np

from sample_common import load_gray

PATCH = 65


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("input_dir")
    ap.add_argument("output_dir")
    ap.add_argument("--descriptor-type", type=int, default=0)
    ap.add_argument("--descriptor-bits", type=int, default=256)
    ap.add_argument("--cropping-scale", type=float, default=1.0)
    ap.add_argument("--use-orientation", action="store_true",
                    help="estimate IC-angle per patch (the reference's "
                         "optional CPU ICAngles path, "
                         "hpatches_description.cpp:107-162)")
    args = ap.parse_args()

    from efficient_features_tpu import BAD, HashSIFT
    from efficient_features_tpu.cpu.reference import ic_angles

    cls = [BAD, HashSIFT][args.descriptor_type]
    extractor = cls(args.cropping_scale, args.descriptor_bits)
    name = f"{cls.__name__.lower()}{args.descriptor_bits}"

    seqs = sorted(d for d in glob.glob(os.path.join(args.input_dir, "*"))
                  if os.path.isdir(d))
    if not seqs:
        raise SystemExit(f"no sequence dirs under {args.input_dir}")

    for seq in seqs:
        seq_name = os.path.basename(seq)
        out_seq = os.path.join(args.output_dir, name, seq_name)
        os.makedirs(out_seq, exist_ok=True)
        for png in sorted(glob.glob(os.path.join(seq, "*.png"))):
            img = load_gray(png)
            npatch = img.shape[0] // PATCH
            # keypoint per patch: centered, sized to cover the 65px patch
            x = np.full(npatch, (PATCH - 1) / 2.0, np.float32)
            y = (np.arange(npatch) * PATCH + (PATCH - 1) / 2.0
                 ).astype(np.float32)
            size = np.full(npatch, PATCH / max(args.cropping_scale, 1e-6),
                           np.float32)
            if args.use_orientation:
                angle = ic_angles(img, np.clip(y.astype(np.int32), 15,
                                               img.shape[0] - 16),
                                  np.clip(x.astype(np.int32), 15,
                                          img.shape[1] - 16))
            else:
                angle = np.full(npatch, -1.0, np.float32)

            desc = extractor.compute(img, np.stack([x, y, size, angle], 1))
            bits = np.unpackbits(desc, axis=1)
            out_csv = os.path.join(
                out_seq, os.path.basename(png).replace(".png", f".{name}.csv"))
            np.savetxt(out_csv, bits, fmt="%d", delimiter=",")
            print(f"{out_csv}: {npatch} patches")


if __name__ == "__main__":
    main()
