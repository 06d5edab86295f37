"""Extract the learned descriptor constants from the reference headers into .npz assets.

The reference bakes learned parameters into C headers:
  - BAD box pairs + thresholds:
      /root/reference/modules/cuda_efficient_features/src/bad.p256.h:27,94
      /root/reference/modules/cuda_efficient_features/src/bad.p512.h:209,340
  - HashSIFT projection matrices (row-major, nbits x 129, float64):
      /root/reference/modules/cuda_efficient_features/src/hash_sift.p256.h:22
      /root/reference/modules/cuda_efficient_features/src/hash_sift.p512.h:22

These are *data* (learned constants from Suarez et al., RA-L 2021), not code. We
re-serialize the identical values as NumPy archives so the TPU framework can load
them without a C toolchain. BoxPairParams struct field order is {x1, x2, y1, y2,
boxRadius} (cuda_bad_internal.h:33-36).

Run once: python tools/extract_params.py
"""
import re
import numpy as np
from pathlib import Path

REF = Path("/root/reference/modules/cuda_efficient_features/src")
OUT = Path(__file__).resolve().parent.parent / "efficient_features_tpu" / "assets"


def parse_bad(path: Path, nbits: int):
    text = path.read_text()
    # box pairs: { x1, x2, y1, y2, boxRadius }, ...
    m = re.search(
        r"box_pair_params_%d\[\]\s*=\s*\{(.*?)\};" % nbits, text, re.S)
    body = m.group(1)
    tuples = re.findall(r"\{([^}]*)\}", body)
    boxes = np.array([[int(v) for v in t.split(",")] for t in tuples],
                     dtype=np.int32)
    assert boxes.shape == (nbits, 5), boxes.shape

    m = re.search(r"thresholds_%d\[\]\s*=\s*\{(.*?)\};" % nbits, text, re.S)
    th = np.array([float(v) for v in m.group(1).replace("\n", " ").split(",")
                   if v.strip()], dtype=np.float32)
    assert th.shape == (nbits,), th.shape
    return boxes, th


def parse_hash_sift(path: Path, nbits: int):
    text = path.read_text()
    m = re.search(r"HASH_SIFT_%d_VALS\[\]\s*=\s*\{(.*?)\};" % nbits, text, re.S)
    vals = np.array([float(v) for v in m.group(1).replace("\n", " ").split(",")
                     if v.strip()], dtype=np.float64)
    assert vals.size == nbits * 129, vals.size
    return vals.reshape(nbits, 129)


def main():
    OUT.mkdir(parents=True, exist_ok=True)
    for nbits in (256, 512):
        boxes, th = parse_bad(REF / f"bad.p{nbits}.h", nbits)
        np.savez(OUT / f"bad_p{nbits}.npz", box_pairs=boxes, thresholds=th)
        print(f"bad_p{nbits}: boxes {boxes.shape} th {th.shape} "
              f"first box {boxes[0].tolist()} first th {th[0]}")

        B = parse_hash_sift(REF / f"hash_sift.p{nbits}.h", nbits)
        np.savez(OUT / f"hash_sift_p{nbits}.npz", b_matrix=B)
        print(f"hash_sift_p{nbits}: {B.shape} [0,0]={B[0,0]!r}")


if __name__ == "__main__":
    main()
