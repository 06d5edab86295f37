"""Same-session A/B: cells-kernel horizontal box7 on the VPU (shipped
slice+add chain) vs the MXU (banded one-hot bf16 matmuls, 3-limb base-256
decomposition — pallas_kernels._box7_mxu).

The round-4 verdict's structural question: detect is VPU-bound while the
MXU idles, and exact horizontal stencils CAN ride banded matmuls — does
moving the box7 horizontal passes there break the vector-pass floor?  The
op-count model says the exactness limb tax (~21 added vector passes per
channel vs ~13 removed) makes it a tie-to-loss; this script is the
required on-chip measurement.  Protocol: one process, interleaved passes,
one-element reads, >= 16 queued dispatches (CLAUDE.md timing protocol);
bit-identity asserted before timing.  Run on the real TPU chip.
"""
import json
import os
import sys
import time

import numpy as np

here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, here)

import jax
import jax.numpy as jnp

from efficient_features_tpu.utils import compile_cache
compile_cache.setup(os.path.join(here, ".xla_cache"), jax.default_backend())

from efficient_features_tpu.ops import pallas_kernels as PK
from bench import make_bench_image


def read(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf[(0,) * leaf.ndim]))


def time_once(fn, iters=16):
    out = fn()
    read(out)  # warm
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    read(out)
    return (time.perf_counter() - t0) * 1e3 / iters


def main():
    sizes = {"4k": (2160, 3840), "8k": (4320, 7680)}
    images = {k: jnp.asarray(make_bench_image(*hw))
              for k, hw in sizes.items()}

    cases = {}
    for k in sizes:
        ref = None
        for kind in ("vpu", "mxu"):
            t0 = time.perf_counter()
            out = PK.fast_harris_nms_cells(images[k], 20, 15, None, None,
                                           kind)
            read(out)
            print(f"{kind} {k}: compiled in {time.perf_counter() - t0:.1f}s",
                  file=sys.stderr)
            crop = tuple(np.asarray(o) for o in out)
            if ref is None:
                ref = crop
            else:
                for name, a, b in zip(("max", "row", "cnt"), ref, crop):
                    bad = int((a != b).sum())
                    assert bad == 0, (k, name, bad)
                print(f"mxu {k}: bit-identical to vpu", file=sys.stderr)
            cases[f"cells_{k}_box7_{kind}"] = (
                lambda im=images[k], kind=kind:
                    PK.fast_harris_nms_cells(im, 20, 15, None, None, kind))

    results = {key: [] for key in cases}
    for p in range(3):
        for key, fn in cases.items():
            results[key].append(round(time_once(fn), 2))
            print(f"pass {p} {key}: {results[key][-1]} ms", file=sys.stderr)
    out = {key: min(v) for key, v in results.items()}
    out["passes"] = results
    print(json.dumps(out))


if __name__ == "__main__":
    main()
