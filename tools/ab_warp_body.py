"""Same-session A/B: warp kernel body "select" (full-height row-index
wheres) vs "split" (per-half builds, hoisted invariant iotas).

The standalone warp is ~70% of the HashSIFT pipeline (round-3.5 honest
split: warp 26.8 of 46.6 at 40k), and SOL.md's corrected model says its
bound is the per-pair full-tile vector passes — exactly what the split
body trims IF Mosaic was not already CSE-ing the invariant builds.

Protocol: one-element host read, >= 16 queued dispatches per window,
interleaved passes (CLAUDE.md timing gotchas).  Run on the real TPU chip.
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

from efficient_features_tpu.ops import window_kernels as WK
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
    img = jnp.asarray(make_bench_image(2160, 3840))
    rng = np.random.default_rng(1)
    n = 40960
    x = rng.uniform(40, 3800, n).astype(np.float32)
    y = rng.uniform(40, 2120, n).astype(np.float32)
    size = np.full(n, 31.0, np.float32)
    angle = rng.uniform(0, 360, n).astype(np.float32)
    valid = np.ones(n, bool)
    args = [jnp.asarray(a) for a in (x, y, size, angle, valid)]

    # Mosaic smoke compile at a tiny grid first
    t0 = time.perf_counter()
    tiny = np.asarray(WK.warp_patches_windows(
        img, *(a[:256] for a in args[:4]), args[4][:256], 1.0,
        body_kind="split"))
    print(f"split tiny-compile ok in {time.perf_counter()-t0:.1f}s, "
          f"sum={int(tiny.sum())}", file=sys.stderr)

    cases = {
        body: (lambda body=body: WK.warp_patches_windows(
            img, *args, 1.0, body_kind=body))
        for body in ("select", "split")
    }

    # on-chip parity first (the bodies are bit-identical by construction)
    a = np.asarray(cases["select"]())
    b = np.asarray(cases["split"]())
    diff = int((a != b).sum())
    print(f"on-chip select-vs-split differing bytes: {diff}",
          file=sys.stderr)
    assert diff == 0, diff

    results = {k: [] for k in cases}
    for p in range(3):
        for k, fn in cases.items():
            results[k].append(round(time_once(fn), 2))
            print(f"pass {p} warp40k_{k}: {results[k][-1]} ms",
                  file=sys.stderr)
    out = {k: min(v) for k, v in results.items()}
    out["passes"] = results
    print(json.dumps(out))


if __name__ == "__main__":
    main()
