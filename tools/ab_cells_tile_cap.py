"""Same-session A/B: cells-kernel tile-height cap 128 (shipped) vs 192/256.

Taller tiles amortize the 24-row vertical halo (2*24/128 = 37% extra DMA
rows at cap 128 vs 19% at 256) and the per-tile issue cost, at the price
of larger live VMEM temporaries.  The knob is EFF_TPU_CELLS_TILE_CAP,
read at trace time inside _tile_dims; this script forces per-cap retraces
with fresh jax.jit instances so one process measures all caps on the same
share (CLAUDE.md protocol: one-element read, >= 16 queued dispatches,
interleaved passes).  Run on the real TPU chip.
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
    images = {k: jnp.asarray(make_bench_image(*hw)) for k, hw in sizes.items()}
    raw = PK.fast_harris_nms_cells.__wrapped__

    cases = {}
    ref_out = {}
    for cap in (128, 192, 256):
        os.environ["EFF_TPU_CELLS_TILE_CAP"] = str(cap)
        for k, (h, w) in sizes.items():
            g = jax.jit(raw, static_argnums=(1, 2, 4))
            t0 = time.perf_counter()
            out = g(images[k], 20, 15, None, None)   # traces with env set
            read(out)
            print(f"cap{cap} {k}: tile={PK._tile_dims(h, w, 64)} "
                  f"compiled in {time.perf_counter() - t0:.1f}s",
                  file=sys.stderr)
            # parity: the valid cell region must be bit-identical across
            # tilings (cellrow carries GLOBAL rows, so crops compare raw)
            ch = -(-h // 8)
            crop = tuple(np.asarray(o[:ch, :w]) for o in out)
            if (k, "ref") not in ref_out:
                ref_out[(k, "ref")] = crop
            else:
                for name, a, b in zip(("max", "row", "cnt"),
                                      ref_out[(k, "ref")], crop):
                    bad = int((a != b).sum())
                    assert bad == 0, (cap, k, name, bad)
                print(f"cap{cap} {k}: bit-identical to cap128",
                      file=sys.stderr)
            cases[f"cells_{k}_cap{cap}"] = (
                lambda g=g, im=images[k]: g(im, 20, 15, None, None))
    del ref_out
    os.environ.pop("EFF_TPU_CELLS_TILE_CAP", None)

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
