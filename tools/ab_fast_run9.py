"""Same-session A/B: FAST-9 corner test — dual-field log-doubled rotate-AND
("log", round-5) vs the two-mask 8-step rotate chain ("chain", rounds 1-4).

The segment test is ~60% of the cells kernel's full-tile vector passes
(~225 of ~380); the log form removes ~55 of them bit-exactly.  Protocol:
one-element read, >= 16 queued dispatches, interleaved passes, per-variant
fresh jax.jit so one process measures both on the same share (the
EFF_TPU_FAST_RUN9 knob is read at trace time).  Run on the real TPU chip.
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
    for variant in ("chain", "log"):
        if variant == "chain":
            os.environ["EFF_TPU_FAST_RUN9"] = "chain"
        else:
            os.environ.pop("EFF_TPU_FAST_RUN9", None)
        for k in sizes:
            g = jax.jit(raw, static_argnums=(1, 2, 4))
            t0 = time.perf_counter()
            out = g(images[k], 20, 15, None, None)
            read(out)
            print(f"{variant} {k}: compiled in {time.perf_counter()-t0:.1f}s",
                  file=sys.stderr)
            crop = tuple(np.asarray(o) for o in out)
            if (k,) not in ref_out:
                ref_out[(k,)] = crop
            else:
                for name, a, b in zip(("max", "row", "cnt"),
                                      ref_out[(k,)], crop):
                    bad = int((a != b).sum())
                    assert bad == 0, (variant, k, name, bad)
                print(f"{variant} {k}: bit-identical to chain",
                      file=sys.stderr)
            cases[f"cells_{k}_{variant}"] = (
                lambda g=g, im=images[k]: g(im, 20, 15, None, None))
    del ref_out

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
