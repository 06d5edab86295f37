"""Same-session A/B: BAD window-kernel formulations "roll" / "noroll" /
"pair".

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

    # Mosaic smoke test first: compile the new kernels at a tiny grid
    # before committing to the 40k compiles (a pathological compile should
    # surface here, cheaply)
    for form in ("noroll", "pair"):
        t0 = time.perf_counter()
        tiny = np.asarray(WK.bad_descriptors_windows(
            img, *(a[:256] for a in args[:4]), args[4][:256], 256, 1.0,
            formulation=form))
        print(f"{form} tiny-compile ok in {time.perf_counter()-t0:.1f}s, "
              f"sum={int(tiny.sum())}", file=sys.stderr)

    cases = {}
    for nbits in (256, 512):
        for form in ("roll", "noroll", "pair"):
            cases[f"bad{nbits}_{form}"] = (
                lambda nbits=nbits, form=form: WK.bad_descriptors_windows(
                    img, *args, nbits, 1.0, formulation=form))

    # parity check on chip first (exactness contract: identical bytes up to
    # the trig-ULP budget; angles are arbitrary so allow the 2e-5 budget)
    a = np.asarray(cases["bad256_roll"]())
    for other in ("noroll", "pair"):
        b = np.asarray(cases[f"bad256_{other}"]())
        diff = int((a != b).sum())
        budget = int(2e-5 * a.size) + 1
        print(f"on-chip roll-vs-{other} differing bytes: {diff} "
              f"(budget {budget})", file=sys.stderr)
        assert diff <= budget, (other, diff, budget)

    # bucket-geometry compile + parity on chip (wide-box branch, s_max > 3.2;
    # Mosaic shapes the interpret-mode CPU tests cannot validate)
    nb = 2048
    xb = jnp.asarray(rng.uniform(300, 3500, nb).astype(np.float32))
    yb = jnp.asarray(rng.uniform(300, 1800, nb).astype(np.float32))
    szb = jnp.asarray(rng.uniform(100.0, 150.0, nb).astype(np.float32))
    anb = jnp.asarray(rng.uniform(-1, 360, nb).astype(np.float32))
    vb = jnp.ones(nb, bool)
    s_max = WK.bucket_scale(float(150.0 / 32.0))
    wide = {}
    for form in ("roll", "noroll", "pair"):
        wide[form] = np.asarray(WK.bad_descriptors_windows(
            img, xb, yb, szb, anb, vb, 256, 1.0, s_max, "group",
            formulation=form))
    for other in ("noroll", "pair"):
        diffw = int((wide["roll"] != wide[other]).sum())
        budgetw = int(2e-5 * wide["roll"].size) + 1
        print(f"on-chip WIDE-bucket roll-vs-{other} differing bytes: "
              f"{diffw} (budget {budgetw})", file=sys.stderr)
        assert diffw <= budgetw, (other, diffw, budgetw)

    results = {k: [] for k in cases}
    for p in range(3):
        for k, fn in cases.items():
            results[k].append(round(time_once(fn), 2))
            print(f"pass {p} {k}: {results[k][-1]} ms", file=sys.stderr)
    out = {k: min(v) for k, v in results.items()}
    out["passes"] = results
    print(json.dumps(out))


if __name__ == "__main__":
    main()
