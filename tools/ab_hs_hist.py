"""Same-session A/B: two-stage HashSIFT histogram tail on XLA
(ops.hash_sift.patch_sift_responses + projection GEMM, the shipped round-4
path) vs the standalone Pallas hist kernel
(window_kernels.hs_hist_from_patches + the permuted projection).

Round-4 verdict Weak #5: HS-256 is the one kernel above its own SOL model
(residual 1.43); the hist stage measured ~17 ms of the 48.5 ms standalone
split at 40k and is HBM-traffic bound (~15 materialized (N, 900)-class f32
arrays; the precision ladder showed the matmuls don't matter).  The kernel
keeps everything in VMEM at M=256 rows/program — this script measures
whether that pays on chip.  Protocol: one process, shared warp patches,
byte parity asserted at the reference's 1e-4 budget before timing,
interleaved passes, >= 16 queued dispatches, one-element reads
(CLAUDE.md timing protocol).  Run on the real TPU chip.
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

from efficient_features_tpu import pipeline as P
from efficient_features_tpu.ops import window_kernels as WK
from efficient_features_tpu.ops import hash_sift as ops_hs
from efficient_features_tpu.ops import bad as ops_bad
from efficient_features_tpu.models.params import load_hash_sift_matrix
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


@jax.jit
def tail_xla(patches, valid, B):
    responses = ops_hs.patch_sift_responses(patches.reshape(-1, 32, 32))
    proj = jnp.dot(responses, B.T, preferred_element_type=jnp.float32,
                   precision="highest")
    bits = jnp.where(valid[:, None], (proj > 0).astype(jnp.int32), 0)
    return ops_bad.pack_bits_msb(bits)


import functools


@functools.partial(jax.jit, static_argnums=(2,))
def tail_pallas(patches, valid, nbits):
    desc = WK.hs_hist_from_patches(patches.reshape(-1, 1024))
    return P._hs_from_fused(desc, valid, nbits)


def main():
    h, w = 2160, 3840
    img = jnp.asarray(make_bench_image(h, w))
    rng = np.random.default_rng(1)
    n = 40960
    x = jnp.asarray(rng.uniform(20, w - 20, n).astype(np.float32))
    y = jnp.asarray(rng.uniform(20, h - 20, n).astype(np.float32))
    size = jnp.full((n,), 31.0, jnp.float32)
    ang = jnp.asarray(rng.uniform(0, 360, n).astype(np.float32))
    valid = jnp.ones(n, bool)

    warp = jax.jit(lambda: WK.warp_patches_windows(
        img, x, y, size, ang, valid, 1.0))
    t0 = time.perf_counter()
    patches = warp()
    read(patches)
    print(f"warp compiled in {time.perf_counter() - t0:.1f}s",
          file=sys.stderr)

    nbits = 256
    B = jnp.asarray(load_hash_sift_matrix(nbits))
    cases = {
        "hs40k_tail_xla": lambda: tail_xla(patches, valid, B),
        "hs40k_tail_pallas": lambda: tail_pallas(patches, valid, nbits),
    }

    # byte parity at the reference budget before timing (both tails are
    # budget-class vs the oracle; vs each other the same class holds)
    outs = {}
    for key, fn in cases.items():
        t0 = time.perf_counter()
        o = fn()
        read(o)
        print(f"{key}: compiled in {time.perf_counter() - t0:.1f}s",
              file=sys.stderr)
        outs[key] = np.asarray(o)
    a, b = outs.values()
    diff = int((a != b).sum())
    budget = int(2e-4 * a.size) + 1
    print(f"parity: {diff} differing bytes of {a.size} (budget {budget})",
          file=sys.stderr)
    assert diff <= budget, (diff, budget)

    cases["hs40k_warp"] = warp
    results = {key: [] for key in cases}
    for p in range(3):
        for key, fn in cases.items():
            results[key].append(round(time_once(fn), 2))
            print(f"pass {p} {key}: {results[key][-1]} ms", file=sys.stderr)
    out = {key: min(v) for key, v in results.items()}
    out["passes"] = results
    out["parity_diff_bytes"] = diff
    print(json.dumps(out))


if __name__ == "__main__":
    main()
