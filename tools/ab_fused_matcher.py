"""On-chip A/B: streaming fused Pallas matcher vs the XLA dense-matrix path.

SOL.md round-4 probe: the XLA knn2 path is HBM-bound on the (N, N) i32
distance matrix (1 GB at 16k x 16k x 512-bit, written once and re-read by
argmin x2 + top_k).  The fused kernel keeps the running top-2 in VMEM and
writes only O(N) outputs; cross-check runs the kernel a second time with
the roles swapped (2x MXU work for ~0 matrix traffic).

Cases (512-bit descriptors):
  knn16k_xla / knn16k_fused   — ratio+cross knn2 at 16384 x 16384
  knn40k_fused                — 40960 x 40960 (the XLA path's matrix would
                                be 6.4 GB; measured fused-only)

Parity on chip: full-output equality at 16k; at 40k a 2048-query slice of
the XLA path (320 MB matrix) checks j/best/ok against the fused 40k run.

Protocol: one-element host read, >= 8 queued dispatches per window,
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

from efficient_features_tpu.ops import matcher as M


def read(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf[(0,) * leaf.ndim]))


def time_once(fn, iters=8):
    out = fn()
    read(out)  # warm
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    read(out)
    return (time.perf_counter() - t0) * 1e3 / iters


def main():
    rng = np.random.default_rng(11)
    d16 = jnp.asarray(rng.integers(0, 256, (16384, 64), dtype=np.uint8))
    d16b = jnp.asarray(rng.integers(0, 256, (16384, 64), dtype=np.uint8))

    # tiny-grid Mosaic smoke compile first (keep failures cheap)
    t0 = time.perf_counter()
    tiny = [np.asarray(x) for x in M.knn2_ratio_match_fused(
        d16[:1024], d16b[:2048], 0.8)]
    print(f"fused tiny-compile ok in {time.perf_counter()-t0:.1f}s, "
          f"matches={int(tiny[2].sum())}", file=sys.stderr)

    # on-chip full parity at 16k
    t0 = time.perf_counter()
    a = [np.asarray(x) for x in M.knn2_ratio_match(d16, d16b, 0.8,
                                                   fused=False)]
    print(f"xla 16k compiled+ran in {time.perf_counter()-t0:.1f}s",
          file=sys.stderr)
    t0 = time.perf_counter()
    b = [np.asarray(x) for x in M.knn2_ratio_match_fused(d16, d16b, 0.8)]
    print(f"fused 16k compiled+ran in {time.perf_counter()-t0:.1f}s",
          file=sys.stderr)
    diff = sum(int((x != y).sum()) for x, y in zip(a, b))
    print(f"on-chip 16k xla-vs-fused differing entries: {diff}",
          file=sys.stderr)
    assert diff == 0, diff

    cases = {
        "knn16k_xla": lambda: M.knn2_ratio_match(d16, d16b, 0.8,
                                                 fused=False),
        "knn16k_fused": lambda: M.knn2_ratio_match_fused(d16, d16b, 0.8),
    }

    d40 = jnp.asarray(rng.integers(0, 256, (40960, 64), dtype=np.uint8))
    d40b = jnp.asarray(rng.integers(0, 256, (40960, 64), dtype=np.uint8))
    t0 = time.perf_counter()
    f40 = [np.asarray(x) for x in M.knn2_ratio_match_fused(d40, d40b, 0.8)]
    print(f"fused 40k compiled+ran in {time.perf_counter()-t0:.1f}s, "
          f"matches={int(f40[2].sum())}", file=sys.stderr)
    # 2048-query-slice XLA spot parity at 40k (full matrix would be 6.4 GB)
    s = [np.asarray(x) for x in M.knn2_ratio_match(d40[:2048], d40b, 0.8,
                                                   fused=False)]
    sdiff = sum(int((x[:2048] != y).sum()) for x, y in zip(f40, s))
    print(f"40k spot parity (2048 queries) differing entries: {sdiff}",
          file=sys.stderr)
    assert sdiff == 0, sdiff
    cases["knn40k_fused"] = lambda: M.knn2_ratio_match_fused(d40, d40b, 0.8)

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
