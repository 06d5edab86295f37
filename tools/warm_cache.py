"""Pre-compile every bench.py shape into the persistent XLA cache.

Round-4's bench TIMED OUT under the driver (BENCH_r04.json rc=124): the
round-end run hit a cold cache and the large pipeline signatures compile
for minutes each through the tunneled dev toolchain (one matcher shape
took 892 s cold).  Running this tool mid-session populates
``.xla_cache/tpu`` — TPU executables are serialized device code
(host-portable, unlike XLA:CPU AOT blobs; utils/compile_cache.py).  The
cache directory is NOT committed (multi-GB; .gitignore) — it persists on
the build machine's disk between rounds, which is where the driver's
round-end ``python bench.py`` runs; a fresh clone on a new machine must
re-run this tool once before benching.

Usage:  python tools/warm_cache.py [--budget-s N]

Each metric compiles independently and the cache persists incrementally,
so a killed run keeps everything compiled so far; re-runs skip warm
entries in seconds.  Matches the reference's build-time kernel
compilation model (CUDA fatbins ship compiled;
/root/reference/modules/cuda_efficient_features/CMakeLists.txt:20-29).
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--budget-s", type=float, default=float("inf"),
                    help="stop starting new compiles after this many s")
    args = ap.parse_args()

    import jax
    import numpy as np

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    from efficient_features_tpu.utils import compile_cache
    compile_cache.setup(os.path.join(here, ".xla_cache"),
                        jax.default_backend())

    import bench

    def read(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(jax.device_get(leaf[(0,) * leaf.ndim]))

    t0 = time.time()
    probes = bench.build_probes()
    for name, (fn, _work) in probes.items():
        t = time.time()
        read(fn())
        print(f"probe {name}: {time.time() - t:.1f}s", flush=True)

    metrics = bench.build_metrics()
    for m in metrics:
        if time.time() - t0 > args.budget_s:
            print(f"budget hit; stopping before {m['key']}", flush=True)
            break
        t = time.time()
        try:
            read(m["fn"]())
            print(f"{m['key']}: {time.time() - t:.1f}s", flush=True)
        except Exception as e:                      # noqa: BLE001
            print(f"{m['key']}: FAILED {e!r}", flush=True)
    print(f"total {time.time() - t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
