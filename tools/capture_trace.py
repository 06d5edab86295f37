"""Capture a jax.profiler (xplane) trace of detect-4K and dAC-4K.

SURVEY.md §5 names jax.profiler/xplane as the TPU analogue of the
reference's `-lineinfo` + Nsight flow
(/root/reference/modules/cuda_efficient_features/CMakeLists.txt:31-33);
this tool is the repeatable capture, and one committed artifact lives in
traces/ so a reader can open the timeline (tensorboard / xprof /
perfetto) without a chip.

Usage (real TPU):
    python tools/capture_trace.py [outdir=traces]

Protocol: compile + warm both pipelines first (first-compile noise would
dwarf the steady-state executables), then trace ITERS steady-state
dispatches of each phase under named TraceAnnotations, completion forced
by a one-element host read (see bench.py's read protocol).
"""
import os
import shutil
import sys

import numpy as np

ITERS = 4


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "traces")
    import jax
    import jax.numpy as jnp
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, here)
    from efficient_features_tpu.utils import compile_cache
    compile_cache.setup(os.path.join(here, ".xla_cache"),
                        jax.default_backend())
    from efficient_features_tpu import pipeline as P
    from bench import make_bench_image

    def read(outv):
        leaf = jax.tree_util.tree_leaves(outv)[0]
        np.asarray(jax.device_get(leaf[(0,) * leaf.ndim]))

    img4k = jnp.asarray(make_bench_image(2160, 3840))
    det_cfg = P.FeatureConfig(nfeatures=10000, descriptor_type="bad_256")
    dac_cfg = P.FeatureConfig(nfeatures=40000, descriptor_type="bad_256")

    # compute-only protocol keypoints — the SAME rng(1) draws in the same
    # order as bench.py:248-254 (x, y, then angle; angle=0 here would
    # trace executables on different keypoint data than the bench rows
    # the *_trace_ms columns claim to anchor)
    rng = np.random.default_rng(1)
    n = 40960
    kps_np = np.zeros((n, 4), np.float32)
    kps_np[:, 0] = rng.uniform(20, 3840 - 20, n)
    kps_np[:, 1] = rng.uniform(20, 2160 - 20, n)
    kps_np[:, 2] = 31.0
    kps_np[:, 3] = rng.uniform(0, 360, n)
    kps = jnp.asarray(kps_np)
    valid = jnp.ones(n, bool)

    # phases keyed by the bench.py metric name (tools/parse_trace.py maps
    # annotation spans onto the module instances inside them)
    phases = [
        ("detect_4k", lambda: P.detect_jit(img4k, det_cfg)),
        ("detect_and_compute_4k_40k_bad_256",
         lambda: P.detect_and_compute_jit(img4k, dac_cfg)),
        ("compute40k_bad256",
         lambda: P.compute_jit(img4k, kps, valid, 256, "bad", 1.0, True)),
        ("compute40k_hash_sift256",
         lambda: P.compute_jit(img4k, kps, valid, 256, "hash_sift", 1.0,
                               True)),
    ]
    for _name, fn in phases:                    # compile + warm
        read(fn())

    tmp = os.path.join(out, "_raw")
    os.makedirs(tmp, exist_ok=True)
    with jax.profiler.trace(tmp):
        for name, fn in phases:
            with jax.profiler.TraceAnnotation(name):
                for _ in range(ITERS):
                    o = fn()
                read(o)

    # flatten the newest capture to stable committed names
    prof = os.path.join(tmp, "plugins", "profile")
    runs = sorted(os.listdir(prof)) if os.path.isdir(prof) else []
    if not runs:
        print("no trace produced under", prof, file=sys.stderr)
        return 1
    src = os.path.join(prof, runs[-1])
    n = 0
    for f in os.listdir(src):
        if f.endswith((".xplane.pb", ".trace.json.gz")):
            ext = ".xplane.pb" if f.endswith(".xplane.pb") else \
                ".trace.json.gz"
            dst = os.path.join(out, f"detect_and_dac_4k{ext}")
            shutil.copyfile(os.path.join(src, f), dst)
            print("wrote", dst, os.path.getsize(dst), "bytes")
            n += 1
    shutil.rmtree(tmp)
    return 0 if n else 1


if __name__ == "__main__":
    sys.exit(main())
