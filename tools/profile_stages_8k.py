"""detect-8K stage split on the real chip (round-5: the 8K row is the worst
vs-baseline metric, 50.3 ms, while its cells kernel alone is 13.1 — split
the other ~37 ms the same way profile_stages.py splits 4K).

Cumulative jits (pyramid / +cells / +selection / +IC / full pipeline),
interleaved min-of-3 passes, >= 8 iters.  Appends rows into
tools/STAGE_PROFILE.json.
"""
import json
import os
import sys
import time

import numpy as np

here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, here)


def main():
    import jax
    from efficient_features_tpu.utils import compile_cache
    compile_cache.setup(os.path.join(here, ".xla_cache"),
                        jax.default_backend())
    import jax.numpy as jnp
    from efficient_features_tpu import pipeline as P
    from efficient_features_tpu.ops import image as OI
    from efficient_features_tpu.ops import detect as OD
    from efficient_features_tpu.ops import pallas_kernels as PK
    from efficient_features_tpu.utils import semantics as S
    from bench import make_bench_image

    def read(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(jax.device_get(leaf[(0,) * leaf.ndim]))

    def time_once(fn, iters):
        out = fn()
        read(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn()
        read(out)
        return (time.perf_counter() - t0) * 1e3 / iters

    img = jnp.asarray(make_bench_image(4320, 7680))
    cfg = P.FeatureConfig(nfeatures=10000, descriptor_type="bad_256")

    @jax.jit
    def pyramid_only(im):
        return OI.build_pyramid(im, cfg.scale_factor, cfg.nlevels)[-1]

    @jax.jit
    def cells_only(im):
        levels = OI.build_pyramid(im, cfg.scale_factor, cfg.nlevels)
        outs = [PK.fast_harris_nms_cells(lv, cfg.fast_threshold,
                                         cfg.nonmax_radius)
                for lv in levels]
        return [o[0] for o in outs]

    @jax.jit
    def cells_l0(im):
        return PK.fast_harris_nms_cells(im, cfg.fast_threshold,
                                        cfg.nonmax_radius)[0]

    @jax.jit
    def select_only(im):
        levels = OI.build_pyramid(im, cfg.scale_factor, cfg.nlevels)
        quotas = cfg.quotas()
        outs = []
        for s, lv in enumerate(levels):
            cm, crow, ccnt = PK.fast_harris_nms_cells(
                lv, cfg.fast_threshold, cfg.nonmax_radius)
            hh, ww = lv.shape

            def dense_fallback(_=None, lv=lv, s=s, hh=hh, ww=ww):
                corner = OD.fast_corner_mask(lv, cfg.fast_threshold)
                resp = OD.harris_response(lv)
                resp = jnp.where(resp == 0, jnp.float32(0.0), resp)
                b = S.HALF_PATCH_SIZE
                border = jnp.zeros((hh, ww), bool
                                   ).at[b:hh - b, b:ww - b].set(True)
                surv = OD.radius_nms(resp, corner & border, cfg.nonmax_radius)
                masked = jnp.where(surv, resp, jnp.float32(-jnp.inf))
                return jax.lax.top_k(masked.reshape(-1),
                                     min(quotas[s], hh * ww))

            outs.append(OD.select_topk_cells(
                cm, crow, ccnt, hh, ww, min(quotas[s], hh * ww),
                dense_fallback))
        return [o[3] for o in outs]

    @jax.jit
    def with_ic(im):
        levels = OI.build_pyramid(im, cfg.scale_factor, cfg.nlevels)
        quotas = cfg.quotas()
        outs = []
        for s, lv in enumerate(levels):
            quota = min(quotas[s], int(np.prod(lv.shape)))
            ys, xs, r, ang, valid = P._detect_level(lv, quota, cfg, None)
            outs.append(ang)
        return outs

    registry = [
        ("detect8k_pyramid_ms", lambda: pyramid_only(img), 10),
        ("detect8k_cells_l0_ms", lambda: cells_l0(img), 10),
        ("detect8k_cells_ms", lambda: cells_only(img), 8),
        ("detect8k_select_ms", lambda: select_only(img), 8),
        ("detect8k_ic_ms", lambda: with_ic(img), 8),
        ("detect8k_full_ms", lambda: P.detect_jit(img, cfg), 8),
    ]

    for key, fn, _ in registry:          # compile pass
        t0 = time.perf_counter()
        read(fn())
        print(f"{key}: compiled/warm in {time.perf_counter() - t0:.1f}s",
              file=sys.stderr)

    best = {key: float("inf") for key, _, _ in registry}
    for p in range(3):
        for key, fn, iters in registry:
            ms = round(time_once(fn, iters), 2)
            best[key] = min(best[key], ms)
            print(f"pass {p} {key}: {ms} ms", file=sys.stderr)

    path = os.path.join(here, "tools", "STAGE_PROFILE.json")
    data = json.load(open(path))
    data.update(best)
    json.dump(data, open(path, "w"), indent=1)
    print(json.dumps(best))


if __name__ == "__main__":
    main()
