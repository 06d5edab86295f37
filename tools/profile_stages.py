"""Stage-split profiling on the real TPU chip (round-3 verdict items #5/#7).

Measures, in ONE process (so the chip's time-share applies equally):
  - detect-4K stage split: pyramid / cells kernels / selection / IC / full
    (the difference to full is the assembly+scalePoints+concat stage)
  - BAD window-kernel scaling: nbits 256 vs 512 (factor build + matmul scale
    linearly in nbits; DMA is constant) and dense vs sparse keypoints (DMA
    per distinct window amortization) at 10k/40k/100k — the data behind the
    "~600 vreg-ops/kp formulation floor" claim
  - range-indicator build variant A/B hooks (see window_kernels)

Writes tools/STAGE_PROFILE.json and prints it; bench.py folds the headline
numbers into BENCH_DETAIL.json context.
"""
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(here, ".xla_cache", jax.default_backend()))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from efficient_features_tpu import pipeline as P
    from efficient_features_tpu.ops import image as OI
    from efficient_features_tpu.ops import detect as OD
    from efficient_features_tpu.ops import pallas_kernels as PK
    from efficient_features_tpu.ops import window_kernels as WK
    from bench import make_bench_image

    def read(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(jax.device_get(leaf))

    def t_ms(fn, iters=3):
        read(fn())  # warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fn()
            read(out)
            best = min(best, (time.perf_counter() - t0) * 1e3 / iters)
        return round(best, 2)

    res = {}
    h, w = 2160, 3840
    img = jnp.asarray(make_bench_image(h, w))
    cfg = P.FeatureConfig(nfeatures=10000, descriptor_type="bad_256")

    # --- detect stage split ------------------------------------------------
    @jax.jit
    def pyramid_only(im):
        return OI.build_pyramid(im, cfg.scale_factor, cfg.nlevels)[-1]

    @functools.partial(jax.jit, static_argnums=())
    def cells_only(im):
        levels = OI.build_pyramid(im, cfg.scale_factor, cfg.nlevels)
        outs = [PK.fast_harris_nms_cells(lv, cfg.fast_threshold,
                                         cfg.nonmax_radius)
                for lv in levels]
        return [o[0] for o in outs]

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
                import efficient_features_tpu.utils.semantics as S
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
            ys, xs, r, valid, ang = _level(lv, min(quotas[s],
                                                   int(np.prod(lv.shape))))
            outs.append(ang)
        return outs

    def _level(lv, quota):
        ys, xs, r, ang, valid = P._detect_level(lv, quota, cfg, None)
        return ys, xs, r, valid, ang

    res["detect4k_pyramid_ms"] = t_ms(lambda: pyramid_only(img))
    res["detect4k_cells_ms"] = t_ms(lambda: cells_only(img))
    res["detect4k_select_ms"] = t_ms(lambda: select_only(img))
    res["detect4k_ic_ms"] = t_ms(lambda: with_ic(img))
    res["detect4k_full_ms"] = t_ms(lambda: P.detect_jit(img, cfg))
    res["detect4k_assembly_ms"] = round(
        res["detect4k_full_ms"] - res["detect4k_ic_ms"], 2)

    # --- BAD window-kernel scaling ----------------------------------------
    rng = np.random.default_rng(1)
    for n in (10240, 40960, 102400):
        for dense, tag in ((False, "sparse"), (True, "dense")):
            if dense:
                # pack keypoints into a narrow strip: few distinct windows
                x = rng.uniform(200, 800, n).astype(np.float32)
                y = rng.uniform(200, 328, n).astype(np.float32)
            else:
                x = rng.uniform(20, w - 20, n).astype(np.float32)
                y = rng.uniform(20, h - 20, n).astype(np.float32)
            kx, ky = jnp.asarray(x), jnp.asarray(y)
            sz = jnp.full((n,), 31.0, jnp.float32)
            ang = jnp.asarray(rng.uniform(0, 360, n).astype(np.float32))
            ok = jnp.ones((n,), bool)
            for nbits in (256, 512):
                key = f"bad{nbits}_{tag}_{n // 1024}k_ms"
                res[key] = t_ms(lambda nb=nbits: WK.bad_descriptors_windows(
                    img, kx, ky, sz, ang, ok, nb, 1.0), iters=2)

    # derived: per-kp marginal cost of nbits doubling ~= factor+matmul share
    for n in (10, 40, 100):
        a = res.get(f"bad256_dense_{n}k_ms")
        b = res.get(f"bad512_dense_{n}k_ms")
        if a and b:
            res[f"bad_dense_{n}k_us_per_kp_256"] = round(a / n, 2)
            res[f"bad_dense_{n}k_factor_matmul_share"] = round(
                (b - a) / a, 3)

    out_path = os.path.join(here, "tools", "STAGE_PROFILE.json")
    with open(out_path, "w") as f:
        json.dump(res, f, indent=2)
    print(json.dumps(res, indent=2))


if __name__ == "__main__":
    main()
