"""Stage-split profiling on the real TPU chip (round-3 verdict items #5/#7).

Measures, with the bench.py interleaved-min protocol (the chip's time share
swings 5-10x on a minutes scale — sequential per-metric timing is
meaningless; a first run of this tool showed cells-only > full-detect):
  - detect-4K stage split: pyramid / cells kernels / +selection / +IC /
    full (full minus +IC is the assembly+scalePoints+concat stage)
  - BAD window-kernel scaling: nbits 256 vs 512 (factor build + matmul
    scale linearly in nbits; DMA constant) and dense vs sparse keypoints
    (DMA-per-distinct-window amortization) at 10k/40k/100k — the data
    behind the "~600 vreg-ops/kp formulation floor" claim
  - HashSIFT two-stage split: warp kernel / XLA histogram / projection GEMM
    (all jitted standalone — inside compute_jit XLA fuses the warp's
    un-sort gather into the consumer, so absolute numbers overstate; use
    them comparatively)

Writes tools/STAGE_PROFILE.json and prints it.
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
    from efficient_features_tpu.utils import compile_cache
    compile_cache.setup(os.path.join(here, ".xla_cache"),
                        jax.default_backend())
    import jax.numpy as jnp
    from efficient_features_tpu import pipeline as P
    from efficient_features_tpu.ops import image as OI
    from efficient_features_tpu.ops import detect as OD
    from efficient_features_tpu.ops import pallas_kernels as PK
    from efficient_features_tpu.ops import window_kernels as WK
    from efficient_features_tpu.ops import hash_sift as OH
    from efficient_features_tpu.models.params import load_hash_sift_matrix
    from efficient_features_tpu.utils import semantics as S
    from bench import make_bench_image

    def read(out):
        # one-element host read: forces completion (block_until_ready returns
        # early under axon) WITHOUT shipping the whole leaf through the
        # tunnel — device_get of e.g. the 42 MB warp-patch array was
        # dominating those windows (see bench.py read())
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(jax.device_get(leaf[(0,) * leaf.ndim]))

    registry = []   # (key, fn, iters)

    def reg(key, fn, iters=12):
        # >= 6 iters everywhere: each measurement window carries a fixed
        # ~25 ms tunnel round trip (round-3 probe), so the 2-3-iteration
        # rows of earlier rounds overstated every stage by ~8-12 ms
        registry.append((key, fn, iters))

    h, w = 2160, 3840
    img = jnp.asarray(make_bench_image(h, w))
    cfg = P.FeatureConfig(nfeatures=10000, descriptor_type="bad_256")

    # --- detect stage split ------------------------------------------------
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

    reg("detect4k_pyramid_ms", lambda: pyramid_only(img))
    reg("detect4k_cells_ms", lambda: cells_only(img))
    reg("detect4k_select_ms", lambda: select_only(img))
    reg("detect4k_ic_ms", lambda: with_ic(img))
    reg("detect4k_full_ms", lambda: P.detect_jit(img, cfg))

    # split INSIDE the cells kernel, level-0 (4K) only: FAST+Harris alone /
    # + NMS (standalone kernels) / + cell reduce (the production kernel)
    fh0 = jax.jit(lambda im: PK.fast_harris(im, cfg.fast_threshold))
    fhn0 = jax.jit(lambda im: PK.fast_harris_nms(im, cfg.fast_threshold,
                                                 cfg.nonmax_radius))
    cells0 = jax.jit(lambda im: PK.fast_harris_nms_cells(
        im, cfg.fast_threshold, cfg.nonmax_radius)[0])
    reg("detect4k_l0_fh_ms", lambda: fh0(img))
    reg("detect4k_l0_fh_nms_ms", lambda: fhn0(img))
    reg("detect4k_l0_cells_ms", lambda: cells0(img))

    # --- BAD window-kernel scaling ----------------------------------------
    rng = np.random.default_rng(1)
    for n in (10240, 40960, 102400):
        for dense, tag in ((False, "sparse"), (True, "dense")):
            if dense:
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
                reg(f"bad{nbits}_{tag}_{n // 1024}k_ms",
                    lambda kx=kx, ky=ky, sz=sz, ang=ang, ok=ok, nb=nbits:
                        WK.bad_descriptors_windows(img, kx, ky, sz, ang,
                                                   ok, nb, 1.0),
                    iters=6)
            # formulation A/B rows: same keypoints through the round-4
            # noroll kernel (per-DMA int8 cache, one-hot column compaction,
            # XLA-side trig) and the round-5 pair kernel (two keypoints
            # block-diagonal in one full-tile box matmul) vs the default
            for form in ("noroll", "pair"):
                reg(f"bad256_{tag}_{n // 1024}k_{form}_ms",
                    lambda kx=kx, ky=ky, sz=sz, ang=ang, ok=ok, form=form:
                        WK.bad_descriptors_windows(img, kx, ky, sz, ang, ok,
                                                   256, 1.0,
                                                   formulation=form),
                    iters=6)

    # --- HashSIFT two-stage split -----------------------------------------
    n = 40960
    x = rng.uniform(20, w - 20, n).astype(np.float32)
    y = rng.uniform(20, h - 20, n).astype(np.float32)
    kx, ky = jnp.asarray(x), jnp.asarray(y)
    sz = jnp.full((n,), 31.0, jnp.float32)
    ang = jnp.asarray(rng.uniform(0, 360, n).astype(np.float32))
    ok = jnp.ones((n,), bool)

    warp = jax.jit(lambda: WK.warp_patches_windows(img, kx, ky, sz, ang,
                                                   ok, 1.0))
    patches = warp()
    hist = jax.jit(lambda p: OH.patch_sift_responses(p.reshape(-1, 32, 32)))
    responses = hist(patches)
    B = jnp.asarray(load_hash_sift_matrix(256))
    gemm = jax.jit(lambda r: jnp.dot(r, B.T,
                                     preferred_element_type=jnp.float32,
                                     precision="highest"))
    reg("hs_warp40k_ms", warp, iters=6)
    reg("hs_hist40k_ms", lambda: hist(patches), iters=6)
    reg("hs_gemm40k_ms", lambda: gemm(responses), iters=6)
    # round-5 Pallas hist kernel (hist WITHOUT the projection; the bench's
    # hs40k_tail_* rows time hist+projection together)
    hist_pl = jax.jit(lambda p: WK.hs_hist_from_patches(p.reshape(-1, 1024)))
    reg("hs_hist40k_pallas_ms", lambda: hist_pl(patches), iters=6)

    # hist matmul precision ladder (time only; parity must be re-validated
    # before any precision drop ships)
    for prec in ("highest", "high", "default"):
        f = jax.jit(functools.partial(_hist_prec, n=n, prec=prec, OH=OH,
                                      jnp=jnp))
        reg(f"hs_hist40k_{prec}_ms",
            lambda f=f: f(patches), iters=6)

    # hist sub-stage shares (time only, results are WRONG by construction):
    # the precision ladder showed the 9 core matmuls are not the bound, so
    # split the VPU side — "noori" replaces the atan2+binning with a
    # constant orientation field (its delta vs the real row = the atan2 +
    # bin-select share), "nomag" additionally replaces the sqrt magnitude
    # (delta = the sqrt share).  Both keep all 9 matmuls and the
    # normalize/quantize tail.
    def _hist_ablate(p, drop_mag):
        pp = p.reshape(-1, 32, 32).astype(jnp.float32)
        dx = pp[:, 1:-1, 2:] - pp[:, 1:-1, :-2]
        dy = pp[:, :-2, 1:-1] - pp[:, 2:, 1:-1]
        m = (dx * dx + dy * dy).reshape(pp.shape[0], -1)
        mag = m if drop_mag else jnp.sqrt(m)
        oi = (jax.lax.broadcasted_iota(jnp.int32, mag.shape, 1) % 8)
        of = mag * np.float32(1e-3)          # data-dependent, transcendental-free
        v_hi = of * mag
        v_lo = mag - v_hi
        Wcore = jnp.asarray(OH._spatial_weight_matrix())[:, :16]
        hists = [jnp.dot(jnp.where(oi == o, v_lo, 0.0)
                         + jnp.where(oi + 1 == o, v_hi, 0.0), Wcore,
                         preferred_element_type=jnp.float32,
                         precision="highest") for o in range(9)]
        core = jnp.stack(hists, axis=-1).reshape(pp.shape[0], 4, 4, 9)
        core = core[..., :8].at[..., 0].add(core[..., 8])
        d = core.reshape(pp.shape[0], 128)
        eps = np.float32(np.finfo(np.float32).eps)
        nrm = jnp.maximum(jnp.sqrt((d * d).sum(axis=1)), eps)
        d = jnp.minimum(d / nrm[:, None], np.float32(0.2))
        nrm = jnp.maximum(jnp.sqrt((d * d).sum(axis=1)), eps)
        d = jnp.clip(jnp.trunc(np.float32(512.0) * d / nrm[:, None]
                               + np.float32(0.5)), 0, 255)
        return d
    hist_noori = jax.jit(functools.partial(_hist_ablate, drop_mag=False))
    hist_nomag = jax.jit(functools.partial(_hist_ablate, drop_mag=True))
    reg("hs_hist40k_noori_ms", lambda: hist_noori(patches), iters=6)
    reg("hs_hist40k_nomag_ms", lambda: hist_nomag(patches), iters=6)

    # --- interleaved measurement ------------------------------------------
    for _, fn, _ in registry:
        read(fn())          # compile + warm
    best = {key: float("inf") for key, _, _ in registry}
    for _pass in range(3):
        for key, fn, iters in registry:
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fn()
            read(out)
            best[key] = min(best[key],
                            (time.perf_counter() - t0) * 1e3 / iters)

    res = {k: round(v, 2) for k, v in best.items()}
    res["note"] = ("interleaved min-of-3 passes, 6-12 iters/row (amortizes "
                   "the fixed ~25 ms tunnel round trip); standalone-jitted "
                   "stages still carry dispatch overhead vs the fused "
                   "pipeline — use comparatively, not absolutely")
    res["detect4k_assembly_ms"] = round(
        res["detect4k_full_ms"] - res["detect4k_ic_ms"], 2)
    for n in (10, 40, 100):
        a = res.get(f"bad256_dense_{n}k_ms")
        b = res.get(f"bad512_dense_{n}k_ms")
        if a and b:
            res[f"bad_dense_{n}k_us_per_kp_256"] = round(a / (n * 1.024), 2)
            res[f"bad_dense_{n}k_factor_matmul_share"] = round((b - a) / a, 3)

    out_path = os.path.join(here, "tools", "STAGE_PROFILE.json")
    with open(out_path, "w") as f:
        json.dump(res, f, indent=2)
    print(json.dumps(res, indent=2))


def _hist_prec(p, *, n, prec, OH, jnp):
    """The 10-matmul histogram stage at a given MXU precision."""
    pp = p.astype(jnp.float32).reshape(-1, 32, 32)
    dx = pp[:, 1:-1, 2:] - pp[:, 1:-1, :-2]
    dy = pp[:, :-2, 1:-1] - pp[:, 2:, 1:-1]
    mag = jnp.sqrt(dx * dx + dy * dy).reshape(n, -1)
    ori = jnp.arctan2(dy, dx).reshape(n, -1)
    so = np.float32(8.0 / (2 * np.pi))
    ob = so * ori
    oi = jnp.floor(ob).astype(jnp.int32)
    of = ob - oi.astype(jnp.float32)
    oi = jnp.where(oi < 0, oi + 8, oi)
    oi = jnp.where(oi >= 8, oi - 8, oi)
    v_hi = of * mag
    v_lo = mag - v_hi
    Wsp = jnp.asarray(OH._spatial_weight_matrix())
    hs = []
    for o in range(10):
        v_o = (jnp.where(oi == o, v_lo, 0.0)
               + jnp.where(oi + 1 == o, v_hi, 0.0))
        hs.append(jnp.dot(v_o, Wsp, preferred_element_type=jnp.float32,
                          precision=prec))
    return jnp.stack(hs, axis=-1)


if __name__ == "__main__":
    main()
