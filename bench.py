"""Benchmark harness (the reference's sample_benchmark analogue,
/root/reference/samples/sample_benchmark.cpp:39-142).

Prints ONE JSON line with the headline metric:
  detectAndCompute of up to 40k keypoints on a 4K image, BAD-256,
  milliseconds; vs_baseline = reference RTX 3060 Ti time (7.2 ms,
  README.md:68-70) / ours.

Timing protocol: under the axon tunnel, per-call host syncs cost ~30 ms and
jax.block_until_ready returns early, so each measurement queues N dispatches
and forces completion with a single host read of ONE output element.  The
measurement window still carries a fixed ~25 ms round-trip tax (round-3
probe: detect-FHD per-iter = 33/18/9 ms at 1/3/24 iters), so iteration
counts are 8+ to amortize it — matching the reference protocol's 100
iterations (sample_benchmark.cpp:39-52) in spirit.

Share normalization (round 4): this dev chip is time-shared with 5-10x
share swings on a minutes scale, so absolute ms mean little.  Every metric
declares its bounding resource (from the SOL.md op-count model) and, in each
measurement pass, its probe for that resource runs IMMEDIATELY ADJACENT to
the metric.  BENCH_DETAIL then carries, per metric:
  *_ms             best wall-clock over the interleaved passes
  *_share          adjacent-probe rate / v5e spec rate (same pass as *_ms)
  *_normalized_ms  ms * share  — the share-adjusted estimate of what this
                   executable would measure on an unshared v5e
  *_sol_ms         the SOL.md CORRECTED vector-pass model at spec (band
                   midpoints from "Model vs measured"; the retracted
                   ALU-peak bounds are kept in SOL.md only)
  *_sol_residual   normalized_ms / sol_ms  (1.0 = kernel achieves its model)
Probes: bf16 MXU matmul, int8 MXU matmul, a VMEM-resident f32 fma chain
(VPU), an HBM-streaming elementwise pass, and a device->host transfer of a
FRESHLY COMPUTED jit output (the round-3 probe read a host-cached jnp.ones
constant and reported a fantasy 1000 GB/s; see hw_d2h below for the
cross-check protocol).

Real scenes (round 4): detect and detectAndCompute also run on scenes tiled
from the committed real fixtures (tests/data/real_montage.png — real
photographic/sensor statistics, tools/make_fixtures.py), alongside the
synthetic box-montage rows.  The reference's baselines average 11 real
SceauxCastle photos (README.md:46-50), so the *_real rows are the honest
comparison; keypoint spatial distribution drives the window-kernel DMA
group count (round-3 finding), which synthetic scenes understate.
"""
import json
import os
import sys
import time

import numpy as np

# v5e public spec peaks (SOL.md): bf16 MXU, int8 MXU, HBM stream; the VPU
# figure is an ESTIMATE (8 sublanes x 128 lanes x ~4 ALUs x ~0.94 GHz)
SPEC = {"mxu_bf16": 197e12, "mxu_int8": 394e12, "vpu": 4e12, "hbm": 819e9}


def make_bench_image(h, w, seed=0):
    """Corner-rich synthetic scene (stand-in for SceauxCastle photos)."""
    rng = np.random.default_rng(seed)
    img = np.zeros((h, w), np.float64)
    yy, xx = np.mgrid[0:h, 0:w]
    img += 60 + 60 * (xx / w) + 40 * np.sin(yy / 57.0)
    for _ in range(600):
        x0 = rng.integers(0, w - 8)
        y0 = rng.integers(0, h - 8)
        bw = int(rng.integers(6, w // 12))
        bh = int(rng.integers(6, h // 12))
        img[y0:y0 + bh, x0:x0 + bw] += float(rng.uniform(-90, 90))
    img += rng.normal(0, 3, (h, w))
    img -= img.min()
    img *= 255.0 / max(img.max(), 1e-9)
    return img.astype(np.uint8)


def make_real_scene(h, w):
    """Tile the committed real-image fixture up to (h, w) — real local
    statistics everywhere (tile seams add a few artificial edges; the
    detector's keypoint DISTRIBUTION still follows the photographic
    content, which is what the synthetic scene gets wrong)."""
    from PIL import Image
    base = np.asarray(Image.open(os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "tests", "data", "real_montage.png")))
    reps = (-(-h // base.shape[0]), -(-w // base.shape[1]))
    return np.ascontiguousarray(np.tile(base, reps)[:h, :w])


def main():
    import jax

    # persistent compile cache: the bench compiles ~10 large pipeline
    # signatures (minutes each on the tunneled dev toolchain); cached
    # executables make repeat runs start in seconds.  Keyed by backend
    # platform (shared scheme with __graft_entry__._enable_compile_cache).
    here = os.path.dirname(os.path.abspath(__file__))
    from efficient_features_tpu.utils import compile_cache
    compile_cache.setup(os.path.join(here, ".xla_cache"),
                        jax.default_backend())

    import jax.numpy as jnp
    from efficient_features_tpu import pipeline as P

    def read(out):
        # Force completion with a host round trip (block_until_ready returns
        # early under axon) — but transfer ONE element, not the whole leaf:
        # bulk d2h rides a ~MB/s tunnel and must never sit inside a timing
        # window (round-3.5 correction).
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(jax.device_get(leaf[(0,) * leaf.ndim]))

    def time_once(fn, iters):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn()
        read(out)
        return (time.perf_counter() - t0) * 1e3 / iters

    detail = {"backend": jax.default_backend(),
              "device": str(jax.devices()[0]),
              "spec": {k: v for k, v in SPEC.items()},
              "spec_note": "v5e public peaks; vpu is an ESTIMATE (SOL.md)"}

    # ------------------------------------------------------------------
    # Hardware probes — one per bounding resource.  work = ops (or bytes)
    # per call; rate = work / adjacent_ms.  Iteration counts are calibrated
    # once at warmup to a ~250 ms window so the fixed ~25 ms round-trip tax
    # stays <~10% at any share.
    # ------------------------------------------------------------------
    pa = jnp.ones((4096, 4096), jnp.bfloat16)
    p_mm = jax.jit(lambda a: jnp.dot(a, a, preferred_element_type=jnp.float32))
    pi = jnp.ones((2048, 2048), jnp.int8)
    p_i8 = jax.jit(lambda a: jnp.dot(a, a, preferred_element_type=jnp.int32))
    pv = jnp.full((256, 512), 0.999999, jnp.float32)

    @jax.jit
    def p_vpu(x):
        # VMEM-resident fma chain: 16 fused multiply-adds per fori_loop
        # step, 128 steps — 537 MFLOP against ~1 MB of HBM traffic, so the
        # VPU (not HBM) bounds it at any share
        def body(_, a):
            for k in range(16):
                a = a * np.float32(0.9999997) + np.float32(1e-7)
            return a
        return jax.lax.fori_loop(0, 128, body, x)

    ph = jnp.ones((4096, 4096), jnp.float32)
    p_hbm = jax.jit(lambda x: x * np.float32(1.000001) + np.float32(0.001))

    # stencil probe: unaligned lane-slice + add chain on a kernel-shaped
    # (176, 1408) i32 tile — the op mix that actually bounds the detect /
    # window kernels (Mosaic full-tile vector ops; round-4 finding: these
    # run ~2.5-3x slower per element than fma chains and ~10-20x below the
    # ALU-peak VPU estimate, which is where the old SOL's 50x residual
    # lived).  work = slice+add per step = 2 vector ops x 16 steps.
    pst = jnp.arange(176 * 1408, dtype=jnp.int32).reshape(176, 1408)

    @jax.jit
    def p_stencil(x):
        acc = jax.lax.slice(x, (0, 0), (176, 1280))
        for d in range(1, 17):
            acc = acc + jax.lax.slice(x, (0, d), (176, 1280 + d))
        return acc

    probes = {
        "mxu_bf16": (lambda: p_mm(pa), 2 * 4096 ** 3),
        "mxu_int8": (lambda: p_i8(pi), 2 * 2048 ** 3),
        "vpu": (lambda: p_vpu(pv), 2.0 * 16 * 128 * 256 * 512),
        "vpu_stencil": (lambda: p_stencil(pst), 2.0 * 16 * 176 * 1280),
        "hbm": (lambda: p_hbm(ph), 2 * ph.size * 4),
    }
    # vpu_stencil has no published spec peak — it is recorded as a measured
    # capability (Gvecop/s) for the SOL.md model and never normalizes a
    # metric (no metric declares it as bound, so SPEC needs no entry)

    sizes = {"fhd": (1080, 1920), "4k": (2160, 3840), "8k": (4320, 7680)}
    images = {k: jnp.asarray(make_bench_image(*hw)) for k, hw in sizes.items()}
    real_images = {k: jnp.asarray(make_real_scene(*hw))
                   for k, hw in sizes.items()}

    # ------------------------------------------------------------------
    # Metric registry: (key, fn, iters, baseline_ms, bound, sol_ms).
    # bound names the probe measured adjacent to this metric each pass;
    # sol_ms is the SOL.md op-count model at v5e spec (None = not modeled).
    # ------------------------------------------------------------------
    metrics = []

    # detect-only, 10k keypoints (README.md:52-55 protocol), synthetic + real
    det_cfg = P.FeatureConfig(nfeatures=10000, descriptor_type="bad_256")
    baselines_detect = {"fhd": 1.6, "4k": 2.9, "8k": 5.5}
    # sol values here are the CORRECTED vector-pass model band midpoints at
    # spec (SOL.md "Model vs measured", post round-4 pass cuts); the
    # retracted ALU-peak bounds (0.1/0.4/1.6 etc.) live in SOL.md only.
    sol_detect = {"fhd": 7.0, "4k": 18.0, "8k": 62.0}
    for k, img in images.items():
        metrics.append((f"detect_{k}",
                        lambda img=img: P.detect_jit(img, det_cfg),
                        32 if k != "8k" else 16, baselines_detect[k],
                        "vpu", sol_detect[k]))
    for k, img in real_images.items():
        metrics.append((f"detect_{k}_real",
                        lambda img=img: P.detect_jit(img, det_cfg),
                        32 if k != "8k" else 16, baselines_detect[k],
                        "vpu", sol_detect[k]))

    # compute-only: 40k fixed keypoints on the 4K image (README.md:58-63)
    img4k = images["4k"]
    h, w = sizes["4k"]
    rng = np.random.default_rng(1)
    n = 40960
    kps = np.zeros((n, 4), np.float32)
    kps[:, 0] = rng.uniform(20, w - 20, n)
    kps[:, 1] = rng.uniform(20, h - 20, n)
    kps[:, 2] = 31.0
    kps[:, 3] = rng.uniform(0, 360, n)
    kps_j = jnp.asarray(kps)
    valid = jnp.ones(n, bool)
    # (baseline, bound, sol): both descriptors are bound by per-keypoint
    # full-tile vector passes (SOL.md round-4 corrected models: BAD ~15-35,
    # HS ~25-40 at spec); HS keeps the mxu_bf16 probe as its adjacent bound
    # because its vector passes interleave with the pair matmuls
    baselines_compute = {
        ("bad", 256): (1.5, "vpu", 25.0), ("bad", 512): (2.7, "vpu", 28.0),
        ("hash_sift", 256): (3.5, "mxu_bf16", 32.0),
        ("hash_sift", 512): (3.9, "mxu_bf16", 33.0)}
    for (kind, bits), (base, bound, sol) in baselines_compute.items():
        metrics.append((
            f"compute40k_{kind}{bits}",
            lambda kind=kind, bits=bits:
                P.compute_jit(img4k, kps_j, valid, bits, kind, 1.0, True),
            8, base, bound, sol))

    # compute-only on DETECTOR keypoints (the reference's compute protocol,
    # sample_benchmark.cpp:125-133): multi-octave sizes (31..111 at 8 levels)
    # through the octave-bucketed window kernels — on the synthetic AND the
    # real scene (keypoint spatial distribution drives the DMA group count)
    from efficient_features_tpu.ops import window_kernels as WKm
    det40 = P.FeatureConfig(nfeatures=40000, descriptor_type="bad_256")
    br40 = tuple(
        (a, b, (WKm.bucket_scale(sz / 32.0)
                if sz / 32.0 <= WKm._S_CAP else None))
        for (a, b, sz) in P.level_slot_ranges(det40, *sizes["4k"]))
    for tag, src in (("", img4k), ("_real", real_images["4k"])):
        slots40 = P.detect_jit(src, det40)
        kp40 = jnp.stack([slots40["x"], slots40["y"], slots40["size"],
                          slots40["angle"]], axis=1).astype(jnp.float32)
        valid40 = slots40["valid"]
        for kind, base, bound, sol in (("bad", 1.5, "vpu", 25.0),
                                       ("hash_sift", 3.5, "mxu_bf16", 32.0)):
            metrics.append((
                f"compute40k_detected_{kind}256{tag}",
                lambda src=src, kp40=kp40, valid40=valid40, kind=kind:
                    P.compute_bucketed_jit(src, kp40, valid40, 256, kind,
                                           1.0, br40),
                8, base, bound, sol))

    # A/B: BAD kernel formulations on the same synthetic 40k size-31
    # keypoints — "roll" (round-2/3 per-keypoint window rotation), "noroll"
    # (round-4: per-DMA int8 cache + one-hot column compaction + XLA-side
    # trig), "pair" (round-5 default: two keypoints block-diagonal in one
    # full-MXU-tile box matmul).
    kx, ky, ksz, kang = (kps_j[:, 0], kps_j[:, 1], kps_j[:, 2], kps_j[:, 3])
    for form in ("noroll", "roll", "pair"):
        metrics.append((
            f"compute40k_bad256_{form}",
            lambda form=form: WKm.bad_descriptors_windows(
                img4k, kx, ky, ksz, kang, valid, 256, 1.0,
                WKm._S_BASE, "group", formulation=form),
            8, None, "vpu", None))

    # A/B: fused HashSIFT kernel vs the two-stage path (patch kernel
    # + XLA histogram); the default compute row uses the two-stage path
    import jax as _jax

    @_jax.jit
    def hs_fused(img, kp, v):
        d = WKm.hs_desc_windows(img, kp[:, 0], kp[:, 1], kp[:, 2],
                                kp[:, 3], v, 1.0)
        return P._hs_from_fused(d, v, 256)

    @_jax.jit
    def hs_unfused(img, kp, v):
        patches = WKm.warp_patches_windows(img, kp[:, 0], kp[:, 1],
                                           kp[:, 2], kp[:, 3], v, 1.0)
        return P._hs_from_patches(patches, v, 256)

    metrics.append(("compute40k_hs256_fused",
                    lambda: hs_fused(img4k, kps_j, valid), 8, None,
                    "mxu_bf16", None))
    metrics.append(("compute40k_hs256_unfused",
                    lambda: hs_unfused(img4k, kps_j, valid), 8, None,
                    "mxu_bf16", 32.0))

    # A/B: warp kernel body (round-8) — "select": full-height (128, npx)
    # row-index wheres; "split": per-half (64, npx) builds with hoisted
    # pair-invariant iotas.  Bit-identical; the standalone warp is ~70% of
    # the HS pipeline (round-3.5 honest split: warp 26.8 of 46.6).
    for wbody in ("select", "split"):
        metrics.append((
            f"warp40k_{wbody}",
            lambda wbody=wbody: WKm.warp_patches_windows(
                img4k, kx, ky, ksz, kang, valid, 1.0, body_kind=wbody),
            8, None, "vpu", None))

    # masked detect (round-2 verdict: the masked path must not cliff)
    mask4k = jnp.asarray(np.ones(sizes["4k"], np.uint8))
    metrics.append(("detect_4k_masked",
                    lambda: P.detect_masked_jit(img4k, mask4k, det_cfg),
                    24, None, "vpu", None))

    # A/B: cells-kernel column halo 64 (round-4 default) vs 128 (rounds 1-3)
    # on the 8K level-0 image — the kernel is ~85% of detect DMA traffic;
    # halo 64 cuts window bytes ~11% bit-identically
    from efficient_features_tpu.ops import pallas_kernels as PKm
    img8k = images["8k"]
    for hx in (None, 128):
        metrics.append((
            f"cells_8k_halo{hx or 64}",
            lambda hx=hx: PKm.fast_harris_nms_cells(img8k, 20, 15, None, hx),
            16, None, "hbm", None))

    # A/B: Pallas tiled MXU resize vs XLA-gather pyramid (detect 4K/8K)
    for k in ("4k", "8k"):
        cfgp = P.FeatureConfig(nfeatures=10000, descriptor_type="bad_256",
                               pallas_resize=True)
        metrics.append((
            f"detect_{k}_pallas_resize",
            lambda img=images[k], cfgp=cfgp: P.detect_jit(img, cfgp),
            10, None, "hbm", None))

    # detectAndCompute, 40k keypoints, 4K, all four descriptors
    # (README.md:66-71); BAD-256 is the headline metric.  Real-scene rows
    # for the headline pair (the baselines ARE real-photo averages).
    baselines_dac = {"bad_256": (7.2, 44.0), "bad_512": (8.2, 47.0),
                     "hash_sift_256": (8.5, 50.0), "hash_sift_512": (8.9, 51.0)}
    for dt, (base, sol) in baselines_dac.items():
        dac_cfg = P.FeatureConfig(nfeatures=40000, descriptor_type=dt)
        bound = "mxu_bf16" if dt.startswith("hash_sift") else "vpu"
        metrics.append((
            f"detect_and_compute_4k_40k_{dt}",
            lambda dac_cfg=dac_cfg: P.detect_and_compute_jit(img4k, dac_cfg),
            8, base, bound, sol))
    for dt in ("bad_256", "hash_sift_256"):
        base, sol = baselines_dac[dt]
        dac_cfg = P.FeatureConfig(nfeatures=40000, descriptor_type=dt)
        bound = "mxu_bf16" if dt.startswith("hash_sift") else "vpu"
        metrics.append((
            f"detect_and_compute_4k_40k_{dt}_real",
            lambda dac_cfg=dac_cfg: P.detect_and_compute_jit(
                real_images["4k"], dac_cfg),
            8, base, bound, sol))

    # A/B: streaming fused Pallas matcher vs the XLA dense-matrix path
    # (sample_feature_matching / sample_image_sequence analogue at scale).
    # The XLA path is HBM-bound on the (N, N) i32 distance matrix (1 GB at
    # 16k x 16k x 512-bit, re-read 3x by argmin/top_k); the fused kernel
    # keeps the running top-2 in VMEM and is MXU-bound (2x +-1 GEMM for the
    # cross check).  40k x 40k is fused-only: the dense matrix would be
    # 6.4 GB.  Outputs are bit-identical (tests/test_matcher.py).
    from efficient_features_tpu.ops import matcher as Mm
    rngm = np.random.default_rng(11)
    dm1 = jnp.asarray(rngm.integers(0, 256, (16384, 64), dtype=np.uint8))
    dm2 = jnp.asarray(rngm.integers(0, 256, (16384, 64), dtype=np.uint8))
    metrics.append(("match16k_512_xla",
                    lambda: Mm.knn2_ratio_match(dm1, dm2, 0.8, fused=False),
                    8, None, "hbm", None))
    metrics.append(("match16k_512_fused",
                    lambda: Mm.knn2_ratio_match_fused(dm1, dm2, 0.8), 8,
                    None, "mxu_bf16", 3.4))
    dm3 = jnp.asarray(rngm.integers(0, 256, (40960, 64), dtype=np.uint8))
    dm4 = jnp.asarray(rngm.integers(0, 256, (40960, 64), dtype=np.uint8))
    metrics.append(("match40k_512_fused",
                    lambda: Mm.knn2_ratio_match_fused(dm3, dm4, 0.8), 4,
                    None, "mxu_bf16", 21.5))

    # steady-state streaming frame time (donated buffers; the reference's
    # DeviceBuffer reuse analogue) on FHD detect+compute+match
    from samples.sample_image_sequence import streaming_step_fn
    step, _state = streaming_step_fn(P.FeatureConfig(
        nfeatures=4000, descriptor_type="bad_256"), sizes["fhd"])
    frame = images["fhd"]
    metrics.append(("streaming_fhd_frame", lambda: step(frame), 32, None,
                    "vpu", None))

    # batched throughput: 4 FHD frames inside ONE executable (lax.map on a
    # single-device mesh) — per-frame cost amortizes dispatch overhead
    from efficient_features_tpu.parallel import sharding as SHm
    bmesh = SHm.make_mesh(1)
    bcfg = P.FeatureConfig(nfeatures=4000, descriptor_type="bad_256")
    batch4 = jnp.stack([images["fhd"]] * 4)
    metrics.append(("batch4_fhd",
                    lambda: SHm.detect_and_compute_batch(batch4, bcfg, bmesh),
                    8, None, "vpu", None))

    # ------------------------------------------------------------------
    # Warmup (compile everything), probe-iteration calibration, then three
    # interleaved passes.  Each pass measures, for every metric, its
    # bounding probe IMMEDIATELY before the metric — the adjacent pair is
    # what normalizes away this chip's minutes-scale share swings.
    # ------------------------------------------------------------------
    for _, fn, _, _, _, _ in metrics:
        read(fn())

    # the fixed per-window host round-trip tax (one-element read through the
    # tunnel): measured directly on a trivial cached executable, subtracted
    # from probe windows so probe RATES are honest at any share.  Metric
    # rows keep the tax (comparable with earlier rounds; 8-32 iters keep it
    # <~15%).
    tiny = jax.jit(lambda x: x + 1)
    read(tiny(jnp.float32(0)))
    tax_ms = min(time_once(lambda: tiny(jnp.float32(0)), 1) for _ in range(3))
    detail["read_tax_ms"] = round(tax_ms, 2)

    probe_iters = {}
    for name, (fn, _work) in probes.items():
        read(fn())
        t4 = time_once(fn, 4)
        t_est = max(t4 - tax_ms / 4, 0.05)     # net per-iter estimate
        probe_iters[name] = int(min(max(8, 250.0 / t_est), 256))

    def probe_rate(name):
        """ops-or-bytes/s for one adjacent probe window, tax-corrected."""
        fn, work = probes[name]
        iters = probe_iters[name]
        pms = time_once(fn, iters)
        net = max(pms - tax_ms / iters, 1e-3)
        return net, work / (net / 1e3)

    best = {key: float("inf") for key, *_ in metrics}
    adj_share = {}        # probe share recorded in the best pass
    probe_best = {name: float("inf") for name in probes}
    for _pass in range(3):
        # one standalone sweep of EVERY probe per pass, so the hw context is
        # populated even for resources no metric is bound by (round-4 fix:
        # hw_int8 reported 0.0 because no metric declared the int8 bound and
        # the probe never ran inside a pass)
        for name in probes:
            pms, _rate = probe_rate(name)
            probe_best[name] = min(probe_best[name], pms)
        for key, fn, iters, _base, bound, _sol in metrics:
            share = None
            if bound is not None:
                pms, rate = probe_rate(bound)
                probe_best[bound] = min(probe_best[bound], pms)
                share = rate / SPEC[bound]
            ms = time_once(fn, iters)
            if ms < best[key]:
                best[key] = ms
                if share is not None:
                    adj_share[key] = share

    # hardware context: best probe rates over the whole run
    detail["hw_bf16_tflops"] = round(
        probes["mxu_bf16"][1] / (probe_best["mxu_bf16"] / 1e3) / 1e12, 2)
    detail["hw_int8_tops"] = round(
        probes["mxu_int8"][1] / (probe_best["mxu_int8"] / 1e3) / 1e12, 2)
    detail["hw_vpu_tops"] = round(
        probes["vpu"][1] / (probe_best["vpu"] / 1e3) / 1e12, 3)
    detail["hw_hbm_gbps"] = round(
        probes["hbm"][1] / (probe_best["hbm"] / 1e3) / 1e9, 1)
    # measured stencil capability (no spec peak): full-tile vector ops/s on
    # kernel-shaped unaligned slices — the unit of the SOL.md detect model
    detail["hw_vpu_stencil_gvecops"] = round(
        probes["vpu_stencil"][1] / (probe_best["vpu_stencil"] / 1e3) / 1e9, 1)

    # device->host tunnel rate, measured honestly (round-4 fix): transfer a
    # FRESHLY COMPUTED 1 MB jit output (a constant-folded jnp.ones reads
    # back from a host-side cache at fantasy rates — the round-3 probe
    # recorded ~1000 GB/s while bulk fetches measurably ran at MB/s), and
    # cross-check with a second fetch of the SAME buffer (a large ratio
    # second/first exposes host-side caching of the first).
    d2h_src = jnp.arange(512 * 512, dtype=jnp.float32).reshape(512, 512)
    d2h_fn = jax.jit(lambda x, s: x * (np.float32(1.0) + s) + s)
    d2h_rates = []
    for p in range(2):
        buf = d2h_fn(d2h_src, jnp.float32(p * 1e-6))
        read(buf)                      # complete compute before timing d2h
        t0 = time.perf_counter()
        a = np.asarray(jax.device_get(buf))
        dt1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        np.asarray(jax.device_get(buf))
        dt2 = time.perf_counter() - t0
        # a recheck rate far above the first fetch exposes host-side
        # caching of the buffer (the round-3 probe's failure mode)
        d2h_rates.append((a.nbytes / dt1 / 1e9, a.nbytes / max(dt2, 1e-9) / 1e9))
    detail["hw_d2h_gbps"] = round(max(r[0] for r in d2h_rates), 4)
    detail["hw_d2h_recheck_gbps"] = round(max(r[1] for r in d2h_rates), 4)

    for key, _fn, _iters, base, bound, sol in metrics:
        detail[f"{key}_ms"] = round(best[key], 2)
        if base is not None:
            detail[f"{key}_vs_rtx3060ti"] = round(base / best[key], 4)
        share = adj_share.get(key)
        if share is not None:
            detail[f"{key}_share"] = round(share, 4)
            norm = best[key] * share
            detail[f"{key}_normalized_ms"] = round(norm, 3)
            if sol is not None:
                detail[f"{key}_sol_ms"] = sol
                detail[f"{key}_sol_residual"] = round(norm / sol, 2)
    if "batch4_fhd_ms" in detail:
        detail["batch4_fhd_per_frame_ms"] = round(detail["batch4_fhd_ms"] / 4,
                                                  2)

    # attach the stage profile (tools/profile_stages.py) and the A/B
    # decisions so the context travels with every bench record
    prof = os.path.join(here, "tools", "STAGE_PROFILE.json")
    if os.path.exists(prof):
        with open(prof) as f:
            detail["stage_profile"] = json.load(f)
        detail["stage_profile"].setdefault("note", (
            "2-3 iteration protocol: rows carry ~8-12 ms of fixed "
            "round-trip tax — use comparatively, not absolutely"))
    detail["decisions"] = {
        "hs_fused_kernel": "off by A/B, twice (round-3 rewrite samples the "
        "patch once, one-matmul exact gradients + per-block M=8 constant "
        "matmuls: 54.5 vs 44.1 ms at 40k; in-kernel constant matmuls are "
        "VMEM weight-stream-bound at small M while two-stage runs the same "
        "contractions as (40k,1024)-row GEMMs; EFF_TPU_FUSED_HS=1 opts in); "
        "round-4 healthy-share re-run (HBM 744 GB/s probed): still loses, "
        "47.8 vs 38.7 ms at 40k — decision closed",
        "bad_window_dma": "one DMA per distinct window (group) kept; "
        "per-program re-DMA measured equal within noise — r2 'regression' "
        "was share swing",
        "bad_formulation": "round 5 on-chip A/B: 'pair' default (40k sparse "
        "pair/roll/noroll = 22.3/26.4/28.7 ms; 100k 49.4/55.4/56.4); "
        "EFF_TPU_BAD_FORMULATION overrides",
        "pallas_resize": "XLA gather resize stays default (round-3 "
        "rectangular-tile pallas variant ties within noise: 22.3 vs 21.2 ms "
        "detect-4K, 65.0 vs 66.4 at 8K); round-4 healthy-share re-run "
        "(HBM 744 GB/s probed): 19.7 vs 17.4 at 4K, 54.2 vs 55.5 at 8K — "
        "still a loss/tie, decision closed; opt-in via "
        "FeatureConfig.pallas_resize / EFF_TPU_PALLAS_RESIZE",
        "cells_halo": "round 4: column halo 128->64 (the kernel support "
        "needs only 18; 64 keeps the DMA width a 128 multiple) — standalone "
        "cells-8K A/B: 14.33 vs 17.70 ms, and detect 4K/8K dropped "
        "20.3->17.4 / 66.5->55.5 together with the level-fit tiles and "
        "disc/Sobel pass cuts (SOL.md round-4 correction)",
        "read_protocol": "round 3.5: all timing windows end in a ONE-element "
        "host read; bulk d2h rides a ~MB/s tunnel and never sits inside a "
        "timing window; hw_d2h_gbps now measures a freshly computed jit "
        "output with a same-buffer recheck (round-4 fix — the old probe "
        "read a host-cached jnp.ones at a fantasy ~1000 GB/s)",
        "hs_hist_core": "round 3.5: the histogram contracts against the 16 "
        "core spatial-bin columns only and skips the provably-zero "
        "orientation-bin-9 matmul — 60% of hist matmul FLOPs removed, "
        "verified bit-identical",
        "warp_packed_gather": "round 4: the left/right bilinear one-hot "
        "gathers ride ONE matmul (right selector weighted 4096; fields are "
        "exact integers < 2^24 in the f32 accumulator, unpacked by a "
        "power-of-two divide) — halves the warp kernels' dominant MXU work "
        "bit-identically; same packing halves the fused-HS gradient "
        "constant (dx + 4096*dy)",
        "cpu_compile_cache": "round 4: XLA:CPU executables are never "
        "persisted — same-machine cache reads intermittently segfault in "
        "get_executable_and_time (compile-option pseudo-features never "
        "match the loader's host probe); TPU cache unaffected",
        "share_normalization": "round 4: per-metric bounding-resource "
        "probes measured ADJACENT to each metric in every pass; "
        "*_normalized_ms = ms * (adjacent probe rate / v5e spec) and "
        "*_sol_residual reconcile measurement against the SOL.md op-count "
        "model (see SOL.md 'model vs measured')",
        "real_vs_synthetic": "round 4: real-scene rows (tiled committed "
        "fixtures) measure EQUAL to synthetic within noise at every size "
        "(detect 4K 20.4 vs 20.3; dAC-BAD256 50.8 vs 50.5; detected-kp "
        "compute 24.8 vs 24.9) — keypoint spatial distribution does not "
        "shift window-group DMA counts enough to reorder any ranking; "
        "synthetic rows remain comparable across rounds",
        "fused_matcher": "round 10 on-chip A/B (tools/ab_fused_matcher.py): "
        "streaming fused Pallas top-2 matcher 16.0 ms vs dense XLA 231.2 ms "
        "at 16k x 16k x 512-bit (14.4x; 0 differing output entries), 40k x "
        "40k fused-only 79.8 ms (the dense matrix would be 6.4 GB; 2048-"
        "query XLA spot parity 0 diffs) — fused is the DEFAULT on the TPU "
        "backend for match/knn2_ratio_match[_masked]; EFF_TPU_FUSED_MATCH "
        "and the fused= kwarg override; the dense path stays for CPU/"
        "interpret and A/Bs",
        "vector_op_floor": "round 4: on a probed-healthy session (bf16 "
        "204 TFLOPs, HBM 779 GB/s adjacent) the pipelines still run 10-55x "
        "above the old ALU-peak SOL — the kernels are bound by FULL-TILE "
        "VECTOR-OP throughput (unaligned slices/rotates/compares), probed "
        "at hw_vpu_stencil_gvecops, ~10-20x below the 4 Tops ALU estimate; "
        "SOL.md's corrected model closes the residual (detect-4K: ~430 "
        "vector ops/tile x 92 tiles matches the measured 16.9 ms cells "
        "stage)",
    }

    ms = best["detect_and_compute_4k_40k_bad_256"]
    baseline_ms = 7.2
    vs = baseline_ms / ms

    with open("BENCH_DETAIL.json", "w") as f:
        json.dump(detail, f, indent=2)
    print(json.dumps(detail, indent=2), file=sys.stderr)

    print(json.dumps({
        "metric": "detect_and_compute_4k_40k_bad256_ms",
        "value": round(ms, 3),
        "unit": "ms",
        "vs_baseline": round(vs, 4),
    }))


if __name__ == "__main__":
    main()
