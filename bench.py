"""Benchmark harness (the reference's sample_benchmark analogue,
/root/reference/samples/sample_benchmark.cpp:39-142).

Prints ONE JSON line with the headline metric:
  detectAndCompute of up to 40k keypoints on a 4K image, BAD-256,
  milliseconds; vs_baseline = reference RTX 3060 Ti time (7.2 ms,
  README.md:68-70) / ours.

Driver-proof protocol (round 5 — round 4's bench timed out under the
driver and recorded NOTHING, which taught us the reference's lesson the
hard way: sample_benchmark.cpp always completes and always reports):
  * The HEADLINE metric is measured FIRST and its one-line JSON is printed
    (and flushed) immediately — a later kill cannot erase the round's
    number.  Nothing else is ever printed to stdout.
  * BENCH_DETAIL.json is rewritten ATOMICALLY after EVERY metric; a kill
    at any point preserves all completed rows plus a "skipped" list.
  * A wall-clock budget (env EFF_TPU_BENCH_BUDGET_S, default 1140 s from
    PROCESS START) gates each remaining metric; past 0.55/0.8 of it the
    pass count degrades 3->2->1, and optional rows (A/Bs, real-scene
    duplicates, the dense matcher, pallas-resize) are skipped first.
  * tools/warm_cache.py pre-compiles every bench shape into .xla_cache
    (machine-persistent, NOT committed — multi-GB; the driver benches on
    the same machine), so the round-end run is compile-free.

Timing protocol: under the axon tunnel, per-call host syncs cost ~30 ms and
jax.block_until_ready returns early, so each measurement queues N dispatches
and forces completion with a single host read of ONE output element.  The
measurement window still carries a fixed ~25 ms round-trip tax (round-3
probe: detect-FHD per-iter = 33/18/9 ms at 1/3/24 iters), so iteration
counts are 8+ to amortize it — matching the reference protocol's 100
iterations (sample_benchmark.cpp:39-52) in spirit.

Share normalization (round 4, hardened round 5): this dev chip is
time-shared with 5-10x share swings on a minutes scale, so absolute ms mean
little.  Every metric declares its bounding resource (from the SOL.md
op-count model) and, in each measurement pass, its probe for that resource
runs immediately BEFORE and AFTER the metric; the pass share is the mean of
the two and the pass normalized time is ms * share.  BENCH_DETAIL carries,
per metric:
  *_ms             best wall-clock over the passes
  *_share          median pass share (adjacent probe rate / v5e spec rate)
  *_share_spread   max/min pass share — >2 means the share swung during
                   this row and the normalized number is low-confidence
  *_normalized_ms  median over passes of (pass ms * pass share)
  *_sol_ms         the SOL.md corrected vector-pass model at spec
  *_sol_residual   normalized_ms / sol_ms  (1.0 = kernel achieves model)
Shares above 1.05 are FLAGGED (``share_flags``) and clamped to 1.0 in the
normalization — a probe beating spec means the probe (or the spec entry)
is wrong, not the chip.  Round-4 weakness closed in round 5: hw_bf16 read
264.8 TFLOPs on a 197-TFLOP part because (a) the differential two-window
estimate overshoots without bound when the share improves between windows
(now floored at t2 - tax/k) and (b) the hw context took the BEST window
over the whole run — the max of many noisy estimates (now the MEDIAN of
every window, with the best kept as *_best and >1.1x-spec medians flagged
in hw_flags).

Real scenes: detect and detectAndCompute also run on scenes tiled from the
committed real fixtures (tests/data/real_montage.png — real photographic
statistics, tools/make_fixtures.py); the reference's baselines average 11
real SceauxCastle photos (README.md:46-50).  Round-4 finding: real rows
measure equal to synthetic within noise (recorded in decisions).
"""
import json
import os
import sys
import time

import numpy as np

# v5e public spec peaks (SOL.md): bf16 MXU, int8 MXU, HBM stream; the VPU
# figure is an ESTIMATE (8 sublanes x 128 lanes x ~4 ALUs x ~0.94 GHz)
SPEC = {"mxu_bf16": 197e12, "mxu_int8": 394e12, "vpu": 4e12, "hbm": 819e9}

HEADLINE_KEY = "detect_and_compute_4k_40k_bad_256"
HEADLINE_BASELINE_MS = 7.2


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


def build_probes():
    """Per-resource hardware probes: name -> (fn, work_per_call).

    Random (not constant) operands, so no backend fast path can flatter a
    rate; each probe is sized so its resource (not the fixed round-trip
    tax or HBM) bounds the window.
    """
    import jax
    import jax.numpy as jnp

    # random operands generated ON DEVICE (jax.random under jit): host
    # transfers of ~100 MB would crawl through the MB/s tunnel, while
    # constant operands (the round-4 probes used jnp.ones) risk backend
    # fast paths flattering the rate
    def dev_rand(shape, dtype, lo, hi, seed):
        k = jax.random.PRNGKey(seed)
        x = jax.jit(lambda k: jax.random.uniform(
            k, shape, jnp.float32, lo, hi))(k)
        if dtype == jnp.int8:
            return jax.jit(lambda v: jnp.round(v).astype(jnp.int8))(x)
        return jax.jit(lambda v, d=dtype: v.astype(d))(x)

    pa = dev_rand((4096, 4096), jnp.bfloat16, -1.0, 1.0, 0)
    p_mm = jax.jit(lambda a: jnp.dot(a, a, preferred_element_type=jnp.float32))
    pi = dev_rand((2048, 2048), jnp.int8, -3.0, 3.0, 1)
    p_i8 = jax.jit(lambda a: jnp.dot(a, a, preferred_element_type=jnp.int32))
    pv = dev_rand((256, 512), jnp.float32, 0.9, 1.1, 2)

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

    ph = dev_rand((4096, 4096), jnp.float32, -1.0, 1.0, 3)
    p_hbm = jax.jit(lambda x: x * np.float32(1.000001) + np.float32(0.001))

    # stencil probe: unaligned lane-slice + add chain on a kernel-shaped
    # (176, 1408) i32 tile — the op mix that actually bounds the detect /
    # window kernels (Mosaic full-tile vector ops; round-4 finding: these
    # run ~2.5-3x slower per element than fma chains and ~10-20x below the
    # ALU-peak VPU estimate, which is where the old SOL's 50x residual
    # lived).  work = slice+add per step = 2 vector ops x 16 steps.
    pst = jax.jit(lambda k: jax.random.randint(
        k, (176, 1408), 0, 255, jnp.int32))(jax.random.PRNGKey(4))

    @jax.jit
    def p_stencil(x):
        acc = jax.lax.slice(x, (0, 0), (176, 1280))
        for d in range(1, 17):
            acc = acc + jax.lax.slice(x, (0, d), (176, 1280 + d))
        return acc

    return {
        "mxu_bf16": (lambda: p_mm(pa), 2 * 4096 ** 3),
        "mxu_int8": (lambda: p_i8(pi), 2 * 2048 ** 3),
        "vpu": (lambda: p_vpu(pv), 2.0 * 16 * 128 * 256 * 512),
        "vpu_stencil": (lambda: p_stencil(pst), 2.0 * 16 * 176 * 1280),
        "hbm": (lambda: p_hbm(ph), 2 * ph.size * 4),
    }
    # vpu_stencil has no published spec peak — it is recorded as a measured
    # capability (Gvecop/s) for the SOL.md model and never normalizes a
    # metric (no metric declares it as bound, so SPEC needs no entry)


def build_metrics():
    """The full metric registry, in measurement-priority order.

    Returns the metrics list.  Each metric is a dict:
      key       row name in BENCH_DETAIL
      fn        zero-arg callable dispatching one iteration
      iters     dispatches per timing window (>=8 per the tax protocol,
                except noted heavyweights)
      baseline  reference RTX 3060 Ti ms (None = no reference row)
      bound     probe name measured adjacent to this metric
      sol       SOL.md corrected model ms at v5e spec (None = unmodeled)
      optional  True rows are skipped first under the time budget
      decision  key into the decisions dict that controls this row's
                shipped default (A/B rows only; round-4 Weak #6)
    """
    import jax.numpy as jnp
    from efficient_features_tpu import pipeline as P
    from efficient_features_tpu.ops import window_kernels as WKm
    from efficient_features_tpu.ops import pallas_kernels as PKm
    from efficient_features_tpu.ops import matcher as Mm
    from efficient_features_tpu.parallel import sharding as SHm
    from samples.sample_image_sequence import streaming_step_fn

    sizes = {"fhd": (1080, 1920), "4k": (2160, 3840), "8k": (4320, 7680)}

    # LAZY operand builders: only the headline's 4K image is materialized
    # before the headline row measures.  Eagerly shipping every image
    # (FHD/4K/8K synthetic + real ~ 86 MB host->device) could delay the
    # headline print by minutes on a slow tunnel (hw_d2h has measured
    # 0.014 GB/s); each builder memoizes so a row's first (untimed)
    # warm-up call pays the transfer exactly once
    import functools as _ft

    @_ft.lru_cache(maxsize=None)
    def image(k):
        return jnp.asarray(make_bench_image(*sizes[k]))

    @_ft.lru_cache(maxsize=None)
    def real_image(k):
        return jnp.asarray(make_real_scene(*sizes[k]))

    img4k = image("4k")
    h, w = sizes["4k"]

    def M(key, fn, iters, baseline, bound, sol, optional=False,
          decision=None):
        return dict(key=key, fn=fn, iters=iters, baseline=baseline,
                    bound=bound, sol=sol, optional=optional,
                    decision=decision)

    metrics = []

    # ------------------------------------------------------------------
    # HEADLINE first (printed the moment it is measured):
    # detectAndCompute, 40k keypoints, 4K, BAD-256 (README.md:66-71)
    # ------------------------------------------------------------------
    dac_cfgs = {dt: P.FeatureConfig(nfeatures=40000, descriptor_type=dt)
                for dt in ("bad_256", "bad_512", "hash_sift_256",
                           "hash_sift_512")}
    baselines_dac = {"bad_256": (7.2, 44.0), "bad_512": (8.2, 47.0),
                     "hash_sift_256": (8.5, 50.0), "hash_sift_512": (8.9, 51.0)}
    metrics.append(M(
        HEADLINE_KEY,
        lambda: P.detect_and_compute_jit(img4k, dac_cfgs["bad_256"]),
        8, 7.2, "vpu", 44.0))

    # ------------------------------------------------------------------
    # Core reference-protocol rows
    # ------------------------------------------------------------------
    # detect-only, 10k keypoints (README.md:52-55 protocol)
    det_cfg = P.FeatureConfig(nfeatures=10000, descriptor_type="bad_256")
    baselines_detect = {"fhd": 1.6, "4k": 2.9, "8k": 5.5}
    # sol values are the CORRECTED vector-pass model band midpoints at
    # spec (SOL.md "Model vs measured", post round-4 pass cuts); the
    # retracted ALU-peak bounds (0.1/0.4/1.6 etc.) live in SOL.md only.
    sol_detect = {"fhd": 7.0, "4k": 18.0, "8k": 62.0}
    for k in sizes:
        metrics.append(M(f"detect_{k}",
                         lambda k=k: P.detect_jit(image(k), det_cfg),
                         32 if k != "8k" else 16, baselines_detect[k],
                         "vpu", sol_detect[k]))

    # compute-only: 40k fixed keypoints on the 4K image (README.md:58-63)
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
        metrics.append(M(
            f"compute40k_{kind}{bits}",
            lambda kind=kind, bits=bits:
                P.compute_jit(img4k, kps_j, valid, bits, kind, 1.0, True),
            8, base, bound, sol))

    # batched throughput scaling (round-4 verdict #6) — EARLY since round
    # 5: the first 1140-s driver-budget run exhausted its wall on
    # executable loads before reaching these, and the frames/s crossover
    # curve is the round's priority evidence, so they run right after the
    # single-frame compute rows
    bmesh = SHm.make_mesh(1)
    bcfg = P.FeatureConfig(nfeatures=4000, descriptor_type="bad_256")

    @_ft.lru_cache(maxsize=None)
    def batch_frames(k, nb):
        return jnp.stack([image(k)] * nb)

    for nb in (1, 4, 8, 16):
        metrics.append(M(
            f"batch{nb}_fhd",
            lambda nb=nb: SHm.detect_and_compute_batch(
                batch_frames("fhd", nb), bcfg, bmesh),
            8, None, "vpu", None))
    bcfg4k = P.FeatureConfig(nfeatures=10000, descriptor_type="bad_256")
    for nb in (4, 8):
        metrics.append(M(
            f"batch{nb}_4k",
            lambda nb=nb: SHm.detect_and_compute_batch(
                batch_frames("4k", nb), bcfg4k, bmesh),
            8, None, "vpu", None))

    # streaming fused Pallas matcher (the shipped TPU default; the dense
    # XLA A/B row is optional, below)
    rngm = np.random.default_rng(11)
    dm1 = jnp.asarray(rngm.integers(0, 256, (16384, 64), dtype=np.uint8))
    dm2 = jnp.asarray(rngm.integers(0, 256, (16384, 64), dtype=np.uint8))
    metrics.append(M("match16k_512_fused",
                     lambda: Mm.knn2_ratio_match_fused(dm1, dm2, 0.8), 8,
                     None, "mxu_bf16", 3.4,
                     decision="fused_matcher"))

    # remaining detectAndCompute descriptors
    for dt in ("bad_512", "hash_sift_256", "hash_sift_512"):
        base, sol = baselines_dac[dt]
        bound = "mxu_bf16" if dt.startswith("hash_sift") else "vpu"
        metrics.append(M(
            f"detect_and_compute_4k_40k_{dt}",
            lambda dt=dt: P.detect_and_compute_jit(img4k, dac_cfgs[dt]),
            8, base, bound, sol))

    # ------------------------------------------------------------------
    # Secondary rows: real scenes, detected keypoints, masked, streaming,
    # batch throughput scaling, fused matcher
    # ------------------------------------------------------------------
    # real-scene rows are OPTIONAL since round 5: the round-4 run measured
    # them equal to synthetic within noise at every size (decision
    # real_vs_synthetic), and each is a heavyweight pipeline signature —
    # demoting them buys budget for the batch-scaling curve (verdict #6)
    for k in sizes:
        metrics.append(M(f"detect_{k}_real",
                         lambda k=k: P.detect_jit(real_image(k), det_cfg),
                         32 if k != "8k" else 16, baselines_detect[k],
                         "vpu", sol_detect[k], optional=True,
                         decision="real_vs_synthetic"))
    for dt in ("bad_256", "hash_sift_256"):
        base, sol = baselines_dac[dt]
        bound = "mxu_bf16" if dt.startswith("hash_sift") else "vpu"
        metrics.append(M(
            f"detect_and_compute_4k_40k_{dt}_real",
            lambda dt=dt: P.detect_and_compute_jit(real_image("4k"),
                                                   dac_cfgs[dt]),
            8, base, bound, sol, optional=True,
            decision="real_vs_synthetic"))

    # compute-only on DETECTOR keypoints (the reference's compute protocol,
    # sample_benchmark.cpp:125-133): multi-octave sizes (31..111 at 8
    # levels) through the octave-bucketed window kernels — on the synthetic
    # AND the real scene (keypoint spatial distribution drives the DMA
    # group count)
    det40 = P.FeatureConfig(nfeatures=40000, descriptor_type="bad_256")
    br40 = tuple(
        (a, b, (WKm.bucket_scale(sz / 32.0)
                if sz / 32.0 <= WKm._S_CAP else None))
        for (a, b, sz) in P.level_slot_ranges(det40, *sizes["4k"]))
    detected_kp_cache = {}

    def detected_kps(tag, src):
        # lazy: running detect at 40k here would compile two large shapes
        # BEFORE the headline metric prints (round-5 driver-proofing: no
        # work ahead of the headline that isn't the headline's own)
        if tag not in detected_kp_cache:
            slots40 = P.detect_jit(src, det40)
            kp40 = jnp.stack([slots40["x"], slots40["y"], slots40["size"],
                              slots40["angle"]], axis=1).astype(jnp.float32)
            detected_kp_cache[tag] = (kp40, slots40["valid"])
        return detected_kp_cache[tag]

    for tag, srcf in (("", lambda: img4k), ("_real",
                                            lambda: real_image("4k"))):
        for kind, base, bound, sol in (("bad", 1.5, "vpu", 25.0),
                                       ("hash_sift", 3.5, "mxu_bf16", 32.0)):
            def fn(tag=tag, srcf=srcf, kind=kind):
                src = srcf()
                kp40, valid40 = detected_kps(tag, src)
                return P.compute_bucketed_jit(src, kp40, valid40, 256, kind,
                                              1.0, br40)
            metrics.append(M(f"compute40k_detected_{kind}256{tag}", fn,
                             8, base, bound, sol,
                             optional=(tag == "_real"),
                             decision=("real_vs_synthetic" if tag == "_real"
                                       else None)))

    # masked detect (round-2 verdict: the masked path must not cliff)
    @_ft.lru_cache(maxsize=None)
    def mask4k_arr():
        return jnp.asarray(np.ones(sizes["4k"], np.uint8))
    metrics.append(M("detect_4k_masked",
                     lambda: P.detect_masked_jit(img4k, mask4k_arr(),
                                                 det_cfg),
                     24, None, "vpu", None))

    # steady-state streaming frame time (donated buffers; the reference's
    # DeviceBuffer reuse analogue) on FHD detect+compute+match
    step, _state = streaming_step_fn(P.FeatureConfig(
        nfeatures=4000, descriptor_type="bad_256"), sizes["fhd"])
    metrics.append(M("streaming_fhd_frame", lambda: step(image("fhd")),
                     32, None, "vpu", None))

    # cells-kernel column halo 64 (round-4 default) vs 128 (rounds 1-3) on
    # the 8K level-0 image — REQUIRED since round 5: this near-equal pair
    # is the SANITY CHECK for share normalization (verdict Weak #3: two
    # back-to-back variants of the same kernel must normalize within
    # ~1.3x, recorded as sanity_norm_ratio_cells_halo)
    for hx in (None, 128):
        metrics.append(M(
            f"cells_8k_halo{hx or 64}",
            lambda hx=hx: PKm.fast_harris_nms_cells(image("8k"), 20, 15,
                                                    None, hx),
            16, None, "hbm", None, decision="cells_halo"))

    # ------------------------------------------------------------------
    # Optional rows (skipped first under the time budget): A/Bs whose
    # decisions are already recorded, plus heavyweight matcher scale rows
    # ------------------------------------------------------------------
    # A/B: BAD kernel formulations on the same synthetic 40k size-31
    # keypoints — "roll" (round-2/3 per-keypoint window rotation), "noroll"
    # (round-4: per-DMA int8 cache + one-hot column compaction + XLA-side
    # trig), "pair" (round-5 default: two keypoints block-diagonal in one
    # full-MXU-tile box matmul).
    kx, ky, ksz, kang = (kps_j[:, 0], kps_j[:, 1], kps_j[:, 2], kps_j[:, 3])
    for form in ("pair", "noroll", "roll"):
        metrics.append(M(
            f"compute40k_bad256_{form}",
            lambda form=form: WKm.bad_descriptors_windows(
                img4k, kx, ky, ksz, kang, valid, 256, 1.0,
                WKm._S_BASE, "group", formulation=form),
            8, None, "vpu", None, optional=True,
            decision="bad_formulation"))

    # A/B: fused HashSIFT kernel vs the two-stage path (patch kernel
    # + XLA histogram); the default compute row uses the two-stage path
    import jax as _jax
    from efficient_features_tpu import pipeline as _P

    @_jax.jit
    def hs_fused(img, kp, v):
        d = WKm.hs_desc_windows(img, kp[:, 0], kp[:, 1], kp[:, 2],
                                kp[:, 3], v, 1.0)
        return _P._hs_from_fused(d, v, 256)

    @_jax.jit
    def hs_unfused(img, kp, v):
        patches = WKm.warp_patches_windows(img, kp[:, 0], kp[:, 1],
                                           kp[:, 2], kp[:, 3], v, 1.0)
        return _P._hs_from_patches(patches, v, 256)

    metrics.append(M("compute40k_hs256_fused",
                     lambda: hs_fused(img4k, kps_j, valid), 8, None,
                     "mxu_bf16", None, optional=True,
                     decision="hs_fused_kernel"))
    metrics.append(M("compute40k_hs256_unfused",
                     lambda: hs_unfused(img4k, kps_j, valid), 8, None,
                     "mxu_bf16", 32.0, optional=True,
                     decision="hs_fused_kernel"))

    # A/B: HS histogram tail backend on SHARED warp patches (round-5
    # decision hs_hist_backend; tools/ab_hs_hist.py is the controlling
    # interleaved A/B).  Lazy: the warp stage runs once, on first dispatch,
    # only if the budget reaches these optional rows.
    from efficient_features_tpu.ops import hash_sift as HSm
    from efficient_features_tpu.ops import bad as BADm
    from efficient_features_tpu.models.params import load_hash_sift_matrix

    _hs_patches = []

    def _tail_patches():
        if not _hs_patches:
            _hs_patches.append(_jax.jit(
                lambda: WKm.warp_patches_windows(
                    img4k, kx, ky, ksz, kang, valid, 1.0))())
        return _hs_patches[0]

    @_jax.jit
    def hs_tail_xla(patches, v):
        responses = HSm.patch_sift_responses(patches.reshape(-1, 32, 32))
        B = jnp.asarray(load_hash_sift_matrix(256))
        proj = jnp.dot(responses, B.T, preferred_element_type=jnp.float32,
                       precision="highest")
        bits = jnp.where(v[:, None], (proj > 0).astype(jnp.int32), 0)
        return BADm.pack_bits_msb(bits)

    @_jax.jit
    def hs_tail_pallas(patches, v):
        d = WKm.hs_hist_from_patches(patches.reshape(-1, 1024))
        return _P._hs_from_fused(d, v, 256)

    for tk, tfn in (("xla", hs_tail_xla), ("pallas", hs_tail_pallas)):
        metrics.append(M(f"hs40k_tail_{tk}",
                         lambda tfn=tfn: tfn(_tail_patches(), valid),
                         16, None, "mxu_bf16", None, optional=True,
                         decision="hs_hist_backend"))

    # A/B: warp kernel body (round-8) — "select": full-height (128, npx)
    # row-index wheres; "split": per-half (64, npx) builds with hoisted
    # pair-invariant iotas.  Bit-identical; the standalone warp is ~70% of
    # the HS pipeline (round-3.5 honest split: warp 26.8 of 46.6).
    for wbody in ("select", "split"):
        metrics.append(M(
            f"warp40k_{wbody}",
            lambda wbody=wbody: WKm.warp_patches_windows(
                img4k, kx, ky, ksz, kang, valid, 1.0, body_kind=wbody),
            8, None, "vpu", None, optional=True,
            decision="warp_body"))

    # A/B: Pallas tiled MXU resize vs XLA-gather pyramid (detect 4K/8K)
    for k in ("4k", "8k"):
        cfgp = P.FeatureConfig(nfeatures=10000, descriptor_type="bad_256",
                               pallas_resize=True)
        metrics.append(M(
            f"detect_{k}_pallas_resize",
            lambda k=k, cfgp=cfgp: P.detect_jit(image(k), cfgp),
            10, None, "hbm", None, optional=True, decision="pallas_resize"))

    # A/B: dense XLA matcher (HBM-bound on the (N, N) i32 distance matrix,
    # ~1 GB at 16k x 16k x 512-bit re-read 3x) vs the fused default above;
    # 40k x 40k is fused-only (the dense matrix would be 6.4 GB)
    metrics.append(M("match16k_512_xla",
                     lambda: Mm.knn2_ratio_match(dm1, dm2, 0.8, fused=False),
                     8, None, "hbm", None, optional=True,
                     decision="fused_matcher"))
    dm3 = jnp.asarray(rngm.integers(0, 256, (40960, 64), dtype=np.uint8))
    dm4 = jnp.asarray(rngm.integers(0, 256, (40960, 64), dtype=np.uint8))
    metrics.append(M("match40k_512_fused",
                     lambda: Mm.knn2_ratio_match_fused(dm3, dm4, 0.8), 8,
                     None, "mxu_bf16", 21.5, optional=True,
                     decision="fused_matcher"))

    return metrics


def decisions_dict():
    """A/B decisions and protocol notes that travel with every bench
    record.  A/B metric rows reference these via their ``decision`` field
    (BENCH_DETAIL ``*_decision_ref`` columns) — single-session A/B rows
    can contradict the shipped default when the share swings between rows;
    the referenced decision names the controlling interleaved A/B and its
    hardware context (round-4 verdict Weak #6)."""
    return {
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
        "bad_formulation": "round 5 on-chip interleaved A/B (healthy share, "
        "30.5 TFLOPs / 54 GB/s context): 'pair' default (40k sparse "
        "pair/roll/noroll = 22.3/26.4/28.7 ms; 100k 49.4/55.4/56.4); "
        "single-session bench rows can rank differently under share swing "
        "— the interleaved A/B controls; EFF_TPU_BAD_FORMULATION overrides",
        "pallas_resize": "XLA gather resize stays default (round-3 "
        "rectangular-tile pallas variant ties within noise: 22.3 vs 21.2 ms "
        "detect-4K, 65.0 vs 66.4 at 8K); round-4 healthy-share re-run "
        "(HBM 744 GB/s probed): 19.7 vs 17.4 at 4K, 54.2 vs 55.5 at 8K — "
        "still a loss/tie, decision closed; opt-in via "
        "FeatureConfig.pallas_resize / EFF_TPU_PALLAS_RESIZE",
        "hs_hist_backend": "round 5 on-chip interleaved A/B (tools/"
        "ab_hs_hist.py, 3 passes x 16 iters, byte parity asserted first: "
        "2 differing bytes of 1.3M, budget 263): the standalone Pallas "
        "hist kernel (window_kernels._hs_hist_kernel — the fused kernel's "
        "hist tail at M=256 rows/program, VMEM-resident) runs the 40k "
        "hist+projection tail in 5.43 ms vs the XLA stage's 13.5 (2.5x; "
        "warp stage 22.7 for context) — 'pallas' is the TPU default "
        "(EFF_TPU_HS_HIST overrides).  Confirms the round-4 verdict's "
        "HS-residual diagnosis: the stage was HBM-traffic bound on ~15 "
        "materialized (N,900)-class intermediates, and the fused kernel's "
        "earlier losses were the per-keypoint M=8 weight streams, not "
        "in-kernel hist math itself",
        "kernel_cache_collision": "round-5 DISCOVERY (the round's biggest "
        "correctness event): compiled Pallas kernel binaries are cached "
        "per process by kernel identity, NOT content — two same-name "
        "kernel variants in one process silently share whichever binary "
        "compiled first (proven: log-then-chain FAST variants returned "
        "bit-identical WRONG outputs; chain alone is correct).  This "
        "voided three recorded A/Bs (fast_run9, warp_body, the first "
        "cells_box7 run — its 'mxu' arm compiled in 0.2 s, a cache hit "
        "on the vpu binary) and shipped a real miscompile (see "
        "fast_run9).  Rule: same-process A/B variants must differ in "
        "kernel def NAME (see _fast_harris_nms_reduced_kernel_mxu) or "
        "run in separate processes; a sub-second 'compile' of a "
        "never-compiled variant is the tell",
        "fast_run9": "round-5 CORRECTION: the round-9 'log' dual-field "
        "rotate-AND form MISCOMPILES under Mosaic — its binary "
        "deterministically misses wrap-run corners (darker=0x80FF class; "
        "675 misses on the 200x280 tier scene, 1021 at FHD) while the "
        "identical algebra is exhaustively correct in numpy over all "
        "2^16 masks.  The validating round-9 A/B was void (kernel-cache "
        "collision, above) and the compiled tier had not run between "
        "rounds 8 and 10; caught by this round's tier-vs-oracle run.  "
        "The rounds-1-8 two-mask 8-step chain is restored as the ONLY "
        "form; the packed form is removed",
        "warp_body": "round-9 'select vs split TIE' was void (kernel-cache "
        "collision); round-5 DECOLLIDED rerun (split via its own kernel "
        "def name _warp_kernel_split): genuinely 0 differing bytes "
        "compiled and a timing tie (select 29.0 vs split 28.6 ms at 40k, "
        "overlapping passes) — select stays default, EFF_TPU_WARP_BODY="
        "split is a validated opt-in",
        "cells_box7": "round 5, DECIDED by the decollided A/B (the first "
        "run was void — its mxu arm 'compiled' in 0.2 s, a kernel-cache "
        "hit on the vpu binary; rerun after routing mxu through its own "
        "kernel def name, real 27/23 s compiles): compiled outputs "
        "bit-identical to vpu at both sizes, timing a size-split WASH — "
        "4K mxu 4.53 vs vpu 4.66 ms (mxu +3% every pass), 8K mxu 13.35 "
        "vs vpu 13.14 (vpu +1.6%) — so 'vpu' stays the default and "
        "EFF_TPU_CELLS_BOX7=mxu is a validated opt-in.  This closes the "
        "round-4 verdict's structural question with data: riding the "
        "idle MXU does NOT break the vector-pass floor; the limb "
        "build/recombine tax eats the removed horizontal passes, as the "
        "op-count model predicted",
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
        "share_normalization": "round 5: per-metric bounding-resource "
        "probes run immediately BEFORE and AFTER each metric in every "
        "pass; pass share = mean of the two, *_normalized_ms = median over "
        "passes of (pass ms * pass share), *_share_spread = max/min pass "
        "share (>2 = low confidence), shares >1.05 flagged + clamped",
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
        "bench_protocol": "round 5 (driver-proof rewrite after BENCH_r04 "
        "rc=124): headline measured+printed FIRST; BENCH_DETAIL rewritten "
        "atomically after every metric; EFF_TPU_BENCH_BUDGET_S wall budget "
        "skips optional rows (A/Bs, dense matcher, pallas-resize) on slow "
        "shares, recording them in 'skipped'; tools/warm_cache.py + the "
        "machine-persistent .xla_cache/tpu (multi-GB, NOT committed — it "
        "lives on the build machine's disk where the driver also runs) "
        "keep the driver run compile-free; a fresh clone must re-run "
        "warm_cache once",
    }


def main():
    import jax

    t_start = time.perf_counter()
    # default sized for a warm .xla_cache run; a cold or slow-share session
    # degrades to fewer passes past 0.55/0.8 of the budget and skips rows
    # (optional first) instead of overrunning the driver's timeout
    # (unknown; round 4's bench died at it with the old compute-everything-
    # then-print protocol, so the headline prints first regardless)
    budget_s = float(os.environ.get("EFF_TPU_BENCH_BUDGET_S", "1140"))

    # persistent compile cache: the bench compiles ~10 large pipeline
    # signatures (minutes each on the tunneled dev toolchain); cached
    # executables make repeat runs start in seconds.  Keyed by backend
    # platform (shared scheme with __graft_entry__._enable_compile_cache).
    here = os.path.dirname(os.path.abspath(__file__))
    from efficient_features_tpu.utils import compile_cache
    compile_cache.setup(os.path.join(here, ".xla_cache"),
                        jax.default_backend())

    import jax.numpy as jnp

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
              "spec_note": "v5e public peaks; vpu is an ESTIMATE (SOL.md)",
              "budget_s": budget_s,
              "skipped": [],
              "share_flags": {}}

    detail_path = os.path.join(here, "BENCH_DETAIL.json")

    def flush_detail():
        """Atomic rewrite — a kill at any point preserves completed rows."""
        tmp = detail_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(detail, f, indent=2)
        os.replace(tmp, detail_path)

    probes = build_probes()
    metrics = build_metrics()

    # the fixed per-window host round-trip tax (one-element read through the
    # tunnel): measured directly on a trivial cached executable, subtracted
    # from probe windows so probe RATES are honest at any share.  Metric
    # rows keep the tax (comparable with earlier rounds; 8-32 iters keep it
    # <~15%).
    tiny = jax.jit(lambda x: x + 1)
    read(tiny(jnp.float32(0)))
    tax_ms = min(time_once(lambda: tiny(jnp.float32(0)), 1) for _ in range(3))
    detail["read_tax_ms"] = round(tax_ms, 2)

    # probe-iteration calibration to a ~120 ms base window (each probe
    # call runs a k-iter and a 2k-iter window; four probe calls run per
    # metric per pass, so window length is the main bench-duration lever)
    probe_iters = {}
    for name, (fn, _work) in probes.items():
        read(fn())
        t4 = time_once(fn, 4)
        t_est = max(t4 - tax_ms / 4, 0.05)     # net per-iter estimate
        probe_iters[name] = int(min(max(8, 120.0 / t_est), 192))

    def probe_rate(name):
        """ops-or-bytes/s for one adjacent probe: DIFFERENTIAL two-window
        timing (k and 2k iters; per-iter = 2*t_2k - t_k) cancels the fixed
        round-trip tax exactly instead of subtracting a separately-measured
        estimate — the round-5 probe-credibility fix: a 62 ms tax estimate
        captured during a slow tunnel moment over-subtracted 0.24 ms/iter
        from 0.13 ms/iter probes and reported shares of 3-7.  If the share
        swings between the two windows the difference can collapse; it is
        floored at a third of the 2k-window mean so a single bad pair can
        inflate a rate by at most 3x (flagged via share_spread/median
        anyway)."""
        fn, work = probes[name]
        k = probe_iters[name]
        t1 = time_once(fn, k)
        t2 = time_once(fn, 2 * k)
        # floor 2: the true per-iter is t2 minus the tax amortized over 2k
        # iters; allowing tax up to 2x the measured estimate bounds a lucky
        # second window's overshoot to ~tax/k relative (the round-4 run
        # recorded hw_bf16_tflops = 264.8 on a 197-TFLOP part because a
        # share swing between the two windows shrank the difference — the
        # differential's overshoot is unbounded without this floor)
        per = max(2 * t2 - t1, t2 - tax_ms / k, t2 / 3.0, 1e-3)
        rate = work / (per / 1e3)
        probe_samples[name].append(rate)
        return per, rate

    probe_samples = {name: [] for name in probes}

    def measure_metric(m, passes=3):
        """Warm (compile), then `passes` interleaved (probe, metric, probe)
        windows.  Fills detail columns for this metric and flushes."""
        key = m["key"]
        read(m["fn"]())                      # warmup / compile
        rows = []                            # (ms, share_lo_clamped, share)
        for _ in range(passes):
            share = None
            if m["bound"] is not None:
                _pms, rate = probe_rate(m["bound"])
                share_pre = rate / SPEC[m["bound"]]
            ms = time_once(m["fn"], m["iters"])
            if m["bound"] is not None:
                _pms, rate = probe_rate(m["bound"])
                share = 0.5 * (share_pre + rate / SPEC[m["bound"]])
            rows.append((ms, share))
        best_ms = min(r[0] for r in rows)
        detail[f"{key}_ms"] = round(best_ms, 2)
        if m["baseline"] is not None:
            detail[f"{key}_vs_rtx3060ti"] = round(m["baseline"] / best_ms, 4)
        shares = [s for _, s in rows if s is not None]
        if shares:
            med_share = sorted(shares)[len(shares) // 2]
            spread = max(shares) / max(min(shares), 1e-9)
            detail[f"{key}_share"] = round(med_share, 4)
            detail[f"{key}_share_spread"] = round(spread, 2)
            if med_share > 1.05:
                detail["share_flags"][key] = round(med_share, 4)
            norms = sorted(ms * min(s, 1.0) for ms, s in rows
                           if s is not None)
            norm = norms[len(norms) // 2]
            detail[f"{key}_normalized_ms"] = round(norm, 3)
            if m["sol"] is not None:
                detail[f"{key}_sol_ms"] = m["sol"]
                detail[f"{key}_sol_residual"] = round(norm / m["sol"], 2)
        if m["decision"] is not None:
            detail[f"{key}_decision_ref"] = m["decision"]
        flush_detail()
        return best_ms

    # ------------------------------------------------------------------
    # HEADLINE first: measure, print the one-line JSON, flush stdout.
    # ------------------------------------------------------------------
    headline = metrics[0]
    assert headline["key"] == HEADLINE_KEY
    ms = measure_metric(headline)
    print(json.dumps({
        "metric": "detect_and_compute_4k_40k_bad256_ms",
        "value": round(ms, 3),
        "unit": "ms",
        "vs_baseline": round(HEADLINE_BASELINE_MS / ms, 4),
    }), flush=True)

    # ------------------------------------------------------------------
    # Remaining metrics under the wall budget (counted from PROCESS START
    # so a slow-share headline eats the budget rather than overrunning the
    # driver's timeout; optional rows check a tighter fraction so required
    # rows get the slack first).
    # ------------------------------------------------------------------
    def over_budget(optional):
        used = time.perf_counter() - t_start
        return used > (budget_s * (0.8 if optional else 1.0))

    def adaptive_passes():
        # degrade 3->2->1 passes as the budget drains so late required rows
        # record a (noisier) row instead of being skipped outright
        used = time.perf_counter() - t_start
        if used > 0.8 * budget_s:
            return 1
        if used > 0.55 * budget_s:
            return 2
        return 3

    for m in metrics[1:]:
        if over_budget(m["optional"]):
            detail["skipped"].append(m["key"])
            flush_detail()
            continue
        try:
            measure_metric(m, passes=adaptive_passes())
        except Exception as e:                      # noqa: BLE001
            # one broken row must not cost the rest of the bench
            detail["skipped"].append(m["key"])
            detail.setdefault("errors", {})[m["key"]] = repr(e)[:300]
            flush_detail()

    # derived columns: per-frame batch costs + the throughput story
    for nb in (1, 4, 8, 16):
        k = f"batch{nb}_fhd_ms"
        if k in detail:
            detail[f"batch{nb}_fhd_per_frame_ms"] = round(detail[k] / nb, 2)
            detail[f"batch{nb}_fhd_fps"] = round(1000.0 * nb / detail[k], 1)
    for nb in (4, 8):
        k = f"batch{nb}_4k_ms"
        if k in detail:
            detail[f"batch{nb}_4k_per_frame_ms"] = round(detail[k] / nb, 2)
            detail[f"batch{nb}_4k_fps"] = round(1000.0 * nb / detail[k], 1)

    # the throughput story (round-4 verdict #6): where does batched
    # per-frame dAC cross the RTX single-stream 7.2 ms?  (FHD batches at
    # 4k features; the RTX number is 4K/40k, so the honest comparison is
    # frames/s at matched work — recorded as measured, with the crossover
    # stated from the FHD curve.)
    # batch=1 is the SAME detect_and_compute_batch program at nb=1 (since
    # round 5) — the earlier streaming_fhd_frame stand-in also ran the
    # per-frame matcher, overstating the b1 point vs the rest of the curve
    curve = {nb: detail.get(f"batch{nb}_fhd_per_frame_ms")
             for nb in (1, 4, 8, 16)}
    known = {nb: v for nb, v in curve.items() if v}
    batch_scaling_entry = None
    if len(known) >= 2:
        cross = [nb for nb, v in sorted(known.items()) if v < 7.2]
        batch_scaling_entry = {
            "per_frame_ms": known,
            "crossover_batch_vs_rtx_7p2": (cross[0] if cross else None),
            "note": ("single-chip lax.map batches on FHD/4k-feature dAC; "
                     "per-frame cost amortizes dispatch+pyramid overheads; "
                     "see batch*_4k rows for the 4K curve")}

    # sanity pair for share normalization (round-4 verdict Weak #3): two
    # near-equal kernels must normalize within ~1.3x
    a = detail.get("cells_8k_halo64_normalized_ms")
    b = detail.get("cells_8k_halo128_normalized_ms")
    if a and b:
        detail["sanity_norm_ratio_cells_halo"] = round(max(a, b) / min(a, b),
                                                       2)

    # hardware context: MEDIAN probe rate over every window in the run
    # (the max of many noisy differential estimates systematically
    # overshoots — the round-4 artifact's impossible 264.8 TFLOPs was the
    # best-window rate; the best is kept as *_best for share-variance
    # context, and any median beating spec by >10% is flagged, not
    # silently reported)
    detail["hw_flags"] = {}
    for name, hw_key, scale in (("mxu_bf16", "hw_bf16_tflops", 1e12),
                                ("vpu", "hw_vpu_tops", 1e12),
                                ("hbm", "hw_hbm_gbps", 1e9),
                                ("mxu_int8", "hw_int8_tops", 1e12),
                                ("vpu_stencil", "hw_vpu_stencil_gvecops",
                                 1e9)):
        if not probe_samples[name]:
            # resources no metric is bound by get one context window pair
            probe_rate(name)
            probe_rate(name)
        rates = sorted(probe_samples[name])
        med = rates[len(rates) // 2]
        nd = 3 if scale == 1e12 else 1
        detail[hw_key] = round(med / scale, nd)
        detail[hw_key + "_best"] = round(rates[-1] / scale, nd)
        detail[hw_key + "_n"] = len(rates)
        if name in SPEC and med > 1.1 * SPEC[name]:
            detail["hw_flags"][hw_key] = round(med / SPEC[name], 3)
    if not detail["hw_flags"]:
        del detail["hw_flags"]

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
        d2h_rates.append((a.nbytes / dt1 / 1e9,
                          a.nbytes / max(dt2, 1e-9) / 1e9))
    detail["hw_d2h_gbps"] = round(max(r[0] for r in d2h_rates), 4)
    detail["hw_d2h_recheck_gbps"] = round(max(r[1] for r in d2h_rates), 4)

    # attach the stage profile (tools/profile_stages.py), trace-derived
    # per-kernel times (tools/parse_trace.py), and the A/B decisions so the
    # context travels with every bench record
    prof = os.path.join(here, "tools", "STAGE_PROFILE.json")
    if os.path.exists(prof):
        with open(prof) as f:
            detail["stage_profile"] = json.load(f)
        detail["stage_profile"].setdefault("note", (
            "2-3 iteration protocol: rows carry ~8-12 ms of fixed "
            "round-trip tax — use comparatively, not absolutely"))
    tr = os.path.join(here, "tools", "TRACE_MS.json")
    if os.path.exists(tr):
        with open(tr) as f:
            detail["trace_ms"] = json.load(f)
        # per-metric *_trace_ms columns: device-side XLA-Module durations
        # from the committed profiler capture (share-free — the
        # reconciliation anchor for *_normalized_ms and *_sol_ms;
        # tools/parse_trace.py)
        for k, v in detail["trace_ms"].get("metrics", {}).items():
            if f"{k}_ms" in detail:
                detail[f"{k}_trace_ms"] = v
    detail["decisions"] = decisions_dict()
    if batch_scaling_entry is not None:
        detail["decisions"]["batch_scaling"] = batch_scaling_entry
    detail["total_wall_s"] = round(time.perf_counter() - t_start, 1)
    flush_detail()
    print(json.dumps(detail, indent=2), file=sys.stderr)


if __name__ == "__main__":
    main()
