"""Streaming image-sequence demo (samples/sample_image_sequence.cpp).

Runs detect+compute over a stream of frames with async dispatch (the TPU
analogue of the reference's CUDA-stream pipeline), matching consecutive frames
with a knn ratio test + cross check (sample_image_sequence.cpp:114-144).

    python samples/sample_image_sequence.py [glob-or-dir] [--frames N]
"""
import argparse
import glob
import os
import time

import numpy as np

try:
    from sample_common import load_gray, descriptor_type, warp_image
except ImportError:    # imported as samples.sample_image_sequence (bench.py)
    from .sample_common import load_gray, descriptor_type, warp_image


def frame_iter(src, n_frames):
    if src:
        paths = sorted(glob.glob(os.path.join(src, "*"))
                       if os.path.isdir(src) else glob.glob(src))
        for p in paths[:n_frames]:
            yield load_gray(p)
    else:
        base = load_gray(None, 720, 1280, seed=9)
        rng = np.random.default_rng(0)
        for i in range(n_frames):
            yield warp_image(base, angle_deg=2.0 * i,
                             tx=5.0 * i, ty=float(rng.uniform(-3, 3)))


def streaming_step_fn(cfg, hw, max_ratio: float = 0.8,
                      homography: bool = False, ransac_iters: int = 256,
                      ransac_thresh: float = 3.0, ransac_seed: int = 0):
    """Steady-state streaming step with DONATED state buffers.

    The previous frame's descriptor/valid/coordinate buffers are donated to
    each step (jax donate_argnums), so XLA writes the new frame's outputs
    into the same allocations — the reference DeviceBuffer grow-only reuse
    (device_buffer.cpp:42-69) expressed the XLA way.  Returns (step, state):
    step(frame) -> (n_keypoints, n_matches) device scalars — plus
    (H 3x3, n_inliers) when homography=True: the batched RANSAC
    (ops/ransac.py) verifies the frame-to-frame matches INSIDE the same
    jit, so geometric tracking adds zero host synchronizations.  state is
    the mutable closure cell (exposed for tests)."""
    import jax
    import jax.numpy as jnp

    from efficient_features_tpu import pipeline as P
    from efficient_features_tpu.ops import matcher
    from efficient_features_tpu.ops import ransac as RS

    h, w = hw

    def _core(frame, prev_desc, prev_valid, prev_xy):
        slots, desc = P.detect_and_compute_core(frame, cfg, True)
        valid = slots["valid"]
        xy = jnp.stack([slots["x"], slots["y"]], axis=1).astype(jnp.float32)
        j, _, ok = matcher.knn2_ratio_match_masked(
            prev_desc, prev_valid, desc, valid, max_ratio)
        outs = (desc, valid, xy, slots["count"], ok.sum(dtype=jnp.int32))
        if homography:
            H, _, n_inl = RS._ransac_core(
                prev_xy, xy[j], ok, jnp.float32(ransac_thresh),
                jax.random.PRNGKey(ransac_seed), ransac_iters)
            outs = outs + (H, n_inl)
        return outs

    step_jit = jax.jit(_core, donate_argnums=(1, 2, 3))

    # capacity probe: only shapes[0].shape[0] is read, so the prev-state
    # dummies just need >= 4 rows (RANSAC's minimal-set top_k needs 4)
    shapes = jax.eval_shape(
        _core,
        jax.ShapeDtypeStruct((h, w), jnp.uint8),
        jax.ShapeDtypeStruct((8, cfg.descriptor_bytes), jnp.uint8),
        jax.ShapeDtypeStruct((8,), jnp.bool_),
        jax.ShapeDtypeStruct((8, 2), jnp.float32))
    cap = shapes[0].shape[0]
    state = {"desc": jnp.zeros((cap, cfg.descriptor_bytes), jnp.uint8),
             "valid": jnp.zeros(cap, bool),
             "xy": jnp.zeros((cap, 2), jnp.float32)}

    def step(frame):
        res = step_jit(jnp.asarray(frame), state["desc"], state["valid"],
                       state["xy"])
        state["desc"], state["valid"], state["xy"] = res[0], res[1], res[2]
        count, nmatch = res[3], res[4]
        if homography:
            return count, nmatch, res[5], res[6]
        return count, nmatch

    return step, state


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("source", nargs="?", default=None)
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--max-keypoints", type=int, default=3000)
    ap.add_argument("--descriptor-type", type=int, default=0)
    ap.add_argument("--descriptor-bits", type=int, default=256)
    ap.add_argument("--max-ratio", type=float, default=0.8)
    ap.add_argument("--homography", action="store_true",
                    help="RANSAC-verify frame-to-frame matches inside the "
                         "same jitted step (geometric tracking)")
    ap.add_argument("--ransac-thresh", type=float, default=3.0)
    args = ap.parse_args()

    from efficient_features_tpu import EfficientFeatures
    from efficient_features_tpu.ops import matcher
    import jax.numpy as jnp

    feat = EfficientFeatures(
        nfeatures=args.max_keypoints,
        descriptor_type=descriptor_type(args.descriptor_type,
                                        args.descriptor_bits))

    # fully device-resident stream: detect+describe+match chain on fixed-
    # capacity slot arrays with DONATED state buffers (steady-state zero
    # allocations); the only host transfer per frame is the two counts
    # (the reference's CUDA-stream loop needs keypoint downloads)
    step = None
    t_all = []
    for fi, frame in enumerate(frame_iter(args.source, args.frames)):
        if step is None:
            step, _ = streaming_step_fn(feat._cfg, frame.shape,
                                        args.max_ratio,
                                        homography=args.homography,
                                        ransac_thresh=args.ransac_thresh)
        t0 = time.perf_counter()
        res = step(frame)
        count, nmatch = res[0], res[1]
        nk = int(np.asarray(count))
        nm = int(np.asarray(nmatch)) if fi > 0 else 0
        dt = time.perf_counter() - t0
        t_all.append(dt)
        line = f"frame {fi}: {nk} kps, {nm} matches, {dt*1e3:.1f} ms"
        if args.homography and fi > 0:
            line += f", {int(np.asarray(res[3]))} RANSAC inliers"
        print(line)

    if len(t_all) > 2:
        steady = np.mean(t_all[2:]) * 1e3
        print(f"steady-state per frame: {steady:.1f} ms "
              f"({1e3/steady:.1f} fps)")


if __name__ == "__main__":
    main()
