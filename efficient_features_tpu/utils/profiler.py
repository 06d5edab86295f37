"""Profiling / tracing utilities (SURVEY.md §5: the reference ships only
`-lineinfo` for Nsight plus steady_clock micro-benchmarks; the TPU-native
equivalents are jax.profiler xplane traces and queued-dispatch wall timing).
"""
from __future__ import annotations

import contextlib
import time

import numpy as np
import jax


def force_completion(out) -> None:
    """Force full device completion via a host read of one output element.

    NOTE: under tunneled TPU runtimes (axon), jax.block_until_ready can return
    before execution finishes; a device_get is authoritative.
    """
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf))


def timeit_ms(fn, iters: int = 10, warmup: int = 1) -> float:
    """Wall time per call in ms: queue `iters` dispatches, one final sync."""
    for _ in range(warmup):
        force_completion(fn())
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn()
    force_completion(out)
    return (time.perf_counter() - t0) * 1e3 / iters


@contextlib.contextmanager
def trace(logdir: str = "/tmp/eff_tpu_trace"):
    """Capture a jax.profiler trace (view with TensorBoard / xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named region in profiler traces."""
    with jax.profiler.TraceAnnotation(name):
        yield
