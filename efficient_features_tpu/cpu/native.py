"""ctypes bindings for the native C++ CPU backend (native/libeff_cpu.so).

The native module mirrors the reference's C++ CPU module
(modules/efficient_features) with our exact semantics — FAST/integral/BAD are
bit-identical to the NumPy oracle and the TPU kernels; the HashSIFT warp can
differ on rare pixels by one gray level where libm's cosf/sinf differ from
NumPy's by an ULP (same class of difference the descriptor error budgets
absorb).  It is optional: `available()` is False until `make -C native` has
been run (or build() is called), and callers fall back to the NumPy oracle.
"""
from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

from ..models.params import load_bad_params

_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"
_SO = _NATIVE_DIR / "libeff_cpu.so"
_lib = None


def build() -> None:
    subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True,
                   capture_output=True)


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not _SO.exists():
        raise FileNotFoundError(
            f"{_SO} not built; run `make -C native` or native.build()")
    lib = ctypes.CDLL(str(_SO))
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    c_int = ctypes.c_int
    c_float = ctypes.c_float
    lib.eff_fast_mask.argtypes = [u8p, c_int, c_int, c_int, u8p]
    lib.eff_integral.argtypes = [u8p, c_int, c_int, i32p]
    lib.eff_bad.argtypes = [u8p, c_int, c_int, i32p, f32p, c_int, c_float,
                            i32p, f32p, c_int, u8p]
    lib.eff_warp_patches.argtypes = [u8p, c_int, c_int, f32p, c_int, c_float,
                                     u8p]
    lib.eff_patch_sift_responses.argtypes = [u8p, c_int, f32p]
    lib.eff_detect.argtypes = [u8p, c_int, c_int, i32p, f32p, i32p, c_int,
                               c_int, c_int, c_int, i32p, f32p, f32p, f32p,
                               f32p, i32p, f32p, i32p]
    lib.eff_hash_project.argtypes = [f32p, c_int, f32p, c_int, u8p]
    _lib = lib
    return lib


def available() -> bool:
    try:
        _load()
        return True
    except (FileNotFoundError, OSError):
        return False


def fast_corner_mask(img: np.ndarray, threshold: int) -> np.ndarray:
    lib = _load()
    img = np.ascontiguousarray(img, np.uint8)
    out = np.zeros(img.shape, np.uint8)
    lib.eff_fast_mask(img, img.shape[0], img.shape[1], threshold, out)
    return out.astype(bool)


def integral_image_i32(img: np.ndarray) -> np.ndarray:
    lib = _load()
    img = np.ascontiguousarray(img, np.uint8)
    h, w = img.shape
    out = np.zeros((h + 1, w + 1), np.int32)
    lib.eff_integral(img, h, w, out)
    return out


def bad_descriptors(img: np.ndarray, x, y, size, angle, *, nbits=256,
                    scale_factor=1.0) -> np.ndarray:
    lib = _load()
    img = np.ascontiguousarray(img, np.uint8)
    h, w = img.shape
    integral = integral_image_i32(img)
    kps = np.ascontiguousarray(
        np.stack([x, y, size, angle], axis=1), np.float32)
    n = kps.shape[0]
    boxes, th = load_bad_params(nbits)
    out = np.zeros((n, nbits // 8), np.uint8)
    lib.eff_bad(img, h, w, integral, kps, n, np.float32(scale_factor),
                np.ascontiguousarray(boxes, np.int32),
                np.ascontiguousarray(th, np.float32), nbits, out)
    return out


def warp_patches(img: np.ndarray, x, y, size, angle,
                 cropping_scale=1.0) -> np.ndarray:
    lib = _load()
    img = np.ascontiguousarray(img, np.uint8)
    kps = np.ascontiguousarray(
        np.stack([x, y, size, angle], axis=1), np.float32)
    n = kps.shape[0]
    out = np.zeros((n, 32, 32), np.uint8)
    lib.eff_warp_patches(img, img.shape[0], img.shape[1], kps, n,
                         np.float32(cropping_scale), out)
    return out


def patch_sift_responses(patches: np.ndarray) -> np.ndarray:
    lib = _load()
    patches = np.ascontiguousarray(patches, np.uint8)
    n = patches.shape[0]
    out = np.zeros((n, 129), np.float32)
    lib.eff_patch_sift_responses(patches, n, out)
    return out


def hash_sift_descriptors(img: np.ndarray, x, y, size, angle, *, nbits=256,
                          cropping_scale=1.0) -> np.ndarray:
    from ..models.params import load_hash_sift_matrix
    lib = _load()
    patches = warp_patches(img, x, y, size, angle, cropping_scale)
    responses = patch_sift_responses(patches)
    b = np.ascontiguousarray(load_hash_sift_matrix(nbits), np.float32)
    n = responses.shape[0]
    out = np.zeros((n, nbits // 8), np.uint8)
    lib.eff_hash_project(responses, n, b, nbits, out)
    return out


def detect(img: np.ndarray, *, nfeatures: int = 5000,
           scale_factor: float = 1.2, nlevels: int = 8,
           first_level: int = 0, fast_threshold: int = 20,
           nonmax_radius: int = 15):
    """Native full multi-scale detect, bit-identical to
    cpu.reference.detect (x, y, response, octave, size exact; angle within
    libm-vs-numpy atan2 ULPs).  The reference's own CPU module has no
    detector; this is the C++ deployment path for the complete pipeline.

    Returns a cpu.reference.DetectResult."""
    from ..utils import semantics as S
    from .reference import DetectResult

    lib = _load()
    img = np.ascontiguousarray(img, np.uint8)
    h, w = img.shape
    shapes = np.asarray(
        S.pyramid_shapes(h, w, scale_factor, nlevels), np.int32)
    scales = np.asarray(S.pyramid_scales(scale_factor, nlevels), np.float32)
    quotas_l = S.features_per_level(nfeatures, scale_factor, nlevels)
    quotas = np.asarray(
        [min(int(q), int(shapes[s, 0]) * int(shapes[s, 1]))
         for s, q in enumerate(quotas_l)], np.int32)
    umax = np.asarray(S.U_MAX, np.int32)
    cap = int(quotas.sum())
    x = np.zeros(cap, np.float32)
    y = np.zeros(cap, np.float32)
    resp = np.zeros(cap, np.float32)
    ang = np.zeros(cap, np.float32)
    octv = np.zeros(cap, np.int32)
    size = np.zeros(cap, np.float32)
    counts = np.zeros(nlevels, np.int32)
    lib.eff_detect(img, h, w, np.ascontiguousarray(shapes), scales, quotas,
                   nlevels, first_level, fast_threshold, nonmax_radius,
                   umax, x, y, resp, ang, octv, size, counts)
    n = int(counts.sum())
    return DetectResult(x[:n], y[:n], resp[:n], ang[:n], octv[:n], size[:n],
                        [int(c) for c in counts])
