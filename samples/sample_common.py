"""Shared sample utilities (the reference's samples/sample_common.{h,cpp}).

Image IO uses cv2 when available; otherwise samples fall back to deterministic
synthetic scenes so every CLI runs in a bare environment.
"""
from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def load_gray(path: str | None, h: int = 1080, w: int = 1920,
              seed: int = 0) -> np.ndarray:
    """Load a grayscale u8 image, or synthesize a corner-rich scene."""
    if path:
        try:
            import cv2
            img = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
            if img is None:
                raise FileNotFoundError(path)
            return img
        except ImportError:
            from PIL import Image
            return np.asarray(Image.open(path).convert("L"))
    from bench import make_bench_image
    return make_bench_image(h, w, seed)


def descriptor_type(desc_kind: int, desc_bits: int) -> str:
    """Map the reference CLI convention (0:BAD 1:HashSIFT x 256/512)."""
    kind = ["bad", "hash_sift"][desc_kind]
    return f"{kind}_{desc_bits}"


def warp_image(img: np.ndarray, angle_deg: float, tx: float, ty: float
               ) -> np.ndarray:
    """Small rigid warp for synthetic sequences (nearest-neighbour)."""
    h, w = img.shape
    th = np.deg2rad(angle_deg)
    c, s = np.cos(th), np.sin(th)
    yy, xx = np.mgrid[0:h, 0:w]
    cx, cy = w / 2, h / 2
    sx = c * (xx - cx) + s * (yy - cy) + cx - tx
    sy = -s * (xx - cx) + c * (yy - cy) + cy - ty
    sxi = np.clip(np.round(sx).astype(int), 0, w - 1)
    syi = np.clip(np.round(sy).astype(int), 0, h - 1)
    return img[syi, sxi]
