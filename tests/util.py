"""Shared test helpers: deterministic corner-rich synthetic images.

The reference tests use 11 SceauxCastle photos (not shipped here); these
synthetic scenes (textured polygons + gradients + noise) stand in and produce
thousands of FAST corners at multiple scales.
"""
import numpy as np


def make_test_image(h: int = 480, w: int = 640, seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    img = np.zeros((h, w), np.float64)
    yy, xx = np.mgrid[0:h, 0:w]
    # smooth background gradient
    img += 60 + 60 * (xx / w) + 40 * np.sin(yy / 37.0)
    # random bright/dark rectangles (sharp corners)
    for _ in range(120):
        x0 = rng.integers(0, w - 8)
        y0 = rng.integers(0, h - 8)
        bw = int(rng.integers(4, 60))
        bh = int(rng.integers(4, 60))
        val = float(rng.uniform(-110, 110))
        img[y0:y0 + bh, x0:x0 + bw] += val
    # random circles
    for _ in range(30):
        cx, cy = rng.uniform(0, w), rng.uniform(0, h)
        r = rng.uniform(4, 30)
        mask = (xx - cx) ** 2 + (yy - cy) ** 2 < r * r
        img[mask] += rng.uniform(-80, 80)
    img += rng.normal(0, 3, (h, w))
    img -= img.min()
    img *= 255.0 / max(img.max(), 1e-9)
    return img.astype(np.uint8)


def make_keypoints(h, w, n, seed=1, with_angle=True):
    """Random descriptor-input keypoints (x, y, size, angle) away from borders."""
    rng = np.random.default_rng(seed)
    margin = 40
    x = rng.uniform(margin, w - margin, n).astype(np.float32)
    y = rng.uniform(margin, h - margin, n).astype(np.float32)
    size = np.full(n, 31.0, np.float32)
    if with_angle:
        angle = rng.uniform(0, 360, n).astype(np.float32)
    else:
        angle = np.full(n, -1.0, np.float32)
    return x, y, size, angle
