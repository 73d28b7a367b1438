"""Deterministic synthetic images (no external data): seeded gradient +
ellipse + texture compositions, PPM-encoded. ≙ the reference test
fixture's seeded file generator (tests/setup.py:77-79) for the image
modality."""

from __future__ import annotations

import numpy as np

from deduplidog_ray.images.codecs import encode_ppm


def make_image(seed: int, h: int = 48, w: int = 64) -> np.ndarray:
    """HxWx3 uint8, fully determined by (seed, h, w)."""
    rng = np.random.default_rng(np.uint64(seed) ^ np.uint64(0x1A6E))
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = np.zeros((h, w, 3), dtype=np.float32)
    for c in range(3):
        gx, gy = rng.uniform(-1, 1, 2)
        img[:, :, c] = 128 + 60 * (gx * xx / w + gy * yy / h)
    # 2-3 soft ellipses
    for _ in range(int(rng.integers(2, 4))):
        cy, cx = rng.uniform(0.2, 0.8) * h, rng.uniform(0.2, 0.8) * w
        ry, rx = rng.uniform(0.1, 0.3) * h, rng.uniform(0.1, 0.3) * w
        mask = ((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2 < 1
        img[mask] += rng.uniform(-80, 80, 3).astype(np.float32)
    img += rng.normal(0, 3, img.shape).astype(np.float32)   # texture
    return np.clip(img, 0, 255).astype(np.uint8)


def make_ppm(seed: int, h: int = 48, w: int = 64) -> bytes:
    return encode_ppm(make_image(seed, h, w))
