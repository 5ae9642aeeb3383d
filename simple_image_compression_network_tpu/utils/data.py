"""Input pipeline: image folders (PNG/JPEG via PIL) and synthetic data.

The reference has no dataset tooling (all-ones fixture only,
``conv3_nonsquare_tb.cpp:801``); training the float codec needs crops, and
benchmarking needs Kodak-like images.  ``synthetic_images`` generates
band-limited noise (natural-image-like 1/f spectrum) so rate numbers are
meaningful without any dataset on disk.
"""

from __future__ import annotations

import os
from typing import Iterator, List, Optional, Tuple

import numpy as np


def list_images(directory: str) -> List[str]:
    exts = {".png", ".jpg", ".jpeg", ".bmp", ".ppm"}
    return sorted(
        os.path.join(directory, f) for f in os.listdir(directory)
        if os.path.splitext(f)[1].lower() in exts)


def load_image(path: str) -> np.ndarray:
    """-> (X, Y, 3) uint8 in the reference's x-major layout (x = long side
    first dim as stored; we simply use PIL row-major: dim0 = height)."""
    from PIL import Image
    img = Image.open(path).convert("RGB")
    return np.asarray(img, np.uint8)


def synthetic_images(n: int, x: int, y: int, seed: int = 0,
                     alpha: float = 1.6) -> np.ndarray:
    """(n, x, y, 3) uint8 band-limited noise with a 1/f^alpha spectrum."""
    rng = np.random.default_rng(seed)
    fx = np.fft.fftfreq(x)[:, None]
    fy = np.fft.rfftfreq(y)[None, :]
    amp = 1.0 / np.maximum(np.hypot(fx, fy), 1.0 / max(x, y)) ** alpha
    out = np.empty((n, x, y, 3), np.uint8)
    for i in range(n):
        for c in range(3):
            phase = rng.uniform(0, 2 * np.pi, size=amp.shape)
            spec = amp * np.exp(1j * phase)
            img = np.fft.irfft2(spec, s=(x, y))
            img = (img - img.min()) / max(float(np.ptp(img)), 1e-9)
            out[i, ..., c] = np.round(255 * img).astype(np.uint8)
    return out


def random_crops(images: np.ndarray, crop: int, batch: int,
                 rng: np.random.Generator) -> np.ndarray:
    """(B, crop, crop, 3) float32 in [0,1] sampled from a uint8 image stack."""
    n, x, y, _ = images.shape
    out = np.empty((batch, crop, crop, 3), np.float32)
    for b in range(batch):
        i = rng.integers(0, n)
        ox = rng.integers(0, x - crop + 1)
        oy = rng.integers(0, y - crop + 1)
        out[b] = images[i, ox:ox + crop, oy:oy + crop] / 255.0
    return out


def crop_batches(images: np.ndarray, crop: int, batch: int, steps: int,
                 seed: int = 0) -> Iterator[np.ndarray]:
    rng = np.random.default_rng(seed)
    for _ in range(steps):
        yield random_crops(images, crop, batch, rng)
