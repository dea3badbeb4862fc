"""Canonical synthetic photographic content for TPU benchmarks.

bench.py (the driver's artifact of record) and the pixel-vs-JPEG A/B
probe (jpeg_ingest_probe.py) must measure the same content or the
probe's ratios stop explaining the headline: JPEG payload size — and
therefore H2D cost on this rig's serialized link — is content-
dependent. This module is the single definition; bench.py keeps an
inline copy so it stays self-contained for the driver, and
tests/test_bench_contract.py asserts the two stay byte-identical.

Smooth sinusoidal fields plus mild Gaussian texture: uniform noise
defeats DCT compression (unrepresentative JPEG sizes), while pure
gradients compress unrealistically well. sigma=6 at quality 88 lands
in the size range of real photographs (~0.5-1 bit/px).
"""

from __future__ import annotations

import io

import numpy as np


def photo(w: int, h: int, seed: int) -> np.ndarray:
    """(h, w, 3) uint8 photographic synthetic image."""
    g = np.random.default_rng(seed)
    x = np.linspace(0, 4 * np.pi, w)
    y = np.linspace(0, 3 * np.pi, h)
    base = np.stack(
        [
            127 + 110 * np.sin(x)[None, :] * np.cos(y)[:, None],
            127 + 90 * np.cos(2 * x)[None, :] + 0 * y[:, None],
            127 + 70 * np.sin(y)[:, None] + 0 * x[None, :],
        ],
        -1,
    )
    return (base + g.normal(0, 6.0, base.shape)).clip(0, 255).astype(
        np.uint8
    )


def jpeg_bytes(img: np.ndarray, quality: int = 88) -> bytes:
    """Encode as baseline JPEG at the benchmark's standard quality."""
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(img).save(buf, "JPEG", quality=quality)
    return buf.getvalue()
