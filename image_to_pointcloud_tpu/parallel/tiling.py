"""High-resolution tiled depth inference (BASELINE.json config 4).

The reference simply downscales anything over 3072 px and runs one
forward (backend/app.py:438-445) — resolution is lost. Here large inputs
are split into overlapping model-native tiles, the tiles run as one
batch (data-parallel over the mesh), and per-tile depths are blended
back with separable feathered weights. Tile extraction and blending are
static-shape gathers/scatter-adds inside the jitted graph.

Per-tile relative depths are affine-aligned (least-squares scale/shift
in the overlap with the running mosaic's low-res anchor) before
blending — the standard trick for stitching scale-ambiguous monocular
depth.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["plan_tiles", "extract_tiles", "blend_tiles"]


def plan_tiles(h: int, w: int, tile: int, overlap: int) -> list[tuple[int, int]]:
    """Top-left corners of overlapping tiles covering (h, w).

    Requires ``0 <= overlap < tile <= min(h, w)`` — callers clamp
    (HighResPipeline does); an overlap >= tile would plan a
    zero/negative stride and silently leave most of the image uncovered.
    """
    if tile <= 0 or not 0 <= overlap < tile:
        raise ValueError(f"need 0 <= overlap < tile, got tile={tile} overlap={overlap}")
    if tile > h or tile > w:
        raise ValueError(f"tile {tile} exceeds image {h}x{w}; clamp it first")
    stride = tile - overlap

    def axis(n):
        if n <= tile:
            return [0]
        pos = list(range(0, n - tile, stride))
        pos.append(n - tile)
        return pos

    return [(y, x) for y in axis(h) for x in axis(w)]


def extract_tiles(img: jax.Array, corners, tile: int) -> jax.Array:
    """(H, W, C) → (T, tile, tile, C) static-shape gather."""
    slabs = [
        jax.lax.dynamic_slice(img, (y, x, 0), (tile, tile, img.shape[2]))
        for y, x in corners
    ]
    return jnp.stack(slabs)


@functools.lru_cache(maxsize=32)
def _feather_1d(tile: int) -> np.ndarray:
    ramp = np.minimum(np.arange(tile) + 1, np.arange(tile)[::-1] + 1)
    return (ramp / ramp.max()).astype(np.float32)


def _align_affine(tile_depth, anchor, eps=1e-6):
    """Least-squares (scale, shift) mapping tile_depth → anchor."""
    x = tile_depth.reshape(-1)
    y = anchor.reshape(-1)
    mx, my = jnp.mean(x), jnp.mean(y)
    cov = jnp.mean((x - mx) * (y - my))
    var = jnp.mean((x - mx) ** 2)
    s = cov / (var + eps)
    b = my - s * mx
    return s * tile_depth + b


def blend_tiles(
    tile_depths: jax.Array,
    corners,
    out_hw: tuple[int, int],
    anchor: jax.Array | None = None,
) -> jax.Array:
    """(T, t, t) per-tile depths → (H, W) feather-blended mosaic.

    ``anchor``: optional (H, W) low-res depth (upsampled full-image pass)
    each tile is affine-aligned to before blending.
    """
    h, w = out_hw
    t = tile_depths.shape[1]
    fw = jnp.asarray(np.outer(_feather_1d(t), _feather_1d(t)))

    acc = jnp.zeros((h, w), jnp.float32)
    wacc = jnp.zeros((h, w), jnp.float32)
    for i, (y, x) in enumerate(corners):
        d = tile_depths[i]
        if anchor is not None:
            ref = jax.lax.dynamic_slice(anchor, (y, x), (t, t))
            d = _align_affine(d, ref)
        acc = jax.lax.dynamic_update_slice(
            acc, jax.lax.dynamic_slice(acc, (y, x), (t, t)) + d * fw, (y, x)
        )
        wacc = jax.lax.dynamic_update_slice(
            wacc, jax.lax.dynamic_slice(wacc, (y, x), (t, t)) + fw, (y, x)
        )
    return acc / jnp.maximum(wacc, 1e-8)
