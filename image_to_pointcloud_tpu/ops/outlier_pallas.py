"""Pallas TPU kernel: windowed grid-kNN mean distances.

The XLA scan formulation of the windowed neighbour search
(ops.outlier.grid_knn_mean_distances) re-reads its (k, H, W) running
top-k carry from HBM on every one of the (2r+1)² window offsets —
~3.6 GB of carry traffic per 518² image, which makes it
bandwidth-bound. This kernel keeps the insertion-cascade accumulator in
VMEM scratch: each grid program DMAs one padded tile (with halo) of the
x/y/z point planes into VMEM, runs all window offsets over it in-core,
and writes the per-point mean-distance tile once. Carry traffic drops to
zero; HBM reads are ~(1 + halo overhead) passes over the point map.

Semantics identical to ops.outlier.grid_knn_mean_distances (sentinel-
padded borders, self included at distance 0, Open3D mean-of-k-nearest).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["grid_knn_mean_distances_pallas"]

_BIG = 1e30
_SENTINEL = 1e9


def _kernel(pad_hbm, out_ref, tile_vmem, sem, *, k, r, th, tw):
    """One program: an output tile (th, tw) of mean k-NN distances.

    The halo'd input tile overlaps its neighbours, which BlockSpec index
    maps cannot express — so the input stays in HBM and each program DMAs
    its (3, th+2r, halo_w) window into VMEM scratch explicitly. The grid
    is (batch, tiles_h, tiles_w) — batching is native, NOT via vmap
    (vmap would prepend a grid axis and silently shift program_id).
    """
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    halo_w = tile_vmem.shape[2]  # lane-aligned (multiple of 128)
    copy = pltpu.make_async_copy(
        pad_hbm.at[
            b,
            :,
            pl.ds(i * th, th + 2 * r),
            pl.ds(j * tw, halo_w),
        ],
        tile_vmem,
        sem,
    )
    copy.start()
    copy.wait()
    x = tile_vmem[0]
    y = tile_vmem[1]
    z = tile_vmem[2]
    cx = x[r : r + th, r : r + tw]
    cy = y[r : r + th, r : r + tw]
    cz = z[r : r + th, r : r + tw]

    win = 2 * r + 1
    # Insertion-cascade top-k held entirely in registers/VMEM values.
    best = [jnp.full((th, tw), _BIG, jnp.float32) for _ in range(k)]
    for dy in range(win):
        for dx in range(win):
            qx = x[dy : dy + th, dx : dx + tw]
            qy = y[dy : dy + th, dx : dx + tw]
            qz = z[dy : dy + th, dx : dx + tw]
            dxv = qx - cx
            dyv = qy - cy
            dzv = qz - cz
            v = dxv * dxv + dyv * dyv + dzv * dzv
            v = jnp.where(v > 1e17, jnp.float32(_BIG), v)
            for i in range(k):
                lo = jnp.minimum(best[i], v)
                v = jnp.maximum(best[i], v)
                best[i] = lo

    acc = jnp.zeros((th, tw), jnp.float32)
    cnt = jnp.zeros((th, tw), jnp.float32)
    for i in range(k):
        found = best[i] < _BIG * 0.5
        acc = acc + jnp.where(found, jnp.sqrt(jnp.maximum(best[i], 0.0)), 0.0)
        cnt = cnt + found.astype(jnp.float32)
    out_ref[0] = acc / jnp.maximum(cnt, 1.0)


@functools.partial(
    jax.jit, static_argnames=("k", "window", "tile", "interpret")
)
def grid_knn_mean_distances_pallas(
    points_grid: jax.Array,
    *,
    k: int = 20,
    window: int = 4,
    tile: tuple[int, int] = (128, 256),
    interpret: bool = False,
) -> jax.Array:
    """Grid points → mean k-NN distances.

    Accepts (hh, ww, 3) → (hh*ww,) or batched (B, hh, ww, 3) → (B, hh*ww).
    """
    squeeze = points_grid.ndim == 3
    if squeeze:
        points_grid = points_grid[None]
    bsz, hh, ww, _ = points_grid.shape
    r = window
    # Tile dims must stay hardware-aligned (8 sublanes x 128 lanes for
    # f32) even when the grid is smaller than the nominal tile: the
    # kernel's DMA slice starts at (i*th, j*tw), and Mosaic must PROVE
    # those divisible by the (8, 128) tiling — th=hh or tw=ww from an
    # odd image size (e.g. 400x300 -> ww=200) fails to compile on TPU.
    # Overhang centers read sentinel padding and are sliced off below.
    th = min(tile[0], -(-hh // 8) * 8)
    tw = min(tile[1], -(-ww // 128) * 128)
    gh = -(-hh // th)
    gw = -(-ww // tw)

    # Halo'd DMA windows must be lane-aligned: round the window width up
    # to a multiple of 128 (extra lanes hold sentinel and are never used
    # as centers). Pad so every tile's window is in range; padding is
    # sentinel (≥1e9 ⇒ masked in-kernel), output overhang is dropped.
    halo_w = -(-(tw + 2 * r) // 128) * 128
    ph = gh * th + 2 * r
    pw = gw * tw + halo_w
    p = points_grid.astype(jnp.float32)
    pad = jnp.full((bsz, 3, ph, pw), jnp.float32(_SENTINEL))
    pad = pad.at[:, :, r : r + hh, r : r + ww].set(p.transpose(0, 3, 1, 2))

    kernel = functools.partial(_kernel, k=k, r=r, th=th, tw=tw)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bsz, gh * th, gw * tw), jnp.float32),
        grid=(bsz, gh, gw),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, th, tw), lambda b, i, j: (b, i, j), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((3, th + 2 * r, halo_w), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(pad)
    out = out[:, :hh, :ww].reshape(bsz, hh * ww)
    return out[0] if squeeze else out
