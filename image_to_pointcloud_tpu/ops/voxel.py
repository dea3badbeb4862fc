"""Voxel-grid downsampling with static shapes (Open3D voxel_down_sample semantics).

Used by the high-resolution config ("1024² tiled depth inference +
voxel-grid downsample to 1M points", BASELINE.json config 4). Open3D's
``voxel_down_sample(voxel_size)`` averages the positions (and colors) of
all points falling in each occupied voxel, where the voxel index is
``floor((p - (min_bound - voxel_size/2)) / voxel_size)`` — Open3D
centers the grid half a voxel below the min bound
(``VoxelDownSample``'s ``voxel_min_bound``).

XLA needs static shapes, so the result is returned as fixed-capacity
buffers plus a validity mask: sort points by voxel key, detect segment
starts, compute a dense rank by prefix sum, and scatter-add sums/counts
into (N, ...) output slots — one pass, no host round-trips.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["voxel_downsample"]


@partial(jax.jit, static_argnames=())
def voxel_downsample(
    points: jax.Array,
    colors: jax.Array,
    voxel_size: jax.Array | float,
    valid: jax.Array | None = None,
):
    """Average points/colors per occupied voxel.

    Args:
      points: (N, 3) float32.
      colors: (N, C) float32 (averaged alongside positions).
      voxel_size: scalar voxel edge length.
      valid: optional (N,) bool mask of live inputs.

    Returns:
      (out_points (N, 3), out_colors (N, C), out_valid (N,), count scalar):
      the first ``count`` slots marked valid hold one voxel each.
    """
    n = points.shape[0]
    p = points.astype(jnp.float32)
    c = colors.astype(jnp.float32)
    if valid is None:
        valid = jnp.ones((n,), bool)

    vsize = jnp.asarray(voxel_size, jnp.float32)
    minb = jnp.min(jnp.where(valid[:, None], p, jnp.inf), axis=0)
    # Open3D's grid origin sits half a voxel below the min bound.
    idx3 = jnp.floor((p - (minb - 0.5 * vsize)) / vsize).astype(jnp.int32)
    # Group by the (x, y, z) voxel index LEXICOGRAPHICALLY rather than a
    # combined linear key: a tiny voxel_size over a wide cloud gives
    # per-axis dims ~1e6 whose product silently wraps int32 (jnp has no
    # overflow trap and x64 is off), merging unrelated voxels. Three
    # stable sorts cost ~3x one argsort and can never collide.
    iv = jnp.where(valid[:, None], idx3, jnp.int32(2**31 - 1))  # invalid last
    order = jnp.lexsort((iv[:, 0], iv[:, 1], iv[:, 2]))
    sidx = iv[order]
    sp = p[order]
    sc = c[order]
    svalid = valid[order]

    is_start = jnp.concatenate(
        [jnp.ones((1,), bool), jnp.any(sidx[1:] != sidx[:-1], axis=1)]
    ) & svalid
    rank = jnp.cumsum(is_start.astype(jnp.int32)) - 1  # dense voxel id
    rank = jnp.where(svalid, rank, n - 1)  # park invalid in last slot

    sums_p = jnp.zeros((n, 3), jnp.float32).at[rank].add(
        jnp.where(svalid[:, None], sp, 0.0)
    )
    sums_c = jnp.zeros((n, c.shape[1]), jnp.float32).at[rank].add(
        jnp.where(svalid[:, None], sc, 0.0)
    )
    cnt = jnp.zeros((n,), jnp.float32).at[rank].add(svalid.astype(jnp.float32))

    count = jnp.sum(is_start.astype(jnp.int32))
    out_valid = jnp.arange(n) < count
    safe = jnp.maximum(cnt, 1.0)[:, None]
    return sums_p / safe, sums_c / safe, out_valid, count
