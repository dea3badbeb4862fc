"""Statistical outlier removal on TPU — exact kNN via tiled MXU matmuls.

Reproduces Open3D's ``PointCloud.remove_statistical_outlier(nb_neighbors,
std_ratio)`` semantics used by the reference (backend/app.py:252-269, hot
spot #3): for every point, the mean distance to its ``nb_neighbors``
nearest neighbours (the query point itself is among them, at distance 0 —
Open3D queries the tree with the point itself) is computed; points whose
mean distance exceeds ``cloud_mean + std_ratio * sample_std`` are dropped
(strictly-less-than keep test, sample std with n-1 denominator).

Instead of a KD-tree (pointer-chasing, hostile to XLA), the kNN search is
formulated as a blocked distance-matrix computation
``D² = |q|² + |k|² − 2 q·kᵀ`` — the inner term is an MXU matmul — with a
running top-k merge over key blocks, so memory stays at
``O(block² )`` while arithmetic rides the systolic array.

Defaults nb_neighbors=20, std_ratio=2.0 match the reference call site.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["statistical_outlier_mask", "knn_mean_distances", "outlier_keep_from_means"]


def outlier_keep_from_means(means, pos, std_ratio: float = 2.0, axis=None):
    """Open3D RemoveStatisticalOutliers threshold rule on mean kNN
    distances: statistics run over ``valid_distances`` = the points with
    mean > 0 only (coincident-duplicate clusters are excluded from BOTH
    the numerators and the denominators — Open3D's count_if(x > 0)),
    keep = pos & mean < cloud_mean + std_ratio * std (Bessel). One shared
    implementation: the exact mask, the grid mask, and the batched
    serving graph all call this (they used to triplicate it and disagree
    on the denominator).

    ``axis=None`` treats ``means`` as one cloud; ``axis=-1`` applies the
    rule independently per leading-batch row.
    """
    kd = axis is not None
    npos = jnp.sum(pos.astype(jnp.float32), axis=axis, keepdims=kd)
    denom = jnp.maximum(npos, 1.0)
    cloud_mean = jnp.sum(jnp.where(pos, means, 0.0), axis=axis, keepdims=kd) / denom
    sq = jnp.where(pos, (means - cloud_mean) ** 2, 0.0)
    var = jnp.sum(sq, axis=axis, keepdims=kd) / jnp.maximum(npos - 1.0, 1.0)
    threshold = cloud_mean + std_ratio * jnp.sqrt(var)
    return pos & (means < threshold)

_BIG = jnp.float32(1e30)


def _pad_to(x: jax.Array, n: int, value) -> jax.Array:
    pad = n - x.shape[0]
    if pad <= 0:
        return x
    width = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, width, constant_values=value)


@partial(jax.jit, static_argnames=("k", "query_block", "key_block"))
def knn_mean_distances(
    points: jax.Array,
    valid: jax.Array | None = None,
    *,
    k: int = 20,
    query_block: int = 512,
    key_block: int = 2048,
) -> jax.Array:
    """Mean distance from each point to its k nearest neighbours (incl. self).

    Args:
      points: (N, 3) float32 positions.
      valid: optional (N,) bool; invalid points are excluded as neighbour
        candidates and get mean distance 0 (→ dropped by the filter).
      k: neighbour count (Open3D ``nb_neighbors``; self included).

    Returns:
      (N,) float32 mean kNN distances.
    """
    n = points.shape[0]
    p = points.astype(jnp.float32)
    if valid is None:
        valid = jnp.ones((n,), bool)

    nq = -(-n // query_block) * query_block
    nk = -(-n // key_block) * key_block
    cap = max(nq, nk)
    p_pad = _pad_to(p, cap, 0.0)
    v_pad = _pad_to(valid, cap, False)

    keys = p_pad[:nk]
    kvalid = v_pad[:nk]
    key_sq = jnp.sum(keys * keys, axis=1)
    n_kblocks = nk // key_block

    def per_query_block(qb):
        q = jax.lax.dynamic_slice_in_dim(p_pad, qb * query_block, query_block)
        q_sq = jnp.sum(q * q, axis=1, keepdims=True)

        def scan_keys(carry, kb):
            best = carry  # (query_block, k) running smallest distances²
            kpts = jax.lax.dynamic_slice_in_dim(keys, kb * key_block, key_block)
            ksq = jax.lax.dynamic_slice_in_dim(key_sq, kb * key_block, key_block)
            kval = jax.lax.dynamic_slice_in_dim(kvalid, kb * key_block, key_block)
            d2 = q_sq + ksq[None, :] - 2.0 * jnp.dot(
                q,
                kpts.T,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            d2 = jnp.where(kval[None, :], jnp.maximum(d2, 0.0), _BIG)
            merged = jnp.concatenate([best, d2], axis=1)
            neg_top, _ = jax.lax.top_k(-merged, k)
            return -neg_top, None

        init = jnp.full((query_block, k), _BIG, jnp.float32)
        best, _ = jax.lax.scan(
            scan_keys, init, jnp.arange(n_kblocks, dtype=jnp.int32)
        )
        found = best < _BIG * 0.5
        dist = jnp.sqrt(jnp.maximum(best, 0.0))
        cnt = jnp.maximum(jnp.sum(found, axis=1), 1)
        return jnp.sum(jnp.where(found, dist, 0.0), axis=1) / cnt

    means = jax.lax.map(per_query_block, jnp.arange(nq // query_block, dtype=jnp.int32))
    means = means.reshape(nq)[:n]
    return jnp.where(valid, means, 0.0)


@partial(jax.jit, static_argnames=("k", "window"))
def grid_knn_mean_distances(
    points_grid: jax.Array,
    *,
    k: int = 20,
    window: int = 4,
) -> jax.Array:
    """Mean k-NN distance for depth-grid point clouds via window search.

    Points unprojected from a depth map sit on a (hh, ww) grid whose 3D
    nearest neighbours are (for any smooth surface) inside a small grid
    window; searching a (2·window+1)² neighbourhood is exact there and
    conservative at depth discontinuities (a missed far-side neighbour can
    only *increase* the mean, pushing true outliers further out). This is
    the production-path replacement for the O(N²) search — O(N·window²)
    with no large top-k, ~1000× faster at 518².

    Args:
      points_grid: (hh, ww, 3) float32 positions in grid layout.

    Returns:
      (hh*ww,) float32 mean distances (row-major), matching
      :func:`knn_mean_distances` away from discontinuities.
    """
    hh, ww, _ = points_grid.shape
    p = points_grid.astype(jnp.float32)
    r = window
    # Sentinel-padded map; shifted-window taps are dynamic slices of it.
    pad = jnp.pad(p, ((r, r), (r, r), (0, 0)), constant_values=1e9)
    offsets = jnp.asarray(
        [(dy, dx) for dy in range(2 * r + 1) for dx in range(2 * r + 1)],
        jnp.int32,
    )

    # Scan over window offsets, maintaining the k smallest squared
    # distances per point via an insertion cascade (20 compare-exchanges):
    # pure VPU elementwise work, compact scan body — no patch
    # materialization, no conv, no top-k sort.
    def step(carry, off):
        q = jax.lax.dynamic_slice(pad, (off[0], off[1], 0), (hh, ww, 3))
        diff = q - p
        d2 = jnp.sum(diff * diff, axis=-1)  # (hh, ww)
        v = jnp.where(d2 > 1e17, _BIG, d2)
        rows = []
        for i in range(k):
            s = carry[i]
            lo = jnp.minimum(s, v)
            v = jnp.maximum(s, v)
            rows.append(lo)
        return jnp.stack(rows), None

    init = jnp.full((k, hh, ww), _BIG, jnp.float32)
    best, _ = jax.lax.scan(step, init, offsets)
    best = best.reshape(k, hh * ww)
    found = best < _BIG * 0.5
    dist = jnp.sqrt(jnp.maximum(best, 0.0))
    cnt = jnp.maximum(jnp.sum(found, axis=0), 1)
    return jnp.sum(jnp.where(found, dist, 0.0), axis=0) / cnt


@partial(jax.jit, static_argnames=("k", "window", "std_ratio", "use_pallas"))
def grid_statistical_outlier_mask(
    points_grid: jax.Array,
    *,
    k: int = 20,
    std_ratio: float = 2.0,
    window: int = 4,
    use_pallas: bool | None = None,
) -> jax.Array:
    """Open3D-semantics outlier mask using the windowed grid search.

    Returns a (hh*ww,) keep mask (row-major grid order). On TPU the
    neighbour search runs as the Pallas VMEM-resident kernel
    (ops.outlier_pallas); elsewhere the XLA scan formulation is used.
    """
    hh, ww, _ = points_grid.shape
    n = hh * ww
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu" or (
            jax.default_backend() not in ("cpu", "gpu")
        )
    if use_pallas:
        from image_to_pointcloud_tpu.ops.outlier_pallas import (
            grid_knn_mean_distances_pallas,
        )

        means = grid_knn_mean_distances_pallas(points_grid, k=k, window=window)
    else:
        means = grid_knn_mean_distances(points_grid, k=k, window=window)
    return outlier_keep_from_means(means, means > 0.0, std_ratio)


@partial(jax.jit, static_argnames=("k", "query_block", "key_block"))
def statistical_outlier_mask(
    points: jax.Array,
    valid: jax.Array | None = None,
    *,
    k: int = 20,
    std_ratio: float = 2.0,
    query_block: int = 512,
    key_block: int = 2048,
) -> jax.Array:
    """Boolean keep-mask with Open3D remove_statistical_outlier semantics."""
    n = points.shape[0]
    if valid is None:
        valid = jnp.ones((n,), bool)
    means = knn_mean_distances(
        points, valid, k=k, query_block=query_block, key_block=key_block
    )
    return outlier_keep_from_means(means, valid & (means > 0.0), std_ratio)
