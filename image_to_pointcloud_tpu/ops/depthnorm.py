"""Robust depth normalization — the shared normalize path of the reference.

Reproduces, as one jittable function, the normalization used both for the
depth preview (reference backend/app.py:124-147) and for the point-cloud
z values (backend/app.py:190-206):

1. non-finite values are replaced by the median of the finite values,
2. percentiles p2/p98 are taken (numpy linear interpolation),
3. if ``p98 <= p2`` fall back to (min, max),
4. clip to [p2, p98] and scale by ``(d - p2) / (p98 - p2 + 1e-6)``,
5. if the range is still degenerate the output is all zeros,
6. optional inversion ``d -> 1 - d`` (Depth-Anything predicts inverse depth,
   see the reference's ``invert_depth`` request flag, backend/app.py:54).

The preview path (backend/app.py:129-147) and the unprojection path
(backend/app.py:190-206) share these exact semantics — quirk #13 in
SURVEY.md §8 — so both call this one kernel.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["normalize_depth", "order_statistics"]


# ---- exact order statistics without sorting -------------------------------
#
# XLA sorts are slow on TPU (two full 518² sorts per image would dominate
# the normalize stage); instead, order statistics are found by bisecting
# the *bit representation* of float32: map each value to an
# order-preserving uint32 key, then 32 fixed rank-counting passes pin the
# k-th smallest key exactly. Each pass is one fused compare+reduce over
# the data — pure VPU work, no data movement between lanes.


def _f32_to_ordered_u32(x: jax.Array) -> jax.Array:
    """Monotone bijection float32 → uint32 (IEEE-754 total order)."""
    b = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.uint32)
    neg = (b >> 31).astype(jnp.bool_)
    return jnp.where(neg, ~b, b | jnp.uint32(0x80000000))


def _ordered_u32_to_f32(k: jax.Array) -> jax.Array:
    b = jnp.where(
        (k >> 31).astype(jnp.bool_), k ^ jnp.uint32(0x80000000), ~k
    )
    return jax.lax.bitcast_convert_type(b, jnp.float32)


def order_statistics(x: jax.Array, ks: jax.Array) -> jax.Array:
    """Exact k-th smallest values (0-indexed ranks ``ks``) of 1-D ``x``.

    Equivalent to ``jnp.sort(x)[ks]`` (for non-NaN data) without the sort:
    32 bisection steps over the uint32 key space, each a vectorized rank
    count. ``ks`` may be traced (data-dependent ranks are fine).
    """
    keys = _f32_to_ordered_u32(x)
    ks = jnp.asarray(ks, jnp.uint32)
    lo = jnp.zeros_like(ks)
    hi = jnp.full_like(ks, 0xFFFFFFFF)

    def body(_, carry):
        lo, hi = carry
        mid = lo + (hi - lo) // 2
        # rank(mid) = #{keys <= mid}, for all searched ranks at once.
        cnt = jnp.sum(
            (keys[None, :] <= mid[:, None]).astype(jnp.uint32), axis=1
        )
        take = cnt >= ks + 1
        return jnp.where(take, lo, mid + 1), jnp.where(take, mid, hi)

    lo, hi = jax.lax.fori_loop(0, 32, body, (lo, hi))
    return _ordered_u32_to_f32(hi)


def normalize_depth(depth: jax.Array, invert: bool | jax.Array = True) -> jax.Array:
    """Normalize a depth map to [0, 1] with the reference's robust scheme.

    Args:
      depth: float array of any shape (typically (H, W)).
      invert: whether to flip the normalized values (``invert_depth``).

    Returns:
      float32 array of the same shape, values in [0, 1].
    """
    d = depth.astype(jnp.float32)
    flat = d.reshape(-1)
    n = flat.shape[0]

    finite = jnp.isfinite(flat)
    any_nonfinite = jnp.logical_not(jnp.all(finite))

    # Median of finite values (nanmedian semantics, backend/app.py:132):
    # non-finites are pushed to +inf so the finite values hold the low
    # ranks; the median ranks depend on the finite count (traced — fine).
    big = jnp.float32(jnp.inf)
    masked = jnp.where(finite, flat, big)
    nfin = jnp.sum(finite.astype(jnp.int32))
    mid_hi = jnp.maximum(nfin // 2, 0)
    mid_lo = jnp.maximum((nfin - 1) // 2, 0)
    meds = order_statistics(masked, jnp.stack([mid_lo, mid_hi]))
    med = 0.5 * (meds[0] + meds[1])
    flat = jnp.where(any_nonfinite & jnp.logical_not(finite), med, flat)

    # numpy 'linear' percentiles p2/p98 from four exact order statistics
    # (ranks are static — n is a compile-time shape).
    import math

    pos2 = 2.0 / 100.0 * (n - 1)
    pos98 = 98.0 / 100.0 * (n - 1)
    ranks = jnp.array(
        [math.floor(pos2), math.ceil(pos2),
         math.floor(pos98), math.ceil(pos98)],
        jnp.int32,
    )
    os4 = order_statistics(flat, ranks)
    frac2 = jnp.float32(pos2 - math.floor(pos2))
    frac98 = jnp.float32(pos98 - math.floor(pos98))
    p2 = os4[0] * (1.0 - frac2) + os4[1] * frac2
    p98 = os4[2] * (1.0 - frac98) + os4[3] * frac98
    dmin = jnp.min(flat)
    dmax = jnp.max(flat)

    # Fallback to (min, max) when p98 <= p2 (backend/app.py:136-137).
    use_fallback = p98 <= p2
    lo = jnp.where(use_fallback, dmin, p2)
    hi = jnp.where(use_fallback, dmax, p98)

    scaled = (jnp.clip(flat, lo, hi) - lo) / (hi - lo + 1e-6)
    out = jnp.where(hi > lo, scaled, jnp.zeros_like(scaled))

    out = jnp.where(jnp.asarray(invert), 1.0 - out, out)
    # When the degenerate branch (all zeros) was taken and invert=True the
    # reference yields 1.0 - 0.0 = 1.0 everywhere, matching this order.
    return out.reshape(d.shape)
