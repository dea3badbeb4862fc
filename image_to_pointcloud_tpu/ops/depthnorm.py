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

__all__ = ["normalize_depth"]


def _percentile_linear(sorted_vals: jax.Array, q: float) -> jax.Array:
    """numpy 'linear' percentile on a pre-sorted 1-D array."""
    n = sorted_vals.shape[0]
    pos = q / 100.0 * (n - 1)
    lo = jnp.floor(pos).astype(jnp.int32)
    hi = jnp.ceil(pos).astype(jnp.int32)
    frac = pos - jnp.floor(pos)
    return sorted_vals[lo] * (1.0 - frac) + sorted_vals[hi] * frac


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

    finite = jnp.isfinite(flat)
    any_nonfinite = jnp.logical_not(jnp.all(finite))

    # Median of finite values (nanmedian semantics, backend/app.py:132).
    # Sort with non-finites pushed to +inf so the finite prefix is contiguous.
    big = jnp.float32(jnp.inf)
    masked = jnp.where(finite, flat, big)
    msorted = jnp.sort(masked)
    nfin = jnp.sum(finite.astype(jnp.int32))
    mid_hi = jnp.maximum(nfin // 2, 0)
    mid_lo = jnp.maximum((nfin - 1) // 2, 0)
    med = 0.5 * (msorted[mid_lo] + msorted[mid_hi])
    flat = jnp.where(any_nonfinite & jnp.logical_not(finite), med, flat)

    svals = jnp.sort(flat)
    p2 = _percentile_linear(svals, 2.0)
    p98 = _percentile_linear(svals, 98.0)
    dmin = svals[0]
    dmax = svals[-1]

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
