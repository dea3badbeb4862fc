"""Standard monocular-depth evaluation metrics.

The reference has no evaluation of any kind (no tests, no metrics —
SURVEY.md §4); this module provides the metrics every depth-estimation
paper reports, jitted and mask-aware, for validating fine-tuned
checkpoints (train/) against ground truth:

  AbsRel   mean |d − d*| / d*
  SqRel    mean (d − d*)² / d*
  RMSE     √mean (d − d*)²
  RMSElog  √mean (log d − log d*)²
  SILog    scale-invariant log error (Eigen et al.)
  δ<1.25ᵏ  fraction with max(d/d*, d*/d) < 1.25ᵏ, k ∈ {1,2,3}
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["depth_metrics"]


@jax.jit
def depth_metrics(
    pred: jax.Array, target: jax.Array, mask: jax.Array | None = None
) -> dict[str, jax.Array]:
    """Metrics over valid pixels (mask True, target > 0).

    Args:
      pred/target: (..., H, W) positive depths.
      mask: optional boolean validity mask (same shape).
    """
    valid = target > 0
    if mask is not None:
        valid = valid & mask
    n = jnp.maximum(valid.sum(), 1)
    eps = 1e-12
    p = jnp.where(valid, jnp.maximum(pred, eps), 1.0)
    t = jnp.where(valid, jnp.maximum(target, eps), 1.0)

    def vmean(x):
        return jnp.where(valid, x, 0.0).sum() / n

    diff = p - t
    log_diff = jnp.log(p) - jnp.log(t)
    ratio = jnp.maximum(p / t, t / p)

    silog_first = vmean(log_diff**2)
    silog_second = vmean(log_diff) ** 2
    return {
        "abs_rel": vmean(jnp.abs(diff) / t),
        "sq_rel": vmean(diff**2 / t),
        "rmse": jnp.sqrt(vmean(diff**2)),
        "rmse_log": jnp.sqrt(vmean(log_diff**2)),
        "silog": jnp.sqrt(jnp.maximum(silog_first - silog_second, 0.0)),
        "delta1": vmean((ratio < 1.25).astype(jnp.float32)),
        "delta2": vmean((ratio < 1.25**2).astype(jnp.float32)),
        "delta3": vmean((ratio < 1.25**3).astype(jnp.float32)),
    }
