"""Depth-estimation training losses (fine-tuning support).

The reference is inference-only; the framework adds first-class
fine-tuning of the depth family. Standard monocular-depth objectives:

* :func:`silog_loss` — scale-invariant log loss (Eigen et al.).
* :func:`affine_invariant_loss` — MiDaS-style: per-image least-squares
  scale/shift alignment of prediction to target, then trimmed MAE.
* :func:`gradient_matching_loss` — multi-scale depth-gradient matching.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["silog_loss", "affine_invariant_loss", "gradient_matching_loss"]


def silog_loss(pred, target, mask=None, lam: float = 0.85, eps: float = 1e-6):
    """Scale-invariant log loss over valid pixels."""
    if mask is None:
        mask = jnp.ones_like(pred, bool)
    m = mask.astype(jnp.float32)
    n = jnp.maximum(m.sum(axis=(-2, -1)), 1.0)
    g = (jnp.log(jnp.maximum(pred, eps)) - jnp.log(jnp.maximum(target, eps))) * m
    s1 = (g**2).sum(axis=(-2, -1)) / n
    s2 = (g.sum(axis=(-2, -1)) / n) ** 2
    return jnp.mean(s1 - lam * s2)


def _lsq_align(pred, target, m, eps=1e-6):
    n = jnp.maximum(m.sum(axis=(-2, -1), keepdims=True), 1.0)
    mp = (pred * m).sum(axis=(-2, -1), keepdims=True) / n
    mt = (target * m).sum(axis=(-2, -1), keepdims=True) / n
    cov = ((pred - mp) * (target - mt) * m).sum(axis=(-2, -1), keepdims=True) / n
    var = (((pred - mp) ** 2) * m).sum(axis=(-2, -1), keepdims=True) / n
    s = cov / (var + eps)
    b = mt - s * mp
    return s * pred + b


def affine_invariant_loss(pred, target, mask=None, trim: float = 0.2):
    """MiDaS-style scale/shift-invariant trimmed MAE per image.

    After least-squares alignment, the worst ``trim`` fraction of valid
    residuals per image is discarded (MiDaS Eq. 6 trims 20%) so
    heavy-tailed label noise doesn't dominate the gradient. ``trim=0``
    recovers the plain masked MAE.
    """
    if mask is None:
        mask = jnp.ones_like(pred, bool)
    m = mask.astype(jnp.float32)
    aligned = _lsq_align(pred, target, m)
    res = jnp.abs(aligned - target) * m
    if trim <= 0.0:
        n = jnp.maximum(m.sum(axis=(-2, -1)), 1.0)
        return jnp.mean(res.sum(axis=(-2, -1)) / n)
    b = res.shape[0]
    flat = res.reshape(b, -1)
    mflat = m.reshape(b, -1)
    nvalid = mflat.sum(axis=-1)
    # Keep the floor((1-trim)·nvalid) smallest valid residuals: invalid
    # pixels sort to +inf, so the ascending prefix is valid-only.
    order = jnp.sort(jnp.where(mflat > 0, flat, jnp.inf), axis=-1)
    keep_n = jnp.floor((1.0 - trim) * nvalid).astype(jnp.int32)
    idx = jnp.arange(flat.shape[-1])[None, :]
    kept = jnp.where(idx < keep_n[:, None], order, 0.0)
    return jnp.mean(kept.sum(axis=-1) / jnp.maximum(keep_n, 1))


def gradient_matching_loss(pred, target, mask=None, scales: int = 4):
    """Multi-scale gradient matching on (B, H, W) depth maps."""
    if mask is None:
        mask = jnp.ones_like(pred, bool)
    total = 0.0
    p, t, m = pred, target, mask.astype(jnp.float32)
    for _ in range(scales):
        # A diff is valid only when BOTH endpoint pixels are (MiDaS
        # multiplies both masks): one-sided masking would let invalid
        # target values leak into the loss at every validity boundary.
        dx = jnp.abs(jnp.diff(p - t, axis=-1)) * (
            m[..., :, 1:] * m[..., :, :-1]
        )
        dy = jnp.abs(jnp.diff(p - t, axis=-2)) * (
            m[..., 1:, :] * m[..., :-1, :]
        )
        n = jnp.maximum(m.sum(axis=(-2, -1)), 1.0)
        total = total + jnp.mean(
            (dx.sum(axis=(-2, -1)) + dy.sum(axis=(-2, -1))) / n
        )
        p = p[..., ::2, ::2]
        t = t[..., ::2, ::2]
        m = m[..., ::2, ::2]
    return total / scales
