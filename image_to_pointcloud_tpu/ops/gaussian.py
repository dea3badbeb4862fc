"""Separable Gaussian blur with cv2.GaussianBlur(ksize, sigma=0) semantics.

The reference optionally smooths the normalized depth map with
``cv2.GaussianBlur(d, (k, k), 0)`` where ``k = max(3, smooth_ksize//2*2+1)``
(reference backend/app.py:209-214). With ``sigma=0`` OpenCV derives the
kernel as follows:

* for ksize in {1, 3, 5, 7} it uses fixed "small Gaussian" tables,
* otherwise ``sigma = 0.3*((ksize-1)*0.5 - 1) + 0.8`` and
  ``w_i = exp(-(i - (k-1)/2)^2 / (2 sigma^2))`` normalized to sum 1,

and the default border mode is BORDER_REFLECT_101 (numpy ``mode='reflect'``).
We implement the blur as a separable 1-D convolution pair on the VPU with
reflect padding, fused under jit with the surrounding normalize/unproject ops.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["gaussian_blur", "gaussian_kernel1d"]

# OpenCV's bit-exact fixed-point kernels for sigma<=0 and ksize<=9
# (multiples of 1/256; modules/imgproc/src/smooth.cpp).
_SMALL_GAUSSIAN = {
    1: np.array([1.0], dtype=np.float32),
    3: np.array([0.25, 0.5, 0.25], dtype=np.float32),
    5: np.array([0.0625, 0.25, 0.375, 0.25, 0.0625], dtype=np.float32),
    7: np.array([0.03125, 0.109375, 0.21875, 0.28125, 0.21875, 0.109375, 0.03125], dtype=np.float32),
    9: np.array([4, 13, 30, 51, 60, 51, 30, 13, 4], dtype=np.float32) / 256.0,
}


@functools.lru_cache(maxsize=64)
def gaussian_kernel1d(ksize: int, sigma: float = 0.0) -> np.ndarray:
    """1-D Gaussian kernel identical to cv2.getGaussianKernel(ksize, sigma)."""
    if sigma <= 0 and ksize in _SMALL_GAUSSIAN:
        return _SMALL_GAUSSIAN[ksize]
    if sigma <= 0:
        sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
    x = np.arange(ksize, dtype=np.float64) - (ksize - 1) * 0.5
    w = np.exp(-(x * x) / (2.0 * sigma * sigma))
    w /= w.sum()
    return w.astype(np.float32)


def gaussian_blur(img: jax.Array, ksize: int, sigma: float = 0.0) -> jax.Array:
    """Blur an (H, W) float map like cv2.GaussianBlur((k, k), sigma)."""
    k = gaussian_kernel1d(int(ksize), float(sigma))
    half = (len(k) - 1) // 2
    kern = jnp.asarray(k)
    x = img.astype(jnp.float32)
    if half == 0:
        return x
    # BORDER_REFLECT_101 == numpy/jnp 'reflect'.
    xp = jnp.pad(x, ((half, half), (0, 0)), mode="reflect")
    rows = sum(kern[i] * xp[i : i + x.shape[0], :] for i in range(len(k)))
    xp = jnp.pad(rows, ((0, 0), (half, half)), mode="reflect")
    out = sum(kern[i] * xp[:, i : i + x.shape[1]] for i in range(len(k)))
    return out
