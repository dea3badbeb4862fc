"""Separable matmul-based image resampling with exact OpenCV / PIL semantics.

The reference pipeline resizes in three places with three different kernels:

* downscale of large inputs with ``cv2.INTER_AREA``   (reference backend/app.py:444)
* depth→image upscale with ``cv2.INTER_LINEAR``       (reference backend/app.py:188)
* HF processor resize with PIL bicubic (resample=3)   (reference backend/app.py:109)

On TPU we express every one of these as two small dense matmuls
``out = W_rows @ img @ W_cols.T`` where the resampling-weight matrices are
precomputed on host at trace time (shapes are static under jit). This maps
the entire resampling operation onto the MXU, fuses with neighbouring ops
under XLA, and is *exactly* the same linear operator the CPU libraries
apply (their fixed-point rounding aside).

All functions operate on float arrays shaped ``(H, W)`` or ``(H, W, C)``
(or batched ``(..., H, W, C)`` via the ``*_nhwc`` helper).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "resize_area",
    "resize_linear",
    "resize_bicubic_pil",
    "resize2d",
    "resample_matrix",
    "resize_batched",
]


def _weights_area(in_size: int, out_size: int) -> np.ndarray:
    """cv2.INTER_AREA weights for downscaling (box-filter area overlap).

    Output pixel ``i`` averages the source interval ``[i*s, (i+1)*s)`` with
    ``s = in/out``; each source pixel contributes its overlap length / s.
    For integer ratios this reduces to exact mean pooling. Matches
    cv2.resize(..., interpolation=cv2.INTER_AREA) on float inputs for
    downscaling (the only direction the reference uses it,
    backend/app.py:438-445, 156-160).
    """
    scale = in_size / out_size
    w = np.zeros((out_size, in_size), dtype=np.float64)
    for i in range(out_size):
        left = i * scale
        right = (i + 1) * scale
        j0 = int(math.floor(left))
        j1 = int(math.ceil(right))
        for j in range(j0, min(j1, in_size)):
            overlap = min(right, j + 1) - max(left, j)
            if overlap > 0:
                w[i, j] = overlap / scale
        # Guard the right edge: renormalize tiny float drift.
        s = w[i].sum()
        if s > 0:
            w[i] /= s
    return w.astype(np.float32)


def _weights_linear(in_size: int, out_size: int) -> np.ndarray:
    """cv2.INTER_LINEAR weights (half-pixel centers, clamped borders).

    Source coordinate of output pixel i is ``(i + 0.5) * s - 0.5``; the two
    neighbouring source pixels get triangle weights. Matches cv2 bilinear on
    float inputs (reference backend/app.py:188 resizes the float32 depth map
    this way).
    """
    scale = in_size / out_size
    w = np.zeros((out_size, in_size), dtype=np.float64)
    for i in range(out_size):
        src = (i + 0.5) * scale - 0.5
        j = int(math.floor(src))
        f = src - j
        j0 = min(max(j, 0), in_size - 1)
        j1 = min(max(j + 1, 0), in_size - 1)
        w[i, j0] += 1.0 - f
        w[i, j1] += f
    return w.astype(np.float32)


def _cubic_filter(x: np.ndarray, a: float = -0.5) -> np.ndarray:
    """Keys cubic kernel with a=-0.5 (PIL's BICUBIC filter)."""
    x = np.abs(x)
    r = np.zeros_like(x)
    m1 = x < 1.0
    m2 = (x >= 1.0) & (x < 2.0)
    r[m1] = ((a + 2.0) * x[m1] - (a + 3.0)) * x[m1] * x[m1] + 1.0
    r[m2] = (((x[m2] - 5.0) * x[m2] + 8.0) * x[m2] - 4.0) * a
    return r


def _weights_bicubic_pil(in_size: int, out_size: int) -> np.ndarray:
    """PIL ``Image.resize(..., BICUBIC)`` weights.

    PIL widens the kernel support by the scale factor when downscaling
    (antialiasing) and normalizes weights per output pixel — this is the
    resize the HF DPT image processor applies inside the reference's
    depth-inference call (backend/app.py:109).
    """
    scale = in_size / out_size
    filterscale = max(scale, 1.0)
    support = 2.0 * filterscale
    w = np.zeros((out_size, in_size), dtype=np.float64)
    for i in range(out_size):
        center = (i + 0.5) * scale
        j0 = max(int(center - support + 0.5), 0)
        j1 = min(int(center + support + 0.5), in_size)
        js = np.arange(j0, j1)
        ww = _cubic_filter((js - center + 0.5) / filterscale)
        tot = ww.sum()
        if tot != 0:
            ww = ww / tot
        w[i, j0:j1] = ww
    return w.astype(np.float32)


def _weights_linear_ac(in_size: int, out_size: int) -> np.ndarray:
    """torch ``F.interpolate(mode='bilinear', align_corners=True)`` weights.

    Source coordinate of output i is ``i * (in-1)/(out-1)`` — used by the
    DPT fusion/head upsampling inside the depth network.
    """
    w = np.zeros((out_size, in_size), dtype=np.float64)
    scale = (in_size - 1) / (out_size - 1) if out_size > 1 else 0.0
    for i in range(out_size):
        src = i * scale
        j = int(math.floor(src))
        f = src - j
        j0 = min(max(j, 0), in_size - 1)
        j1 = min(max(j + 1, 0), in_size - 1)
        w[i, j0] += 1.0 - f
        w[i, j1] += f
    return w.astype(np.float32)


def _weights_bicubic_torch(in_size: int, out_size: int) -> np.ndarray:
    """torch ``F.interpolate(mode='bicubic', align_corners=False,
    antialias=False)`` weights (a=-0.75, half-pixel centers, clamped
    borders, no kernel widening on downscale) — DINOv2's position-embedding
    interpolation.
    """
    a = -0.75
    scale = in_size / out_size
    w = np.zeros((out_size, in_size), dtype=np.float64)
    for i in range(out_size):
        src = (i + 0.5) * scale - 0.5
        j = int(math.floor(src))
        t = src - j
        offs = np.array([-1, 0, 1, 2])
        x = np.abs(offs - t)
        ww = np.where(
            x < 1.0,
            ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0,
            np.where(x < 2.0, (((x - 5.0) * x + 8.0) * x - 4.0) * a, 0.0),
        )
        for o, wt in zip(offs, ww):
            jj = min(max(j + o, 0), in_size - 1)
            w[i, jj] += wt
    return w.astype(np.float32)


_FILTERS = {
    "area": _weights_area,
    "linear": _weights_linear,
    "linear_ac": _weights_linear_ac,
    "bicubic_pil": _weights_bicubic_pil,
    "bicubic_torch": _weights_bicubic_torch,
}


@functools.lru_cache(maxsize=256)
def resample_matrix(in_size: int, out_size: int, method: str) -> np.ndarray:
    """Cached (out_size, in_size) resampling-weight matrix."""
    if in_size == out_size and method in ("area", "linear", "linear_ac"):
        return np.eye(out_size, dtype=np.float32)
    return _FILTERS[method](in_size, out_size)


def resize_batched(x: jax.Array, out_hw: tuple[int, int], method: str) -> jax.Array:
    """Resize a (B, H, W, C) batch with the given filter (two MXU matmuls).

    Dtype-aware: float32 inputs resample in full (HIGHEST) precision —
    the cv2/PIL-exact parity paths; bfloat16 inputs (model-internal
    feature maps) stay bf16 at native MXU speed. Same-size resizes are
    identities for every supported filter and are skipped.
    """
    if (x.shape[1], x.shape[2]) == tuple(out_hw):
        return x if jnp.issubdtype(x.dtype, jnp.floating) else x.astype(jnp.float32)
    bf16 = x.dtype == jnp.bfloat16
    if not jnp.issubdtype(x.dtype, jnp.floating):
        x = x.astype(jnp.float32)
    wdt = x.dtype
    prec = None if bf16 else jax.lax.Precision.HIGHEST
    wr = jnp.asarray(resample_matrix(x.shape[1], out_hw[0], method)).astype(wdt)
    wc = jnp.asarray(resample_matrix(x.shape[2], out_hw[1], method)).astype(wdt)
    y = jnp.einsum(
        "oi,biwc->bowc", wr, x,
        preferred_element_type=jnp.float32, precision=prec,
    ).astype(wdt)
    return jnp.einsum(
        "oj,bhjc->bhoc", wc, y,
        preferred_element_type=jnp.float32, precision=prec,
    ).astype(wdt)


def resize2d(img: jax.Array, out_hw: tuple[int, int], method: str) -> jax.Array:
    """Resize ``(H, W)`` or ``(H, W, C)`` float array with the given filter.

    Implemented as two MXU matmuls with host-precomputed weights.
    """
    squeeze = img.ndim == 2
    if squeeze:
        img = img[:, :, None]
    x = resize_batched(img.astype(jnp.float32)[None], out_hw, method)[0]
    if squeeze:
        x = x[:, :, 0]
    return x


def resize_area(img: jax.Array, out_hw: tuple[int, int]) -> jax.Array:
    """cv2.INTER_AREA resize (reference backend/app.py:444)."""
    return resize2d(img, out_hw, "area")


def resize_linear(img: jax.Array, out_hw: tuple[int, int]) -> jax.Array:
    """cv2.INTER_LINEAR resize (reference backend/app.py:188)."""
    return resize2d(img, out_hw, "linear")


def resize_bicubic_pil(img: jax.Array, out_hw: tuple[int, int]) -> jax.Array:
    """PIL BICUBIC resize (HF processor semantics, backend/app.py:109)."""
    return resize2d(img, out_hw, "bicubic_pil")
