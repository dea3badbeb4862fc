"""Model-input preprocessing: HF DPT image-processor semantics, fused on device.

The reference calls the HF ``AutoImageProcessor`` inside its inference
step (backend/app.py:109): PIL-bicubic resize with ``keep_aspect_ratio``
to multiples of 14 targeting 518×518, rescale by 1/255, ImageNet
mean/std. Here that becomes: a host-side pure-integer size computation
(:func:`processor_output_size`) and a device-side fused resize+normalize
(:func:`preprocess_for_model`) that XLA folds into the model's first
matmul neighbourhood.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from image_to_pointcloud_tpu.models.depth_anything import (
    IMAGENET_MEAN,
    IMAGENET_STD,
)
from image_to_pointcloud_tpu.ops.resize import resize_batched

__all__ = ["processor_output_size", "preprocess_for_model"]


def _constrain_to_multiple_of(val: float, multiple: int, min_val: int = 0) -> int:
    x = round(val / multiple) * multiple
    if x < min_val:
        x = -(-val // multiple) * multiple
    return int(x)


def processor_output_size(
    h: int,
    w: int,
    target: int = 518,
    multiple: int = 14,
    keep_aspect_ratio: bool = True,
) -> tuple[int, int]:
    """Resize target used by the DPT processor (keep-aspect, multiple-of-14)."""
    scale_h = target / h
    scale_w = target / w
    if keep_aspect_ratio:
        if abs(1 - scale_w) < abs(1 - scale_h):
            scale_h = scale_w
        else:
            scale_w = scale_h
    return (
        _constrain_to_multiple_of(scale_h * h, multiple),
        _constrain_to_multiple_of(scale_w * w, multiple),
    )


def preprocess_for_model(
    images_rgb: jax.Array, out_hw: tuple[int, int]
) -> jax.Array:
    """(B, H, W, 3) uint8/float RGB → (B, mh, mw, 3) normalized model input."""
    x = images_rgb.astype(jnp.float32)
    x = resize_batched(x, out_hw, "bicubic_pil")
    x = x * (1.0 / 255.0)
    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
    std = jnp.asarray(IMAGENET_STD, jnp.float32)
    return (x - mean) / std
