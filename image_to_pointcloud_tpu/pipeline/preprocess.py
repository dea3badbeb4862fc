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

__all__ = [
    "processor_output_size",
    "preprocess_for_model",
    "model_preprocess_spec",
    "reflect_pad_margins",
]


def reflect_pad_margins(cfg, h: int, w: int) -> tuple[int, int]:
    """Per-side reflect-pad margins for the model family.

    ZoeDepth pads by ``int(sqrt(dim/2) * 3)`` before resizing and crops
    the prediction back (image_processing_zoedepth.py:287-292 and
    post_process_depth_estimation); the DA family pads nothing."""
    import math

    f = getattr(cfg, "pad_reflect_factor", 0)
    if not f:
        return 0, 0
    return int(math.sqrt(h / 2) * f), int(math.sqrt(w / 2) * f)


def model_preprocess_spec(cfg, model_target=None):
    """Per-family (target, multiple, mean, std, method, keep_aspect)
    preprocess parameters.

    DA-family configs use the HF DPT processor defaults (518,
    multiple-of-14, ImageNet stats, PIL-bicubic resize); ZoeDepthConfig
    carries overrides ((384,512), multiple-of-32, 0.5/0.5 stats,
    bilinear-align-corners resize + reflect pad); DPTClassicConfig a
    fixed square 384 (keep_aspect_ratio=False, the Intel/dpt-large
    processor's setting) with 0.5/0.5 stats."""
    return (
        model_target
        if model_target is not None
        else getattr(cfg, "native_target", 518),
        getattr(cfg, "size_multiple", 14),
        tuple(getattr(cfg, "pixel_mean", IMAGENET_MEAN)),
        tuple(getattr(cfg, "pixel_std", IMAGENET_STD)),
        getattr(cfg, "resize_method", "bicubic_pil"),
        getattr(cfg, "keep_aspect_ratio", True),
    )


def _constrain_to_multiple_of(val: float, multiple: int, min_val: int = 0) -> int:
    x = round(val / multiple) * multiple
    if x < min_val:
        x = -(-val // multiple) * multiple
    return int(x)


def processor_output_size(
    h: int,
    w: int,
    target: int | tuple[int, int] = 518,
    multiple: int = 14,
    keep_aspect_ratio: bool = True,
) -> tuple[int, int]:
    """Resize target used by the DPT-family processors (keep-aspect,
    multiple-of-N). ``target`` may be (th, tw) for non-square natives
    (ZoeDepth trains at 384x512, image_processing_zoedepth.py)."""
    th, tw = (target, target) if isinstance(target, int) else target
    scale_h = th / h
    scale_w = tw / w
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
    images_rgb: jax.Array,
    out_hw: tuple[int, int],
    mean: tuple[float, ...] = IMAGENET_MEAN,
    std: tuple[float, ...] = IMAGENET_STD,
    method: str = "bicubic_pil",
) -> jax.Array:
    """(B, H, W, 3) uint8/float RGB → (B, mh, mw, 3) normalized model input.

    mean/std/method default to the DA family's HF-DPT-processor
    semantics (ImageNet stats, PIL bicubic); ZoeDepth passes 0.5/0.5
    stats and torch bilinear-align-corners resize via its config."""
    x = images_rgb.astype(jnp.float32)
    x = resize_batched(x, out_hw, method)
    x = x * (1.0 / 255.0)
    return (x - jnp.asarray(mean, jnp.float32)) / jnp.asarray(std, jnp.float32)
