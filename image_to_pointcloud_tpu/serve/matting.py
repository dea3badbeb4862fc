"""Learned background matting for the v2 processor.

The reference composites its input onto white using a learned alpha
matte (``transparent_background.Remover`` — a salient-object
segmentation network, spar3d_processor.py:88). Here the matte model is
a Flax SegFormer (models/segformer.py): put a SegFormer matting/
salient-object checkpoint at ``<IPC_TPU_CHECKPOINT_DIR>/matting/
model.safetensors`` (1-channel sigmoid head or 2-class softmax head)
and :class:`MatteModel` serves it; with no checkpoint the processor
falls back to the classical border-statistics matte
(serve/processor3d.estimate_background_matte), mirroring how the depth
models fall back to random init.
"""

from __future__ import annotations

import logging
import os
from pathlib import Path

import numpy as np

__all__ = ["MatteModel", "load_matte_model"]

logger = logging.getLogger(__name__)

# Internal inference resolution: SegFormer's native fine-tune size.
_MATTE_SIZE = 512
# ImageNet stats — the SegformerImageProcessor defaults.
_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
_STD = np.asarray([0.229, 0.224, 0.225], np.float32)


class MatteModel:
    """Alpha matte from a SegFormer checkpoint: ``alpha(rgb) -> (H, W)``."""

    def __init__(self, params, num_labels: int):
        import jax
        import jax.numpy as jnp

        from image_to_pointcloud_tpu.models import (
            SegformerMatte,
            segformer_b0,
        )
        from image_to_pointcloud_tpu.ops.resize import resize_batched

        if num_labels not in (1, 2):
            raise ValueError(
                "matting head must be 1-channel (sigmoid) or 2-class "
                f"(softmax); got {num_labels} channels"
            )
        self.num_labels = num_labels
        model = SegformerMatte(segformer_b0(num_labels=num_labels))

        def fn(p, pixels_u8):
            x = pixels_u8.astype(jnp.float32) / 255.0
            x = (x - _MEAN) / _STD
            logits = model.apply({"params": p}, x)  # (B, S/4, S/4, C)
            if num_labels == 1:
                prob = jax.nn.sigmoid(logits[..., 0])
            else:
                prob = jax.nn.softmax(logits, axis=-1)[..., 1]
            # Back to the matte working resolution on device.
            return resize_batched(
                prob[..., None], (_MATTE_SIZE, _MATTE_SIZE), "linear"
            )[..., 0]

        self._fn = jax.jit(fn)
        self._params = params

    def alpha(self, rgb_u8: np.ndarray) -> np.ndarray:
        """(H, W, 3) uint8 → (H, W) float32 alpha in [0, 1]."""
        from PIL import Image

        h, w = rgb_u8.shape[:2]
        im = Image.fromarray(rgb_u8).resize(
            (_MATTE_SIZE, _MATTE_SIZE), Image.BILINEAR
        )
        prob = np.asarray(self._fn(self._params, np.asarray(im)[None]))[0]
        out = Image.fromarray(
            (np.clip(prob, 0.0, 1.0) * 255).astype(np.uint8)
        ).resize((w, h), Image.BILINEAR)
        return np.asarray(out).astype(np.float32) / 255.0


def load_matte_model(
    checkpoint_dir: str | os.PathLike | None = None,
) -> MatteModel | None:
    """MatteModel from ``<dir>/matting/model.safetensors`` or None.

    The head width (1 vs 2 channels) is inferred from the checkpoint's
    classifier shape, so both matting conventions drop in unmodified."""
    root = checkpoint_dir or os.environ.get("IPC_TPU_CHECKPOINT_DIR")
    if not root:
        return None
    path = Path(root) / "matting" / "model.safetensors"
    if not path.exists():
        return None
    from image_to_pointcloud_tpu.models import (
        convert_segformer,
        load_safetensors,
    )

    try:
        sd = load_safetensors(str(path))
        num_labels = sd["decode_head.classifier.weight"].shape[0]
        params = convert_segformer(sd)
        model = MatteModel(params, int(num_labels))
        logger.info(
            "Loaded learned matting model from %s (%d-channel head)",
            path, num_labels,
        )
        return model
    except Exception as e:  # noqa: BLE001
        logger.warning(
            "Failed to load matting checkpoint %s (%s); falling back to "
            "the classical matte", path, e,
        )
        return None
