"""DPT neck + depth head in Flax (Depth-Anything variant), NHWC on TPU.

Semantics mirror the HF ``DepthAnythingNeck`` / ``DepthAnythingDepthEstimationHead``
driving the model the reference serves (backend/app.py:80-82):

* reassemble: 1×1 projection to per-stage widths, then ×4 / ×2 upsample
  (stride-matched transposed conv ≡ matmul + depth-to-space here),
  identity, or stride-2 3×3 conv downsample,
* per-stage 3×3 convs (no bias) to the fusion width,
* RefineNet-style fusion: pre-activation residual units, align-corners
  bilinear upsampling to the next stage's size (our separable-matmul
  resampler), 1×1 projection,
* head: 3×3 conv → upsample to patch_size×grid → 3×3 conv → ReLU → 1×1
  conv → ReLU → relative inverse depth (B, H, W).

Transposed convolutions with kernel==stride are implemented as a single
MXU matmul followed by a depth-to-space reshape — equivalent math, no
scatter, ideal XLA tiling.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from image_to_pointcloud_tpu.ops.resize import resize_batched

__all__ = ["DPTConfig", "DPTNeckHead"]


@dataclasses.dataclass(frozen=True)
class DPTConfig:
    hidden_size: int = 384
    neck_hidden_sizes: Sequence[int] = (48, 96, 192, 384)
    fusion_hidden_size: int = 64
    head_hidden_size: int = 32
    patch_size: int = 14
    metric_depth: bool = False  # metric (ZoeDepth-class) vs relative output
    max_depth: float = 1.0
    dtype: jnp.dtype = jnp.float32


class _UpsampleMatmul(nn.Module):
    """ConvTranspose(k=s) as matmul + depth-to-space (exact equivalence)."""

    channels: int
    factor: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        f = self.factor
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (f, f, c, self.channels)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.channels,))
        y = jnp.einsum(
            "bhwc,ijco->bhwijo",
            x.astype(self.dtype),
            kernel.astype(self.dtype),
            preferred_element_type=jnp.float32,
        )
        y = y + bias
        y = y.transpose(0, 1, 3, 2, 4, 5).reshape(b, h * f, w * f, self.channels)
        return y.astype(self.dtype)


class _PreActResidual(nn.Module):
    cfg: DPTConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg.fusion_hidden_size
        h = nn.relu(x)
        h = nn.Conv(c, (3, 3), padding=1, dtype=self.cfg.dtype, name="conv1")(h)
        h = nn.relu(h)
        h = nn.Conv(c, (3, 3), padding=1, dtype=self.cfg.dtype, name="conv2")(h)
        return x + h


class _FusionLayer(nn.Module):
    cfg: DPTConfig

    @nn.compact
    def __call__(self, x, residual=None, out_hw=None):
        cfg = self.cfg
        if residual is not None:
            if residual.shape[1:3] != x.shape[1:3]:
                residual = resize_batched(residual, x.shape[1:3], "linear")
            x = x + _PreActResidual(cfg, name="res1")(residual)
        x = _PreActResidual(cfg, name="res2")(x)
        if out_hw is None:
            out_hw = (x.shape[1] * 2, x.shape[2] * 2)
        x = resize_batched(x, out_hw, "linear_ac").astype(cfg.dtype)
        x = nn.Conv(
            cfg.fusion_hidden_size, (1, 1), dtype=cfg.dtype, name="projection"
        )(x)
        return x


class DPTNeckHead(nn.Module):
    """Feature maps (4× (B, h, w, D), shallow→deep) → depth (B, H, W)."""

    cfg: DPTConfig

    @nn.compact
    def __call__(self, feats: list[jax.Array]) -> jax.Array:
        cfg = self.cfg
        assert len(feats) == 4
        ph, pw = feats[0].shape[1], feats[0].shape[2]

        # Reassemble: project + rescale each stage.
        stages = []
        for i, f in enumerate(feats):
            c = cfg.neck_hidden_sizes[i]
            x = nn.Conv(c, (1, 1), dtype=cfg.dtype, name=f"proj{i}")(f.astype(cfg.dtype))
            if i == 0:
                x = _UpsampleMatmul(c, 4, cfg.dtype, name="up0")(x)
            elif i == 1:
                x = _UpsampleMatmul(c, 2, cfg.dtype, name="up1")(x)
            elif i == 3:
                x = nn.Conv(
                    c, (3, 3), strides=(2, 2), padding=1, dtype=cfg.dtype, name="down3"
                )(x)
            stages.append(
                nn.Conv(
                    cfg.fusion_hidden_size,
                    (3, 3),
                    padding=1,
                    use_bias=False,
                    dtype=cfg.dtype,
                    name=f"conv{i}",
                )(x)
            )

        # Fusion: deepest → shallowest, each upsampled to the next size.
        deep_to_shallow = stages[::-1]
        fused = None
        for idx, hs in enumerate(deep_to_shallow):
            last = idx == len(deep_to_shallow) - 1
            out_hw = None if last else deep_to_shallow[idx + 1].shape[1:3]
            layer = _FusionLayer(cfg, name=f"fusion{idx}")
            fused = layer(hs, out_hw=out_hw) if fused is None else layer(
                fused, hs, out_hw=out_hw
            )

        # Head.
        x = nn.Conv(
            cfg.fusion_hidden_size // 2, (3, 3), padding=1, dtype=cfg.dtype, name="head_conv1"
        )(fused)
        x = resize_batched(
            x, (ph * cfg.patch_size, pw * cfg.patch_size), "linear_ac"
        ).astype(cfg.dtype)
        x = nn.Conv(
            cfg.head_hidden_size, (3, 3), padding=1, dtype=cfg.dtype, name="head_conv2"
        )(x)
        x = nn.relu(x)
        x = nn.Conv(1, (1, 1), dtype=cfg.dtype, name="head_conv3")(x)
        if cfg.metric_depth:
            x = nn.sigmoid(x) * cfg.max_depth
        else:
            x = nn.relu(x)
        return x[..., 0]
