"""Classic DPT (= MiDaS 3.0) in Flax: plain ViT encoder + readout-project
DPT neck + monodepth head.

The north-star benchmark set (BASELINE.json) names MiDaS / DPT-Large
model slots; the reference itself only serves Depth-Anything
(backend/app.py:80-81). MiDaS 3.0 *is* this architecture (Ranftl et al.
2021), and HF ``transformers.models.dpt`` is the implementation the
released ``Intel/dpt-large`` checkpoint loads into — semantics here are
matched to it (verified by tests/test_dpt_classic_parity.py) so those
weights drop in via :func:`models.convert.convert_dpt_classic`.

Architecture deltas vs the Depth-Anything variant (models/dpt.py):

* readout_type="project": each tap keeps its CLS token; per stage the
  CLS is broadcast-concatenated to every patch token and projected
  back to hidden width with Linear(2C→C)+GELU
  (modeling_dpt.DPTReassembleStage.forward),
* fusion upsamples by an exact ×2 each step (align_corners=True) with
  the 1×1 projection applied after — NOT "resize to the next stage's
  size" (modeling_dpt.DPTFeatureFusionLayer.forward); residual size
  mismatches are bilinear align_corners=False resized,
* head: 3×3 conv (F→F/2) → exact ×2 bilinear align_corners=True →
  3×3 conv (→32) → ReLU → 1×1 conv (→1) → ReLU
  (modeling_dpt.DPTDepthEstimationHead).

Preprocessing: the DPT image processor for Intel/dpt-large resizes to a
fixed 384×384 (keep_aspect_ratio=False) and normalizes with mean=std=0.5
— carried as config attributes read by pipeline/preprocess.py.

TPU notes: reuses the MXU-matmul building blocks of models/dpt.py
(transposed-conv-as-matmul upsampling, separable-matmul resizes); the
readout projection is one extra fused matmul per stage.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from image_to_pointcloud_tpu.models.dpt import (
    DPTConfig,
    _FusionLayer,
    _UpsampleMatmul,
)
from image_to_pointcloud_tpu.models.vit import ViTBackbone, ViTConfig
from image_to_pointcloud_tpu.ops.resize import resize_batched

__all__ = ["DPTClassicConfig", "DPTClassic"]


@dataclasses.dataclass(frozen=True)
class _RelativeNeckInfo:
    """Duck-typed ``cfg.neck`` view for consumers that check
    ``cfg.neck.metric_depth`` (cli.py:307, pipeline/advanced.py:94)."""

    metric_depth: bool = False
    max_depth: float = 1.0


@dataclasses.dataclass(frozen=True)
class DPTClassicConfig:
    backbone: ViTConfig = dataclasses.field(default_factory=ViTConfig)
    neck_hidden_sizes: Sequence[int] = (256, 512, 1024, 1024)
    fusion_hidden_size: int = 256
    head_hidden_size: int = 32
    # DPTImageProcessor for Intel/dpt-large: fixed square 384 (no
    # keep-aspect), bicubic, mean=std=0.5.
    pixel_mean: Sequence[float] = (0.5, 0.5, 0.5)
    pixel_std: Sequence[float] = (0.5, 0.5, 0.5)
    native_target: int = 384
    size_multiple: int = 16
    keep_aspect_ratio: bool = False
    resize_method: str = "bicubic_pil"
    dtype: jnp.dtype = jnp.float32

    # ---- config-surface compatibility with DepthAnythingConfig ----

    @property
    def neck(self) -> _RelativeNeckInfo:
        return _RelativeNeckInfo()

    def _neck_cfg(self) -> DPTConfig:
        """Internal DPTConfig view for the shared fusion modules."""
        return DPTConfig(
            hidden_size=self.backbone.hidden_size,
            neck_hidden_sizes=tuple(self.neck_hidden_sizes),
            fusion_hidden_size=self.fusion_hidden_size,
            head_hidden_size=self.head_hidden_size,
            patch_size=self.backbone.patch_size,
            dtype=self.dtype,
        )

    def with_dtype(self, dtype) -> "DPTClassicConfig":
        return dataclasses.replace(
            self, dtype=dtype,
            backbone=dataclasses.replace(self.backbone, dtype=dtype),
        )

    def with_flash_attention(self, on: bool = True) -> "DPTClassicConfig":
        return dataclasses.replace(
            self,
            backbone=dataclasses.replace(
                self.backbone, use_flash_attention=on
            ),
        )

    def with_quantized(self, on: bool = True) -> "DPTClassicConfig":
        return dataclasses.replace(
            self, backbone=dataclasses.replace(self.backbone, quantized=on)
        )


class _ClassicNeckHead(nn.Module):
    """Tap token sequences (CLS included) → relative inverse depth."""

    cfg: DPTClassicConfig

    @nn.compact
    def __call__(self, taps: list[jax.Array], grid_hw: tuple[int, int]):
        cfg = self.cfg
        ncfg = cfg._neck_cfg()
        dt = cfg.dtype
        ph, pw = grid_hw
        d = cfg.backbone.hidden_size

        # Reassemble: readout-project, 1×1 channel proj, per-stage rescale.
        stages = []
        for i, t in enumerate(taps):
            t = t.astype(dt)
            cls, tok = t[:, :1, :], t[:, 1:, :]
            x = jnp.concatenate(
                [tok, jnp.broadcast_to(cls, tok.shape)], axis=-1
            )
            x = nn.Dense(d, dtype=dt, name=f"readout{i}")(x)
            x = nn.gelu(x, approximate=False)
            x = x.reshape(x.shape[0], ph, pw, d)
            c = cfg.neck_hidden_sizes[i]
            x = nn.Conv(c, (1, 1), dtype=dt, name=f"proj{i}")(x)
            if i == 0:
                x = _UpsampleMatmul(c, 4, dt, name="up0")(x)
            elif i == 1:
                x = _UpsampleMatmul(c, 2, dt, name="up1")(x)
            elif i == 3:
                x = nn.Conv(
                    c, (3, 3), strides=(2, 2), padding=1, dtype=dt,
                    name="down3",
                )(x)
            stages.append(
                nn.Conv(
                    cfg.fusion_hidden_size, (3, 3), padding=1,
                    use_bias=False, dtype=dt, name=f"conv{i}",
                )(x)
            )

        # Fusion, deepest → shallowest; every step an exact ×2 of the
        # accumulated map (_FusionLayer's out_hw=None default), residual
        # mismatches bilinear-resized — modeling_dpt semantics.
        fused = None
        for idx, hs in enumerate(stages[::-1]):
            layer = _FusionLayer(ncfg, name=f"fusion{idx}")
            fused = layer(hs) if fused is None else layer(fused, hs)

        # Head (modeling_dpt.DPTDepthEstimationHead; exact ×2, not
        # resize-to-input — they differ only for odd patch grids).
        x = nn.Conv(
            cfg.fusion_hidden_size // 2, (3, 3), padding=1, dtype=dt,
            name="head_conv1",
        )(fused)
        x = resize_batched(
            x, (x.shape[1] * 2, x.shape[2] * 2), "linear_ac"
        ).astype(dt)
        x = nn.Conv(
            cfg.head_hidden_size, (3, 3), padding=1, dtype=dt,
            name="head_conv2",
        )(x)
        x = nn.relu(x)
        x = nn.Conv(1, (1, 1), dtype=dt, name="head_conv3")(x)
        x = nn.relu(x)
        return x[..., 0]


class DPTClassic(nn.Module):
    """(B, H, W, 3) normalized pixels → (B, H', W') relative inverse
    depth (H'=H for even patch grids, the only sizes the preprocess
    emits). ``taps`` short-circuits the encoder for the GPipe path
    (parallel/pipeline_par), mirroring ZoeDepth's convention."""

    cfg: DPTClassicConfig

    @nn.compact
    def __call__(
        self, pixels: jax.Array, taps: list[jax.Array] | None = None
    ) -> jax.Array:
        p = self.cfg.backbone.patch_size
        grid = (pixels.shape[1] // p, pixels.shape[2] // p)
        if taps is None:
            taps = ViTBackbone(self.cfg.backbone, name="backbone")(pixels)
        depth = _ClassicNeckHead(self.cfg, name="neck")(taps, grid)
        return depth.astype(jnp.float32)
