"""Plain ViT backbone in Flax — the encoder of classic DPT (MiDaS 3.0).

The reference only serves Depth-Anything (backend/app.py:80-81), but the
north-star benchmark set names the MiDaS family; MiDaS 3.0 *is* DPT with
a plain ViT encoder (Ranftl et al., "Vision Transformers for Dense
Prediction"). This is that encoder, semantics matched to HF
``transformers.models.dpt.modeling_dpt``'s internal ViT
(DPTViTEmbeddings/DPTViTLayer) so released ``Intel/dpt-large`` weights
drop in via :func:`models.convert.convert_dpt_classic`.

Differences from :class:`models.dinov2.DinoV2Backbone` (both are ViTs,
but the families diverge in exactly these places):

* no LayerScale (plain residual adds),
* LayerNorm eps 1e-12 (HF ViT default) vs DINOv2's 1e-6,
* position embeddings interpolated with torch *bilinear*
  (align_corners=False; modeling_dpt.DPTViTEmbeddings._resize_pos_embed)
  vs DINOv2's bicubic,
* tap layers return the raw token sequence INCLUDING the CLS token and
  WITHOUT a final LayerNorm — classic DPT's readout-projection consumes
  the CLS per stage (modeling_dpt.DPTReassembleStage.forward), where
  DINOv2 norms and strips it.

TPU-first layout mirrors dinov2.py: patchify-reshape + one MXU matmul
for the 16×16/stride-16 patch embed, attention through
models/attention.py (Pallas flash past the long-sequence crossover),
NHWC everywhere, static shapes under jit.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from image_to_pointcloud_tpu.models.attention import multi_head_attention
from image_to_pointcloud_tpu.ops.resize import resample_matrix

__all__ = ["ViTConfig", "ViTBackbone", "ViTBlock"]


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    mlp_ratio: int = 4
    patch_size: int = 16
    pos_embed_size: int = 24  # side of the native position-embedding grid
    layer_norm_eps: float = 1e-12
    out_layers: Sequence[int] = (5, 11, 17, 23)  # 0-indexed block outputs
    use_flash_attention: bool = False
    # Rematerialize encoder blocks on the backward pass (training).
    remat_blocks: bool = False
    # Below this, XLA fused attention wins; 1024 matches DinoV2Config
    # (full-graph A/B at 1370 tokens: benchmarks/flash_ab.py).
    flash_min_seq: int = 1024
    dtype: jnp.dtype = jnp.float32
    quantized: bool = False  # int8 W8A8 block matmuls (models/quantize.py)


def _dense(cfg: "ViTConfig", features: int, name: str):
    """Block matmul dispatch — models/quantize.block_dense."""
    from image_to_pointcloud_tpu.models.quantize import block_dense

    return block_dense(cfg.quantized, features, dtype=cfg.dtype, name=name)


class _Mlp(nn.Module):
    cfg: ViTConfig

    @nn.compact
    def __call__(self, x):
        d = self.cfg.hidden_size
        x = _dense(self.cfg, d * self.cfg.mlp_ratio, "fc1")(x)
        x = nn.gelu(x, approximate=False)
        x = _dense(self.cfg, d, "fc2")(x)
        return x


class ViTBlock(nn.Module):
    """Pre-LN ViT block (modeling_dpt.DPTViTLayer): LN → MHA → +residual,
    LN → MLP → +residual. Param names match the DINOv2 block so the TP
    sharding rules (parallel/sharding.py block\\d+/(q|k|v|proj|mlp/fc*))
    apply unchanged."""

    cfg: ViTConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=cfg.dtype, name="norm1")(x)
        use_flash = cfg.use_flash_attention and h.shape[1] >= cfg.flash_min_seq
        h = multi_head_attention(
            _dense(cfg, cfg.hidden_size, "q")(h),
            _dense(cfg, cfg.hidden_size, "k")(h),
            _dense(cfg, cfg.hidden_size, "v")(h),
            num_heads=cfg.num_heads,
            use_flash=use_flash,
        )
        h = _dense(cfg, cfg.hidden_size, "proj")(h)
        x = x + h

        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=cfg.dtype, name="norm2")(x)
        return x + _Mlp(cfg, name="mlp")(h)


class ViTBackbone(nn.Module):
    """(B, H, W, 3) pixels → list of (B, 1+ph·pw, D) token sequences, one
    per configured tap layer, CLS included (classic DPT's readout needs
    it). Setup-style like DinoV2Backbone so ``embed`` can feed the GPipe
    schedule (parallel/pipeline_par) with the blocks streamed per stage.
    """

    cfg: ViTConfig

    def setup(self):
        cfg = self.cfg
        p = cfg.patch_size
        self.patch_embed = self.param(
            "patch_embed",
            nn.initializers.lecun_normal(),
            (p * p * 3, cfg.hidden_size),
        )
        self.patch_bias = self.param(
            "patch_bias", nn.initializers.zeros, (cfg.hidden_size,)
        )
        self.cls_token = self.param(
            "cls_token", nn.initializers.normal(0.02), (1, 1, cfg.hidden_size)
        )
        n_native = cfg.pos_embed_size * cfg.pos_embed_size
        self.pos_embed_param = self.param(
            "pos_embed",
            nn.initializers.normal(0.02),
            (1, n_native + 1, cfg.hidden_size),
        )
        block_cls = nn.remat(ViTBlock) if cfg.remat_blocks else ViTBlock
        self.blocks = [
            block_cls(cfg, name=f"block{i}") for i in range(cfg.num_layers)
        ]

    def _pos_embed(self, ph: int, pw: int) -> jax.Array:
        cfg = self.cfg
        pos = self.pos_embed_param
        if ph == cfg.pos_embed_size and pw == cfg.pos_embed_size:
            return pos
        # torch bilinear (align_corners=False) over the patch grid, CLS
        # slot untouched — modeling_dpt._resize_pos_embed semantics.
        cls_pos, patch_pos = pos[:, :1], pos[:, 1:]
        grid = patch_pos.reshape(
            cfg.pos_embed_size, cfg.pos_embed_size, cfg.hidden_size
        )
        wr = jnp.asarray(resample_matrix(cfg.pos_embed_size, ph, "linear"))
        wc = jnp.asarray(resample_matrix(cfg.pos_embed_size, pw, "linear"))
        grid = jnp.einsum(
            "oi,iwc->owc", wr, grid, precision=jax.lax.Precision.HIGHEST
        )
        grid = jnp.einsum(
            "oj,hjc->hoc", wc, grid, precision=jax.lax.Precision.HIGHEST
        )
        return jnp.concatenate(
            [cls_pos, grid.reshape(1, ph * pw, cfg.hidden_size)], axis=1
        )

    def embed(self, pixels: jax.Array) -> jax.Array:
        """(B, H, W, 3) normalized pixels → (B, 1+ph·pw, D) tokens."""
        cfg = self.cfg
        b, h, w, _ = pixels.shape
        p = cfg.patch_size
        ph, pw = h // p, w // p

        x = pixels.reshape(b, ph, p, pw, p, 3).transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(b, ph * pw, p * p * 3).astype(cfg.dtype)
        x = x @ self.patch_embed.astype(cfg.dtype) + self.patch_bias.astype(
            cfg.dtype
        )
        x = jnp.concatenate(
            [
                jnp.broadcast_to(
                    self.cls_token.astype(cfg.dtype), (b, 1, cfg.hidden_size)
                ),
                x,
            ],
            axis=1,
        )
        return x + self._pos_embed(ph, pw).astype(cfg.dtype)

    def __call__(self, pixels: jax.Array) -> list[jax.Array]:
        """pixels: (B, H, W, 3), H and W multiples of ``patch_size``."""
        cfg = self.cfg
        x = self.embed(pixels)
        feats: dict[int, jax.Array] = {}
        want = set(cfg.out_layers)
        for i in range(cfg.num_layers):
            x = self.blocks[i](x)
            if i in want:
                feats[i] = x
        return [feats[i] for i in cfg.out_layers]
