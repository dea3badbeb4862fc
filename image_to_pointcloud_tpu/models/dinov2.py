"""DINOv2 ViT backbone in Flax — the encoder of the Depth-Anything family.

TPU-first design notes:

* NHWC layouts throughout; the 14×14/stride-14 patch embedding is a
  patchify-reshape followed by one MXU matmul (never a general conv).
* Attention runs through :mod:`image_to_pointcloud_tpu.models.attention`
  (Pallas flash-attention on TPU, fused XLA einsum fallback elsewhere).
* Position embeddings for non-native resolutions are interpolated with the
  separable-matmul resampler (torch bicubic a=-0.75 semantics), so the
  whole forward stays one jitted graph with static shapes.

Semantics match HF ``Dinov2Backbone`` as configured by Depth-Anything
(the model the reference loads at backend/app.py:80-81): pre-norm blocks,
LayerScale, GELU MLP, final LayerNorm applied to every selected
intermediate hidden state, CLS stripped from the returned feature maps.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from image_to_pointcloud_tpu.models.attention import multi_head_attention
from image_to_pointcloud_tpu.ops.resize import resample_matrix

__all__ = ["DinoV2Config", "DinoV2Backbone"]


@dataclasses.dataclass(frozen=True)
class DinoV2Config:
    hidden_size: int = 384
    num_layers: int = 12
    num_heads: int = 6
    mlp_ratio: int = 4
    patch_size: int = 14
    pos_embed_size: int = 37  # side of the native position-embedding grid
    layer_norm_eps: float = 1e-6
    out_layers: Sequence[int] = (2, 5, 8, 11)  # 0-indexed block outputs
    use_flash_attention: bool = False
    # Rematerialize each encoder block on the backward pass (training):
    # bounds live activations to one block while recomputing only that
    # block — the right remat granularity for a 12-24 block ViT.
    remat_blocks: bool = False
    # Sequences shorter than this use XLA's fused attention even with
    # use_flash_attention on. Was 2048 through round 3 (the f32-upcast
    # kernel lost below ~2k tokens); with the kernel's bf16 MXU dots
    # (models/attention.py) flash wins the full-graph A/B at 1370 tokens
    # 313.4 vs 250.7 img/s (benchmarks/flash_ab.py, 2026-08-20), so the
    # gate now admits the flagship 518² sequence.
    flash_min_seq: int = 1024
    dtype: jnp.dtype = jnp.float32  # compute dtype (bfloat16 on TPU)
    quantized: bool = False  # int8 W8A8 block matmuls (models/quantize.py)


def _dense(cfg: "DinoV2Config", features: int, name: str):
    """Block matmul dispatch — models/quantize.block_dense."""
    from image_to_pointcloud_tpu.models.quantize import block_dense

    return block_dense(cfg.quantized, features, dtype=cfg.dtype, name=name)


class Mlp(nn.Module):
    cfg: DinoV2Config

    @nn.compact
    def __call__(self, x):
        d = self.cfg.hidden_size
        x = _dense(self.cfg, d * self.cfg.mlp_ratio, "fc1")(x)
        x = nn.gelu(x, approximate=False)
        x = _dense(self.cfg, d, "fc2")(x)
        return x


class Block(nn.Module):
    cfg: DinoV2Config

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=cfg.dtype, name="norm1")(x)
        # Flash attention pays off once the (N, N) score tensor dominates
        # HBM traffic; below ~2k tokens XLA's fused attention is on par.
        use_flash = cfg.use_flash_attention and h.shape[1] >= cfg.flash_min_seq
        h = multi_head_attention(
            _dense(cfg, cfg.hidden_size, "q")(h),
            _dense(cfg, cfg.hidden_size, "k")(h),
            _dense(cfg, cfg.hidden_size, "v")(h),
            num_heads=cfg.num_heads,
            use_flash=use_flash,
        )
        h = _dense(cfg, cfg.hidden_size, "proj")(h)
        g1 = self.param("ls1", nn.initializers.ones, (cfg.hidden_size,))
        x = x + g1.astype(h.dtype) * h

        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=cfg.dtype, name="norm2")(x)
        h = Mlp(cfg, name="mlp")(h)
        g2 = self.param("ls2", nn.initializers.ones, (cfg.hidden_size,))
        return x + g2.astype(h.dtype) * h


class DinoV2Backbone(nn.Module):
    """Returns feature maps (B, h, w, D) for each configured output layer.

    Setup-style so the three phases are independently applicable (param
    names unchanged): ``embed`` (patchify → tokens), the ``block{i}``
    submodules (run sequentially by ``__call__`` or streamed through the
    GPipe schedule by parallel/pipeline_par), and ``finalize`` (final
    LayerNorm + CLS strip + grid reshape of the selected tap layers).
    """

    cfg: DinoV2Config

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
        block_cls = nn.remat(Block) if cfg.remat_blocks else Block
        self.blocks = [
            block_cls(cfg, name=f"block{i}") for i in range(cfg.num_layers)
        ]
        self.final_norm = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=cfg.dtype, name="norm"
        )

    def _pos_embed(self, ph: int, pw: int) -> jax.Array:
        cfg = self.cfg
        pos = self.pos_embed_param
        if ph == cfg.pos_embed_size and pw == cfg.pos_embed_size:
            return pos
        # torch bicubic (align_corners=False, antialias=False) interpolation
        # of the patch grid, CLS slot untouched — HF Dinov2 semantics.
        cls_pos, patch_pos = pos[:, :1], pos[:, 1:]
        grid = patch_pos.reshape(
            cfg.pos_embed_size, cfg.pos_embed_size, cfg.hidden_size
        )
        wr = jnp.asarray(resample_matrix(cfg.pos_embed_size, ph, "bicubic_torch"))
        wc = jnp.asarray(resample_matrix(cfg.pos_embed_size, pw, "bicubic_torch"))
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

        # Patchify + single matmul == Conv(k=p, s=p), laid out for the MXU.
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

    def finalize(
        self, taps: Sequence[jax.Array], ph: int, pw: int
    ) -> list[jax.Array]:
        """Tap-layer token activations → (B, ph, pw, D) feature maps."""
        out = []
        for t in taps:
            f = self.final_norm(t)[:, 1:, :]  # strip CLS
            out.append(f.reshape(f.shape[0], ph, pw, self.cfg.hidden_size))
        return out

    def __call__(self, pixels: jax.Array) -> list[jax.Array]:
        """pixels: (B, H, W, 3) normalized image, H and W multiples of 14."""
        cfg = self.cfg
        p = cfg.patch_size
        ph, pw = pixels.shape[1] // p, pixels.shape[2] // p

        x = self.embed(pixels)
        feats: dict[int, jax.Array] = {}
        want = set(cfg.out_layers)
        for i in range(cfg.num_layers):
            x = self.blocks[i](x)
            if i in want:
                feats[i] = x
        return self.finalize([feats[i] for i in cfg.out_layers], ph, pw)
