"""SegFormer (MiT encoder + all-MLP decode head) in Flax — the learned
background-matting model for the v2 processor.

The reference's v2 preprocess removes backgrounds with a learned matte
(``transparent_background.Remover``, spar3d_processor.py:88). This is
the framework's learned model for that slot (serve/matting.py): a real
segmentation architecture mirroring HF
``transformers.models.segformer.modeling_segformer`` exactly, so any
released/fine-tuned SegFormer checkpoint (e.g. a 1-class salient-object
or portrait matte head on the MiT-B0 trunk) converts straight in via
``models.convert.convert_segformer``.

Architecture (NHWC throughout):
  4 stages of overlapped patch-embed conv → pre-norm transformer blocks
  with spatially-reduced attention (PvT-style sr conv on K/V) and
  Mix-FFN (dense → 3×3 depthwise conv → GELU → dense), per-stage final
  LayerNorm; decode head projects every stage to a common width,
  bilinearly upsamples to stage-1 resolution (H/4), fuses with a 1×1
  conv + BatchNorm(frozen inference stats) + ReLU, then a 1×1
  classifier. Logits are (B, H/4, W/4, num_labels).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from image_to_pointcloud_tpu.ops.resize import resize_batched

__all__ = ["SegformerConfig", "SegformerMatte", "segformer_b0"]


@dataclasses.dataclass(frozen=True)
class SegformerConfig:
    hidden_sizes: Sequence[int] = (32, 64, 160, 256)
    depths: Sequence[int] = (2, 2, 2, 2)
    num_heads: Sequence[int] = (1, 2, 5, 8)
    sr_ratios: Sequence[int] = (8, 4, 2, 1)
    patch_sizes: Sequence[int] = (7, 3, 3, 3)
    strides: Sequence[int] = (4, 2, 2, 2)
    mlp_ratios: Sequence[int] = (4, 4, 4, 4)
    decoder_hidden_size: int = 256
    num_labels: int = 1
    layer_norm_eps: float = 1e-6
    batch_norm_eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32


def segformer_b0(num_labels: int = 1) -> SegformerConfig:
    """MiT-B0 (the 3.7M-param small trunk; nvidia/mit-b0 layout)."""
    return SegformerConfig(num_labels=num_labels)


def _ln(cfg, name):
    return nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=cfg.dtype, name=name)


class _EfficientAttention(nn.Module):
    cfg: SegformerConfig
    stage: int

    @nn.compact
    def __call__(self, x, hw):
        cfg = self.cfg
        d = cfg.hidden_sizes[self.stage]
        heads = cfg.num_heads[self.stage]
        dh = d // heads
        b, n, _ = x.shape
        h, w = hw

        q = nn.Dense(d, dtype=cfg.dtype, name="q")(x)
        kv_in = x
        sr = cfg.sr_ratios[self.stage]
        if sr > 1:
            grid = kv_in.reshape(b, h, w, d)
            grid = nn.Conv(
                d, (sr, sr), strides=(sr, sr), padding="VALID",
                dtype=cfg.dtype, name="sr",
            )(grid)
            kv_in = grid.reshape(b, -1, d)
            kv_in = _ln(cfg, "sr_norm")(kv_in)
        k = nn.Dense(d, dtype=cfg.dtype, name="k")(kv_in)
        v = nn.Dense(d, dtype=cfg.dtype, name="v")(kv_in)

        m = kv_in.shape[1]
        q = q.reshape(b, n, heads, dh).transpose(0, 2, 1, 3)
        k = k.reshape(b, m, heads, dh).transpose(0, 2, 1, 3)
        v = v.reshape(b, m, heads, dh).transpose(0, 2, 1, 3)
        scores = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
        ) / math.sqrt(dh)
        probs = jax.nn.softmax(scores, axis=-1).astype(cfg.dtype)
        out = jnp.einsum(
            "bhqk,bhkd->bhqd", probs, v, preferred_element_type=jnp.float32
        ).astype(cfg.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, d)
        return nn.Dense(d, dtype=cfg.dtype, name="proj")(out)


class _MixFFN(nn.Module):
    cfg: SegformerConfig
    stage: int

    @nn.compact
    def __call__(self, x, hw):
        cfg = self.cfg
        d = cfg.hidden_sizes[self.stage]
        hidden = int(d * cfg.mlp_ratios[self.stage])
        b, n, _ = x.shape
        h, w = hw
        x = nn.Dense(hidden, dtype=cfg.dtype, name="fc1")(x)
        g = x.reshape(b, h, w, hidden)
        g = nn.Conv(
            hidden, (3, 3), padding=[(1, 1), (1, 1)],
            feature_group_count=hidden, dtype=cfg.dtype, name="dwconv",
        )(g)
        x = g.reshape(b, n, hidden)
        x = nn.gelu(x, approximate=False)
        return nn.Dense(d, dtype=cfg.dtype, name="fc2")(x)


class _Block(nn.Module):
    cfg: SegformerConfig
    stage: int

    @nn.compact
    def __call__(self, x, hw):
        x = x + _EfficientAttention(self.cfg, self.stage, name="attn")(
            _ln(self.cfg, "norm1")(x), hw
        )
        x = x + _MixFFN(self.cfg, self.stage, name="mlp")(
            _ln(self.cfg, "norm2")(x), hw
        )
        return x


class _FrozenBatchNorm(nn.Module):
    """Inference-mode BatchNorm: running stats live in the params tree
    (converted from the torch checkpoint; identity stats at random init)."""

    features: int
    eps: float

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("mean", nn.initializers.zeros, (self.features,))
        var = self.param("var", nn.initializers.ones, (self.features,))
        inv = scale * jax.lax.rsqrt(var + self.eps)
        return x * inv + (bias - mean * inv)


class SegformerMatte(nn.Module):
    """(B, H, W, 3) normalized pixels → (B, H/4, W/4, num_labels) logits."""

    cfg: SegformerConfig

    @nn.compact
    def __call__(self, pixels: jax.Array) -> jax.Array:
        cfg = self.cfg
        x = pixels.astype(cfg.dtype)
        feats = []
        for s in range(4):
            p = cfg.patch_sizes[s]
            pad = p // 2
            x = nn.Conv(
                cfg.hidden_sizes[s], (p, p),
                strides=(cfg.strides[s], cfg.strides[s]),
                padding=[(pad, pad), (pad, pad)],
                dtype=cfg.dtype, name=f"embed{s}",
            )(x)
            b, h, w, d = x.shape
            t = _ln(cfg, f"embed_norm{s}")(x.reshape(b, h * w, d))
            for j in range(cfg.depths[s]):
                t = _Block(cfg, s, name=f"stage{s}_block{j}")(t, (h, w))
            t = _ln(cfg, f"stage_norm{s}")(t)
            x = t.reshape(b, h, w, d)
            feats.append(x)

        # All-MLP decode head at stage-1 resolution (H/4, W/4).
        out_hw = feats[0].shape[1:3]
        proj = []
        for s, f in enumerate(feats):
            p = nn.Dense(
                cfg.decoder_hidden_size, dtype=cfg.dtype, name=f"linear_c{s}"
            )(f)
            if p.shape[1:3] != out_hw:
                p = resize_batched(p, out_hw, "linear").astype(cfg.dtype)
            proj.append(p)
        # torch concatenates reversed (deepest stage first).
        fused = jnp.concatenate(proj[::-1], axis=-1)
        fused = nn.Conv(
            cfg.decoder_hidden_size, (1, 1), use_bias=False,
            dtype=cfg.dtype, name="linear_fuse",
        )(fused)
        fused = _FrozenBatchNorm(
            cfg.decoder_hidden_size, cfg.batch_norm_eps, name="bn"
        )(fused.astype(jnp.float32)).astype(cfg.dtype)
        fused = nn.relu(fused)
        logits = nn.Conv(
            cfg.num_labels, (1, 1), dtype=cfg.dtype, name="classifier"
        )(fused)
        return logits.astype(jnp.float32)
