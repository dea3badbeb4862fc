"""BEiT vision transformer backbone (Flax) — ZoeDepth's encoder.

Mirrors the semantics of HF ``transformers.models.beit.modeling_beit``
(the torch implementation the released ``Intel/zoedepth-nyu-kitti``
checkpoint targets): pre-norm blocks with layer scale (lambda_1/2),
Q/V-biased K-unbiased attention, and per-layer decomposed relative
position bias added to the attention logits (no absolute position
embeddings). The reference serves depth models through HF torch
(backend/app.py:80-113); this is the TPU-native equivalent for the
ZoeDepth family.

Layout notes (same conventions as models/dinov2.py):
  * NHWC pixels, patchify as one flattened matmul (p*p*3, D) on the MXU.
  * Relative-position index tables are built host-side at trace time
    (static shapes) and gathered on device.
  * Arbitrary input resolutions follow HF's MiDaS-3.1-style bilinear
    re-interpolation of the bias table, including its width/height
    reshape quirk, for checkpoint compatibility.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

__all__ = ["BeitConfig", "BeitBackbone"]


@dataclasses.dataclass(frozen=True)
class BeitConfig:
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    intermediate_size: int = 4096
    patch_size: int = 16
    # Native patch-grid side the relative-position tables were trained at
    # (image_size // patch_size; 24 for the released BEiT-L/16-384).
    window_size: int = 24
    layer_norm_eps: float = 1e-12
    layer_scale: bool = True  # lambda_1 / lambda_2 (init 0.1 in torch)
    # 1-indexed stage outputs (ZoeDepth-large taps stages 6/12/18/24).
    out_layers: Sequence[int] = (6, 12, 18, 24)
    quantized: bool = False  # int8 W8A8 block matmuls (models/quantize.py)
    dtype: jnp.dtype = jnp.float32


@functools.lru_cache(maxsize=16)
def relative_position_index(wh: int, ww: int) -> np.ndarray:
    """(wh*ww+1, wh*ww+1) int32 index into a (2wh-1)(2ww-1)+3 table.

    Same construction as HF BeitRelativePositionBias.generate_relative_
    position_index: entry [i, j] is the bucket of the relative offset
    between patches i and j; the last 3 buckets are cls→token, token→cls
    and cls→cls.
    """
    num_rel = (2 * wh - 1) * (2 * ww - 1) + 3
    coords = np.stack(
        np.meshgrid(np.arange(wh), np.arange(ww), indexing="ij")
    ).reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]  # (2, N, N)
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[:, :, 0] += wh - 1
    rel[:, :, 1] += ww - 1
    rel[:, :, 0] *= 2 * ww - 1
    idx = np.zeros((wh * ww + 1, wh * ww + 1), np.int64)
    idx[1:, 1:] = rel.sum(-1)
    idx[0, :] = num_rel - 3
    idx[:, 0] = num_rel - 2
    idx[0, 0] = num_rel - 1
    return idx.astype(np.int32)


def _interp_bias_table(
    table: jax.Array, old_w: tuple[int, int], new_w: tuple[int, int]
) -> jax.Array:
    """HF's arbitrary-window-size table re-interpolation.

    Bilinearly resamples the (2wh-1)(2ww-1) spatial part of the table to
    the new window's grid, keeping the 3 cls buckets; reproduces HF's
    ``reshape(1, old_width, old_height, -1)`` axis order exactly (the
    table layout quirk the released checkpoints bake in).
    """
    from image_to_pointcloud_tpu.ops.resize import resize_batched

    oh, ow = 2 * old_w[0] - 1, 2 * old_w[1] - 1
    nh, nw = 2 * new_w[0] - 1, 2 * new_w[1] - 1
    heads = table.shape[-1]
    # HF reshapes the flat table as (width, height) — transposed relative
    # to the index layout — and resizes that to (new_height, new_width).
    spatial = table[: oh * ow].reshape(1, ow, oh, heads)
    spatial = resize_batched(spatial.astype(jnp.float32), (nh, nw), "linear")
    spatial = spatial.reshape(nh * nw, heads)
    return jnp.concatenate([spatial, table[oh * ow :]], axis=0)


def _dense(cfg: "BeitConfig", features: int, name: str, use_bias: bool = True):
    """Block matmul dispatch — models/quantize.block_dense."""
    from image_to_pointcloud_tpu.models.quantize import block_dense

    return block_dense(
        cfg.quantized, features, dtype=cfg.dtype, name=name, use_bias=use_bias
    )


class _BeitAttention(nn.Module):
    cfg: BeitConfig

    @nn.compact
    def __call__(self, x: jax.Array, grid: tuple[int, int]) -> jax.Array:
        cfg = self.cfg
        b, n, d = x.shape
        h = cfg.num_heads
        dh = d // h

        q = _dense(cfg, d, "q")(x)
        # BEiT's key projection has no bias (modeling_beit.py:253).
        k = _dense(cfg, d, "k", use_bias=False)(x)
        v = _dense(cfg, d, "v")(x)
        q = q.reshape(b, n, h, dh).transpose(0, 2, 1, 3)
        k = k.reshape(b, n, h, dh).transpose(0, 2, 1, 3)
        v = v.reshape(b, n, h, dh).transpose(0, 2, 1, 3)

        native = (cfg.window_size, cfg.window_size)
        num_rel = (2 * native[0] - 1) * (2 * native[1] - 1) + 3
        table = self.param(
            "rel_pos_table",
            nn.initializers.zeros,
            (num_rel, h),
        )
        if tuple(grid) != native:
            table = _interp_bias_table(table, native, tuple(grid))
        idx = jnp.asarray(relative_position_index(*grid))
        bias = jnp.take(table, idx.reshape(-1), axis=0).reshape(n, n, h)
        bias = bias.transpose(2, 0, 1)[None].astype(jnp.float32)

        scores = (
            jnp.einsum(
                "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
            )
            / math.sqrt(dh)
            + bias
        )
        probs = jax.nn.softmax(scores, axis=-1).astype(cfg.dtype)
        out = jnp.einsum(
            "bhqk,bhkd->bhqd", probs, v, preferred_element_type=jnp.float32
        ).astype(cfg.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, d)
        return _dense(cfg, d, "proj")(out)


class BeitBlock(nn.Module):
    cfg: BeitConfig

    @nn.compact
    def __call__(self, x: jax.Array, grid: tuple[int, int]) -> jax.Array:
        cfg = self.cfg
        d = cfg.hidden_size
        h = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=cfg.dtype, name="norm1"
        )(x)
        h = _BeitAttention(cfg, name="attn")(h, grid)
        if cfg.layer_scale:
            h = h * self.param("ls1", nn.initializers.ones, (d,)).astype(
                cfg.dtype
            )
        x = x + h
        h = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=cfg.dtype, name="norm2"
        )(x)
        h = _dense(cfg, cfg.intermediate_size, "fc1")(h)
        h = nn.gelu(h, approximate=False)
        h = _dense(cfg, d, "fc2")(h)
        if cfg.layer_scale:
            h = h * self.param("ls2", nn.initializers.ones, (d,)).astype(
                cfg.dtype
            )
        return x + h


class BeitBackbone(nn.Module):
    """(B, H, W, 3) pixels → list of (B, N+1, D) token maps (with CLS).

    setup-style like DinoV2Backbone so the encoder can be split: ``embed``
    produces tokens, ``blocks`` run sequentially here or streamed through
    the GPipe schedule (parallel/pipeline_par.pipelined_zoedepth_apply —
    BEiT-L's taps at 6/12/18/24 are exactly the 4 stage boundaries)."""

    cfg: BeitConfig

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
            "cls_token", nn.initializers.zeros, (1, 1, cfg.hidden_size)
        )
        self.blocks = [
            BeitBlock(cfg, name=f"block{i}") for i in range(cfg.num_layers)
        ]

    def embed(self, pixels: jax.Array) -> jax.Array:
        """(B, H, W, 3) → (B, 1+gh·gw, D) tokens (patchify matmul + CLS;
        BEiT has no absolute position embeddings)."""
        cfg = self.cfg
        p = cfg.patch_size
        b, hh, ww, _ = pixels.shape
        gh, gw = hh // p, ww // p
        x = pixels.reshape(b, gh, p, gw, p, 3).transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(b, gh * gw, p * p * 3).astype(cfg.dtype)
        x = (
            jnp.einsum(
                "bnk,kd->bnd", x, self.patch_embed.astype(cfg.dtype),
                preferred_element_type=jnp.float32,
            )
            + self.patch_bias
        ).astype(cfg.dtype)
        cls = jnp.broadcast_to(
            self.cls_token, (b, 1, cfg.hidden_size)
        ).astype(cfg.dtype)
        return jnp.concatenate([cls, x], axis=1)

    def __call__(self, pixels: jax.Array) -> list[jax.Array]:
        cfg = self.cfg
        p = cfg.patch_size
        grid = (pixels.shape[1] // p, pixels.shape[2] // p)
        x = self.embed(pixels)
        taps = []
        want = {i - 1 for i in cfg.out_layers}  # 1-indexed stages → blocks
        for i in range(cfg.num_layers):
            x = self.blocks[i](x, grid)
            if i in want:
                taps.append(x.astype(jnp.float32))
        return taps
