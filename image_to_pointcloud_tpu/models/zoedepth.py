"""ZoeDepth metric-depth model (Flax): BEiT backbone + DPT neck +
relative-depth head + adaptive metric-bins head.

Mirrors HF ``transformers.models.zoedepth.modeling_zoedepth`` (the
implementation the released ``Intel/zoedepth-nyu-kitti`` weights load
into) so real checkpoints are a drop-in via ``convert_zoedepth``. This
fills the north-star "ZoeDepth metric" slot (BASELINE config 3) with the
actual architecture: seed-bin regressor → 4 attractor refinements over
the fusion pyramid → conditional log-binomial softmax over bin centers,
conditioned on the relative-depth features.

Faithfulness notes (bug-compatible with HF / the original repo):
  * ``inv_attractor`` uses alpha=300, gamma=2 — the config's
    ``attractor_alpha`` is stored but never passed (modeling_zoedepth
    AttractorLayerUnnormed.forward), so we hardcode the effective values.
  * The released checkpoints use ``bin_centers_type='softplus'`` →
    unnormed attractors, which is what this implements.
  * Readout type "project": CLS token concatenated and projected per
    stage (reassemble), GELU.

TPU notes: all interpolations are the MXU-matmul resizes from
ops/resize.py (align-corners semantics matched per call site); BEiT
attention's additive bias rides XLA's fused attention (577 tokens at
384² — far below the flash-kernel crossover, models/dinov2.py).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from image_to_pointcloud_tpu.models.beit import BeitBackbone, BeitConfig
# Shared MXU building blocks (param layouts identical; duck-typed on
# cfg.fusion_hidden_size/cfg.dtype) — ONE implementation, models/dpt.py.
from image_to_pointcloud_tpu.models.dpt import (
    _PreActResidual,
    _UpsampleMatmul,
)
from image_to_pointcloud_tpu.ops.resize import resize_batched

__all__ = ["ZoeDepthConfig", "ZoeDepth"]


@dataclasses.dataclass(frozen=True)
class _MetricNeckInfo:
    """Duck-typed ``cfg.neck`` view for config consumers (cli/pipelines)
    that check ``cfg.neck.metric_depth`` / ``max_depth``."""

    metric_depth: bool
    max_depth: float


@dataclasses.dataclass(frozen=True)
class ZoeDepthConfig:
    backbone: BeitConfig = dataclasses.field(default_factory=BeitConfig)
    neck_hidden_sizes: Sequence[int] = (96, 192, 384, 768)
    fusion_hidden_size: int = 256
    reassemble_factors: Sequence[float] = (4, 2, 1, 0.5)
    bottleneck_features: int = 256
    num_relative_features: int = 32
    bin_embedding_dim: int = 128
    n_bins: int = 64
    min_depth: float = 1e-3
    max_depth: float = 10.0
    num_attractors: Sequence[int] = (16, 8, 4, 1)
    min_temp: float = 0.0212
    max_temp: float = 50.0
    # ZoeDepth normalizes with mean=std=0.5 (IMAGENET_STANDARD), not the
    # DA family's ImageNet mean/std (image_processing_zoedepth.py), and
    # its processor resizes toward 384x512 in multiples of 32.
    pixel_mean: Sequence[float] = (0.5, 0.5, 0.5)
    pixel_std: Sequence[float] = (0.5, 0.5, 0.5)
    native_target: tuple[int, int] = (384, 512)
    size_multiple: int = 32
    # ZoeDepth reflect-pads the input by int(sqrt(dim/2)*3) per side
    # before resizing and crops the prediction back (boundary-artifact
    # fix; image_processing_zoedepth.py pad_image / post_process), and
    # resizes with torch bilinear align_corners=True — not the DPT
    # processor's PIL bicubic.
    pad_reflect_factor: int = 3
    resize_method: str = "linear_ac"
    dtype: jnp.dtype = jnp.float32

    # ---- config-surface compatibility with DepthAnythingConfig ----

    @property
    def neck(self) -> _MetricNeckInfo:
        return _MetricNeckInfo(metric_depth=True, max_depth=self.max_depth)

    def with_dtype(self, dtype) -> "ZoeDepthConfig":
        return dataclasses.replace(
            self, dtype=dtype,
            backbone=dataclasses.replace(self.backbone, dtype=dtype),
        )

    def with_flash_attention(self, on: bool) -> "ZoeDepthConfig":
        # BEiT's per-layer additive bias needs a bias-aware flash kernel;
        # at ZoeDepth's 577-token sequences XLA's fused attention is
        # already past the flash crossover (models/dinov2.py
        # flash_min_seq), so this is deliberately a no-op.
        return self

    def with_quantized(self, on: bool) -> "ZoeDepthConfig":
        return dataclasses.replace(
            self, backbone=dataclasses.replace(self.backbone, quantized=on)
        )


def _conv(c, k, name, *, dtype, stride=1, bias=True):
    return nn.Conv(
        c, (k, k), strides=(stride, stride),
        padding=[(k // 2, k // 2), (k // 2, k // 2)],
        use_bias=bias, dtype=dtype, name=name,
    )


class _Reassemble(nn.Module):
    """Tokens (B, N+1, D) → 4 feature maps at [4x, 2x, 1x, 0.5x] of the
    patch grid (ZoeDepthReassembleStage, readout_type='project')."""

    cfg: ZoeDepthConfig
    grid: tuple[int, int]

    @nn.compact
    def __call__(self, taps: list[jax.Array]) -> list[jax.Array]:
        cfg = self.cfg
        gh, gw = self.grid
        out = []
        for i, t in enumerate(taps):
            cls, tok = t[:, :1, :], t[:, 1:, :]
            x = jnp.concatenate(
                [tok, jnp.broadcast_to(cls, tok.shape)], axis=-1
            ).astype(cfg.dtype)
            x = nn.Dense(
                cfg.backbone.hidden_size, dtype=cfg.dtype, name=f"readout{i}"
            )(x)
            x = nn.gelu(x, approximate=False)
            b = x.shape[0]
            x = x.reshape(b, gh, gw, cfg.backbone.hidden_size)
            c = cfg.neck_hidden_sizes[i]
            x = nn.Conv(c, (1, 1), dtype=cfg.dtype, name=f"proj{i}")(x)
            f = cfg.reassemble_factors[i]
            if f == 4:
                x = _UpsampleMatmul(c, 4, cfg.dtype, name=f"up{i}")(x)
            elif f == 2:
                x = _UpsampleMatmul(c, 2, cfg.dtype, name=f"up{i}")(x)
            elif f == 0.5:
                x = _conv(c, 3, f"down{i}", dtype=cfg.dtype, stride=2)(x)
            out.append(x)
        return out


class _FusionLayer(nn.Module):
    """ZoeDepthFeatureFusionLayer: (+res1(residual)) → res2 → ×2
    upsample (align_corners=True) → 1×1 projection."""

    cfg: ZoeDepthConfig

    @nn.compact
    def __call__(self, x, residual=None):
        cfg = self.cfg
        if residual is not None:
            if residual.shape[1:3] != x.shape[1:3]:
                residual = resize_batched(residual, x.shape[1:3], "linear")
            x = x + _PreActResidual(cfg, name="res1")(residual)
        x = _PreActResidual(cfg, name="res2")(x)
        x = resize_batched(
            x, (x.shape[1] * 2, x.shape[2] * 2), "linear_ac"
        ).astype(cfg.dtype)
        return nn.Conv(
            cfg.fusion_hidden_size, (1, 1), dtype=cfg.dtype, name="projection"
        )(x)


class _Projector(nn.Module):
    """1×1 conv MLP (ZoeDepthProjector)."""

    out_features: int
    mlp_dim: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.mlp_dim, (1, 1), dtype=self.dtype, name="conv1")(x)
        x = nn.relu(x)
        return nn.Conv(
            self.out_features, (1, 1), dtype=self.dtype, name="conv2"
        )(x)


def _inv_attractor(dx, alpha=300.0, gamma=2):
    """dc = dx / (1 + alpha·dx^gamma) — HF's effective constants (the
    config values are never passed through; see module docstring)."""
    return dx / (1.0 + alpha * dx**gamma)


class _AttractorUnnormed(nn.Module):
    """ZoeDepthAttractorLayerUnnormed (bin_centers_type='softplus')."""

    cfg: ZoeDepthConfig
    n_attractors: int

    @nn.compact
    def __call__(self, x, prev_bin, prev_bin_embedding):
        cfg = self.cfg
        if prev_bin_embedding is not None:
            prev_bin_embedding = resize_batched(
                prev_bin_embedding, x.shape[1:3], "linear_ac"
            ).astype(cfg.dtype)
            x = x + prev_bin_embedding
        h = nn.Conv(
            cfg.bin_embedding_dim, (1, 1), dtype=cfg.dtype, name="conv1"
        )(x)
        h = nn.relu(h)
        h = nn.Conv(self.n_attractors, (1, 1), dtype=cfg.dtype, name="conv2")(h)
        attractors = jax.nn.softplus(h.astype(jnp.float32))  # (B,H,W,A)

        centers = resize_batched(
            prev_bin, x.shape[1:3], "linear_ac"
        )  # (B,H,W,n_bins) f32
        delta = jnp.mean(
            _inv_attractor(attractors[..., :, None] - centers[..., None, :]),
            axis=-2,
        )
        new_centers = centers + delta
        return new_centers, new_centers


class _ConditionalLogBinomial(nn.Module):
    """ZoeDepthConditionalLogBinomialSoftmax: per-pixel MLP → (p, t) →
    binomial distribution over n_bins → softmax(y/t)."""

    cfg: ZoeDepthConfig
    in_features: int
    condition_dim: int

    @nn.compact
    def __call__(self, main, condition):
        cfg = self.cfg
        x = jnp.concatenate([main, condition], axis=-1).astype(cfg.dtype)
        bottleneck = (self.in_features + self.condition_dim) // 2
        x = nn.Conv(bottleneck, (1, 1), dtype=cfg.dtype, name="mlp1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Conv(4, (1, 1), dtype=cfg.dtype, name="mlp2")(x)
        x = jax.nn.softplus(x.astype(jnp.float32))

        eps = 1e-4
        p2, t2 = x[..., :2] + eps, x[..., 2:] + eps
        prob = p2[..., 0] / (p2[..., 0] + p2[..., 1])  # (B,H,W)
        temp = t2[..., 0] / (t2[..., 0] + t2[..., 1])
        temp = (cfg.max_temp - cfg.min_temp) * temp + cfg.min_temp

        # log-binomial coefficients log C(k-1, i) via the HF Stirling
        # formula. n and i are static, so fold the table on the host —
        # this also sidesteps an XLA constant-folding NaN in the
        # 0·log(eps) term at i = k-1 (the traced version NaN'd under jit
        # while matching torch eagerly).
        import numpy as _np

        k = cfg.n_bins
        e = _np.float32(1e-7)
        n = _np.float32(k - 1) + e
        kk = _np.arange(k, dtype=_np.float32) + e
        lb = jnp.asarray(
            n * _np.log(n)
            - kk * _np.log(kk)
            - (n - kk) * _np.log(n - kk + e)
        )
        k_idx = jnp.arange(k, dtype=jnp.float32)
        k_minus_1 = jnp.float32(k - 1)

        p = jnp.clip(prob, eps, 1.0)[..., None]
        omp = jnp.clip(1.0 - prob, eps, 1.0)[..., None]
        y = lb + k_idx * jnp.log(p) + (k_minus_1 - k_idx) * jnp.log(omp)
        return jax.nn.softmax(y / temp[..., None], axis=-1)  # (B,H,W,k)


class ZoeDepth(nn.Module):
    """(B, H, W, 3) normalized pixels → (B, H, W) metric depth (meters)."""

    cfg: ZoeDepthConfig

    @nn.compact
    def __call__(self, pixels: jax.Array, taps=None) -> jax.Array:
        """``taps``: optional precomputed backbone activations (4× (B,
        N+1, D)) — the GPipe-pipelined path runs the encoder externally
        (parallel/pipeline_par.pipelined_zoedepth_apply) and feeds the
        neck/heads here."""
        cfg = self.cfg
        p = cfg.backbone.patch_size
        gh, gw = pixels.shape[1] // p, pixels.shape[2] // p

        if taps is None:
            taps = BeitBackbone(cfg.backbone, name="backbone")(pixels)
        stages = _Reassemble(cfg, (gh, gw), name="reassemble")(taps)
        feats = [
            _conv(
                cfg.fusion_hidden_size, 3, f"conv{i}",
                dtype=cfg.dtype, bias=False,
            )(s)
            for i, s in enumerate(stages)
        ]
        bottleneck = feats[-1]

        # Fusion: deepest → shallowest (ZoeDepthFeatureFusionStage).
        fused_list = []
        fused = None
        for idx, hs in enumerate(feats[::-1]):
            layer = _FusionLayer(cfg, name=f"fusion{idx}")
            fused = layer(hs) if fused is None else layer(fused, hs)
            fused_list.append(fused)

        # Relative-depth head on the shallowest fused map.
        x = _conv(
            cfg.fusion_hidden_size // 2, 3, "rel_conv1", dtype=cfg.dtype
        )(fused_list[-1])
        x = resize_batched(
            x, (x.shape[1] * 2, x.shape[2] * 2), "linear_ac"
        ).astype(cfg.dtype)
        x = _conv(
            cfg.num_relative_features, 3, "rel_conv2", dtype=cfg.dtype
        )(x)
        rel_features = nn.relu(x)
        x = nn.Conv(1, (1, 1), dtype=cfg.dtype, name="rel_conv3")(rel_features)
        relative_depth = nn.relu(x.astype(jnp.float32))[..., 0]  # (B,H',W')

        # Metric bins head.
        xb = nn.Conv(
            cfg.bottleneck_features, (1, 1), dtype=cfg.dtype, name="mh_conv2"
        )(bottleneck)
        h = nn.Conv(256, (1, 1), dtype=cfg.dtype, name="seed_conv1")(xb)
        h = nn.relu(h)
        h = nn.Conv(cfg.n_bins, (1, 1), dtype=cfg.dtype, name="seed_conv2")(h)
        prev_bin = jax.nn.softplus(h.astype(jnp.float32))  # unnormed seeds
        prev_emb = _Projector(
            cfg.bin_embedding_dim, 128, cfg.dtype, name="seed_projector"
        )(xb)

        bin_centers = prev_bin
        bin_emb = prev_emb
        for i, feat in enumerate(fused_list):
            bin_emb = _Projector(
                cfg.bin_embedding_dim, 128, cfg.dtype, name=f"projector{i}"
            )(feat)
            prev_bin, bin_centers = _AttractorUnnormed(
                cfg, cfg.num_attractors[i], name=f"attractor{i}"
            )(bin_emb, prev_bin, prev_emb)
            prev_emb = bin_emb

        last_hw = rel_features.shape[1:3]
        rel_cond = resize_batched(
            relative_depth[..., None], last_hw, "linear_ac"
        )
        last = jnp.concatenate(
            [rel_features.astype(jnp.float32), rel_cond], axis=-1
        )
        bin_emb_up = resize_batched(bin_emb, last_hw, "linear_ac")
        probs = _ConditionalLogBinomial(
            cfg,
            cfg.num_relative_features + 1,
            cfg.bin_embedding_dim,
            name="cond_log_binomial",
        )(last, bin_emb_up)

        centers = resize_batched(bin_centers, last_hw, "linear_ac")
        depth = jnp.sum(probs * centers, axis=-1)
        return depth.astype(jnp.float32)
