"""Numerical parity of the Flax Depth-Anything vs the HF torch implementation.

Random-initialized weights (no network access) are converted with
models.convert and both forwards compared — this validates architecture
and converter at once, the same check real hub checkpoints would get.
"""

import numpy as np
import pytest

import jax.numpy as jnp


def _build_pair(hidden=32, layers=4, heads=2, image_size=56, out_idx=(1, 2, 3, 4)):
    import torch
    from transformers import DepthAnythingConfig as HFDAConfig
    from transformers import DepthAnythingForDepthEstimation
    from transformers.models.dinov2 import Dinov2Config

    from image_to_pointcloud_tpu.models import (
        DepthAnything,
        DepthAnythingConfig,
        convert_depth_anything,
    )
    from image_to_pointcloud_tpu.models.dinov2 import DinoV2Config
    from image_to_pointcloud_tpu.models.dpt import DPTConfig

    torch.manual_seed(0)
    bb = Dinov2Config(
        hidden_size=hidden,
        num_hidden_layers=layers,
        num_attention_heads=heads,
        intermediate_size=hidden * 4,
        patch_size=14,
        image_size=image_size,
        out_indices=list(out_idx),
        out_features=[f"stage{i}" for i in out_idx],
        reshape_hidden_states=False,  # DepthAnything neck strips CLS itself
    )
    neck_sizes = [hidden // 4, hidden // 2, hidden, hidden]
    hf_cfg = HFDAConfig(
        backbone_config=bb,
        reassemble_hidden_size=hidden,
        fusion_hidden_size=16,
        neck_hidden_sizes=neck_sizes,
        head_hidden_size=8,
        patch_size=14,
    )
    hf = DepthAnythingForDepthEstimation(hf_cfg).eval()

    cfg = DepthAnythingConfig(
        backbone=DinoV2Config(
            hidden_size=hidden,
            num_layers=layers,
            num_heads=heads,
            pos_embed_size=image_size // 14,
            out_layers=tuple(i - 1 for i in out_idx),
        ),
        neck=DPTConfig(
            hidden_size=hidden,
            neck_hidden_sizes=tuple(neck_sizes),
            fusion_hidden_size=16,
            head_hidden_size=8,
        ),
    )
    params = convert_depth_anything(hf.state_dict(), num_layers=layers)
    return hf, DepthAnything(cfg), {"params": params}


@pytest.mark.parametrize("hw", [(56, 56), (42, 70)])
def test_forward_parity(rng, hw):
    import torch

    hf, model, variables = _build_pair(image_size=56)
    h, w = hw
    x = rng.normal(0, 1, (2, h, w, 3)).astype(np.float32)

    with torch.no_grad():
        ref = hf(torch.from_numpy(x.transpose(0, 3, 1, 2))).predicted_depth.numpy()

    ours = np.asarray(model.apply(variables, jnp.asarray(x)))
    assert ours.shape == ref.shape
    scale = max(np.abs(ref).max(), 1e-6)
    np.testing.assert_allclose(ours / scale, ref / scale, atol=5e-5)


def test_forward_parity_da_layer_choice(rng):
    """DA-V2's non-contiguous intermediate layers ([3,6,9,12] stages)."""
    import torch

    hf, model, variables = _build_pair(
        hidden=32, layers=6, heads=2, image_size=56, out_idx=(2, 3, 5, 6)
    )
    x = rng.normal(0, 1, (1, 56, 56, 3)).astype(np.float32)
    with torch.no_grad():
        ref = hf(torch.from_numpy(x.transpose(0, 3, 1, 2))).predicted_depth.numpy()
    ours = np.asarray(model.apply(variables, jnp.asarray(x)))
    scale = max(np.abs(ref).max(), 1e-6)
    np.testing.assert_allclose(ours / scale, ref / scale, atol=5e-5)


def test_flash_attention_matches_xla(rng):
    from image_to_pointcloud_tpu.models.attention import (
        _attention_xla,
        flash_attention,
    )

    q = jnp.asarray(rng.normal(0, 1, (2, 3, 200, 32)).astype(np.float32))
    k = jnp.asarray(rng.normal(0, 1, (2, 3, 200, 32)).astype(np.float32))
    v = jnp.asarray(rng.normal(0, 1, (2, 3, 200, 32)).astype(np.float32))
    ref = np.asarray(_attention_xla(q, k, v, 1.0 / np.sqrt(32)))
    ours = np.asarray(
        flash_attention(q, k, v, block_q=128, block_k=128, interpret=True)
    )
    np.testing.assert_allclose(ours, ref, atol=2e-5)
    # block_q not dividing the block_k-padded length (regression: the
    # query grid used floor division and dropped the tail tiles, leaving
    # uninitialized rows in the output).
    mixed = np.asarray(
        flash_attention(q, k, v, block_q=96, block_k=128, interpret=True)
    )
    np.testing.assert_allclose(mixed, ref, atol=2e-5)


class TestQuantized:
    """Int8 W8A8 encoder quantization (models/quantize.py)."""

    def test_quant_dense_error_bound(self, rng):
        from image_to_pointcloud_tpu.models.quantize import (
            QuantDense,
            quantize_dense_params,
        )

        w = rng.normal(0, 0.05, (64, 48)).astype(np.float32)
        b = rng.normal(0, 0.01, (48,)).astype(np.float32)
        x = rng.normal(0, 1.0, (10, 64)).astype(np.float32)
        ref = x @ w + b
        qp = quantize_dense_params({"kernel": w, "bias": b})
        out = QuantDense(48).apply({"params": qp}, jnp.asarray(x))
        rel = np.abs(np.asarray(out) - ref) / (np.abs(ref).mean() + 1e-8)
        assert rel.mean() < 0.02, rel.mean()

    def test_backbone_quantized_close_to_f32(self, rng):
        """Full tiny model: int8 depth within ~2% relative of f32."""
        import dataclasses

        from image_to_pointcloud_tpu.models import DepthAnything
        from image_to_pointcloud_tpu.models.quantize import (
            quantize_encoder_params,
        )

        _, model, variables = _build_pair(
            hidden=32, layers=4, heads=2, image_size=56
        )
        params = variables["params"]
        x = rng.normal(0, 1, (1, 56, 56, 3)).astype(np.float32)
        ref = np.asarray(model.apply({"params": params}, x))

        qcfg = dataclasses.replace(
            model.cfg,
            backbone=dataclasses.replace(model.cfg.backbone, quantized=True),
        )
        qmodel = DepthAnything(qcfg)
        qparams = quantize_encoder_params(
            params, model.cfg.backbone.num_layers
        )
        out = np.asarray(qmodel.apply({"params": qparams}, x))
        assert out.shape == ref.shape
        denom = np.abs(ref).mean() + 1e-8
        rel = np.abs(out - ref).mean() / denom
        assert rel < 0.05, rel

    def test_quantized_params_shard_like_float(self):
        from image_to_pointcloud_tpu.parallel.sharding import (
            param_sharding_rules,
        )

        assert param_sharding_rules("backbone/block0/q/kernel_q") == \
            param_sharding_rules("backbone/block0/q/kernel")
        assert param_sharding_rules("backbone/block2/mlp/fc2/kernel_q") == \
            param_sharding_rules("backbone/block2/mlp/fc2/kernel")
        # Scales shard like biases of the same layer.
        assert param_sharding_rules("backbone/block0/v/kernel_scale") == \
            param_sharding_rules("backbone/block0/v/bias")


def test_flash_attention_head_pack_identical(rng):
    """head_pack processes multiple (batch·head) slices per program for
    MXU/VPU overlap; outputs must be bit-identical to the unpacked
    kernel at every pack (same dots, same order, just ILP)."""
    from image_to_pointcloud_tpu.models.attention import flash_attention

    q = jnp.asarray(rng.normal(0, 1, (2, 4, 200, 32)).astype(np.float32))
    k = jnp.asarray(rng.normal(0, 1, (2, 4, 200, 32)).astype(np.float32))
    v = jnp.asarray(rng.normal(0, 1, (2, 4, 200, 32)).astype(np.float32))
    base = np.asarray(
        flash_attention(q, k, v, block_q=128, block_k=128, interpret=True)
    )
    for pack in (2, 4, 8):
        packed = np.asarray(
            flash_attention(
                q, k, v, block_q=128, block_k=128, interpret=True,
                head_pack=pack,
            )
        )
        np.testing.assert_array_equal(packed, base)
    # Non-divisible pack falls back to 1 (b·h = 8, pack 3).
    fb = np.asarray(
        flash_attention(
            q, k, v, block_q=128, block_k=128, interpret=True, head_pack=3
        )
    )
    np.testing.assert_array_equal(fb, base)
