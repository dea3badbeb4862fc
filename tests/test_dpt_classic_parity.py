"""Numerical parity of Flax classic DPT (= MiDaS 3.0) vs HF torch DPT.

Random-initialized weights (no network access) are converted with
models.convert.convert_dpt_classic and both forwards compared — the
same check a real ``Intel/dpt-large`` checkpoint would get. Mirrors
tests/test_model_parity.py's methodology for the DA family.
"""

import numpy as np

import jax.numpy as jnp


def _build_pair(hidden=32, layers=4, heads=2, image_size=64, out_idx=(0, 1, 2, 3)):
    import torch
    from transformers import DPTConfig as HFDPTConfig
    from transformers import DPTForDepthEstimation

    from image_to_pointcloud_tpu.models import (
        DPTClassic,
        DPTClassicConfig,
        ViTConfig,
        convert_dpt_classic,
    )

    torch.manual_seed(0)
    neck_sizes = [hidden // 2, hidden, hidden * 2, hidden * 2]
    hf_cfg = HFDPTConfig(
        hidden_size=hidden,
        num_hidden_layers=layers,
        num_attention_heads=heads,
        intermediate_size=hidden * 4,
        image_size=image_size,
        patch_size=16,
        is_hybrid=False,
        readout_type="project",
        backbone_out_indices=list(out_idx),
        neck_hidden_sizes=neck_sizes,
        fusion_hidden_size=16,
    )
    hf = DPTForDepthEstimation(hf_cfg).eval()
    # HF zero-inits cls_token/position_embeddings (DPTPreTrainedModel.
    # _init_weights); randomize them so the readout projection and the
    # pos-embed interpolation are actually exercised.
    with torch.no_grad():
        hf.dpt.embeddings.cls_token.normal_(0, 0.5)
        hf.dpt.embeddings.position_embeddings.normal_(0, 0.5)

    cfg = DPTClassicConfig(
        backbone=ViTConfig(
            hidden_size=hidden,
            num_layers=layers,
            num_heads=heads,
            patch_size=16,
            pos_embed_size=image_size // 16,
            out_layers=tuple(out_idx),
        ),
        neck_hidden_sizes=tuple(neck_sizes),
        fusion_hidden_size=16,
    )
    params = convert_dpt_classic(hf.state_dict(), num_layers=layers)
    return hf, DPTClassic(cfg), {"params": params}


def _compare(hf, model, variables, x):
    import torch

    with torch.no_grad():
        ref = hf(torch.from_numpy(x.transpose(0, 3, 1, 2))).predicted_depth.numpy()
    ours = np.asarray(model.apply(variables, jnp.asarray(x)))
    assert ours.shape == ref.shape
    scale = max(np.abs(ref).max(), 1e-6)
    np.testing.assert_allclose(ours / scale, ref / scale, atol=5e-5)


def test_forward_parity_native_size(rng):
    hf, model, variables = _build_pair(image_size=64)
    x = rng.normal(0, 1, (2, 64, 64, 3)).astype(np.float32)
    _compare(hf, model, variables, x)


def test_forward_parity_interpolated_pos_embed(rng):
    """96² input on a 64²-native model exercises the torch-bilinear
    (align_corners=False) position-embedding interpolation."""
    hf, model, variables = _build_pair(image_size=64)
    x = rng.normal(0, 1, (1, 96, 96, 3)).astype(np.float32)
    _compare(hf, model, variables, x)


def test_forward_parity_odd_patch_grid(rng):
    """80² → 5×5 patch grid: the fusion chain's exact-×2 upsampling (not
    resize-to-stage-size) and the residual-mismatch bilinear resize are
    only distinguishable on odd grids — output is 96², not 80²
    (modeling_dpt.DPTFeatureFusionLayer scale_factor=2 semantics)."""
    hf, model, variables = _build_pair(image_size=64)
    x = rng.normal(0, 1, (1, 80, 80, 3)).astype(np.float32)
    ref_shape_note = 96  # 5→3→6→12→24→48 fused, ×2 head
    _compare(hf, model, variables, x)
    import torch

    with torch.no_grad():
        ref = hf(torch.from_numpy(x.transpose(0, 3, 1, 2))).predicted_depth
    assert ref.shape[-1] == ref_shape_note


def test_forward_parity_nonboundary_taps(rng):
    """Tap layers that are not evenly spaced (readout per-stage params
    still line up with HF's per-index readout_projects)."""
    hf, model, variables = _build_pair(layers=6, out_idx=(1, 2, 4, 5))
    x = rng.normal(0, 1, (1, 64, 64, 3)).astype(np.float32)
    _compare(hf, model, variables, x)


def test_preset_registered():
    from image_to_pointcloud_tpu.models import (
        DPTClassicConfig,
        build_model,
        preset,
    )
    from image_to_pointcloud_tpu.models.dpt_classic import DPTClassic

    cfg = preset("dpt-large")
    assert isinstance(cfg, DPTClassicConfig)
    # Intel/dpt-large geometry: ViT-L/16 @ 384², taps (5,11,17,23).
    assert cfg.backbone.hidden_size == 1024
    assert cfg.backbone.num_layers == 24
    assert tuple(cfg.backbone.out_layers) == (5, 11, 17, 23)
    assert cfg.native_target == 384 and not cfg.keep_aspect_ratio
    assert isinstance(build_model(cfg), DPTClassic)
    assert preset("midas") is cfg  # MiDaS 3.0 == DPT-Large


def test_pipeline_fixed_square_preprocess(rng):
    """DPTClassicConfig's keep_aspect_ratio=False reaches the pipeline:
    a non-square input still maps to the fixed 384² model resolution
    (DPTImageProcessor for Intel/dpt-large)."""
    from image_to_pointcloud_tpu.models import preset
    from image_to_pointcloud_tpu.pipeline.preprocess import (
        model_preprocess_spec,
        processor_output_size,
    )

    cfg = preset("dpt-large")
    target, mult, mean, std, method, keep = model_preprocess_spec(cfg)
    assert (mean, std) == ((0.5, 0.5, 0.5), (0.5, 0.5, 0.5))
    assert keep is False
    assert processor_output_size(
        480, 640, target, multiple=mult, keep_aspect_ratio=keep
    ) == (384, 384)


def test_dpt_classic_trainer_step(rng):
    """Tiny classic DPT fine-tunes through the sharded Trainer (DP+TP
    mesh; plain-ViT blocks hit the same megatron rules as DINOv2's)."""
    import jax

    from image_to_pointcloud_tpu.parallel.sharding import make_mesh
    from image_to_pointcloud_tpu.train.trainer import TrainConfig, Trainer

    _, model, variables = _build_pair(image_size=64)
    mesh = make_mesh(data=2, model=2)
    trainer = Trainer(
        model.cfg, jax.device_get(variables["params"]), mesh,
        TrainConfig(loss="silog", remat=True),
    )
    # remat must actually engage for this family (per-block nn.remat),
    # not silently no-op like it would behind a DA-only isinstance gate.
    assert trainer.model.cfg.backbone.remat_blocks is True
    x = jnp.asarray(rng.normal(0, 1, (4, 64, 64, 3)).astype(np.float32))
    y = jnp.asarray(rng.random((4, 64, 64)).astype(np.float32) + 0.5)
    l1 = float(trainer.train_step(x, y))
    l2 = float(trainer.train_step(x, y))
    assert np.isfinite(l1) and np.isfinite(l2)


def test_dpt_classic_int8_quantized_close_to_f32(rng):
    """W8A8 ViT encoder (neck/head stay float): depth within ~5% of the
    f32 forward — QUANT_TARGETS covers the plain-ViT block names."""
    from image_to_pointcloud_tpu.models import DPTClassic
    from image_to_pointcloud_tpu.models.quantize import (
        quantize_encoder_params,
    )

    _, model, variables = _build_pair(image_size=64)
    x = rng.normal(0, 1, (1, 64, 64, 3)).astype(np.float32)
    ref = np.asarray(model.apply(variables, jnp.asarray(x)))

    qcfg = model.cfg.with_quantized(True)
    qparams = quantize_encoder_params(
        variables["params"], qcfg.backbone.num_layers
    )
    out = np.asarray(
        DPTClassic(qcfg).apply({"params": qparams}, jnp.asarray(x))
    )
    rel = np.abs(out - ref) / max(np.abs(ref).max(), 1e-6)
    assert rel.max() < 0.05, rel.max()


def test_dpt_classic_cli_convert_ckpt(tmp_path):
    """DPT-classic safetensors → convert-ckpt CLI → Orbax →
    ModelManager: the exact ingestion loop a real Intel/dpt-large
    download would take (reference analog: backend/app.py:80-81)."""
    from safetensors.torch import save_file

    from image_to_pointcloud_tpu.cli import main as cli_main
    from image_to_pointcloud_tpu.serve.models import ModelManager

    hf, model, variables = _build_pair(image_size=64)
    src = tmp_path / "hf"
    src.mkdir()
    save_file(
        {k: v.contiguous() for k, v in hf.state_dict().items()},
        str(src / "model.safetensors"),
    )

    from image_to_pointcloud_tpu.models.depth_anything import PRESETS

    PRESETS["dpt-tiny-test"] = model.cfg
    try:
        out_root = tmp_path / "converted"
        rc = cli_main(
            [
                "convert-ckpt", str(src),
                "--model", "dpt-tiny-test",
                "-o", str(out_root),
            ]
        )
        assert rc == 0
        mm = ModelManager(
            checkpoint_dir=str(out_root), use_bf16=False,
            use_flash_attention=False,
        )
        params = mm._load_params("dpt-tiny-test", model.cfg)
        assert mm.random_weights["dpt-tiny-test"] is False
        x = np.zeros((1, 64, 64, 3), np.float32)
        a = np.asarray(model.apply({"params": params}, x))
        b = np.asarray(model.apply(variables, x))
        np.testing.assert_allclose(a, b, atol=1e-6)
    finally:
        PRESETS.pop("dpt-tiny-test", None)
