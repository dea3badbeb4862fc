"""Numerical parity of the Flax ZoeDepth vs the HF torch implementation.

Random-initialized weights converted with models.convert.convert_zoedepth
and both forwards compared — validates the BEiT backbone, DPT neck,
relative head and the adaptive metric-bins head at once, the same check
the released ``Intel/zoedepth-nyu-kitti`` checkpoint would get.
"""

import numpy as np
import pytest

import jax.numpy as jnp


def _build_pair(hidden=32, layers=4, heads=2, image_size=64, seed=0):
    import torch
    from transformers import ZoeDepthConfig as HFZoeConfig
    from transformers import ZoeDepthForDepthEstimation
    from transformers.models.beit import BeitConfig as HFBeitConfig

    from image_to_pointcloud_tpu.models import (
        BeitConfig,
        ZoeDepth,
        ZoeDepthConfig,
        convert_zoedepth,
    )

    torch.manual_seed(seed)
    bb = HFBeitConfig(
        hidden_size=hidden,
        num_hidden_layers=layers,
        num_attention_heads=heads,
        intermediate_size=hidden * 2,
        image_size=image_size,
        patch_size=16,
        use_relative_position_bias=True,
        reshape_hidden_states=False,
        out_indices=list(range(1, layers + 1)),
        out_features=[f"stage{i}" for i in range(1, layers + 1)],
    )
    hf_cfg = HFZoeConfig(
        backbone_config=bb,
        neck_hidden_sizes=[8, 16, 24, 32],
        fusion_hidden_size=16,
        bottleneck_features=16,
        num_relative_features=8,
        bin_embedding_dim=8,
        bin_configurations=[{"n_bins": 16, "min_depth": 1e-3, "max_depth": 10.0}],
        num_attractors=[4, 3, 2, 1],
    )
    hf = ZoeDepthForDepthEstimation(hf_cfg).eval()
    # Random init leaves the rel-pos tables at zero; give them signal so
    # the bias path is actually exercised.
    sd = hf.state_dict()
    with torch.no_grad():
        for name, t in hf.named_parameters():
            if "relative_position_bias_table" in name:
                t.normal_(0, 0.5)
    sd = hf.state_dict()

    cfg = ZoeDepthConfig(
        backbone=BeitConfig(
            hidden_size=hidden,
            num_layers=layers,
            num_heads=heads,
            intermediate_size=hidden * 2,
            patch_size=16,
            window_size=image_size // 16,
            out_layers=tuple(range(1, layers + 1)),
        ),
        neck_hidden_sizes=(8, 16, 24, 32),
        fusion_hidden_size=16,
        bottleneck_features=16,
        num_relative_features=8,
        bin_embedding_dim=8,
        n_bins=16,
        num_attractors=(4, 3, 2, 1),
    )
    params = convert_zoedepth(sd, num_layers=layers)
    return hf, ZoeDepth(cfg), {"params": params}


@pytest.mark.parametrize("hw", [(64, 64), (96, 80)])
def test_zoedepth_forward_parity(rng, hw):
    """Native window (64²) and off-window (96x80: exercises the rel-pos
    table re-interpolation path)."""
    import torch

    hf, model, variables = _build_pair(image_size=64)
    h, w = hw
    x = rng.normal(0, 1, (2, h, w, 3)).astype(np.float32)

    with torch.no_grad():
        ref = hf(torch.from_numpy(x.transpose(0, 3, 1, 2))).predicted_depth.numpy()

    import jax

    # Jitted on purpose: the serving path always runs compiled, and XLA
    # fusion once NaN'd the log-binomial constants (models/zoedepth.py).
    ours = np.asarray(jax.jit(model.apply)(variables, jnp.asarray(x)))
    assert ours.shape == ref.shape
    scale = max(np.abs(ref).max(), 1e-6)
    np.testing.assert_allclose(ours / scale, ref / scale, atol=5e-5)


def test_zoedepth_depth_is_positive_and_finite(rng):
    hf, model, variables = _build_pair(image_size=64, seed=3)
    x = rng.normal(0, 1, (1, 64, 64, 3)).astype(np.float32)
    out = np.asarray(model.apply(variables, jnp.asarray(x)))
    assert np.isfinite(out).all()
    assert (out > 0).all()  # sum of softmax-weighted softplus bin centers


def test_zoedepth_through_depth_pipeline(rng):
    """Tiny ZoeDepth serves through the fused DepthPipeline graph
    (family dispatch in pipeline/graph.py + per-family preprocess)."""
    from image_to_pointcloud_tpu.pipeline.graph import (
        DepthPipeline,
        PipelineOptions,
    )

    _, model, variables = _build_pair(image_size=64)
    pipe = DepthPipeline(model.cfg, variables["params"], model_target=64)
    assert pipe.size_multiple == 32 and pipe.pixel_mean == (0.5, 0.5, 0.5)
    imgs = rng.integers(0, 255, (1, 70, 90, 3)).astype(np.uint8)
    res = pipe.run_batch(
        imgs, options=PipelineOptions(density="low", refine=False)
    )[0]
    assert len(res.points) > 50
    assert np.isfinite(res.points).all()


def test_zoedepth_through_metric_pipeline(rng):
    """ZoeDepth's metric output drives MetricPipeline (real intrinsics)."""
    from image_to_pointcloud_tpu.pipeline.advanced import (
        CameraIntrinsics,
        MetricPipeline,
    )

    _, model, variables = _build_pair(image_size=64)
    mp = MetricPipeline(model.cfg, variables["params"], model_target=64)
    img = rng.integers(0, 255, (64, 64, 3)).astype(np.uint8)
    pts, cols = mp.run(img, CameraIntrinsics.from_fov(64, 64, 60.0), step=2)
    assert len(pts) > 100
    assert (pts[:, 2] > 0).all()  # softplus bins → positive metric z


def test_zoedepth_presets_are_real():
    from image_to_pointcloud_tpu.models import ZoeDepthConfig, preset

    z = preset("zoedepth")
    assert isinstance(z, ZoeDepthConfig)
    # Released Intel/zoedepth-nyu-kitti layout: BEiT-L/16-384.
    assert z.backbone.hidden_size == 1024 and z.backbone.num_layers == 24
    assert z.n_bins == 64 and z.neck.metric_depth is True
    zs = preset("zoedepth-small")
    assert isinstance(zs, ZoeDepthConfig)
    assert zs.backbone.hidden_size == 768


def test_zoedepth_trainer_step(rng):
    """Tiny ZoeDepth fine-tunes through the sharded Trainer (DP mesh;
    BEiT params replicate or TP-shard per parallel/sharding rules)."""
    import jax

    from image_to_pointcloud_tpu.parallel.sharding import make_mesh
    from image_to_pointcloud_tpu.train.trainer import TrainConfig, Trainer

    _, model, variables = _build_pair(image_size=64)
    mesh = make_mesh(data=2, model=2)
    trainer = Trainer(
        model.cfg, jax.device_get(variables["params"]), mesh,
        TrainConfig(loss="silog", remat=True),
    )
    x = jnp.asarray(rng.normal(0, 1, (4, 64, 64, 3)).astype(np.float32))
    y = jnp.asarray(rng.random((4, 64, 64)).astype(np.float32) + 0.5)
    l1 = float(trainer.train_step(x, y))
    l2 = float(trainer.train_step(x, y))
    assert np.isfinite(l1) and np.isfinite(l2)


def test_zoedepth_cli_convert_ckpt(tmp_path):
    """ZoeDepth-family safetensors → convert-ckpt CLI → Orbax →
    ModelManager (the same ingestion loop the DA family has)."""
    import torch
    from safetensors.torch import save_file

    from image_to_pointcloud_tpu.cli import main as cli_main
    from image_to_pointcloud_tpu.models import ZoeDepthConfig, preset
    from image_to_pointcloud_tpu.serve.models import ModelManager

    # Shrink the preset so the CLI shape check validates a real (if
    # tiny) ZoeDepth rather than instantiating BEiT-base in the test.
    hf, model, variables = _build_pair(image_size=64)
    src = tmp_path / "hf"
    src.mkdir()
    save_file(
        {k: v.contiguous() for k, v in hf.state_dict().items()},
        str(src / "model.safetensors"),
    )

    from image_to_pointcloud_tpu.models.depth_anything import PRESETS

    PRESETS["zoedepth-tiny-test"] = model.cfg
    try:
        out_root = tmp_path / "converted"
        rc = cli_main(
            [
                "convert-ckpt", str(src),
                "--model", "zoedepth-tiny-test",
                "-o", str(out_root),
            ]
        )
        assert rc == 0
        mm = ModelManager(
            checkpoint_dir=str(out_root), use_bf16=False,
            use_flash_attention=False,
        )
        params = mm._load_params("zoedepth-tiny-test", model.cfg)
        assert mm.random_weights["zoedepth-tiny-test"] is False
        x = np.zeros((1, 64, 64, 3), np.float32)
        a = np.asarray(model.apply({"params": params}, x))
        b = np.asarray(model.apply(variables, x))
        np.testing.assert_allclose(a, b, atol=1e-6)
    finally:
        PRESETS.pop("zoedepth-tiny-test", None)


def test_zoedepth_full_hf_processor_chain_parity(rng):
    """Padded preprocessing parity: our MetricPipeline graph (reflect pad
    → bilinear-align-corners resize → model → bicubic unpad) must match
    HF's ZoeDepthImageProcessor + model + post_process_depth_estimation
    end to end — the serving semantics real Intel/zoedepth weights get."""
    import torch
    from transformers import ZoeDepthImageProcessor

    from image_to_pointcloud_tpu.pipeline.advanced import (
        CameraIntrinsics,
        MetricPipeline,
    )

    hf, model, variables = _build_pair(image_size=64)
    h, w = 64, 64
    img = rng.integers(0, 255, (h, w, 3)).astype(np.uint8)

    proc = ZoeDepthImageProcessor(
        size={"height": 64, "width": 64},
        keep_aspect_ratio=True,
        ensure_multiple_of=32,
        do_pad=True,
    )
    inputs = proc(images=img, return_tensors="pt")
    with torch.no_grad():
        out = hf(**inputs)
    ref = proc.post_process_depth_estimation(out, source_sizes=[(h, w)])
    ref_depth = ref[0]["predicted_depth"].numpy()  # (h, w)

    mp = MetricPipeline(model.cfg, variables["params"], model_target=64)
    fn = mp._fn(1, h, w, 1)  # batched graph: B=1 row
    packed = np.asarray(
        fn(
            mp.params,
            jnp.asarray(img)[None],
            jnp.asarray([50.0], jnp.float32), jnp.asarray([50.0], jnp.float32),
            jnp.asarray([w / 2], jnp.float32), jnp.asarray([h / 2], jnp.float32),
        )
    )[0]
    ours_depth = packed[2].reshape(h, w)  # z == metric depth at step=1
    scale = max(np.abs(ref_depth).max(), 1e-6)
    np.testing.assert_allclose(
        ours_depth / scale, ref_depth / scale, atol=5e-5
    )


def test_zoedepth_int8_quantized_close_to_f32(rng):
    """W8A8 BEiT encoder (metric head stays float): depth within ~1%
    of the f32 forward — the same check DA's TestQuantized applies."""
    from image_to_pointcloud_tpu.models import ZoeDepth
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
        ZoeDepth(qcfg).apply({"params": qparams}, jnp.asarray(x))
    )
    rel = np.abs(out - ref) / max(np.abs(ref).max(), 1e-6)
    assert rel.max() < 0.05, rel.max()
