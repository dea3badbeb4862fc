"""End-to-end weight-ingestion rehearsal (PARITY.md deviation 7 closure).

This box has no network egress, so serving defaults to deterministic
random init — but real released weights must be a pure drop-in. These
tests rehearse the full ingestion path with *synthetic* HF-layout
checkpoints whose tensor names and shapes exactly match
``depth-anything/Depth-Anything-V2-Small-hf`` (the model the reference
pulls from the hub at backend/app.py:80-81):

  safetensors dir → IPC_TPU_CHECKPOINT_DIR → ModelManager load+convert
  safetensors → ``convert-ckpt`` CLI → Orbax → ModelManager load
  safetensors dir → live v1 HTTP service → served bytes match a service
  built from the directly-converted params
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, "tests")

from image_to_pointcloud_tpu.models import convert_depth_anything, preset
from image_to_pointcloud_tpu.serve.models import CHECKPOINT_ENV, ModelManager


def _save_safetensors(state_dict, path):
    from safetensors.torch import save_file

    path.parent.mkdir(parents=True, exist_ok=True)
    save_file({k: v.contiguous() for k, v in state_dict.items()}, str(path))


@pytest.fixture(scope="module")
def real_small_ckpt(tmp_path_factory):
    """Torch DA-V2-Small with the released checkpoint's exact layout,
    random weights, saved as ``<root>/depth-anything-v2/model.safetensors``
    — byte-layout identical to dropping in the hub file."""
    import torch
    from transformers import DepthAnythingConfig as HFDAConfig
    from transformers import DepthAnythingForDepthEstimation
    from transformers.models.dinov2 import Dinov2Config

    torch.manual_seed(0)
    bb = Dinov2Config(
        hidden_size=384,
        num_hidden_layers=12,
        num_attention_heads=6,
        intermediate_size=1536,
        patch_size=14,
        image_size=518,
        out_indices=[3, 6, 9, 12],
        out_features=["stage3", "stage6", "stage9", "stage12"],
        reshape_hidden_states=False,
    )
    hf_cfg = HFDAConfig(
        backbone_config=bb,
        reassemble_hidden_size=384,
        fusion_hidden_size=64,
        neck_hidden_sizes=[48, 96, 192, 384],
        head_hidden_size=32,
        patch_size=14,
    )
    hf = DepthAnythingForDepthEstimation(hf_cfg).eval()

    root = tmp_path_factory.mktemp("hf_ckpt")
    _save_safetensors(
        hf.state_dict(), root / "depth-anything-v2" / "model.safetensors"
    )
    return hf, root


def _trees_equal(a, b):
    import jax

    fa = dict(jax.tree_util.tree_flatten_with_path(a)[0])
    fb = dict(jax.tree_util.tree_flatten_with_path(b)[0])
    assert set(fa) == set(fb)
    for k in fa:
        np.testing.assert_array_equal(np.asarray(fa[k]), np.asarray(fb[k]))


def test_env_var_safetensors_ingest_and_forward_parity(
    real_small_ckpt, monkeypatch
):
    """IPC_TPU_CHECKPOINT_DIR → ModelManager: the converted tree is
    bitwise what models.convert produces, and the Flax forward with those
    params matches the torch forward (the check real hub weights get)."""
    import torch

    import jax.numpy as jnp
    from image_to_pointcloud_tpu.models import DepthAnything

    hf, root = real_small_ckpt
    monkeypatch.setenv(CHECKPOINT_ENV, str(root))
    mm = ModelManager(use_bf16=False, use_flash_attention=False)
    assert mm.checkpoint_dir == str(root)

    cfg = preset("depth-anything-v2")
    params = mm._load_params("depth-anything-v2", cfg)
    assert mm.random_weights["depth-anything-v2"] is False
    _trees_equal(params, convert_depth_anything(hf.state_dict(), num_layers=12))

    # Forward parity on the real DA-V2-Small architecture (small input to
    # keep the 1-core CPU trace fast; pos-embed interpolation covers it).
    rng = np.random.default_rng(3)
    x = rng.normal(0, 1, (1, 70, 70, 3)).astype(np.float32)
    with torch.no_grad():
        ref = hf(torch.from_numpy(x.transpose(0, 3, 1, 2))).predicted_depth.numpy()
    ours = np.asarray(DepthAnything(cfg).apply({"params": params}, jnp.asarray(x)))
    scale = max(np.abs(ref).max(), 1e-6)
    np.testing.assert_allclose(ours / scale, ref / scale, atol=5e-5)


def test_cli_convert_ckpt_to_orbax(real_small_ckpt, tmp_path):
    """convert-ckpt CLI: safetensors → <root>/<model>/orbax, which
    ModelManager prefers over on-load conversion, loading bitwise-equal
    params."""
    from image_to_pointcloud_tpu.cli import main as cli_main

    hf, root = real_small_ckpt
    out_root = tmp_path / "converted"
    rc = cli_main(
        [
            "convert-ckpt",
            str(root / "depth-anything-v2"),
            "--model",
            "depth-anything-v2",
            "-o",
            str(out_root),
        ]
    )
    assert rc == 0
    assert (out_root / "depth-anything-v2" / "orbax").exists()

    mm = ModelManager(
        checkpoint_dir=str(out_root), use_bf16=False, use_flash_attention=False
    )
    params = mm._load_params("depth-anything-v2", preset("depth-anything-v2"))
    assert mm.random_weights["depth-anything-v2"] is False
    _trees_equal(params, convert_depth_anything(hf.state_dict(), num_layers=12))


def test_cli_convert_ckpt_rejects_wrong_family(real_small_ckpt, tmp_path):
    """A small checkpoint converted as -base must fail the shape check at
    convert time, not at the first HTTP request."""
    from image_to_pointcloud_tpu.cli import main as cli_main

    _, root = real_small_ckpt
    with pytest.raises(SystemExit, match="mismatch"):
        cli_main(
            [
                "convert-ckpt",
                str(root / "depth-anything-v2"),
                "--model",
                "depth-anything-v2-base",
                "-o",
                str(tmp_path / "x"),
            ]
        )


def test_served_depth_matches_injected_params_service(tmp_path, monkeypatch):
    """Live v1 service booted from IPC_TPU_CHECKPOINT_DIR serves the exact
    bytes (depthMap PNG + preview) of a service built from the directly
    converted params — the ingestion path adds nothing and loses nothing.

    Uses a tiny HF-layout model so the 1-core CPU compile stays fast; the
    real-small layout is covered above at the tree/forward level."""
    import httpx

    from test_model_parity import _build_pair
    from test_serve import _ServerThread, _poll, _test_image_png

    from image_to_pointcloud_tpu.models.depth_anything import PRESETS
    from image_to_pointcloud_tpu.pipeline.graph import DepthPipeline
    from image_to_pointcloud_tpu.serve.app_v1 import create_v1_app

    hf, model, variables = _build_pair(hidden=32, layers=4, heads=2, image_size=56)
    root = tmp_path / "ckpts"
    _save_safetensors(
        hf.state_dict(), root / "depth-anything-v2" / "model.safetensors"
    )
    monkeypatch.setitem(PRESETS, "depth-anything-v2", model.cfg)
    monkeypatch.setenv(CHECKPOINT_ENV, str(root))

    def make_ingested():
        mm = ModelManager(
            use_bf16=False, use_flash_attention=False, model_target=56
        )
        return (
            create_v1_app(output_dir=str(tmp_path / "out_a"), models=mm),
            "*",
        )

    def make_injected():
        mm = ModelManager(use_bf16=False, use_flash_attention=False)
        mm._cache["depth-anything-v2"] = DepthPipeline(
            model.cfg, variables["params"], model_target=56
        )
        return (
            create_v1_app(output_dir=str(tmp_path / "out_b"), models=mm),
            "*",
        )

    png = _test_image_png()

    def run(make):
        srv = _ServerThread(make)
        base = f"http://127.0.0.1:{srv.port}"
        try:
            files = {"file": ("t.png", png, "image/png")}
            r = httpx.post(
                f"{base}/process",
                params={"output_format": "ply", "point_density": "low"},
                files=files,
                timeout=60,
            )
            assert r.status_code == 200
            final = _poll(base, r.json()["job_id"])
            assert final["status"] == "completed", final["message"]
            app = srv.app
            assert app.models.random_weights.get("depth-anything-v2") in (
                False,
                None,
            )
            return final["results"]
        finally:
            srv.stop()

    res_a = run(make_ingested)
    res_b = run(make_injected)
    assert res_a["depthMap"] == res_b["depthMap"]
    assert res_a["preview"]["points"] == res_b["preview"]["points"]
    assert res_a["preview"]["colors"] == res_b["preview"]["colors"]
    assert (
        res_a["pointCloud"]["points"] == res_b["pointCloud"]["points"]
    )
