"""Config tree + checkpoint round-trip tests."""

import dataclasses
import json

import numpy as np


class TestConfig:
    def test_reference_defaults(self):
        from image_to_pointcloud_tpu.core.config import ServiceConfig

        cfg = ServiceConfig()
        assert cfg.max_image_dim == 3072
        assert cfg.max_file_size == 50 * 1024 * 1024
        assert cfg.defaults.depth_scale == 10.0
        assert cfg.defaults.output_format == "las"
        assert cfg.v2.texture_resolution_range == (512, 2048)
        assert cfg.honor_fov is False

    def test_json_and_env_override(self, tmp_path):
        from image_to_pointcloud_tpu.core.config import load_config

        p = tmp_path / "cfg.json"
        p.write_text(json.dumps({
            "port": 9000,
            "defaults": {"depth_scale": 15.0},
            "v2": {"target_count": 500},
        }))
        cfg = load_config(str(p), env={"IPC_TPU_HONOR_FOV": "true",
                                       "IPC_TPU_PORT": "9100"})
        assert cfg.port == 9100  # env wins over file
        assert cfg.defaults.depth_scale == 15.0
        assert cfg.v2.target_count == 500
        assert cfg.honor_fov is True


class TestConfigFailFast:
    """Misconfiguration must raise at load, not surface as a 500 or a
    silently-default server (review round 2)."""

    def test_str_or_none_fields_stay_strings(self):
        from image_to_pointcloud_tpu.core.config import load_config

        cfg = load_config(env={
            "IPC_TPU_WARMUP": "518x518",
            "IPC_TPU_MESH": "2",
            "IPC_TPU_CHECKPOINT_DIR": "123",
        })
        # Numeric-looking values of str|None fields must NOT become ints
        # (serve/__main__.py calls .split on warmup/mesh).
        assert cfg.warmup == "518x518"
        assert cfg.mesh == "2"
        assert cfg.checkpoint_dir == "123"

    def test_max_jobs_still_int(self):
        import pytest

        from image_to_pointcloud_tpu.core.config import load_config

        assert load_config(env={"IPC_TPU_MAX_JOBS": "50"}).max_jobs == 50
        with pytest.raises(ValueError):
            load_config(env={"IPC_TPU_MAX_JOBS": "fifty"})

    def test_unknown_top_level_key_raises(self, tmp_path):
        import pytest

        from image_to_pointcloud_tpu.core.config import load_config

        p = tmp_path / "cfg.json"
        p.write_text(json.dumps({"max_bath": 32}))  # typo of max_batch
        with pytest.raises(ValueError, match="max_bath"):
            load_config(str(p))

    def test_missing_explicit_file_raises(self, tmp_path):
        import pytest

        from image_to_pointcloud_tpu.core.config import load_config

        with pytest.raises(FileNotFoundError):
            load_config(str(tmp_path / "nope.json"))

    def test_comment_keys_allowed_and_example_loads(self):
        """docs/config.example.json (with its _comment key) must always
        load — it is the documented operator template."""
        from pathlib import Path

        from image_to_pointcloud_tpu.core.config import load_config

        example = Path(__file__).parent.parent / "docs" / "config.example.json"
        cfg = load_config(str(example))
        assert cfg.port == 8000
        assert cfg.defaults.depth_scale == 10.0

    def test_nested_string_values_coerced(self, tmp_path):
        from image_to_pointcloud_tpu.core.config import load_config

        p = tmp_path / "cfg.json"
        p.write_text(json.dumps({"defaults": {"depth_scale": "12"}}))
        cfg = load_config(str(p))
        assert cfg.defaults.depth_scale == 12.0
        assert isinstance(cfg.defaults.depth_scale, float)


class TestConfigWiring:
    def test_v1_service_honors_defaults(self, tmp_path):
        """ProcessingDefaults/knobs reach the serving layer (they were
        load-only no-ops before)."""
        from image_to_pointcloud_tpu.core.config import ProcessingDefaults
        from image_to_pointcloud_tpu.serve.app_v1 import V1Service

        d = ProcessingDefaults(depth_scale=15.0, output_format="ply")
        svc = V1Service(
            output_dir=str(tmp_path), defaults=d,
            max_file_size=1024, max_preview_points=5,
            mesh_preview_tris=7, durable_jobs=False,
        )
        assert svc.defaults.depth_scale == 15.0
        assert svc.max_file_size == 1024
        assert svc.max_preview_points == 5
        assert svc.mesh_preview_tris == 7

    def test_v2_service_honors_clamps(self, tmp_path):
        from image_to_pointcloud_tpu.core.config import V2Defaults
        from image_to_pointcloud_tpu.serve.app_v2 import V2Service

        v2 = V2Defaults(target_count=500, target_count_range=(50, 900))
        svc = V2Service(
            output_dir=str(tmp_path), v2_defaults=v2, durable_jobs=False
        )
        assert svc.v2cfg.target_count == 500
        assert svc.v2cfg.target_count_range == (50, 900)


class TestCheckpoint:
    def test_roundtrip(self, tmp_path, rng):
        import jax.numpy as jnp

        from image_to_pointcloud_tpu.train.checkpoint import (
            restore_checkpoint,
            save_checkpoint,
        )

        params = {
            "dense": {"kernel": jnp.asarray(rng.normal(0, 1, (4, 8)).astype(np.float32)),
                       "bias": jnp.zeros((8,), jnp.float32)},
        }
        path = str(tmp_path / "ckpt")
        save_checkpoint(path, params, step=7)
        out = restore_checkpoint(path)
        assert out["step"] == 7
        np.testing.assert_array_equal(
            np.asarray(out["params"]["dense"]["kernel"]),
            np.asarray(params["dense"]["kernel"]),
        )
