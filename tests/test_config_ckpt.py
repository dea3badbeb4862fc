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
