"""Tests for the advanced pipeline configs (metric, high-res tiled, video)."""

import sys

import numpy as np
import pytest

sys.path.insert(0, "tests")


def _metric_pair():
    import dataclasses

    from test_model_parity import _build_pair

    from image_to_pointcloud_tpu.models import DepthAnythingConfig

    _, model, variables = _build_pair(image_size=56)
    cfg = DepthAnythingConfig(
        backbone=model.cfg.backbone,
        neck=dataclasses.replace(model.cfg.neck, metric_depth=True, max_depth=5.0),
    )
    return cfg, variables["params"]


class TestMetric:
    def test_metric_cloud_intrinsics(self, rng):
        from image_to_pointcloud_tpu.pipeline.advanced import (
            CameraIntrinsics,
            MetricPipeline,
        )

        cfg, params = _metric_pair()
        pipe = MetricPipeline(cfg, params, model_target=56)
        img = rng.integers(0, 256, (70, 84, 3), dtype=np.uint8)
        intr = CameraIntrinsics(fx=100.0, fy=110.0, cx=42.0, cy=35.0)
        pts, cols = pipe.run(img, intr, step=2)
        assert pts.shape[1] == 3 and len(pts) == len(cols)
        # Metric head is sigmoid×5 → z in (0, 5); x,y follow the pinhole.
        assert (pts[:, 2] > 0).all() and (pts[:, 2] <= 5.0).all()
        # Verify the pinhole relation on a reconstructed pixel.
        z = pts[:, 2]
        assert np.isfinite(pts).all()

    def test_metric_quantized_transfer_matches_f32(self, rng):
        """The quantized metric bundle reconstructs the same cloud: same
        keep set (computed pre-quantization on device), z within the
        default 12-bit budget max_depth/2·4095, x/y scaled accordingly."""
        from image_to_pointcloud_tpu.pipeline.advanced import (
            CameraIntrinsics,
            MetricPipeline,
        )

        cfg, params = _metric_pair()
        img = rng.integers(0, 256, (70, 84, 3), dtype=np.uint8)
        intr = CameraIntrinsics(fx=100.0, fy=110.0, cx=42.0, cy=35.0)
        a = MetricPipeline(
            cfg, params, model_target=56, quantized_transfer=False
        ).run(img, intr, step=2)
        b = MetricPipeline(
            cfg, params, model_target=56, quantized_transfer=True
        ).run(img, intr, step=2)
        assert len(a[0]) == len(b[0])
        # Metric head is sigmoid×5 → max depth ≤ 5; tol = 5/2·4095 plus
        # the |u-cx|/fx ≤ ~1 x/y magnification (PARITY.md deviation 12).
        np.testing.assert_allclose(a[0], b[0], atol=1.5e-3)
        np.testing.assert_array_equal(a[1], b[1])

    def test_metric_u16_env_tightens_budget(self, rng, monkeypatch):
        """IPC_TPU_DEPTH16=1 restores the u16 metric bundle (±2e-4)."""
        from image_to_pointcloud_tpu.pipeline.advanced import (
            CameraIntrinsics,
            MetricPipeline,
        )

        cfg, params = _metric_pair()
        img = rng.integers(0, 256, (70, 84, 3), dtype=np.uint8)
        intr = CameraIntrinsics(fx=100.0, fy=110.0, cx=42.0, cy=35.0)
        a = MetricPipeline(
            cfg, params, model_target=56, quantized_transfer=False
        ).run(img, intr, step=2)
        monkeypatch.setenv("IPC_TPU_DEPTH16", "1")
        b = MetricPipeline(
            cfg, params, model_target=56, quantized_transfer=True
        ).run(img, intr, step=2)
        assert len(a[0]) == len(b[0])
        np.testing.assert_allclose(a[0], b[0], atol=2e-4)

    def test_metric_run_batch_matches_run(self, rng):
        """run_batch (BASELINE config 3, batched) equals per-image run
        for mixed per-image intrinsics — one dispatch, same clouds."""
        from image_to_pointcloud_tpu.pipeline.advanced import (
            CameraIntrinsics,
            MetricPipeline,
        )

        cfg, params = _metric_pair()
        pipe = MetricPipeline(
            cfg, params, model_target=56, quantized_transfer=True
        )
        imgs = rng.integers(0, 256, (3, 70, 84, 3), dtype=np.uint8)
        intrs = [
            CameraIntrinsics(fx=100.0, fy=110.0, cx=42.0, cy=35.0),
            CameraIntrinsics(fx=90.0, fy=90.0, cx=40.0, cy=30.0),
            CameraIntrinsics(fx=120.0, fy=100.0, cx=44.0, cy=36.0),
        ]
        batched = pipe.run_batch(imgs, intrs, step=2)
        for i in range(3):
            pts, cols = pipe.run(imgs[i], intrs[i], step=2)
            # Both paths run the model batched (B=3 vs B=1) — XLA may
            # reassociate reductions across batch layouts, so allow
            # float-level wiggle on top of the shared quantization.
            np.testing.assert_allclose(
                batched[i][0], pts, atol=2e-3, rtol=1e-4
            )
            assert len(batched[i][0]) == len(batched[i][1])

    def test_fov_constructor(self):
        from image_to_pointcloud_tpu.pipeline.advanced import CameraIntrinsics

        intr = CameraIntrinsics.from_fov(100, 200, 90.0)
        assert intr.cx == 100.0 and intr.cy == 50.0
        np.testing.assert_allclose(intr.fx, 100.0, rtol=1e-6)


class TestHighRes:
    def test_tiled_pipeline_runs(self, rng):
        from test_model_parity import _build_pair

        from image_to_pointcloud_tpu.pipeline.advanced import HighResPipeline

        _, model, variables = _build_pair(image_size=56)
        pipe = HighResPipeline(
            model.cfg, variables["params"], tile=56, overlap=14, model_target=56
        )
        img = rng.integers(0, 256, (112, 140, 3), dtype=np.uint8)
        pts, cols = pipe.run(img, step=2, voxel_budget=2000)
        assert len(pts) <= 112 * 140
        assert len(pts) == len(cols) and pts.shape[1] == 3
        assert np.isfinite(pts).all()

    def test_image_smaller_than_tile(self, rng):
        """Images with a dimension below the configured tile size must
        clamp the tile instead of issuing an oversized dynamic_slice
        (regression: 640x480-class photos crashed the highres path)."""
        from test_model_parity import _build_pair

        from image_to_pointcloud_tpu.pipeline.advanced import HighResPipeline

        _, model, variables = _build_pair(image_size=56)
        pipe = HighResPipeline(
            model.cfg, variables["params"], tile=200, overlap=300,  # both oversized
            model_target=56,
        )
        img = rng.integers(0, 256, (84, 126, 3), dtype=np.uint8)
        pts, cols = pipe.run(img, step=2, voxel_budget=None)
        assert len(pts) == 42 * 63
        assert np.isfinite(pts).all()

    def test_voxel_budget_respected(self, rng):
        from test_model_parity import _build_pair

        from image_to_pointcloud_tpu.pipeline.advanced import HighResPipeline

        _, model, variables = _build_pair(image_size=56)
        pipe = HighResPipeline(
            model.cfg, variables["params"], tile=56, overlap=14, model_target=56
        )
        img = rng.integers(0, 256, (112, 112, 3), dtype=np.uint8)
        budget = 500
        pts, _ = pipe.run(img, step=1, voxel_budget=budget)
        # voxel sizing is a heuristic; allow 4× slack but require real reduction
        assert len(pts) < 4 * budget
        assert len(pts) < 112 * 112


class TestVideo:
    def test_clip_fused_cloud(self, rng):
        from test_model_parity import _build_pair

        from image_to_pointcloud_tpu.pipeline.advanced import VideoPipeline

        _, model, variables = _build_pair(image_size=56)
        pipe = VideoPipeline(model.cfg, variables["params"], model_target=56)
        clip = rng.integers(0, 256, (4, 56, 70, 3), dtype=np.uint8)
        pts, cols = pipe.run(clip, step=2, fuse_voxel=None)
        assert len(pts) == 4 * 28 * 35
        fused, fcols = pipe.run(clip, step=2, fuse_voxel=0.5)
        assert len(fused) < len(pts)
        assert len(fused) == len(fcols)


class TestQuantizedAdvancedTransfer:
    """The depth16-style transfer trick extended to the advanced configs
    (configs 4/5): quantized paths must match the f32 paths to the
    documented tolerances (u16 over depth range / bbox)."""

    def test_video_depth12_matches_f32(self, rng):
        """Default video transfer is the 12-bit packed depth grid:
        z error ≤ depth_scale/2·4095, x/y scaled by |u-cx|/f < 1."""
        from test_model_parity import _build_pair

        from image_to_pointcloud_tpu.pipeline.advanced import VideoPipeline

        _, model, variables = _build_pair(image_size=56)
        clip = rng.integers(0, 256, (3, 56, 70, 3), dtype=np.uint8)
        a = VideoPipeline(
            model.cfg, variables["params"], model_target=56,
            quantized_transfer=False,
        ).run(clip, step=2)
        b = VideoPipeline(
            model.cfg, variables["params"], model_target=56,
            quantized_transfer=True,  # forced (default only on TPU)
        ).run(clip, step=2)
        assert a[0].shape == b[0].shape
        np.testing.assert_allclose(a[0], b[0], atol=10.0 / 2 / 4095 + 1e-6)
        np.testing.assert_array_equal(a[1], b[1])

    def test_video_u16_env_tightens_budget(self, rng, monkeypatch):
        """IPC_TPU_DEPTH16=1 restores the u16 video contract (±2e-4)."""
        from test_model_parity import _build_pair

        from image_to_pointcloud_tpu.pipeline.advanced import VideoPipeline

        _, model, variables = _build_pair(image_size=56)
        clip = rng.integers(0, 256, (2, 56, 70, 3), dtype=np.uint8)
        a = VideoPipeline(
            model.cfg, variables["params"], model_target=56,
            quantized_transfer=False,
        ).run(clip, step=2)
        monkeypatch.setenv("IPC_TPU_DEPTH16", "1")
        b = VideoPipeline(
            model.cfg, variables["params"], model_target=56,
            quantized_transfer=True,
        ).run(clip, step=2)
        assert a[0].shape == b[0].shape
        np.testing.assert_allclose(a[0], b[0], atol=2e-4)

    def test_highres_depth_grid_full_cloud_matches_f32(self, rng):
        """The depth-grid transfer path (native host reconstruct) must
        rebuild the same full cloud as the device unprojection, within
        the 12-bit depth budget, with byte-identical colors."""
        from test_model_parity import _build_pair

        from image_to_pointcloud_tpu.pipeline.advanced import HighResPipeline

        _, model, variables = _build_pair(image_size=56)
        img = rng.integers(0, 256, (112, 112, 3), dtype=np.uint8)
        kw = dict(tile=56, overlap=14, model_target=56)
        a = HighResPipeline(
            model.cfg, variables["params"], quantized_transfer=False, **kw
        ).run(img, step=1, voxel_budget=None)
        b = HighResPipeline(
            model.cfg, variables["params"], quantized_transfer=True, **kw
        ).run(img, step=1, voxel_budget=None)
        assert a[0].shape == b[0].shape
        # z err ≤ scale/2·4095; x/y scale by |u-cx|/f ≤ ~0.42.
        np.testing.assert_allclose(a[0], b[0], atol=10.0 / 2 / 4095 + 1e-6)
        np.testing.assert_allclose(a[1], b[1], atol=0.5 + 1e-6)

    def test_highres_budget_native_voxel_matches_xla_op(self, rng):
        """The budgeted depth-grid path voxel-averages on the host
        (native/src/voxel.cpp); its output must equal ops.voxel_downsample
        applied to the same reconstructed cloud — same voxel count, same
        (z, y, x) emission order, averaged values to float tolerance."""
        from test_model_parity import _build_pair

        from image_to_pointcloud_tpu import native
        from image_to_pointcloud_tpu.ops import voxel_downsample
        from image_to_pointcloud_tpu.pipeline.advanced import HighResPipeline

        if not native.available():
            pytest.skip("native library unavailable")
        _, model, variables = _build_pair(image_size=56)
        img = rng.integers(0, 256, (112, 112, 3), dtype=np.uint8)
        kw = dict(tile=56, overlap=14, model_target=56)
        pipe = HighResPipeline(
            model.cfg, variables["params"], quantized_transfer=True, **kw
        )
        budget = 500
        full = pipe.run(img, step=1, voxel_budget=None)
        got = pipe.run(img, step=1, voxel_budget=budget)
        assert len(got[0]) < 4 * budget and len(got[0]) < len(full[0])
        # Oracle: the XLA voxel kernel over the same host-reconstructed
        # cloud with the same bbox-derived voxel size.
        lo, hi = full[0].min(axis=0), full[0].max(axis=0)
        vol = float(np.prod(np.maximum(hi - lo, 1e-6)))
        voxel = (vol / budget) ** (1.0 / 3.0)
        vp, vc, _, cnt = voxel_downsample(full[0], full[1], voxel)
        cnt = int(cnt)
        assert len(got[0]) == cnt
        np.testing.assert_allclose(got[0], np.asarray(vp[:cnt]), atol=1e-4)
        np.testing.assert_allclose(got[1], np.asarray(vc[:cnt]), atol=1e-3)
