"""End-to-end pipeline fidelity vs the reference's cv2/numpy semantics."""

import functools

import cv2
import numpy as np
import pytest

import jax.numpy as jnp

from image_to_pointcloud_tpu.pipeline.graph import (
    PipelineOptions,
    depth_to_packed_points,
    dummy_point_cloud_graph,
    demo_depth_map_graph,
)
from tests.oracles import (
    normalize_depth_np,
    statistical_outlier_mask_np,
    unproject_np,
)


def _reference_chain(image_bgr, depth, density, invert, depth_scale, smooth,
                     ksize, fov):
    """The reference's depth_to_point_cloud + refine (backend/app.py:174-269)."""
    h, w = image_bgr.shape[:2]
    if depth.shape != (h, w):
        depth = cv2.resize(depth, (w, h), interpolation=cv2.INTER_LINEAR)
    d = normalize_depth_np(depth, invert)
    if smooth:
        k = max(3, int(ksize) // 2 * 2 + 1)
        d = cv2.GaussianBlur(d, (k, k), 0)
    step = {"low": 4, "medium": 2, "high": 1}[density]
    pts, cols = unproject_np(image_bgr, d, step, depth_scale, fov)
    keep = statistical_outlier_mask_np(pts)
    return pts, cols, keep


class TestDepthToPoints:
    @pytest.mark.parametrize("smooth", [False, True])
    @pytest.mark.parametrize("density", ["medium", "high"])
    def test_matches_reference_chain(self, rng, smooth, density):
        h, w = 40, 52
        dh, dw = 28, 28  # model-resolution depth, needs upscale
        img_bgr = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        depth = rng.normal(4.0, 2.0, (dh, dw)).astype(np.float32)

        pts_ref, cols_ref, keep_ref = _reference_chain(
            img_bgr, depth, density, True, 10.0, smooth, 5, None
        )

        opts = PipelineOptions(density=density, smooth_depth=smooth, exact_outlier=True)
        from image_to_pointcloud_tpu.ops.unproject import DENSITY_STRIDES

        packed = np.asarray(
            depth_to_packed_points(
                jnp.asarray(depth),
                jnp.asarray(img_bgr[:, :, ::-1].copy()),
                10.0,
                opts=opts,
                h=h,
                w=w,
                step=DENSITY_STRIDES[density],
            )
        )
        np.testing.assert_allclose(packed[:3].T, pts_ref, atol=2e-5)
        np.testing.assert_array_equal(packed[3:6].T, cols_ref)
        keep = packed[6] > 0.5
        assert (keep == keep_ref).mean() > 0.995  # f32 threshold ties only

    def test_final_points_rmse_budget(self, rng):
        """North-star budget: per-point RMSE < 1e-3 vs reference outputs."""
        h, w = 37, 41
        img_bgr = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        depth = rng.normal(3.0, 1.5, (h, w)).astype(np.float32)
        pts_ref, _, keep_ref = _reference_chain(
            img_bgr, depth, "high", True, 10.0, False, 5, 60.0
        )
        opts = PipelineOptions(density="high", fov=60.0, exact_outlier=True)
        packed = np.asarray(
            depth_to_packed_points(
                jnp.asarray(depth), jnp.asarray(img_bgr[:, :, ::-1].copy()),
                10.0, opts=opts, h=h, w=w, step=1,
            )
        )
        rmse = np.sqrt(((packed[:3].T - pts_ref) ** 2).mean())
        assert rmse < 1e-3


class TestDummyPaths:
    def test_dummy_point_cloud_matches_reference(self, rng):
        h, w = 33, 47
        img_bgr = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        step = 4  # medium

        # Reference semantics (backend/app.py:567-587).
        pts_ref, cols_ref = [], []
        for v in range(0, h, step):
            for u in range(0, w, step):
                gray = cv2.cvtColor(
                    img_bgr[v : v + 1, u : u + 1], cv2.COLOR_BGR2GRAY
                )[0, 0]
                z = (255 - gray) / 255.0 * 5
                pts_ref.append([(u - w / 2) / 100.0, (v - h / 2) / 100.0, z])
                cols_ref.append(
                    [img_bgr[v, u, 2], img_bgr[v, u, 1], img_bgr[v, u, 0]]
                )
        pts_ref = np.array(pts_ref)
        cols_ref = np.array(cols_ref, dtype=np.float64)

        pts, cols = dummy_point_cloud_graph(img_bgr[:, :, ::-1].copy(), "medium")
        np.testing.assert_allclose(pts, pts_ref, atol=1e-5)
        np.testing.assert_array_equal(cols, cols_ref)

    def test_demo_depth_map_matches_reference(self, rng):
        img_bgr = rng.integers(0, 256, (40, 40, 3), dtype=np.uint8)
        gray = cv2.cvtColor(img_bgr, cv2.COLOR_BGR2GRAY)
        blurred = cv2.GaussianBlur(gray, (15, 15), 0)
        ref = cv2.applyColorMap(255 - blurred, cv2.COLORMAP_PLASMA)[:, :, ::-1]

        ours = np.asarray(demo_depth_map_graph(jnp.asarray(img_bgr[:, :, ::-1].copy())))
        # uint8 blur rounding may differ by 1 LSB on a few pixels
        close = (np.abs(ours.astype(int) - ref.astype(int)) <= 6).mean()
        assert close > 0.99


class TestFullPipeline:
    def test_tiny_model_end_to_end(self, rng):
        """Full fused graph with a tiny random model: shape/sanity checks."""
        import sys

        sys.path.insert(0, "tests")
        from test_model_parity import _build_pair

        from image_to_pointcloud_tpu.pipeline.graph import DepthPipeline

        _, model, variables = _build_pair(image_size=56)
        pipe = DepthPipeline(model.cfg, variables["params"], model_target=56)
        img = rng.integers(0, 256, (70, 63, 3), dtype=np.uint8)
        res = pipe.run(img, depth_scale=10.0, options=PipelineOptions())
        assert res.points.shape[1] == 3
        assert res.colors.shape == res.points.shape
        assert res.kept_point_count == len(res.points)
        assert res.raw_point_count == 35 * 32  # ceil(70/2)*ceil(63/2)
        assert res.depth_preview_rgb.dtype == np.uint8
        assert res.depth_preview_rgb.shape[2] == 3
        assert np.isfinite(res.points).all()


class TestQuantizedTransfer:
    @pytest.mark.parametrize("density", ["medium", "high"])
    def test_depth12_matches_f32_path(self, rng, density, monkeypatch):
        """The flat 12-bit packed depth (IPC_TPU_DEPTH12=1 escape
        hatch; the pre-round-5 default) bounds |Δz| by
        depth_scale/4095/2 ≈ 1.3e-3 at scale 10 (RMSE ≈ 7e-4, inside
        the <1e-3 parity budget; PARITY.md deviation 12). The round-5
        DEFAULT codec (sub-byte tiled) is covered with its own oracle
        bound by test_depth8t_default_pipeline_parity.

        density=medium gives a point count divisible by 8; density=high
        (70·63 = 4410 points) exercises the keep-bit padding lanes of the
        single-buffer device→host bundle.
        """
        import sys

        sys.path.insert(0, "tests")
        from test_model_parity import _build_pair

        from image_to_pointcloud_tpu.pipeline.graph import DepthPipeline

        monkeypatch.setenv("IPC_TPU_DEPTH12", "1")
        _, model, variables = _build_pair(image_size=56)
        opts = PipelineOptions(density=density)
        img = rng.integers(0, 256, (70, 63, 3), dtype=np.uint8)
        a = DepthPipeline(
            model.cfg, variables["params"], model_target=56,
            quantized_transfer=False,
        ).run(img, depth_scale=10.0, options=opts)
        b = DepthPipeline(
            model.cfg, variables["params"], model_target=56,
            quantized_transfer=True,
        )
        assert b.depth_bits == 12
        b = b.run(img, depth_scale=10.0, options=opts)
        assert a.raw_point_count == b.raw_point_count
        assert a.kept_point_count == b.kept_point_count
        np.testing.assert_allclose(a.points, b.points, atol=1.5e-3)
        np.testing.assert_array_equal(a.colors, b.colors)

    def test_depth16_env_restores_u16_contract(self, rng, monkeypatch):
        """IPC_TPU_DEPTH16=1 ships u16 depth (2 B/pt) and tightens the
        reconstruction to the historical ±2e-4 u16 budget."""
        import sys

        sys.path.insert(0, "tests")
        from test_model_parity import _build_pair

        from image_to_pointcloud_tpu.pipeline.graph import DepthPipeline

        _, model, variables = _build_pair(image_size=56)
        opts = PipelineOptions(density="medium")
        img = rng.integers(0, 256, (70, 63, 3), dtype=np.uint8)
        a = DepthPipeline(
            model.cfg, variables["params"], model_target=56,
            quantized_transfer=False,
        ).run(img, depth_scale=10.0, options=opts)
        monkeypatch.setenv("IPC_TPU_DEPTH16", "1")
        pipe16 = DepthPipeline(
            model.cfg, variables["params"], model_target=56,
            quantized_transfer=True,
        )
        assert pipe16.depth_bits == 16
        b = pipe16.run(img, depth_scale=10.0, options=opts)
        assert a.kept_point_count == b.kept_point_count
        np.testing.assert_allclose(a.points, b.points, atol=2e-4)
        np.testing.assert_array_equal(a.colors, b.colors)

    def test_depth12_pack_roundtrip_exact(self, rng):
        """unpack_depth12 is the exact inverse of pack_depth12 at the
        12-bit grid, for even and odd point counts (the odd tail pads)."""
        import jax.numpy as jnp

        from image_to_pointcloud_tpu.pipeline.graph import (
            pack_depth12,
            unpack_depth12,
        )

        for hh, ww in [(7, 9), (8, 8), (1, 1)]:
            dn = rng.random((3, hh, ww)).astype(np.float32)
            sec = np.asarray(pack_depth12(jnp.asarray(dn)))
            assert sec.shape == (3, 3 * (-(-hh * ww // 2)))
            d12 = unpack_depth12(sec, hh * ww)
            expect = np.round(dn * 4095.0).astype(np.uint16).reshape(3, -1)
            np.testing.assert_array_equal(d12, expect)

    def test_depth8t_codec_error_bound(self, rng):
        """The sub-byte tile codec honors its documented worst case:
        per-tile max error ≤ range/510 + 0.5 d12 steps (two roundings)
        for coded tiles, exact 12-bit values for side-list tiles; when
        the side list covers every tile wider than 255 the global max
        error is ≤ 1 d12 step."""
        import jax.numpy as jnp

        from image_to_pointcloud_tpu.pipeline.graph import (
            _d8t_geometry,
            depth8t_section_len,
            pack_depth8t,
            unpack_depth8t,
        )

        for hh, ww in [(35, 32), (40, 40), (7, 9), (1, 1)]:
            # Smooth base (tile ranges well under 255) + a few sharp
            # edges that create wide tiles for the side list.
            yy, xx = np.mgrid[0:hh, 0:ww].astype(np.float32)
            dn = 0.35 + 0.3 * np.sin(yy / 17.0) * np.cos(xx / 13.0)
            dn[: hh // 3, : ww // 3] += 0.4  # hard depth edge
            dn = np.clip(dn[None].repeat(2, axis=0), 0.0, 1.0)
            sec = np.asarray(pack_depth8t(jnp.asarray(dn)))
            assert sec.shape == (2, depth8t_section_len(hh, ww))
            got = unpack_depth8t(sec, hh, ww).astype(np.float32)
            want = np.round(dn * 4095.0)
            # Oracle per-tile bound from the original grid.
            th, tw, t, k = _d8t_geometry(hh, ww)
            pad = np.pad(
                want,
                ((0, 0), (0, th * 8 - hh), (0, tw * 8 - ww)),
                mode="edge",
            )
            tiles = (
                pad.reshape(2, th, 8, tw, 8)
                .transpose(0, 1, 3, 2, 4)
                .reshape(2, t, 64)
            )
            ranges = tiles.max(-1) - tiles.min(-1)
            order = np.sort(ranges, axis=-1)[:, ::-1]
            widest_coded = (
                order[:, k] if k < t else np.zeros(2, np.float32)
            )
            err = np.abs(got - want)
            err_tiles = (
                np.pad(
                    err,
                    ((0, 0), (0, th * 8 - hh), (0, tw * 8 - ww)),
                )
                .reshape(2, th, 8, tw, 8)
                .transpose(0, 1, 3, 2, 4)
                .reshape(2, t, 64)
            )
            for b in range(2):
                # Per-tile check: every tile obeys the coded bound
                # range/510 + 0.5 (side-list tiles are exact and pass
                # it trivially).
                per_tile_bound = ranges[b] / 510.0 + 0.5
                assert np.all(
                    err_tiles[b].max(-1) <= per_tile_bound + 1e-3
                ), (hh, ww, b)
            # With side capacity covering every wide tile, the codec
            # stays within one 12-bit step everywhere.
            if np.all(widest_coded <= 255):
                assert err.max() <= 1.0 + 1e-3

    def test_depth8t_default_pipeline_parity(self, rng, monkeypatch):
        """The sub-byte tile codec is the quantized-transfer DEFAULT
        (round-5 A/B, PARITY.md deviation 12); the reconstructed cloud
        matches the f32 path within the codec's oracle-computed error
        bound and keeps identical colors/keep decisions. IPC_TPU_DEPTH12
        restores the flat pack."""
        import sys

        sys.path.insert(0, "tests")
        from test_model_parity import _build_pair

        from image_to_pointcloud_tpu.pipeline.graph import DepthPipeline

        _, model, variables = _build_pair(image_size=56)
        opts = PipelineOptions(density="medium")
        img = rng.integers(0, 256, (70, 63, 3), dtype=np.uint8)
        a = DepthPipeline(
            model.cfg, variables["params"], model_target=56,
            quantized_transfer=False,
        ).run(img, depth_scale=10.0, options=opts)
        monkeypatch.setenv("IPC_TPU_DEPTH12", "1")
        assert DepthPipeline(
            model.cfg, variables["params"], model_target=56,
            quantized_transfer=True,
        ).depth_bits == 12
        monkeypatch.delenv("IPC_TPU_DEPTH12")
        pipe8 = DepthPipeline(
            model.cfg, variables["params"], model_target=56,
            quantized_transfer=True,
        )
        assert pipe8.depth_bits == 8  # the default, no env needed
        b = pipe8.run(img, depth_scale=10.0, options=opts)
        assert a.kept_point_count == b.kept_point_count
        np.testing.assert_array_equal(a.colors, b.colors)
        # Error budget from the codec's guarantee: z error ≤
        # scale·(widest CODED tile range/510 + 1.5 d12 steps)/4095 —
        # the widest coded range is an oracle computed from the f32
        # run's own depth grid (a random-init model's depth map is not
        # smooth, so a fixed constant would be wrong); x/y errors scale
        # by |u−c|/f < 1.
        from image_to_pointcloud_tpu.pipeline.graph import _d8t_geometry

        hh, ww = a.grid_hw
        dn = np.clip(a.packed[2].reshape(hh, ww) / 10.0, 0.0, 1.0)
        d12 = np.round(dn * 4095.0)
        th, tw, t, k = _d8t_geometry(hh, ww)
        tiles = (
            np.pad(
                d12,
                ((0, th * 8 - hh), (0, tw * 8 - ww)),
                mode="edge",
            )
            .reshape(th, 8, tw, 8)
            .transpose(0, 2, 1, 3)
            .reshape(t, 64)
        )
        ranges = np.sort(tiles.max(-1) - tiles.min(-1))[::-1]
        widest_coded = ranges[k] if k < t else 0.0
        bound = 10.0 * (widest_coded / 510.0 + 1.5) / 4095.0
        diff = np.abs(a.points - b.points).max()
        assert diff <= bound, (diff, bound)

    def test_depth8t_small_grid_falls_back_to_flat_pack(
        self, rng, monkeypatch
    ):
        """On small/ragged strided grids the tiled codec's fixed costs
        (64 B edge-padded codes per tile, headers, side-list slots)
        exceed the flat 12-bit pack, so the default codec must fall
        back to pack_depth12 there (round-4 advisor) — and the device
        pack and host unpack must agree on the choice."""
        import sys

        sys.path.insert(0, "tests")
        from test_model_parity import _build_pair

        from image_to_pointcloud_tpu.pipeline.graph import (
            DepthPipeline,
            depth8t_section_len,
        )

        # The advisor's example: a 9×9 grid costs ~316 B tiled vs 123 B
        # flat — the chooser must reject the tiled codec.
        assert depth8t_section_len(9, 9) >= 3 * (-(-81 // 2))

        _, model, variables = _build_pair(image_size=56)
        opts = PipelineOptions(density="low")  # stride 4 → tiny grid
        img = rng.integers(0, 256, (34, 35, 3), dtype=np.uint8)
        a = DepthPipeline(
            model.cfg, variables["params"], model_target=56,
            quantized_transfer=False,
        ).run(img, depth_scale=10.0, options=opts)
        pipe8 = DepthPipeline(
            model.cfg, variables["params"], model_target=56,
            quantized_transfer=True,
        )
        assert pipe8.depth_bits == 8  # the default
        hh, ww = a.grid_hw
        assert pipe8._depth_codec_bits(hh, ww) == 12
        b = pipe8.run(img, depth_scale=10.0, options=opts)
        assert a.kept_point_count == b.kept_point_count
        np.testing.assert_array_equal(a.colors, b.colors)
        # Flat-pack budget applies (tighter than the tiled codec's):
        # z error ≤ 0.5·scale/4095.
        assert np.abs(a.points - b.points).max() <= 10.0 * 0.5 / 4095.0 + 1e-6

    def test_downscaled_input_quantized_transfer(self, rng, monkeypatch):
        """Inputs over MAX_IMAGE_DIM take the device-downscale branch of
        the quantized-transfer graph, which ships strided RGB alongside
        depth16 (regression: that branch returned an undefined preview
        var and every >3072 px request failed at trace time)."""
        import sys

        sys.path.insert(0, "tests")
        from test_model_parity import _build_pair

        from image_to_pointcloud_tpu.pipeline import graph as graph_mod
        from image_to_pointcloud_tpu.pipeline.graph import DepthPipeline

        monkeypatch.setattr(graph_mod, "MAX_IMAGE_DIM", 48)
        _, model, variables = _build_pair(image_size=56)
        img = rng.integers(0, 256, (70, 63, 3), dtype=np.uint8)
        opts = PipelineOptions(density="medium")
        res = DepthPipeline(
            model.cfg, variables["params"], model_target=56,
            quantized_transfer=True,
        ).run(img, depth_scale=10.0, options=opts)
        assert res.kept_point_count > 0
        assert res.depth_preview_rgb is not None
        # Colors must come from the device's strided RGB (the host copy
        # is the pre-downscale image and would be the wrong size).
        assert res.colors.shape == (res.kept_point_count, 3)


class TestPreviewRgbOptOut:
    def test_collect_skips_lut_keeps_gray(self, rng):
        """want_preview_rgb=False: the serving batcher's collect returns
        the gray preview (paletted-PNG source) and skips the host PLASMA
        LUT; the RGB preview stays None."""
        import sys

        sys.path.insert(0, "tests")
        from test_model_parity import _build_pair

        from image_to_pointcloud_tpu.pipeline.graph import DepthPipeline

        _, model, variables = _build_pair(image_size=56)
        pipe = DepthPipeline(
            model.cfg, variables["params"], model_target=56,
            quantized_transfer=True,
        )
        img = rng.integers(0, 256, (70, 63, 3), dtype=np.uint8)
        opts = PipelineOptions(density="medium")
        h = pipe.submit_batch([img], depth_scales=[10.0], options=opts)
        (res,) = pipe.collect(h, want_packed=False, want_preview_rgb=False)
        assert res.depth_preview_gray is not None
        assert res.depth_preview_rgb is None
        assert res.kept_point_count > 0
        # Default collect still materializes RGB == PLASMA[gray].
        h2 = pipe.submit_batch([img], depth_scales=[10.0], options=opts)
        (res2,) = pipe.collect(h2, want_packed=False)
        from image_to_pointcloud_tpu.ops.colormap import PLASMA_RGB

        np.testing.assert_array_equal(
            res2.depth_preview_rgb, PLASMA_RGB[res2.depth_preview_gray]
        )


class TestPresets:
    def test_all_presets_resolve(self):
        from image_to_pointcloud_tpu.models import PRESETS, preset

        for name in PRESETS:
            cfg = preset(name)
            assert cfg.backbone.hidden_size % cfg.backbone.num_heads == 0

    def test_class_aliases(self):
        """North-star config names (BASELINE.json) resolve to the right
        model class."""
        from image_to_pointcloud_tpu.models import preset

        assert preset("midas-small") == preset("depth-anything-v2-small")
        # dpt-large is the REAL classic DPT (= MiDaS 3.0), not a DA alias.
        from image_to_pointcloud_tpu.models import DPTClassicConfig

        assert isinstance(preset("dpt-large"), DPTClassicConfig)
        assert preset("midas") == preset("dpt-large")
        assert preset("zoedepth").neck.metric_depth is True
        with pytest.raises(ValueError):
            preset("nonexistent-model")


class TestCLI:
    """Offline CLI (image_to_pointcloud_tpu.cli) with a stubbed pipeline."""

    def _stub_pipeline(self):
        from image_to_pointcloud_tpu.pipeline.graph import PipelineResult

        class Stub:
            def run_batch(self, images, depth_scales=None, options=None,
                          want_preview=True, want_packed=True):
                out = []
                for im in images:
                    n = im.shape[0] * im.shape[1] // 4
                    out.append(PipelineResult(
                        points=np.zeros((n, 3), np.float32),
                        colors=np.zeros((n, 3), np.float32),
                        depth_preview_rgb=None,
                        raw_point_count=n, kept_point_count=n,
                    ))
                return out

        return Stub()

    def test_convert_batches_by_shape(self, rng, tmp_path, monkeypatch):
        from PIL import Image

        from image_to_pointcloud_tpu import cli

        for name, hw in [("a.png", (16, 20)), ("b.png", (16, 20)),
                         ("c.png", (12, 12))]:
            Image.fromarray(
                rng.integers(0, 255, (*hw, 3)).astype(np.uint8)
            ).save(tmp_path / name)
        monkeypatch.setattr(cli, "_load_pipeline", lambda a: self._stub_pipeline())
        rc = cli.main([
            "convert", str(tmp_path / "a.png"), str(tmp_path / "b.png"),
            str(tmp_path / "c.png"), "-o", str(tmp_path / "out"),
            "--format", "xyz",
        ])
        assert rc == 0
        outs = sorted(p.name for p in (tmp_path / "out").iterdir())
        assert outs == ["a.xyz", "b.xyz", "c.xyz"]
        assert (tmp_path / "out" / "a.xyz").stat().st_size > 0


class TestSubmitCollectContracts:
    def _pipe(self):
        import sys

        sys.path.insert(0, "tests")
        from test_model_parity import _build_pair

        from image_to_pointcloud_tpu.pipeline.graph import DepthPipeline

        _, model, variables = _build_pair(image_size=56)
        return DepthPipeline(
            model.cfg, variables["params"], model_target=56,
            quantized_transfer=True,
        )

    def test_scalar_like_depth_scales(self, rng):
        """Plain floats, 0-d arrays, and numpy scalars all broadcast to
        the batch (np.isscalar would reject the 0-d forms)."""
        pipe = self._pipe()
        imgs = [rng.integers(0, 256, (40, 44, 3), dtype=np.uint8)] * 2
        opts = PipelineOptions(density="low")
        base = None
        for scales in (10.0, np.float32(10.0), np.asarray(10.0)):
            h = pipe.submit_batch(imgs, depth_scales=scales, options=opts)
            res = pipe.collect(h, want_packed=False, want_preview_rgb=False)
            assert len(res) == 2
            if base is None:
                base = res[0].points
            else:
                np.testing.assert_array_equal(res[0].points, base)

    def test_collect_derives_preview_from_handle(self, rng):
        """collect(want_preview=True) on a previewless handle must not
        misread the (1,) placeholder — the handle is authoritative."""
        pipe = self._pipe()
        imgs = [rng.integers(0, 256, (40, 44, 3), dtype=np.uint8)] * 2
        opts = PipelineOptions(density="low")
        h = pipe.submit_batch(imgs, options=opts, want_preview=False)
        res = pipe.collect(h, want_preview=True, want_packed=False)
        assert len(res) == 2
        assert all(r.depth_preview_rgb is None for r in res)
        assert all(r.depth_preview_gray is None for r in res)
        assert all(r.kept_point_count > 0 for r in res)


class TestGraphHelperEquivalence:
    def test_compiled_graph_matches_depth_to_packed_points(self, rng):
        """The batched serving graph's normalize→blur→unproject→refine
        chain must stay equivalent to the standalone helper (they share
        the ops but compose independently; this pins them together so a
        fix to one can't silently miss the other)."""
        import sys

        sys.path.insert(0, "tests")
        from test_model_parity import _build_pair

        from image_to_pointcloud_tpu.ops.resize import resize_batched
        from image_to_pointcloud_tpu.ops.unproject import DENSITY_STRIDES
        from image_to_pointcloud_tpu.pipeline.graph import (
            DepthPipeline,
            depth_to_packed_points,
        )
        from image_to_pointcloud_tpu.pipeline.preprocess import (
            processor_output_size,
        )

        _, model, variables = _build_pair(image_size=56)
        opts = PipelineOptions(density="medium", smooth_depth=True)
        img = rng.integers(0, 256, (70, 63, 3), dtype=np.uint8)
        pipe = DepthPipeline(
            model.cfg, variables["params"], model_target=56,
            quantized_transfer=False,
        )
        res = pipe.run(img, depth_scale=10.0, options=opts)

        # Manual chain: the same preprocess the graph applies, then the
        # helper for everything after the model.
        h, w = img.shape[:2]
        mh, mw = processor_output_size(h, w, 56, multiple=14)
        x = resize_batched(
            jnp.asarray(img, jnp.float32)[None], (mh, mw), "bicubic_pil"
        ) / 255.0
        x = (x - jnp.asarray([0.485, 0.456, 0.406])) / jnp.asarray(
            [0.229, 0.224, 0.225]
        )
        depth = model.apply(variables, x)[0]
        packed = np.asarray(
            depth_to_packed_points(
                depth, jnp.asarray(img, jnp.float32), 10.0,
                opts=opts, h=h, w=w, step=DENSITY_STRIDES["medium"],
            )
        )
        keep = packed[6] > 0.5
        np.testing.assert_allclose(
            res.points, packed[:3].T[keep], atol=2e-4
        )
