"""Oracle tests for the core TPU kernels against cv2/scipy/numpy ground truth."""

import cv2
import numpy as np
import pytest

from image_to_pointcloud_tpu import ops
from tests.oracles import (
    normalize_depth_np,
    statistical_outlier_mask_np,
    unproject_np,
)


class TestResize:
    @pytest.mark.parametrize(
        "in_hw,out_hw",
        [((64, 80), (32, 40)), ((100, 70), (37, 25)), ((37, 53), (21, 30))],
    )
    def test_area_matches_cv2(self, rng, in_hw, out_hw):
        img = rng.random(in_hw, dtype=np.float32)
        ours = np.asarray(ops.resize_area(img, out_hw))
        ref = cv2.resize(img, (out_hw[1], out_hw[0]), interpolation=cv2.INTER_AREA)
        np.testing.assert_allclose(ours, ref, atol=2e-5)

    @pytest.mark.parametrize(
        "in_hw,out_hw",
        [((32, 40), (64, 80)), ((37, 25), (100, 70)), ((40, 40), (37, 53))],
    )
    def test_linear_matches_cv2(self, rng, in_hw, out_hw):
        img = rng.random(in_hw, dtype=np.float32)
        ours = np.asarray(ops.resize_linear(img, out_hw))
        ref = cv2.resize(img, (out_hw[1], out_hw[0]), interpolation=cv2.INTER_LINEAR)
        np.testing.assert_allclose(ours, ref, atol=2e-5)

    def test_linear_3channel(self, rng):
        img = rng.random((20, 30, 3), dtype=np.float32)
        ours = np.asarray(ops.resize_linear(img, (41, 61)))
        ref = cv2.resize(img, (61, 41), interpolation=cv2.INTER_LINEAR)
        np.testing.assert_allclose(ours, ref, atol=2e-5)

    @pytest.mark.parametrize("in_hw,out_hw", [((100, 120), (50, 60)), ((50, 60), (100, 130)), ((98, 74), (37, 37))])
    def test_bicubic_matches_pil(self, rng, in_hw, out_hw):
        from PIL import Image

        img = rng.random(in_hw, dtype=np.float32)
        ours = np.asarray(ops.resize_bicubic_pil(img, out_hw))
        ref = np.asarray(
            Image.fromarray(img).resize((out_hw[1], out_hw[0]), Image.BICUBIC)
        )
        np.testing.assert_allclose(ours, ref, atol=1e-4)


class TestDepthNorm:
    def test_matches_numpy(self, rng):
        d = rng.normal(5.0, 2.0, (67, 89)).astype(np.float32)
        for invert in (True, False):
            ours = np.asarray(ops.normalize_depth(d, invert))
            ref = normalize_depth_np(d, invert)
            np.testing.assert_allclose(ours, ref, atol=1e-6)

    def test_nonfinite_replaced_by_median(self, rng):
        d = rng.random((40, 40)).astype(np.float32) * 10
        d[3, 4] = np.nan
        d[10, 2] = np.inf
        d[0, 0] = -np.inf
        ours = np.asarray(ops.normalize_depth(d, True))
        ref = normalize_depth_np(d, True)
        np.testing.assert_allclose(ours, ref, atol=1e-6)

    def test_constant_input(self):
        d = np.full((16, 16), 3.25, np.float32)
        # degenerate range → zeros, then inverted to ones
        np.testing.assert_allclose(np.asarray(ops.normalize_depth(d, True)), 1.0)
        np.testing.assert_allclose(np.asarray(ops.normalize_depth(d, False)), 0.0)

    def test_percentile_interpolation(self, rng):
        # Values engineered so linear interpolation between order stats matters.
        d = rng.permutation(np.arange(101, dtype=np.float32)).reshape(101, 1)
        ours = np.asarray(ops.normalize_depth(d, False))
        ref = normalize_depth_np(d, False)
        np.testing.assert_allclose(ours, ref, atol=1e-6)


class TestGaussian:
    @pytest.mark.parametrize("k", [3, 5, 7, 9, 15])
    def test_matches_cv2(self, rng, k):
        d = rng.random((50, 64)).astype(np.float32)
        ours = np.asarray(ops.gaussian_blur(d, k))
        ref = cv2.GaussianBlur(d, (k, k), 0)
        np.testing.assert_allclose(ours, ref, atol=1e-6)


class TestColormap:
    def test_matches_cv2_plasma(self, rng):
        img = rng.integers(0, 256, (31, 47), dtype=np.uint8)
        ours = np.asarray(ops.apply_colormap(img, bgr=True))
        ref = cv2.applyColorMap(img, cv2.COLORMAP_PLASMA)
        np.testing.assert_array_equal(ours, ref)


class TestUnproject:
    @pytest.mark.parametrize("step", [1, 2, 4])
    @pytest.mark.parametrize("fov", [None, 60.0])
    def test_matches_reference_loop(self, rng, step, fov):
        h, w = 37, 45
        img_bgr = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        dnorm = rng.random((h, w)).astype(np.float32)
        dnorm[5, 7] = 0.0  # exercise the z==0 epsilon path
        img_rgb = img_bgr[:, :, ::-1].copy()

        packed = np.asarray(
            ops.unproject(
                dnorm, img_rgb, depth_scale=10.0, step=step, h=h, w=w, fov_deg=fov
            )
        )
        pts_ref, cols_ref = unproject_np(img_bgr, dnorm, step, 10.0, fov)
        np.testing.assert_allclose(packed[:3].T, pts_ref, atol=1e-5)
        np.testing.assert_array_equal(packed[3:6].T, cols_ref)
        assert packed.shape == (8, ops.num_points(h, w, step))
        np.testing.assert_array_equal(packed[6], 1.0)

    def test_pallas_matches_xla(self, rng):
        h, w = 40, 64
        img_rgb = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        dnorm = rng.random((h, w)).astype(np.float32)
        a = np.asarray(
            ops.unproject(dnorm, img_rgb, depth_scale=7.5, step=2, h=h, w=w)
        )
        b = np.asarray(
            ops.unproject_pallas(
                dnorm, img_rgb, depth_scale=7.5, step=2, h=h, w=w, interpret=True
            )
        )
        np.testing.assert_allclose(a, b, atol=1e-6)


class TestOutlier:
    def test_matches_open3d_semantics(self, rng):
        pts = rng.normal(0, 1, (500, 3)).astype(np.float32)
        pts[::50] *= 8.0  # inject outliers
        ours = np.asarray(ops.statistical_outlier_mask(pts, k=20, std_ratio=2.0))
        ref = statistical_outlier_mask_np(pts, 20, 2.0)
        assert (ours == ref).mean() > 0.998  # f32-vs-f64 boundary ties only

    def test_coincident_cluster_denominator(self, rng):
        """A cluster of >=k coincident points (mean kNN distance 0) must
        be excluded from BOTH the sums and the denominators — Open3D's
        valid_distances = count_if(mean > 0) (regression: we divided by
        the cloud size, deflating the threshold)."""
        pts = rng.normal(0, 1, (400, 3)).astype(np.float32)
        pts[:25] = pts[0]  # 25 exactly coincident points (k=20 < 25)
        ours = np.asarray(ops.statistical_outlier_mask(pts, k=20, std_ratio=2.0))
        ref = statistical_outlier_mask_np(pts, 20, 2.0)
        assert not ours[:25].any()  # coincident cluster always drops
        assert (ours == ref).mean() > 0.995

    def test_mean_distances(self, rng):
        from scipy.spatial import cKDTree

        pts = rng.normal(0, 1, (300, 3)).astype(np.float32)
        ours = np.asarray(ops.knn_mean_distances(pts, k=10))
        d, _ = cKDTree(pts.astype(np.float64)).query(pts, k=10)
        np.testing.assert_allclose(ours, d.mean(axis=1), rtol=2e-4, atol=2e-5)

    def test_padding_blocks(self, rng):
        # Non-multiple-of-block sizes must not perturb results.
        pts = rng.normal(0, 1, (777, 3)).astype(np.float32)
        a = np.asarray(ops.knn_mean_distances(pts, k=5, query_block=128, key_block=256))
        b = np.asarray(ops.knn_mean_distances(pts, k=5, query_block=512, key_block=1024))
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


class TestVoxel:
    def test_downsample_averages(self, rng):
        pts = rng.random((200, 3)).astype(np.float32) * 4
        cols = rng.random((200, 3)).astype(np.float32)
        op, oc, ovalid, cnt = ops.voxel_downsample(pts, cols, 0.5)
        cnt = int(cnt)
        op, oc = np.asarray(op)[:cnt], np.asarray(oc)[:cnt]
        assert bool(np.asarray(ovalid)[:cnt].all())

        # Oracle: group by voxel index, average (Open3D origin: half a
        # voxel below the min bound).
        idx = np.floor((pts - (pts.min(axis=0) - 0.25)) / 0.5).astype(np.int64)
        keys = [tuple(i) for i in idx]
        groups = {}
        for i, k in enumerate(keys):
            groups.setdefault(k, []).append(i)
        assert cnt == len(groups)
        ref = sorted(
            (
                (pts[g].mean(axis=0), cols[g].mean(axis=0))
                for g in map(list, groups.values())
            ),
            key=lambda t: tuple(t[0]),
        )
        ours = sorted(zip(op, oc), key=lambda t: tuple(t[0]))
        for (rp, rc), (up, uc) in zip(ref, ours):
            np.testing.assert_allclose(up, rp, atol=1e-5)
            np.testing.assert_allclose(uc, rc, atol=1e-5)


class TestGridOutlier:
    def test_matches_exact_on_grid_cloud(self, rng):
        """Windowed grid search equals the exact O(N²) search on a smooth
        depth-grid cloud with injected outliers."""
        import jax.numpy as jnp

        hh, ww = 24, 30
        u, v = np.meshgrid(np.arange(ww, dtype=np.float32),
                           np.arange(hh, dtype=np.float32))
        z = 5.0 + 0.5 * np.sin(u / 5) * np.cos(v / 4)
        z[3, 7] = 12.0   # outliers
        z[15, 20] = 0.2
        f = max(hh, ww) * 1.2
        pts = np.stack(
            [(u - ww / 2) * z / f, (v - hh / 2) * z / f, z], axis=-1
        ).astype(np.float32)

        exact = np.asarray(
            ops.statistical_outlier_mask(pts.reshape(-1, 3), k=10)
        )
        from image_to_pointcloud_tpu.ops.outlier import (
            grid_statistical_outlier_mask,
        )

        grid = np.asarray(
            grid_statistical_outlier_mask(jnp.asarray(pts), k=10, window=7)
        )
        assert (grid == exact).mean() > 0.995
        assert not grid.reshape(hh, ww)[3, 7]
        assert not grid.reshape(hh, ww)[15, 20]

    def test_grid_mean_distances_match(self, rng):
        import jax.numpy as jnp

        from image_to_pointcloud_tpu.ops.outlier import grid_knn_mean_distances

        hh, ww = 16, 20
        u, v = np.meshgrid(np.arange(ww, dtype=np.float32),
                           np.arange(hh, dtype=np.float32))
        z = 4.0 + 0.3 * np.sin(u / 3) + 0.05 * rng.random((hh, ww))
        f = max(hh, ww) * 1.2
        pts = np.stack(
            [(u - ww / 2) * z / f, (v - hh / 2) * z / f, z], axis=-1
        ).astype(np.float32)
        exact = np.asarray(ops.knn_mean_distances(pts.reshape(-1, 3), k=8))
        grid = np.asarray(grid_knn_mean_distances(jnp.asarray(pts), k=8, window=7))
        # Identical where the window captures the true neighbours; the exact
        # kernel's |q|²+|k|²−2qk form carries f32 cancellation noise on tiny
        # distances, so compare with an absolute floor.
        close = np.isclose(grid, exact, rtol=1e-3, atol=2e-5).mean()
        assert close > 0.95

    def test_pallas_kernel_matches_scan(self, rng):
        import jax.numpy as jnp

        from image_to_pointcloud_tpu.ops.outlier import grid_knn_mean_distances
        from image_to_pointcloud_tpu.ops.outlier_pallas import (
            grid_knn_mean_distances_pallas,
        )

        pts = (rng.random((2, 40, 50, 3)) * 3).astype(np.float32)
        ref = np.stack(
            [np.asarray(grid_knn_mean_distances(jnp.asarray(p), k=20, window=4))
             for p in pts]
        )
        out = np.asarray(
            grid_knn_mean_distances_pallas(
                jnp.asarray(pts), k=20, window=4, tile=(16, 32), interpret=True
            )
        )
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-7)

    def test_pallas_odd_grid_alignment_overhang(self, rng):
        """Grids whose strided width is not a lane multiple (e.g. a
        400x300 upload -> 150x200) must still match the scan oracle:
        the kernel rounds its tile dims up to the (8, 128) hardware
        tiling — Mosaic refuses unaligned DMA slice starts on real
        TPU — and the sentinel overhang must not perturb real centers."""
        import jax.numpy as jnp

        from image_to_pointcloud_tpu.ops.outlier import grid_knn_mean_distances
        from image_to_pointcloud_tpu.ops.outlier_pallas import (
            grid_knn_mean_distances_pallas,
        )

        pts = (rng.random((1, 30, 50, 3)) * 3).astype(np.float32)
        ref = np.asarray(
            grid_knn_mean_distances(jnp.asarray(pts[0]), k=20, window=4)
        )[None]
        # tile larger than the grid: th/tw round up to 32/128 (not 30/50).
        out = np.asarray(
            grid_knn_mean_distances_pallas(
                jnp.asarray(pts), k=20, window=4, tile=(128, 256),
                interpret=True,
            )
        )
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-7)


class TestOrderStatistics:
    """Sort-free exact order statistics (bit-bisection, ops/depthnorm)."""


    def test_matches_sort_exactly(self, rng):
        import jax.numpy as jnp

        from image_to_pointcloud_tpu.ops.depthnorm import order_statistics

        x = rng.normal(0, 50, 4097).astype(np.float32)
        x[:10] = 0.0
        x[10:20] = -0.0
        x[20] = np.inf
        ks = np.array([0, 1, 100, 2048, 4095, 4096], np.int32)
        got = np.asarray(order_statistics(jnp.asarray(x), jnp.asarray(ks)))
        np.testing.assert_array_equal(got, np.sort(x)[ks])

    def test_traced_ranks(self, rng):
        """Ranks may be data-dependent (the median path uses nfin)."""
        import jax
        import jax.numpy as jnp

        from image_to_pointcloud_tpu.ops.depthnorm import order_statistics

        x = jnp.asarray(rng.normal(0, 1, 1000).astype(np.float32))

        @jax.jit
        def med(x):
            n = jnp.sum((x > -10).astype(jnp.int32))  # traced count
            ks = jnp.stack([(n - 1) // 2, n // 2])
            s = order_statistics(x, ks)
            return 0.5 * (s[0] + s[1])

        assert abs(float(med(x)) - float(np.median(np.asarray(x)))) < 1e-7


class TestVoxelKeyOverflow:
    def test_tiny_voxels_on_wide_cloud(self, rng):
        """Per-axis grid dims whose product overflows int32 must still
        group correctly (lexicographic 3-key grouping, not a combined
        linear key). 8 distant clusters -> 8 voxels, never merged."""
        from image_to_pointcloud_tpu.ops.voxel import voxel_downsample

        centers = np.array(
            [[x, y, z] for x in (0, 2000.0) for y in (0, 2000.0)
             for z in (0, 2000.0)], np.float32)
        pts = np.repeat(centers, 4, axis=0)
        pts += rng.normal(0, 1e-5, pts.shape).astype(np.float32)
        cols = np.tile(np.arange(8, dtype=np.float32)[:, None], (1, 3))
        cols = np.repeat(cols, 4, axis=0)
        # voxel 1e-3 over extent 2000 -> dims ~2e6 per axis; 8e18 cells.
        import jax.numpy as jnp

        op, oc, ovalid, count = voxel_downsample(
            jnp.asarray(pts), jnp.asarray(cols), 1e-3
        )
        assert int(count) == 8
        got = np.sort(np.asarray(oc)[np.asarray(ovalid)][:, 0])
        np.testing.assert_allclose(got, np.arange(8), atol=1e-5)
