"""Tests for the native C++ module (quadric decimation, XYZ formatting)."""

import numpy as np
import pytest

from image_to_pointcloud_tpu import native


@pytest.fixture(scope="module", autouse=True)
def require_native():
    if not native.available():
        pytest.skip("native toolchain unavailable")


class TestDecimate:
    def _grid_mesh(self, n=30):
        """A simple n x n heightfield mesh."""
        xs, ys = np.meshgrid(np.linspace(0, 1, n), np.linspace(0, 1, n))
        z = np.sin(xs * 3) * np.cos(ys * 2) * 0.2
        verts = np.stack([xs.ravel(), ys.ravel(), z.ravel()], 1)
        idx = np.arange(n * n).reshape(n, n)
        a, b = idx[:-1, :-1].ravel(), idx[:-1, 1:].ravel()
        c, d = idx[1:, :-1].ravel(), idx[1:, 1:].ravel()
        faces = np.concatenate(
            [np.stack([a, c, b], 1), np.stack([b, c, d], 1)], 0
        ).astype(np.int32)
        cols = np.full_like(verts, 128.0)
        return verts, cols, faces

    def test_reduces_to_target(self):
        verts, cols, faces = self._grid_mesh(30)
        out = native.decimate_mesh(verts, cols, faces, 400)
        assert out is not None
        dv, dc, df = out
        assert len(df) <= 400
        assert len(df) > 100  # not destroyed
        assert df.max() < len(dv)
        assert np.isfinite(dv).all()

    def test_geometry_preserved(self):
        verts, cols, faces = self._grid_mesh(24)
        dv, dc, df = native.decimate_mesh(verts, cols, faces, 300)
        # Decimated surface stays inside (slightly padded) original bounds.
        lo, hi = verts.min(0) - 1e-6, verts.max(0) + 1e-6
        assert (dv >= lo).all() and (dv <= hi).all()
        # Surface error: decimated vertices stay close to the heightfield.
        zs = np.sin(dv[:, 0] * 3) * np.cos(dv[:, 1] * 2) * 0.2
        assert np.abs(dv[:, 2] - zs).mean() < 0.02

    def test_noop_when_under_target(self):
        verts, cols, faces = self._grid_mesh(6)
        dv, dc, df = native.decimate_mesh(verts, cols, faces, 10_000)
        assert len(df) == len(faces)


class TestFormatXYZ:
    def test_matches_python_fallback(self, rng):
        pts = rng.normal(0, 5, (200, 3))
        cols = rng.integers(0, 256, (200, 3)).astype(np.int32)
        out = native.format_xyz(pts, cols)
        ref = b"".join(
            b"%.6f %.6f %.6f %d %d %d\n"
            % (pts[i, 0], pts[i, 1], pts[i, 2], cols[i, 0], cols[i, 1], cols[i, 2])
            for i in range(200)
        )
        assert out == ref


class TestReconstruct:
    def test_matches_numpy_path(self, rng):
        hh, ww, step = 30, 40, 2
        h, w = hh * step, ww * step
        d16 = rng.integers(0, 65536, (hh, ww)).astype(np.uint16)
        keep = rng.random((hh, ww)) > 0.3
        img = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
        rgb = img[::step, ::step, :]
        f = max(h, w) * 1.2
        out = native.reconstruct_points(
            d16, keep, rgb, step=step, depth_scale=10.0, f=f,
            cx=w / 2, cy=h / 2,
        )
        assert out is not None
        pts, cols = out

        # BIT-identical to the canonical host implementation: a box with
        # g++ and one on the numpy fallback must export the same bytes
        # (depth16_to_xyz's documented contract).
        from image_to_pointcloud_tpu.pipeline.graph import depth16_to_xyz

        xyz = depth16_to_xyz(
            d16[None], np.asarray([10.0], np.float32),
            step=step, f=f, cx=w / 2, cy=h / 2,
        )[0].reshape(3, hh, ww)
        ref = np.stack([xyz[0][keep], xyz[1][keep], xyz[2][keep]], 1)
        np.testing.assert_array_equal(pts, ref)
        np.testing.assert_array_equal(cols, rgb[keep].astype(np.float32))

    def test_denom_4095_matches_numpy_path(self, rng):
        """The 12-bit packed transfer dequantizes with denom=4095; the
        native kernel must stay BIT-identical to depth16_to_xyz for
        that contract too (both multiply by the caller-computed f32
        reciprocal)."""
        hh, ww, step = 17, 23, 2
        h, w = hh * step, ww * step
        d12 = rng.integers(0, 4096, (hh, ww)).astype(np.uint16)
        keep = rng.random((hh, ww)) > 0.3
        rgb = rng.integers(0, 256, (hh, ww, 3)).astype(np.uint8)
        f = max(h, w) * 1.2
        out = native.reconstruct_points(
            d12, keep, rgb, step=step, depth_scale=10.0, f=f,
            cx=w / 2, cy=h / 2, denom=4095.0,
        )
        assert out is not None
        pts, _ = out
        from image_to_pointcloud_tpu.pipeline.graph import depth16_to_xyz

        xyz = depth16_to_xyz(
            d12[None], np.asarray([10.0], np.float32),
            step=step, f=f, cx=w / 2, cy=h / 2, denom=4095.0,
        )[0].reshape(3, hh, ww)
        ref = np.stack([xyz[0][keep], xyz[1][keep], xyz[2][keep]], 1)
        np.testing.assert_array_equal(pts, ref)

    def test_ycc420_matches_numpy_path(self, rng):
        """The hybrid-JPEG 4:2:0 color reconstruct must be BIT-identical
        to the numpy fallback (pipeline.graph.ycc420_to_rgb_f32): same
        inverse constants, same f32 op order, ties-to-even both sides —
        a g++ host and a fallback host export the same PLY/JSON bytes."""
        hh, ww, step = 31, 41, 2  # odd dims: chroma ceil-div coverage
        h, w = 300, 400
        d16 = rng.integers(0, 65536, (hh, ww)).astype(np.uint16)
        keep = rng.random((hh, ww)) > 0.3
        y = rng.integers(0, 256, (hh, ww)).astype(np.uint8)
        cb = rng.integers(0, 256, (-(-hh // 2), -(-ww // 2))).astype(np.uint8)
        cr = rng.integers(0, 256, cb.shape).astype(np.uint8)
        f = max(h, w) * 1.2
        out = native.reconstruct_points_ycc420(
            d16, keep, y, cb, cr, step=step, depth_scale=10.0, f=f,
            cx=w / 2, cy=h / 2,
        )
        assert out is not None
        pts, cols = out
        from image_to_pointcloud_tpu.pipeline.graph import (
            depth16_to_xyz,
            ycc420_to_rgb_f32,
        )

        xyz = depth16_to_xyz(
            d16[None], np.asarray([10.0], np.float32),
            step=step, f=f, cx=w / 2, cy=h / 2,
        )[0].reshape(3, hh, ww)
        ref = np.stack([xyz[0][keep], xyz[1][keep], xyz[2][keep]], 1)
        np.testing.assert_array_equal(pts, ref)
        rgb = ycc420_to_rgb_f32(y[None], cb[None], cr[None])[0]
        np.testing.assert_array_equal(cols, rgb[keep].astype(np.float32))

    def test_low_keep_rate_returns_compact_copies(self, rng):
        """Sparse keeps must not pin the full-grid base buffers (results
        are retained by the job registry)."""
        hh, ww = 64, 64
        d16 = rng.integers(0, 65536, (hh, ww)).astype(np.uint16)
        keep = np.zeros((hh, ww), bool)
        keep[::16, ::16] = True
        rgb = rng.integers(0, 256, (hh, ww, 3)).astype(np.uint8)
        out = native.reconstruct_points(
            d16, keep, rgb, step=1, depth_scale=10.0, f=80.0,
            cx=32.0, cy=32.0,
        )
        assert out is not None
        pts, cols = out
        assert pts.base is None and cols.base is None  # owned, not views


class TestSurfaceReconstruct:
    """Poisson-class implicit reconstruction (native/src/surface.cpp) —
    the framework's equivalent of the reference's Open3D Poisson/BPA
    (backend/app.py:283-305)."""

    def _sphere(self, n=3000, seed=0):
        r = np.random.default_rng(seed)
        v = r.normal(size=(n, 3))
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        cols = ((v * 0.5 + 0.5) * 255).astype(np.uint8)
        return v.astype(np.float32), cols

    def test_sphere_geometry_and_winding(self):
        from image_to_pointcloud_tpu import native

        if not native.available():
            pytest.skip("native toolchain unavailable")
        pts, cols = self._sphere()
        out = native.surface_reconstruct(pts, cols, depth=5, orient="centroid")
        assert out is not None
        verts, vcols, faces = out
        assert len(faces) > 100
        radii = np.linalg.norm(verts, axis=1)
        # Surface reproduces the unit sphere to a few % of the radius.
        assert abs(radii.mean() - 1.0) < 0.05
        assert radii.std() < 0.05
        # Consistent outward winding everywhere.
        a, b, c = verts[faces[:, 0]], verts[faces[:, 1]], verts[faces[:, 2]]
        nrm = np.cross(b - a, c - a)
        ctr = (a + b + c) / 3
        outward = (nrm * ctr).sum(1) > 0
        assert outward.mean() > 0.99
        # Colors transferred from nearest points (position-correlated).
        cc = vcols[:, 0].astype(np.float32) / 255 * 2 - 1
        assert np.corrcoef(cc, verts[:, 0] / radii)[0, 1] > 0.95

    def test_face_budget_decimation(self):
        from image_to_pointcloud_tpu.pipeline.meshing import reconstruct_cloud

        pts, cols = self._sphere()
        out = reconstruct_cloud(
            pts, cols.astype(np.float32), depth=5, orient="centroid",
            target_faces=2000,
        )
        if out is None:
            pytest.skip("native toolchain unavailable")
        verts, vcols, faces = out
        assert len(faces) <= 2000
        radii = np.linalg.norm(verts, axis=1)
        assert abs(radii.mean() - 1.0) < 0.08

    def test_degenerate_returns_none(self):
        from image_to_pointcloud_tpu import native

        if not native.available():
            pytest.skip("native toolchain unavailable")
        assert native.surface_reconstruct(
            np.zeros((4, 3), np.float32), None
        ) is None


def _fib_sphere(n):
    """Evenly sampled unit sphere (Fibonacci lattice)."""
    idx = np.arange(n) + 0.5
    phi = np.arccos(1 - 2 * idx / n)
    theta = np.pi * (1 + 5**0.5) * idx
    pts = np.stack(
        [np.sin(phi) * np.cos(theta), np.sin(phi) * np.sin(theta), np.cos(phi)],
        1,
    ).astype(np.float32)
    cols = ((pts * 0.5 + 0.5) * 255).astype(np.uint8)
    return pts, cols


class TestMeanNNDistance:
    """Radius basis for BPA (reference backend/app.py:288-290)."""

    def test_matches_brute_force(self, rng):
        pts = rng.normal(size=(300, 3)).astype(np.float32)
        d = native.mean_nn_distance(pts)
        assert d is not None
        diff = pts[:, None, :] - pts[None, :, :]
        dist = np.linalg.norm(diff, axis=2)
        np.fill_diagonal(dist, np.inf)
        expect = dist.min(axis=1).mean()
        assert abs(d - expect) / expect < 1e-4

    def test_degenerate(self):
        assert native.mean_nn_distance(np.zeros((1, 3), np.float32)) is None
        assert native.mean_nn_distance(np.zeros((50, 3), np.float32)) is None


class TestBallPivoting:
    """Real BPA (native/src/bpa.cpp) — the reference's method="bpa"
    branch (Open3D create_from_point_cloud_ball_pivoting with radii
    mean-NN x {1.5, 2, 2.5}, backend/app.py:285-294)."""

    def test_sphere_watertight_manifold(self):
        pts, _ = _fib_sphere(2000)
        faces = native.bpa_reconstruct(pts, orient="centroid")
        assert faces is not None and len(faces) > 0
        # Every vertex meshed; faces index the input points.
        assert faces.max() < len(pts)
        assert len(np.unique(faces)) == len(pts)
        # Watertight 2-manifold: every edge in exactly 2 triangles, and
        # Euler characteristic V - E + F == 2 (sphere topology).
        e = np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]])
        e = np.sort(e, 1)
        eu, cnt = np.unique(e, axis=0, return_counts=True)
        assert (cnt == 2).all()
        assert len(pts) - len(eu) + len(faces) == 2
        # Consistent outward winding.
        tri = pts[faces]
        nrm = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
        ctr = tri.mean(1)
        assert ((nrm * ctr).sum(1) > 0).all()

    def test_open_grid_sheet_exact_triangulation(self):
        # A strided depth-grid sheet: BPA must recover exactly two
        # triangles per grid cell with the grid perimeter as the only
        # boundary edges.
        g = 40
        gx, gy = np.meshgrid(np.linspace(-1, 1, g), np.linspace(-1, 1, g))
        gz = 0.1 * np.sin(3 * gx) * np.cos(3 * gy) + 3.0
        pts = np.stack([gx.ravel(), gy.ravel(), gz.ravel()], 1).astype(np.float32)
        faces = native.bpa_reconstruct(pts, orient="camera")
        assert faces is not None
        assert len(faces) == 2 * (g - 1) * (g - 1)
        e = np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]])
        e = np.sort(e, 1)
        eu, cnt = np.unique(e, axis=0, return_counts=True)
        assert (cnt <= 2).all()
        assert (cnt == 1).sum() == 4 * (g - 1)

    def test_explicit_radii_and_reconstruct_cloud(self):
        pts, cols = _fib_sphere(1500)
        avg = native.mean_nn_distance(pts)
        faces = native.bpa_reconstruct(pts, [avg * 1.5, avg * 2.0, avg * 2.5])
        assert faces is not None and len(faces) > 1000
        from image_to_pointcloud_tpu.pipeline.meshing import reconstruct_cloud

        out = reconstruct_cloud(
            pts, cols.astype(np.float32), method="bpa", orient="centroid"
        )
        assert out is not None
        verts, vcols, f2 = out
        # BPA keeps sample positions: every vertex is an input point.
        assert len(verts) == len(pts)
        assert np.allclose(np.linalg.norm(verts, axis=1), 1.0, atol=1e-5)


class TestPoissonReconstruct:
    """Real Poisson-equation reconstruction (native/src/poisson.cpp) —
    the reference's default meshing (Open3D
    create_from_point_cloud_poisson(depth=8) + bbox crop,
    backend/app.py:297-301)."""

    def test_sphere_surface_accuracy(self):
        pts, cols = _fib_sphere(4000)
        out = native.poisson_reconstruct(pts, cols, depth=6, orient="centroid")
        assert out is not None
        verts, vcols, faces = out
        assert len(faces) > 1000
        radii = np.linalg.norm(verts, axis=1)
        # The multigrid Poisson solve nails the surface far tighter than
        # the SDF fallback: mean radius to 1%, spread under 1%.
        assert abs(radii.mean() - 1.0) < 0.01
        assert radii.std() < 0.01
        # Outward winding everywhere.
        a, b, c = verts[faces[:, 0]], verts[faces[:, 1]], verts[faces[:, 2]]
        nrm = np.cross(b - a, c - a)
        assert (((nrm * ((a + b + c) / 3)).sum(1)) > 0).mean() > 0.99
        # Colors transfer from nearest samples.
        cc = vcols[:, 0].astype(np.float32) / 255 * 2 - 1
        assert np.corrcoef(cc, verts[:, 0] / radii)[0, 1] > 0.95

    def test_open_sheet_and_bbox_crop(self):
        g = 60
        gx, gy = np.meshgrid(np.linspace(-1, 1, g), np.linspace(-1, 1, g))
        gz = 0.15 * np.sin(3 * gx) * np.cos(3 * gy) + 3.0
        pts = np.stack([gx.ravel(), gy.ravel(), gz.ravel()], 1).astype(np.float32)
        out = native.poisson_reconstruct(pts, None, depth=6, orient="camera")
        assert out is not None
        verts, _, faces = out
        assert len(faces) > 500
        # Crop keeps the mesh inside the sample bbox (+ one grid cell).
        pad = 2 * 2.4 / 64  # domain side / res, x2 cells of slack
        assert verts[:, 0].min() > -1 - pad and verts[:, 0].max() < 1 + pad
        assert verts[:, 2].min() > pts[:, 2].min() - pad
        assert verts[:, 2].max() < pts[:, 2].max() + pad
        # Surface tracks the analytic sheet in the interior.
        inb = (np.abs(verts[:, 0]) < 0.85) & (np.abs(verts[:, 1]) < 0.85)
        zpred = 0.15 * np.sin(3 * verts[:, 0]) * np.cos(3 * verts[:, 1]) + 3.0
        err = np.abs(verts[:, 2] - zpred)[inb]
        assert err.mean() < 0.01

    def test_reconstruct_cloud_poisson_default(self):
        pts, cols = _fib_sphere(2000)
        from image_to_pointcloud_tpu.pipeline.meshing import reconstruct_cloud

        out = reconstruct_cloud(
            pts, cols.astype(np.float32), depth=6, orient="centroid",
            target_faces=3000,
        )
        assert out is not None
        verts, vcols, faces = out
        assert len(faces) <= 3000
        radii = np.linalg.norm(verts, axis=1)
        assert abs(radii.mean() - 1.0) < 0.03

    def test_degenerate_returns_none(self):
        assert native.poisson_reconstruct(np.zeros((4, 3), np.float32), None) is None


class TestSerialize:
    """native/src/serialize.cpp vs the pure-Python serialization paths
    (reference result contract: backend/app.py:504-505, 545-559)."""

    def test_json_triplets_matches_tolist(self, rng):
        import json

        if not native.available():
            pytest.skip("native toolchain unavailable")
        pts = rng.normal(0, 5, (500, 3)).astype(np.float32)
        # include exact integers, tiny and huge magnitudes
        pts[0] = [0.0, -1.0, 255.0]
        pts[1] = [1e-30, -1e30, 3.5]
        frag = native.json_f32_triplets(pts)
        assert json.loads(frag) == pts.astype(float).tolist()

    def test_json_i32_list_matches_tolist(self):
        import json

        if not native.available():
            pytest.skip("native toolchain unavailable")
        v = np.arange(-7, 99999, 13, dtype=np.int32)
        assert json.loads(native.json_i32_list(v)) == v.tolist()

    def test_json_f32_list_matches_tolist(self, rng):
        import json

        if not native.available():
            pytest.skip("native toolchain unavailable")
        v = rng.normal(0, 100, (1000,)).astype(np.float32)
        assert json.loads(native.json_f32_list(v)) == v.astype(float).tolist()

    def test_ply_pack_matches_numpy_bytes(self, rng):
        from image_to_pointcloud_tpu.io.ply import ply_points_bytes

        if not native.available():
            pytest.skip("native toolchain unavailable")
        pts = rng.normal(0, 5, (777, 3)).astype(np.float32)
        cols = rng.uniform(-3, 258, (777, 3)).astype(np.float32)  # clamps
        native_bytes = ply_points_bytes(pts, cols)
        numpy_bytes = ply_points_bytes(pts.astype(np.float64), cols)
        assert native_bytes == numpy_bytes

    def test_ply_pack_no_colors(self, rng):
        from image_to_pointcloud_tpu.io.ply import ply_points_bytes

        if not native.available():
            pytest.skip("native toolchain unavailable")
        pts = rng.normal(0, 5, (10, 3)).astype(np.float32)
        assert ply_points_bytes(pts, None) == ply_points_bytes(
            pts.astype(np.float64), None
        )


class TestRawJSON:
    def test_splice_nested_fragments(self):
        import json

        from image_to_pointcloud_tpu.serve.rawjson import RawJSON, dumps_raw

        weird = "\\u0000RAW0" + chr(0)  # adversarial content, must survive
        obj = {
            "a": [1, RawJSON(b"[1.5,2]"), {"b": RawJSON(b'{"x":1}')}],
            "weird": weird,
        }
        assert json.loads(dumps_raw(obj)) == {
            "a": [1, [1.5, 2], {"b": {"x": 1}}],
            "weird": weird,
        }

    def test_no_fragments_is_plain_json(self):
        import json

        from image_to_pointcloud_tpu.serve.rawjson import dumps_raw

        assert json.loads(dumps_raw({"x": [1, 2.5]})) == {"x": [1, 2.5]}

    def test_unserializable_still_raises(self):
        from image_to_pointcloud_tpu.serve.rawjson import dumps_raw

        with pytest.raises(TypeError):
            dumps_raw({"x": object()})


def test_png_palette_data_url_decodes_exact(rng):
    import base64
    import io

    from PIL import Image

    from image_to_pointcloud_tpu.io.image import png_data_url_palette
    from image_to_pointcloud_tpu.ops.colormap import PLASMA_RGB

    gray = rng.integers(0, 256, (37, 53)).astype(np.uint8)
    url = png_data_url_palette(gray, PLASMA_RGB)
    prefix = "data:image/png;base64,"
    assert url.startswith(prefix)
    png = base64.b64decode(url[len(prefix):])
    back = np.asarray(Image.open(io.BytesIO(png)).convert("RGB"))
    np.testing.assert_array_equal(back, PLASMA_RGB[gray])


def test_json_i32_triplets_matches_tolist(rng):
    import json

    if not native.available():
        pytest.skip("native toolchain unavailable")
    v = rng.integers(-50, 70000, (321, 3)).astype(np.int32)
    assert json.loads(native.json_i32_triplets(v)) == v.tolist()
    assert json.loads(native.json_i32_triplets(np.zeros((0, 3), np.int32))) == []


class TestRawJSONAdversarial:
    """Regression: user-controlled strings must never break the splice
    (found in review — an escaped quote + NUL+marker sequence inside a
    request param crashed terminal_body before the per-call nonce)."""

    def test_escaped_quote_nul_marker_content(self):
        import json

        from image_to_pointcloud_tpu.serve.rawjson import RawJSON, dumps_raw

        evil = 'x"' + chr(0) + 'RAW0' + chr(0) + '"y'
        obj = {
            "coordinateSystem": evil,
            "preview": {"points": RawJSON(b"[[1.5,2.0,3.0]]")},
        }
        assert json.loads(dumps_raw(obj)) == {
            "coordinateSystem": evil,
            "preview": {"points": [[1.5, 2.0, 3.0]]},
        }

    def test_exact_placeholder_imitation(self):
        import json

        from image_to_pointcloud_tpu.serve.rawjson import RawJSON, dumps_raw

        # A value that is literally NUL+marker+NUL — the pre-nonce
        # scheme could not distinguish this from a real placeholder.
        for fake_idx in (0, 1, 99):
            evil = chr(0) + f"RAW{fake_idx}" + chr(0)
            obj = {"a": evil, "b": RawJSON(b"[7]"), "c": [evil, evil]}
            assert json.loads(dumps_raw(obj)) == {
                "a": evil, "b": [7], "c": [evil, evil],
            }

    def test_many_fragments_with_hostile_neighbors(self):
        import json

        from image_to_pointcloud_tpu.serve.rawjson import RawJSON, dumps_raw

        evil = "\\" + '"' + chr(0)
        obj = {
            "x": [RawJSON(b"[1]"), evil, RawJSON(b"[2]"), evil, RawJSON(b"[3]")]
        }
        assert json.loads(dumps_raw(obj)) == {"x": [[1], evil, [2], evil, [3]]}


class TestServingMeshMethod:
    """--mesh-method poisson/bpa: the v1 mesh_ply export runs the
    reference's actual reconstruction algorithms (backend/app.py:283-305)
    instead of grid triangulation."""

    def _service(self, tmp_path, method):
        from image_to_pointcloud_tpu.serve.app_v1 import V1Service
        from image_to_pointcloud_tpu.serve.models import ModelManager

        return V1Service(
            output_dir=str(tmp_path),
            models=ModelManager(use_bf16=False, use_flash_attention=False),
            mesh_method=method,
            durable_jobs=False,
        )

    @pytest.mark.parametrize("method", ["poisson", "bpa"])
    def test_export_mesh_point_based(self, tmp_path, method):
        from image_to_pointcloud_tpu import native

        if not native.available():
            pytest.skip("native lib not built")
        svc = self._service(tmp_path, method)
        pts, cols = _fib_sphere(1500)
        req = {"output_format": "mesh_ply"}
        # Point-based methods must not require the packed grid (res=None).
        filepath, preview = svc._export_mesh(
            str(tmp_path / "job"), req, None, pts, cols
        )
        from image_to_pointcloud_tpu.io import read_ply

        parsed = read_ply(open(filepath, "rb").read())
        assert len(parsed["face"]) > 0
        # Preview fields are native RawJSON fragments (serve/rawjson.py).
        faces = preview["faces"].parsed()
        verts = preview["vertices"].parsed()
        assert preview and len(faces) % 3 == 0
        assert len(verts) > 0
        # Vertices stay near the unit sphere (sane reconstruction).
        v = np.asarray(parsed["vertex"][["x", "y", "z"]].tolist(), np.float64)
        r = np.linalg.norm(v, axis=1)
        assert 0.5 < float(np.median(r)) < 1.5


def _jpeg_bytes(img, **kw):
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(img).save(buf, "JPEG", **kw)
    return buf.getvalue()


def _idct_plane(coeffs, qtable):
    """NumPy oracle: dequant + float 8x8 IDCT, one component plane."""
    bh, bw, _ = coeffs.shape
    deq = (coeffs.astype(np.float64) * qtable.astype(np.float64)).reshape(
        bh, bw, 8, 8
    )
    k = np.arange(8)
    basis = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16)
    a = np.full(8, 0.5)
    a[0] = np.sqrt(1 / 8)
    m = a[:, None] * basis  # m[u, x]
    # out[v,x] = sum_u sum_w m[u,v] deq[u,w] m[w,x]
    px = np.einsum("uv,bcuw,wx->bcvx", m, deq, m, optimize=True)
    return px.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8) + 128


class TestJpegCoefficients:
    """Host half of the hybrid JPEG decode (native/src/jpegdec.cpp):
    entropy-decode to quantized DCT coefficients; device math lives in
    ops/jpeg.py. Replaces the reference's full host decode slot
    (backend/app.py:433 cv2.imdecode)."""

    def _smooth_rgb(self, w=97, h=131):
        x = np.linspace(0, 4 * np.pi, w)
        y = np.linspace(0, 3 * np.pi, h)
        return (
            np.stack(
                [
                    127 + 120 * np.sin(x)[None, :] * np.cos(y)[:, None],
                    127 + 100 * np.cos(2 * x)[None, :] + 0 * y[:, None],
                    127 + 80 * np.sin(y)[:, None] + 0 * x[None, :],
                ],
                -1,
            )
            .clip(0, 255)
            .astype(np.uint8)
        )

    def test_444_reconstruction_matches_pil(self):
        """4:4:4 (no chroma upsample in the loop): our float IDCT must
        land within libjpeg's integer-IDCT tolerance of PIL's pixels."""
        import io

        from PIL import Image

        data = _jpeg_bytes(self._smooth_rgb(), quality=92, subsampling=0)
        r = native.jpeg_coefficients(data)
        assert r is not None and r["ncomp"] == 3
        assert r["h"] == [1, 1, 1] and r["v"] == [1, 1, 1]
        planes = [
            _idct_plane(r["coeffs"][c], r["qtables"][c])[
                : r["height"], : r["width"]
            ]
            for c in range(3)
        ]
        ycc = np.stack(planes, -1)
        rgb = np.stack(
            [
                ycc[..., 0] + 1.402 * (ycc[..., 2] - 128),
                ycc[..., 0]
                - 0.344136 * (ycc[..., 1] - 128)
                - 0.714136 * (ycc[..., 2] - 128),
                ycc[..., 0] + 1.772 * (ycc[..., 1] - 128),
            ],
            -1,
        ).clip(0, 255)
        ref = np.asarray(
            Image.open(io.BytesIO(data)).convert("RGB"), np.float64
        )
        assert np.abs(rgb - ref).max() < 3.0  # integer-IDCT headroom

    def test_420_shapes_and_sampling(self):
        data = _jpeg_bytes(self._smooth_rgb(), quality=90)  # PIL default 4:2:0
        r = native.jpeg_coefficients(data)
        assert r is not None
        assert r["h"] == [2, 1, 1] and r["v"] == [2, 1, 1]
        by, bx, _ = r["coeffs"][0].shape
        assert by * 8 >= r["height"] and bx * 8 >= r["width"]
        cy, cx, _ = r["coeffs"][1].shape
        assert (cy, cx) == (by // 2, bx // 2)

    def test_restart_markers_decode_exact(self):
        """DRI/RSTn streams: predictor reset + byte alignment."""
        import io

        from PIL import Image

        x = np.linspace(0, 4 * np.pi, 80)
        y = np.linspace(0, 3 * np.pi, 64)
        gray = (
            (127 + 120 * np.sin(x)[None, :] * np.cos(y)[:, None])
            .clip(0, 255)
            .astype(np.uint8)
        )
        data = _jpeg_bytes(
            np.stack([gray] * 3, -1),
            quality=92,
            subsampling=0,
            restart_marker_rows=1,
        )
        assert any(
            data[i] == 0xFF and 0xD0 <= data[i + 1] <= 0xD7
            for i in range(len(data) - 1)
        ), "encoder produced no restart markers"
        r = native.jpeg_coefficients(data)
        assert r is not None
        yplane = _idct_plane(r["coeffs"][0], r["qtables"][0])[
            : r["height"], : r["width"]
        ]
        ref = np.asarray(
            Image.open(io.BytesIO(data)).convert("RGB"), np.float64
        )[..., 0]
        assert np.abs(yplane.clip(0, 255) - ref).max() < 3.0

    def test_grayscale(self):
        img = self._smooth_rgb()[..., 0]
        r = native.jpeg_coefficients(_jpeg_bytes(img, quality=85))
        assert r is not None and r["ncomp"] == 1
        assert r["qtables"].shape == (1, 64)

    def test_unsupported_and_garbage_return_none(self):
        img = self._smooth_rgb()
        full = _jpeg_bytes(img, quality=85)
        # Lossless SOF3 (patched from the baseline SOF0 marker) is a
        # frame type the decoder genuinely does not support.
        lossless = bytearray(full)
        sof = full.find(b"\xff\xc0")
        assert sof > 0
        lossless[sof + 1] = 0xC3
        assert native.jpeg_coefficients(bytes(lossless)) is None
        assert native.jpeg_coefficients(b"\x89PNG\r\n\x1a\n" + b"z" * 64) is None
        assert native.jpeg_coefficients(full[:40]) is None  # header cut
        assert native.jpeg_coefficients(full[: len(full) // 2]) is None  # scan cut

    def test_progressive_matches_baseline_coefficients(self):
        # libjpeg quantizes identically for baseline and progressive at
        # the same quality; SOF2 transmission (DC/AC first + refinement
        # scans, EOB runs, non-interleaved AC addressing) must
        # reassemble the exact same coefficient arrays.
        img = self._smooth_rgb()  # 97x131: odd dims, padded != ceil dims
        prog_bytes = _jpeg_bytes(img, quality=85, progressive=True)
        assert b"\xff\xc2" in prog_bytes, "encoder did not emit SOF2"
        base = native.jpeg_coefficients(_jpeg_bytes(img, quality=85))
        prog = native.jpeg_coefficients(prog_bytes)
        assert base is not None and prog is not None
        for c in range(base["ncomp"]):
            np.testing.assert_array_equal(
                base["coeffs"][c], prog["coeffs"][c]
            )
        np.testing.assert_array_equal(base["qtables"], prog["qtables"])

    def test_progressive_pixels_match_pil(self):
        # End-to-end check against libjpeg's own progressive rendering
        # (gray content so the Y plane IS the pixel value).
        import io

        from PIL import Image

        x = np.linspace(0, 4 * np.pi, 90)
        y = np.linspace(0, 3 * np.pi, 61)
        gray = (
            (127 + 120 * np.sin(x)[None, :] * np.cos(y)[:, None])
            .clip(0, 255)
            .astype(np.uint8)
        )
        data = _jpeg_bytes(
            np.stack([gray] * 3, -1), quality=90, subsampling=0,
            progressive=True,
        )
        r = native.jpeg_coefficients(data)
        assert r is not None
        yplane = _idct_plane(r["coeffs"][0], r["qtables"][0])[
            : r["height"], : r["width"]
        ]
        ref = np.asarray(
            Image.open(io.BytesIO(data)).convert("RGB"), np.float64
        )[..., 0]
        assert np.abs(yplane.clip(0, 255) - ref).max() < 3.0

    @staticmethod
    def _inject_dht(data: bytes, counts: list[int]) -> bytes:
        """Insert a crafted DHT (tc=0, th=0) right before the SOS marker,
        overriding the encoder's DC table with attacker-chosen counts."""
        total = sum(counts)
        assert len(counts) == 16 and total <= 256
        seg = (
            b"\xff\xc4"
            + (2 + 17 + total).to_bytes(2, "big")
            + bytes([0x00])  # tc=0 (DC), th=0
            + bytes(counts)
            + bytes(range(total))  # symbol values (arbitrary)
        )
        sos = data.find(b"\xff\xda")
        assert sos > 0
        return data[:sos] + seg + data[sos:]

    def test_noncanonical_dht_rejected(self):
        """Advisor round-2 high finding: counts overflowing the l-bit
        code space (e.g. {255,1}) previously drove the 8-bit LUT build
        out of bounds of lut[256] — a stack-buffer-overflow WRITE
        reachable from attacker-controlled uploads. The table must now
        be rejected as corrupt, never built."""
        full = _jpeg_bytes(self._smooth_rgb(), quality=85)
        # 255 one-bit codes: code space for l=1 holds only 2.
        bad = self._inject_dht(full, [255, 1] + [0] * 14)
        assert native.jpeg_coefficients(bad) is None
        # Overflow first appearing at depth 2: 2 one-bit + 1 two-bit
        # codes (l=2 space is 4, mincode[2]=4 after the shift).
        bad2 = self._inject_dht(full, [2, 1] + [0] * 14)
        assert native.jpeg_coefficients(bad2) is None
        # Deep overflow: fine through l=7, overflows at l=8.
        bad3 = self._inject_dht(
            full, [1, 1, 1, 1, 1, 1, 1, 249] + [0] * 8
        )
        assert native.jpeg_coefficients(bad3) is None

    def test_canonical_full_dht_accepted(self):
        """Boundary case: a table that exactly fills the code space
        (two 1-bit codes) is canonical and must still build — only the
        actual decode may then fail on symbol mismatch, not the DHT."""
        full = _jpeg_bytes(self._smooth_rgb(), quality=85)
        patched = self._inject_dht(full, [2] + [0] * 15)
        # Must not crash; result may be None (decode fails with the
        # wrong table) or a valid dict — both prove the DHT was accepted
        # and handled memory-safely.
        native.jpeg_coefficients(patched)

    def test_dht_fuzz_no_crash(self):
        """Random count vectors (valid or not) must never crash the
        decoder process."""
        rng = np.random.default_rng(7)
        full = _jpeg_bytes(self._smooth_rgb(), quality=85)
        for _ in range(50):
            counts = rng.integers(0, 40, size=16)
            counts = (counts * (256 / max(1, counts.sum()))).astype(int)
            counts = np.minimum(counts, 255)
            if counts.sum() > 256:
                counts[-1] -= counts.sum() - 256
            native.jpeg_coefficients(
                self._inject_dht(full, [int(c) for c in counts])
            )


class TestStalenessGuard:
    """native/__init__.py source-hash stamp: a committed .so can never
    silently serve stale code after a clone (VERDICT r2 item 7)."""

    def _reset(self):
        native._LIB = None

    def test_fresh_load_has_matching_stamp(self):
        self._reset()
        try:
            lib = native._load()
            assert lib is not None
            expected = native._source_hash(
                sorted(native._SRC.glob("*.cpp")),
                sorted(native._SRC.glob("*.h")),
            )
            assert lib.ipc_source_hash().decode() == expected
        finally:
            self._reset()
            native._load()

    def test_tampered_source_without_toolchain_falls_back(
        self, monkeypatch, caplog
    ):
        import subprocess as sp

        self._reset()
        try:
            # Simulate drifted sources (hash differs from the stamp in
            # the committed binary) on a box with no g++.
            monkeypatch.setattr(
                native, "_source_hash", lambda *a: "0" * 64
            )
            monkeypatch.setattr(
                native.subprocess,
                "run",
                lambda *a, **k: (_ for _ in ()).throw(
                    FileNotFoundError("g++ not found")
                ),
            )
            with caplog.at_level("ERROR", logger=native.logger.name):
                assert native._load() is None
            assert any(
                "stale" in r.message for r in caplog.records
            ), "no loud staleness warning was logged"
            assert native._LIB is False  # Python fallbacks engaged
            del sp
        finally:
            monkeypatch.undo()
            self._reset()
            assert native._load() is not None  # healthy state restored


class TestJpegSparsePack:
    """C++ split-sparse pack vs the numpy oracle it replaces
    (ops/jpeg_sparse._block_pack_numpy documents the layout contract)."""

    def _packed_cases(self):
        from image_to_pointcloud_tpu.ops.jpeg import host_truncate_coeffs

        x = np.linspace(0, 4 * np.pi, 160)
        y = np.linspace(0, 3 * np.pi, 120)
        rgb = (
            np.stack(
                [
                    127 + 110 * np.sin(x)[None, :] * np.cos(y)[:, None],
                    127 + 90 * np.cos(2 * x)[None, :] + 0 * y[:, None],
                    127 + 70 * np.sin(y)[:, None] + 0 * x[None, :],
                ],
                -1,
            )
            .clip(0, 255)
            .astype(np.uint8)
        )
        r = native.jpeg_coefficients(_jpeg_bytes(rgb, quality=88))
        assert r is not None
        cases = [
            [host_truncate_coeffs(c, k) for c in r["coeffs"]]
            for k in (8, 4, 1)
        ]
        rng = np.random.default_rng(7)
        wide = rng.integers(-400, 400, (5, 7, 8, 8)).astype(np.int16)
        wide[rng.random(wide.shape) > 0.2] = 0  # dense-ish, many exceptions
        cases.append([wide])
        cases.append([np.zeros((3, 3, 8, 8), np.int16)])  # no AC at all
        return cases

    def test_matches_numpy_oracle(self):
        from image_to_pointcloud_tpu.ops.jpeg_sparse import _block_pack_numpy

        for i, coeffs in enumerate(self._packed_cases()):
            ref = _block_pack_numpy(coeffs)
            got = native.jpeg_sparse_pack(coeffs)
            assert got is not None
            for j, (r, g) in enumerate(zip(ref, got)):
                assert g.dtype == r.dtype, (i, j)
                assert np.array_equal(g, r), (i, j)

    def test_block_pack_dispatches_native(self):
        """block_pack must produce the identical tuple regardless of
        which implementation serves it."""
        from image_to_pointcloud_tpu.ops.jpeg_sparse import (
            _block_pack_numpy,
            block_pack,
        )

        coeffs = self._packed_cases()[0]
        for r, g in zip(_block_pack_numpy(coeffs), block_pack(coeffs)):
            assert np.array_equal(g, r)


class TestVoxelDownsample:
    """native/src/voxel.cpp vs the XLA kernel (ops/voxel.py, itself
    oracle-tested against the Open3D voxel_down_sample definition):
    same grid rule (origin half a voxel below min bound), same
    (z, y, x)-lexicographic emission order, averaged values equal to
    float tolerance."""

    def _check(self, pts, cols, voxel):
        from image_to_pointcloud_tpu.ops import voxel_downsample as xla_voxel

        if not native.available():
            pytest.skip("native toolchain unavailable")
        got = native.voxel_downsample(pts, cols, voxel)
        assert got is not None
        vp, vc, _, cnt = xla_voxel(pts, cols, voxel)
        cnt = int(cnt)
        assert len(got[0]) == cnt
        np.testing.assert_allclose(got[0], np.asarray(vp[:cnt]), atol=1e-5)
        np.testing.assert_allclose(got[1], np.asarray(vc[:cnt]), atol=1e-4)

    def test_random_cloud_matches_xla(self, rng):
        pts = rng.normal(0, 3.0, (2000, 3)).astype(np.float32)
        cols = rng.uniform(0, 255, (2000, 3)).astype(np.float32)
        self._check(pts, cols, 0.7)

    def test_dense_duplicates_average(self, rng):
        # Many points per voxel, including exact duplicates.
        base = rng.normal(0, 1.0, (50, 3)).astype(np.float32)
        pts = np.repeat(base, 20, axis=0)
        pts += rng.normal(0, 0.01, pts.shape).astype(np.float32)
        cols = rng.uniform(0, 255, (len(pts), 3)).astype(np.float32)
        self._check(pts, cols, 0.5)

    def test_negative_coords_and_tiny_voxel(self, rng):
        pts = (rng.uniform(-40, -10, (500, 3))).astype(np.float32)
        cols = rng.uniform(0, 255, (500, 3)).astype(np.float32)
        self._check(pts, cols, 0.05)

    def test_single_point_and_empty(self):
        if not native.available():
            pytest.skip("native toolchain unavailable")
        one = np.asarray([[1.0, 2.0, 3.0]], np.float32)
        c = np.asarray([[9.0, 8.0, 7.0]], np.float32)
        got = native.voxel_downsample(one, c, 0.5)
        np.testing.assert_allclose(got[0], one)
        np.testing.assert_allclose(got[1], c)
        empty = native.voxel_downsample(
            np.empty((0, 3), np.float32), np.empty((0, 3), np.float32), 0.5
        )
        assert empty[0].shape == (0, 3)
