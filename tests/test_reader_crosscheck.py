"""Cross-check every exporter against the independent spec-derived
readers (tests/independent_readers.py).

The byte-layout claims in PARITY.md ("matches laspy's LAS 1.2 pf2
output", "Open3D binary PLY layout", "Three.js-loadable GLB") were
previously backed only by readers co-located with the writers. These
tests round-trip the writers through a second implementation written
from the spec text, with validation on (header invariants, index
bounds, alignment, exact body sizes) — a writer bug mirrored into its
own reader cannot pass here. Reference call sites reproduced:
backend/app.py:343-377 (laspy LAS), backend/app.py:329-341 (Open3D
PLY), backend/app.py:379-389 (XYZ), spar3d_processor.py:248-253 (GLB).
"""

import numpy as np
import pytest

from image_to_pointcloud_tpu import io as pcio

from independent_readers import (
    FormatError,
    read_glb,
    read_las12_pf2,
    read_ply,
    read_xyz,
)


class TestLASCrossCheck:
    def test_full_roundtrip(self, rng):
        pts = rng.normal(0, 10, (777, 3)).astype(np.float32)
        cols = rng.integers(0, 256, (777, 3)).astype(np.float32)
        out = read_las12_pf2(pcio.las_bytes(pts, cols))
        h = out["header"]
        assert h["num_points"] == 777
        assert (h["x_scale"], h["y_scale"], h["z_scale"]) == (0.01,) * 3
        # offsets = per-axis minima (backend/app.py:351-354)
        np.testing.assert_allclose(
            [h["x_offset"], h["y_offset"], h["z_offset"]],
            pts.min(axis=0), atol=1e-6,
        )
        np.testing.assert_allclose(out["points"], pts, atol=0.005 + 1e-6)
        np.testing.assert_array_equal(
            out["rgb16"], np.clip(cols, 0, 255).astype(np.uint16) * 256
        )
        # Fields the reference leaves at laspy defaults must be zero.
        for f in ("intensity", "bitfield", "classification",
                  "scan_angle", "user_data", "point_source_id"):
            assert not out[f].any(), f

    def test_gray_fallback(self, rng):
        out = read_las12_pf2(pcio.las_bytes(rng.normal(0, 1, (5, 3)), None))
        np.testing.assert_array_equal(out["rgb16"], 32768)

    def test_header_bounds_match_points(self, rng):
        pts = rng.normal(0, 3, (64, 3))
        h = read_las12_pf2(pcio.las_bytes(pts, None))["header"]
        np.testing.assert_allclose(
            [h["min_x"], h["min_y"], h["min_z"]], pts.min(axis=0))
        np.testing.assert_allclose(
            [h["max_x"], h["max_y"], h["max_z"]], pts.max(axis=0))

    def test_reader_rejects_corruption(self, rng):
        data = bytearray(pcio.las_bytes(rng.normal(0, 1, (8, 3)), None))
        data[107] = 200  # inflate the declared point count
        with pytest.raises(FormatError):
            read_las12_pf2(bytes(data))


class TestPLYCrossCheck:
    def test_points_roundtrip(self, rng):
        pts = rng.normal(0, 5, (333, 3)).astype(np.float32)
        cols = rng.integers(0, 256, (333, 3)).astype(np.float32)
        out = read_ply(pcio.ply_points_bytes(pts, cols))["vertex"]
        np.testing.assert_allclose(
            np.stack([out["x"], out["y"], out["z"]], 1), pts, atol=1e-7)
        np.testing.assert_array_equal(
            np.stack([out["red"], out["green"], out["blue"]], 1),
            cols.astype(np.uint8))

    def test_native_and_numpy_paths_agree(self, rng):
        # The C++ fast path and the numpy path must emit identical bytes
        # (the independent reader sees both, so both layouts validate).
        pts = rng.normal(0, 5, (50, 3)).astype(np.float32)
        cols = rng.integers(0, 256, (50, 3)).astype(np.float32)
        fast = pcio.ply_points_bytes(pts, cols)
        slow = pcio.ply_points_bytes(pts.astype(np.float64), cols)
        assert fast == slow

    def test_mesh_roundtrip(self, rng, tmp_path):
        v = rng.normal(0, 1, (20, 3))
        f = rng.integers(0, 20, (9, 3))
        n = rng.normal(0, 1, (20, 3))
        path = str(tmp_path / "m.ply")
        pcio.write_ply_mesh(path, v, f, colors=np.full((20, 3), 77.0),
                            normals=n)
        with open(path, "rb") as fh:
            out = read_ply(fh.read())
        np.testing.assert_allclose(
            np.stack([out["vertex"]["x"], out["vertex"]["y"],
                      out["vertex"]["z"]], 1), v)
        np.testing.assert_allclose(
            np.stack([out["vertex"]["nx"], out["vertex"]["ny"],
                      out["vertex"]["nz"]], 1), n)
        np.testing.assert_array_equal(out["face"]["vertex_indices"], f)

    def test_reader_rejects_trailing_garbage(self, rng):
        data = pcio.ply_points_bytes(np.zeros((2, 3), np.float32), None)
        with pytest.raises(FormatError):
            read_ply(data + b"\0\0\0")


class TestGLBCrossCheck:
    def test_textured_mesh_validates(self, rng):
        from image_to_pointcloud_tpu.io.image import encode_png

        v = rng.normal(0, 1, (30, 3)).astype(np.float32)
        f = rng.integers(0, 30, (14, 3)).astype(np.int32)
        n = rng.normal(0, 1, (30, 3)).astype(np.float32)
        uv = rng.random((30, 2)).astype(np.float32)
        tex = encode_png(rng.integers(0, 255, (8, 8, 3)).astype(np.uint8))
        out = read_glb(pcio.glb_bytes(v, f, normals=n, uvs=uv,
                                      texture_png=tex))
        prim = out["gltf"]["meshes"][0]["primitives"][0]
        pos = out["accessors"][prim["attributes"]["POSITION"]]
        np.testing.assert_array_equal(pos, v)
        np.testing.assert_array_equal(
            out["accessors"][prim["attributes"]["NORMAL"]], n)
        np.testing.assert_array_equal(
            out["accessors"][prim["attributes"]["TEXCOORD_0"]], uv)
        np.testing.assert_array_equal(
            out["accessors"][prim["indices"]], f.reshape(-1))
        # The embedded texture bytes must round-trip exactly.
        img = out["gltf"]["images"][0]
        view = out["gltf"]["bufferViews"][img["bufferView"]]
        got = out["bin"][view.get("byteOffset", 0):
                         view.get("byteOffset", 0) + view["byteLength"]]
        assert got == tex

    def test_point_cloud_validates(self, rng):
        v = rng.normal(0, 1, (11, 3)).astype(np.float32)
        c = rng.random((11, 3)).astype(np.float32)
        out = read_glb(pcio.glb_bytes(v, None, colors01=c))
        prim = out["gltf"]["meshes"][0]["primitives"][0]
        assert prim["mode"] == 0
        np.testing.assert_array_equal(
            out["accessors"][prim["attributes"]["COLOR_0"]], c)

    def test_reader_rejects_bad_index(self, rng):
        import json as _json
        import struct as _struct

        v = rng.normal(0, 1, (4, 3)).astype(np.float32)
        f = np.array([[0, 1, 2]], np.int32)
        data = bytearray(pcio.glb_bytes(v, f))
        # Corrupt the index buffer to point past the vertex count: the
        # reader must catch it via its index-range validation.
        jlen = _struct.unpack_from("<L", data, 12)[0]
        j = _json.loads(data[20:20 + jlen])
        idx_acc = j["meshes"][0]["primitives"][0]["indices"]
        view = j["bufferViews"][j["accessors"][idx_acc]["bufferView"]]
        binstart = 20 + jlen + 8
        _struct.pack_into("<I", data, binstart + view["byteOffset"], 99)
        with pytest.raises(FormatError):
            read_glb(bytes(data))


class TestXYZCrossCheck:
    def test_roundtrip_and_format(self, rng):
        pts = rng.normal(0, 5, (40, 3)).astype(np.float32)
        cols = rng.integers(0, 256, (40, 3)).astype(np.float32)
        out = read_xyz(pcio.xyz_bytes(pts, cols))
        np.testing.assert_allclose(out["points"], pts, atol=5e-7)
        # int() truncation, exactly like the reference's %d of float
        # colors (backend/app.py:387).
        np.testing.assert_array_equal(out["colors"],
                                      cols.astype(np.int64))
