"""Round-trip and byte-layout tests for the first-party exporters."""

import json
import struct

import numpy as np
import pytest

from image_to_pointcloud_tpu import io as pcio


class TestPLY:
    def test_points_roundtrip(self, rng, tmp_path):
        pts = rng.normal(0, 5, (100, 3)).astype(np.float32)
        cols = rng.integers(0, 256, (100, 3)).astype(np.float32)
        path = str(tmp_path / "p.ply")
        pcio.write_ply_points(path, pts, cols)
        out = pcio.read_ply(path)["vertex"]
        np.testing.assert_allclose(
            np.stack([out["x"], out["y"], out["z"]], 1), pts, atol=1e-6
        )
        np.testing.assert_array_equal(
            np.stack([out["red"], out["green"], out["blue"]], 1),
            cols.astype(np.uint8),
        )

    def test_header_layout(self, rng):
        data = pcio.ply_points_bytes(np.zeros((2, 3)), np.zeros((2, 3)))
        head = data.split(b"end_header\n")[0].decode()
        assert head.startswith("ply\nformat binary_little_endian 1.0\n")
        assert "element vertex 2" in head
        assert "property double x" in head and "property uchar red" in head
        body = data.split(b"end_header\n", 1)[1]
        assert len(body) == 2 * (24 + 3)

    def test_mesh_roundtrip(self, rng, tmp_path):
        v = rng.normal(0, 1, (10, 3))
        f = rng.integers(0, 10, (5, 3))
        path = str(tmp_path / "m.ply")
        pcio.write_ply_mesh(path, v, f, colors=np.full((10, 3), 128.0))
        out = pcio.read_ply(path)
        np.testing.assert_allclose(
            np.stack([out["vertex"]["x"], out["vertex"]["y"], out["vertex"]["z"]], 1),
            v,
        )
        np.testing.assert_array_equal(out["face"], f)


class TestLAS:
    def test_roundtrip_quantization(self, rng, tmp_path):
        pts = rng.normal(0, 10, (500, 3)).astype(np.float32)
        cols = rng.integers(0, 256, (500, 3)).astype(np.float32)
        path = str(tmp_path / "p.las")
        pcio.write_las(path, pts, cols)
        out = pcio.read_las(path)
        # scale 0.01 + min offsets, like the reference (backend/app.py:351-354)
        assert out["scales"] == (0.01, 0.01, 0.01)
        np.testing.assert_allclose(out["offsets"], pts.min(axis=0), atol=1e-6)
        np.testing.assert_allclose(out["points"], pts, atol=0.005 + 1e-6)
        np.testing.assert_array_equal(
            out["rgb16"], np.clip(cols, 0, 255).astype(np.uint16) * 256
        )

    def test_gray_fallback(self, rng, tmp_path):
        pts = rng.normal(0, 1, (10, 3))
        out = pcio.read_las(pcio.las_bytes(pts, None))
        np.testing.assert_array_equal(out["rgb16"], 32768)

    def test_empty_raises(self):
        with pytest.raises(ValueError):
            pcio.las_bytes(np.zeros((0, 3)), None)

    def test_header_is_227_bytes(self, rng):
        data = pcio.las_bytes(np.ones((1, 3)), None)
        assert data[:4] == b"LASF"
        assert struct.unpack_from("<H", data, 94)[0] == 227  # header size
        assert struct.unpack_from("<B", data, 104)[0] == 2  # point format
        assert struct.unpack_from("<H", data, 105)[0] == 26  # record length


class TestXYZ:
    def test_format(self):
        pts = np.array([[1.5, -2.25, 3.0]], np.float32)
        cols = np.array([[254.9, 1.2, 0.0]], np.float32)
        line = pcio.xyz_bytes(pts, cols).decode().strip()
        # colors int()-truncated, %.6f floats (backend/app.py:387)
        assert line == "1.500000 -2.250000 3.000000 254 1 0"

    def test_no_colors(self):
        line = pcio.xyz_bytes(np.zeros((1, 3)), None).decode().strip()
        assert line.endswith("128 128 128")


class TestGLB:
    def _parse(self, data):
        assert data[:4] == b"glTF"
        ver, total = struct.unpack_from("<LL", data, 4)
        assert ver == 2 and total == len(data)
        jlen, jtype = struct.unpack_from("<L4s", data, 12)
        assert jtype == b"JSON"
        j = json.loads(data[20 : 20 + jlen])
        blen, btype = struct.unpack_from("<L4s", data, 20 + jlen)
        assert btype == b"BIN\0"
        binchunk = data[28 + jlen : 28 + jlen + blen]
        return j, binchunk

    def test_mesh_with_texture(self, rng):
        from image_to_pointcloud_tpu.io.image import encode_png

        v = rng.normal(0, 1, (12, 3)).astype(np.float32)
        f = rng.integers(0, 12, (6, 3)).astype(np.int32)
        uv = rng.random((12, 2)).astype(np.float32)
        tex = encode_png(rng.integers(0, 255, (8, 8, 3)).astype(np.uint8))
        data = pcio.glb_bytes(v, f, uvs=uv, texture_png=tex)
        j, binchunk = self._parse(data)
        prim = j["meshes"][0]["primitives"][0]
        assert prim["mode"] == 4 and "TEXCOORD_0" in prim["attributes"]
        assert j["materials"][0]["pbrMetallicRoughness"]["baseColorTexture"]["index"] == 0
        pos_acc = j["accessors"][prim["attributes"]["POSITION"]]
        view = j["bufferViews"][pos_acc["bufferView"]]
        got = np.frombuffer(
            binchunk[view["byteOffset"] : view["byteOffset"] + view["byteLength"]],
            np.float32,
        ).reshape(-1, 3)
        np.testing.assert_array_equal(got, v)

    def test_point_cloud_mode(self, rng):
        v = rng.normal(0, 1, (5, 3)).astype(np.float32)
        c = rng.random((5, 3)).astype(np.float32)
        j, _ = self._parse(pcio.glb_bytes(v, None, colors01=c))
        prim = j["meshes"][0]["primitives"][0]
        assert prim["mode"] == 0 and "COLOR_0" in prim["attributes"]


class TestImage:
    def test_png_roundtrip(self, rng):
        from image_to_pointcloud_tpu.io.image import decode_image_rgb, encode_png

        img = rng.integers(0, 256, (20, 30, 3)).astype(np.uint8)
        out = decode_image_rgb(encode_png(img))
        np.testing.assert_array_equal(out, img)

    def test_data_url(self, rng):
        from image_to_pointcloud_tpu.io.image import png_data_url

        url = png_data_url(np.zeros((4, 4, 3), np.uint8))
        assert url.startswith("data:image/png;base64,")


class TestMetadata:
    def test_keys_match_reference(self, rng):
        pts = rng.normal(0, 1, (50, 3))
        md = pcio.generate_gis_metadata(
            pts,
            coordinate_system="WGS84",
            model="depth-anything-v2",
            output_format="las",
            point_density="medium",
            depth_scale=10.0,
            invert_depth=True,
            smooth_depth=False,
            gps_coords={"lat": 1.0, "lon": 2.0},
        )
        assert set(md) == {
            "coordinateSystem", "bounds", "pointCount", "generatedWith",
            "outputFormat", "pointDensity", "depthScale", "invertDepth",
            "smoothDepth", "gpsReference",
        }
        assert set(md["bounds"]) == {"minX", "maxX", "minY", "maxY", "minZ", "maxZ"}
        assert md["pointCount"] == 50


class TestPCD:
    def test_header_and_packed_rgb(self, rng):
        from image_to_pointcloud_tpu.io import pcd_bytes

        pts = rng.normal(0, 1, (5, 3)).astype(np.float32)
        cols = rng.integers(0, 255, (5, 3)).astype(np.float32)
        raw = pcd_bytes(pts, cols)
        header, _, body = raw.partition(b"DATA binary\n")
        assert b"FIELDS x y z rgb" in header
        assert b"POINTS 5" in header
        rec = np.frombuffer(body, np.float32).reshape(5, 4)
        np.testing.assert_allclose(rec[:, :3], pts, rtol=1e-6)
        packed = rec[:, 3].view(np.uint32)
        r = (packed >> 16) & 0xFF
        g = (packed >> 8) & 0xFF
        b = packed & 0xFF
        np.testing.assert_array_equal(
            np.stack([r, g, b], 1), cols.astype(np.uint32)
        )

    def test_no_colors(self, rng):
        from image_to_pointcloud_tpu.io import pcd_bytes

        pts = rng.normal(0, 1, (3, 3)).astype(np.float32)
        raw = pcd_bytes(pts)
        assert b"FIELDS x y z\n" in raw
        body = raw.partition(b"DATA binary\n")[2]
        np.testing.assert_allclose(
            np.frombuffer(body, np.float32).reshape(3, 3), pts, rtol=1e-6
        )


class TestOBJ:
    def test_mesh_with_colors(self, rng):
        from image_to_pointcloud_tpu.io import obj_bytes

        verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
        faces = np.array([[0, 1, 2]], np.int32)
        cols = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], np.float32)
        text = obj_bytes(verts, faces, cols).decode()
        lines = [ln for ln in text.splitlines() if not ln.startswith("#")]
        assert lines[0] == "v 0.000000 0.000000 0.000000 1.0000 0.0000 0.0000"
        assert lines[-1] == "f 1 2 3"  # 1-indexed

    def test_points_only(self):
        from image_to_pointcloud_tpu.io import obj_bytes

        text = obj_bytes(np.zeros((2, 3))).decode()
        assert text.count("\nv ") + text.startswith("v ") >= 1
        assert "f " not in text


class TestExporterLengthGuards:
    """All exporters must agree: a colors/points length mismatch is a
    caller bug that raises — never silent truncation (obj), heap
    over-read (native xyz), or silent gray output (las)."""

    def test_xyz_mismatch_raises(self):
        from image_to_pointcloud_tpu.io.xyz import xyz_bytes

        with pytest.raises(ValueError, match="colors length"):
            xyz_bytes(np.zeros((5, 3), np.float32), np.zeros((3, 3)))

    def test_obj_mismatch_raises(self):
        from image_to_pointcloud_tpu.io.obj import obj_bytes

        with pytest.raises(ValueError, match="colors length"):
            obj_bytes(
                np.zeros((5, 3)), faces=[[0, 1, 4]], colors=np.zeros((3, 3))
            )

    def test_las_mismatch_raises(self):
        from image_to_pointcloud_tpu.io.las import las_bytes

        with pytest.raises(ValueError, match="colors length"):
            las_bytes(np.zeros((5, 3)), np.zeros((3, 3)))

    def test_glb_empty_raises_clearly(self):
        from image_to_pointcloud_tpu.io.glb import glb_bytes

        with pytest.raises(ValueError, match="no vertices"):
            glb_bytes(np.zeros((0, 3), np.float32))
