"""Hybrid JPEG decode: device half (ops/jpeg.py) against PIL/libjpeg
oracles, host half via native.jpeg_coefficients (tests/test_native.py
covers the entropy decoder itself).

The capability under test replaces the reference's host-only decode
slot (backend/app.py:433 cv2.imdecode) for baseline JPEGs: host does
Huffman only, the device does dequant + scaled IDCT + chroma upsample
+ YCbCr→RGB.
"""

import io

import numpy as np
import pytest

from image_to_pointcloud_tpu import native
from image_to_pointcloud_tpu.ops import jpeg as devjpeg


@pytest.fixture(scope="module", autouse=True)
def require_native():
    if not native.available():
        pytest.skip("native toolchain unavailable")


def _photo(w=250, h=179, noise=10.0, seed=0):
    """Photograph-like content: smooth fields + moderate texture."""
    rng = np.random.default_rng(seed)
    x = np.linspace(0, 4 * np.pi, w)
    y = np.linspace(0, 3 * np.pi, h)
    base = np.stack(
        [
            127 + 110 * np.sin(x)[None, :] * np.cos(y)[:, None],
            127 + 90 * np.cos(2 * x)[None, :] + 0 * y[:, None],
            127 + 70 * np.sin(y)[:, None] + 0 * x[None, :],
        ],
        -1,
    )
    return (base + rng.normal(0, noise, base.shape)).clip(0, 255).astype(
        np.uint8
    )


def _encode(img, **kw):
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(img).save(buf, "JPEG", **kw)
    return buf.getvalue()


def _device_decode(data, k=8):
    r = native.jpeg_coefficients(data)
    assert r is not None
    spec = devjpeg.JpegSpec(
        r["width"], r["height"], r["ncomp"], tuple(r["h"]), tuple(r["v"]), k
    )
    co = tuple(
        devjpeg.host_truncate_coeffs(c, k) for c in r["coeffs"]
    )
    out = devjpeg.decode_jpeg_to_rgb(
        co, r["qtables"].astype(np.float32), spec
    )
    return np.asarray(out), r, spec


class TestIdctMatrix:
    def test_k8_is_orthonormal_idct(self):
        m = devjpeg.idct_matrix(8)
        assert np.allclose(m @ m.T, np.eye(8), atol=1e-6)

    def test_scaled_preserves_block_mean(self):
        # A constant block decodes to the same constant at every scale.
        rng = np.random.default_rng(3)
        dc = rng.normal(0, 300)
        coeffs = np.zeros((8, 8), np.float32)
        coeffs[0, 0] = dc
        for k in (1, 2, 4, 8):
            m = devjpeg.idct_matrix(k)
            out = m.T @ coeffs[:k, :k] @ m
            assert np.allclose(out, dc / 8.0, atol=1e-4), k


class TestFullScaleVsPIL:
    """k=8 must land within libjpeg's integer-IDCT/fixed-point-color
    tolerance of PIL's pixels (a few gray levels)."""

    @pytest.mark.parametrize(
        "subsampling,tol",
        [(0, 3.0), (1, 4.0), (2, 4.0)],  # 4:4:4, 4:2:2, 4:2:0
    )
    def test_rgb(self, subsampling, tol):
        from PIL import Image

        data = _encode(_photo(), quality=90, subsampling=subsampling)
        out, _, _ = _device_decode(data, k=8)
        ref = np.asarray(
            Image.open(io.BytesIO(data)).convert("RGB"), np.float64
        )
        err = np.abs(out - ref)
        assert err.max() <= tol, (subsampling, err.max())
        assert err.mean() < 1.0

    def test_grayscale(self):
        from PIL import Image

        data = _encode(_photo()[..., 0], quality=88)
        out, r, _ = _device_decode(data, k=8)
        assert r["ncomp"] == 1
        ref = np.asarray(
            Image.open(io.BytesIO(data)).convert("RGB"), np.float64
        )
        assert np.abs(out - ref).max() <= 2.0

    def test_odd_dimensions_exact_crop(self):
        # Dims that are not multiples of the MCU size exercise the
        # padding-crop path on both luma and chroma.
        data = _encode(_photo(w=101, h=67), quality=90)
        out, r, spec = _device_decode(data, k=8)
        assert out.shape == (67, 101, 3)
        assert spec.out_hw == (67, 101)


class TestProgressive:
    """SOF2 streams through the same hybrid path: the multi-scan
    entropy decoder (native/src/jpegdec.cpp progressive scans)
    reassembles full coefficients, so device decode must land on PIL's
    pixels exactly like the baseline path."""

    @pytest.mark.parametrize(
        "subsampling,tol",
        [(0, 3.0), (2, 4.0)],  # 4:4:4, 4:2:0
    )
    def test_rgb_vs_pil(self, subsampling, tol):
        from PIL import Image

        data = _encode(
            _photo(), quality=90, subsampling=subsampling, progressive=True
        )
        assert b"\xff\xc2" in data
        out, _, _ = _device_decode(data, k=8)
        ref = np.asarray(
            Image.open(io.BytesIO(data)).convert("RGB"), np.float64
        )
        err = np.abs(out - ref)
        assert err.max() <= tol, (subsampling, err.max())
        assert err.mean() < 1.0

    def test_grayscale(self):
        from PIL import Image

        data = _encode(_photo()[..., 0], quality=88, progressive=True)
        out, r, _ = _device_decode(data, k=8)
        assert r["ncomp"] == 1
        ref = np.asarray(
            Image.open(io.BytesIO(data)).convert("RGB"), np.float64
        )
        assert np.abs(out - ref).max() <= 2.0

    def test_restart_markers(self):
        data = _encode(
            _photo(w=120, h=88), quality=90, progressive=True,
            restart_marker_rows=1,
        )
        assert any(
            data[i] == 0xFF and 0xD0 <= data[i + 1] <= 0xD7
            for i in range(len(data) - 1)
        ), "encoder produced no restart markers"
        base = native.jpeg_coefficients(_encode(_photo(w=120, h=88), quality=90))
        prog = native.jpeg_coefficients(data)
        assert prog is not None
        for c in range(base["ncomp"]):
            np.testing.assert_array_equal(base["coeffs"][c], prog["coeffs"][c])

    def test_truncation_and_bitflip_fuzz(self):
        """Damaged progressive streams must return cleanly (dict or
        None), never crash or write out of bounds — deterministic fuzz
        like tests/test_http_fuzz.py."""
        data = _encode(_photo(w=200, h=150), quality=85, progressive=True)
        rng = np.random.default_rng(42)
        for cut in rng.integers(2, len(data), 24):
            native.jpeg_coefficients(data[: int(cut)])
        buf = bytearray(data)
        for _ in range(24):
            i = int(rng.integers(2, len(buf)))
            old = buf[i]
            buf[i] = int(rng.integers(0, 256))
            native.jpeg_coefficients(bytes(buf))
            buf[i] = old
        # The pristine stream still decodes after the fuzz loop.
        assert native.jpeg_coefficients(data) is not None


class TestScaledDecode:
    """k<8: DCT-domain downscaling. Two oracles — libjpeg's own scaled
    decode (PIL draft mode; a different fixed-point approximation, loose
    tolerance) and full decode + area resize (what the serving pipeline
    substitutes it for; PARITY.md tolerance)."""

    @pytest.mark.parametrize("k", [4, 2])
    def test_vs_pil_draft(self, k):
        from PIL import Image

        data = _encode(_photo(w=1000, h=750), quality=90)
        out, r, spec = _device_decode(data, k=k)
        im = Image.open(io.BytesIO(data))
        im.draft("RGB", (r["width"] * k // 8, r["height"] * k // 8))
        ref = np.asarray(im.convert("RGB"), np.float64)
        assert out.shape[:2] == ref.shape[:2] == spec.out_hw
        err = np.abs(out - ref)
        assert err.mean() < 5.0
        assert np.percentile(err, 99) < 16.0

    def test_vs_full_decode_area_resize(self):
        import jax
        import jax.numpy as jnp
        from PIL import Image

        from image_to_pointcloud_tpu.ops.resize import resize_batched

        data = _encode(_photo(w=1000, h=750), quality=90)
        out, _, spec = _device_decode(data, k=2)
        full = np.asarray(
            Image.open(io.BytesIO(data)).convert("RGB"), np.float64
        )
        area = np.asarray(
            resize_batched(
                jnp.asarray(full[None], jnp.float32), spec.out_hw, "area"
            )
        )[0]
        rmse = np.sqrt(((out - area) ** 2).mean())
        assert rmse < 4.0  # the documented deviation band
        del jax

    def test_transfer_shrink(self):
        """The point of the exercise: k=2 coefficients are ~16x smaller
        than the pixels they replace on the H2D link."""
        data = _encode(_photo(w=1000, h=750), quality=90)
        r = native.jpeg_coefficients(data)
        k = 2
        nbytes = sum(
            devjpeg.host_truncate_coeffs(c, k).nbytes for c in r["coeffs"]
        )
        assert nbytes * 10 < r["width"] * r["height"] * 3


class TestPlanScale:
    def test_covers_target(self):
        # 4000x3000 capped to 3072 → k must cover (2304, 3072).
        k = devjpeg.plan_scale(4000, 3000, (2304, 3072))
        assert k == 7
        assert -(-3000 * k // 8) >= 2304 and -(-4000 * k // 8) >= 3072

    def test_small_image_full_scale(self):
        assert devjpeg.plan_scale(518, 518, (518, 518)) == 8

    def test_model_sized_target(self):
        # 4000x3000 headed straight to a 518-max model grid.
        k = devjpeg.plan_scale(4000, 3000, (389, 518))
        assert k == 2

    def test_shape_validation(self):
        data = _encode(_photo(), quality=90)
        r = native.jpeg_coefficients(data)
        spec = devjpeg.JpegSpec(
            r["width"], r["height"], 3, tuple(r["h"]), tuple(r["v"]), 8
        )
        bad = tuple(
            devjpeg.host_truncate_coeffs(c, 4) for c in r["coeffs"]
        )
        with pytest.raises(ValueError):
            devjpeg.decode_jpeg_to_rgb(
                bad, r["qtables"].astype(np.float32), spec
            )


class TestHybridPipeline:
    """The hybrid ingest through the FULL fused serving graph vs the
    pixel path on the same JPEG: same geometry within the decode
    tolerance (the two decoders differ by ≤ a few gray levels)."""

    @pytest.fixture(scope="class")
    def pipe(self):
        import sys

        sys.path.insert(0, "tests")
        from test_model_parity import _build_pair

        from image_to_pointcloud_tpu.pipeline.graph import DepthPipeline

        _, model, variables = _build_pair(image_size=56)
        return DepthPipeline(model.cfg, variables["params"], model_target=56)

    def _jpeg_input(self, data, k):
        from image_to_pointcloud_tpu.pipeline.graph import JpegInput

        r = native.jpeg_coefficients(data)
        spec = devjpeg.JpegSpec(
            r["width"], r["height"], r["ncomp"], tuple(r["h"]), tuple(r["v"]), k
        )
        return JpegInput(
            spec=spec,
            coeffs=[devjpeg.host_truncate_coeffs(c, k) for c in r["coeffs"]],
            qtables=r["qtables"].astype(np.float32),
        )

    def test_matches_pixel_path(self, pipe):
        from PIL import Image

        from image_to_pointcloud_tpu.pipeline.graph import PipelineOptions

        data = _encode(_photo(w=220, h=164, noise=8.0), quality=90)
        res_j = pipe.run_jpeg(
            self._jpeg_input(data, 8), options=PipelineOptions()
        )
        pix = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
        res_p = pipe.run(pix, options=PipelineOptions())

        assert res_j.grid_hw == res_p.grid_hw
        # Keep masks agree except for borderline outlier-threshold points.
        kj = res_j.packed[6] > 0.5
        kp = res_p.packed[6] > 0.5
        assert (kj == kp).mean() > 0.999
        both = kj & kp
        xyz_j = res_j.packed[:3, both]
        xyz_p = res_p.packed[:3, both]
        # z = normalized_depth·scale; input pixel deltas of ≤4 levels
        # move the depth net's output a little — bound the drift.
        assert np.sqrt(((xyz_j - xyz_p) ** 2).mean()) < 0.05
        col_d = np.abs(res_j.packed[3:6, both] - res_p.packed[3:6, both])
        assert col_d.max() <= 6.0
        # Depth preview: same normalize path, near-identical gray.
        assert (
            np.abs(
                res_j.depth_preview_gray.astype(int)
                - res_p.depth_preview_gray.astype(int)
            ).mean()
            < 0.5
        )

    def test_native_and_numpy_collect_agree(self, pipe):
        """The two collect paths over the same hybrid handle — native
        fused reconstruct (want_packed=False) and the numpy bundle path
        (want_packed=True) — must produce identical points AND colors
        (the 4:2:0 ride-along decodes bit-identically on both)."""
        if not native.available():
            pytest.skip("native toolchain unavailable")
        from image_to_pointcloud_tpu.pipeline.graph import PipelineOptions

        data = _encode(_photo(w=120, h=88, noise=8.0), quality=88)
        handle = pipe.submit_batch_jpeg(
            [self._jpeg_input(data, 8)], options=PipelineOptions(),
            want_preview=False,
        )
        fast = pipe.collect(handle, want_preview=False, want_packed=False)[0]
        full = pipe.collect(handle, want_preview=False, want_packed=True)[0]
        np.testing.assert_array_equal(fast.points, full.points)
        np.testing.assert_array_equal(fast.colors, full.colors)

    def test_batched_mixed_scales(self, pipe):
        from image_to_pointcloud_tpu.pipeline.graph import PipelineOptions

        data = _encode(_photo(w=120, h=88), quality=88)
        ji = self._jpeg_input(data, 8)
        handle = pipe.submit_batch_jpeg(
            [ji, ji, ji], depth_scales=[5.0, 10.0, 20.0],
            options=PipelineOptions(),
        )
        r5, r10, r20 = pipe.collect(handle)
        # depth_scale scales z linearly (and x,y through z).
        k = (r5.packed[6] > 0.5) & (r10.packed[6] > 0.5) & (r20.packed[6] > 0.5)
        z5, z10, z20 = r5.packed[2, k], r10.packed[2, k], r20.packed[2, k]
        np.testing.assert_allclose(z10, z5 * 2.0, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(z20, z5 * 4.0, rtol=1e-4, atol=1e-5)

    def test_plan_engages_small_jpegs_when_sparse_wins(self):
        """With the blocked-sparse payload (ops/jpeg_sparse.py) ordinary
        full-scale (k=8) JPEGs engage too: the payload must ship well
        under the raw pixel bytes it replaces."""
        from image_to_pointcloud_tpu.ops.jpeg_sparse import (
            coeff_layout,
            sparse_payload_bytes,
        )
        from image_to_pointcloud_tpu.pipeline.graph import plan_jpeg_input

        small = _encode(_photo(w=400, h=300, noise=6.0), quality=88)
        ji = plan_jpeg_input(small)
        assert ji is not None and ji.spec.k == 8
        _, _, pos, _, exc_idx, _ = ji.sparse()
        _, total = coeff_layout(ji.spec)
        assert (
            sparse_payload_bytes(len(pos), len(exc_idx), total)
            < 0.75 * 400 * 300 * 3
        )

    def test_plan_gates_non_jpeg_and_dense_content(self):
        from image_to_pointcloud_tpu.pipeline.graph import plan_jpeg_input

        assert plan_jpeg_input(b"\x89PNG\r\n\x1a\nnope") is None
        # Quality-100 uniform noise: nearly every coefficient survives
        # quantization, the sparse payload loses to pixels, host decode
        # keeps the slot.
        rng = np.random.default_rng(11)
        noise = rng.integers(0, 256, (96, 128, 3)).astype(np.uint8)
        dense = _encode(noise, quality=100)
        assert plan_jpeg_input(dense) is None

    def test_plan_large_image(self):
        """>3511 px max dim → k<8 and the decode covers the reference's
        downscaled working size (so the in-graph resize only shrinks)."""
        from image_to_pointcloud_tpu.pipeline.graph import (
            _proc_hw,
            plan_jpeg_input,
        )

        data = _encode(_photo(w=3600, h=2700, noise=6.0), quality=85)
        ji = plan_jpeg_input(data)
        assert ji is not None
        assert ji.spec.k == 7
        h, w = _proc_hw(2700, 3600)
        oh, ow = ji.spec.out_hw
        assert oh >= h and ow >= w
        # Coefficient payload is smaller than the pixels it replaces.
        nbytes = sum(c.nbytes for c in ji.coeffs)
        assert nbytes < 2700 * 3600 * 3


class TestServingHybrid:
    """V1 service with jpeg_device_decode=True: an eligible JPEG takes
    the hybrid ingest end-to-end over HTTP; everything else falls back
    to the host decode."""

    @pytest.fixture()
    def v1_hybrid_server(self, tmp_path, monkeypatch):
        import sys

        sys.path.insert(0, "tests")
        from test_serve import _ServerThread, _tiny_model_manager

        from image_to_pointcloud_tpu.pipeline import graph as graphmod

        # The real planner only engages for >3510 px images (too heavy
        # for CI); force small JPEGs onto the hybrid path at k=8 so the
        # whole serving flow runs in seconds. Non-JPEG bytes must still
        # return None (fallback coverage).
        real_coeffs = native.jpeg_coefficients

        def force_plan(data):
            from image_to_pointcloud_tpu.pipeline.graph import JpegInput

            r = real_coeffs(data)
            if r is None:
                return None
            spec = devjpeg.JpegSpec(
                r["width"], r["height"], r["ncomp"],
                tuple(r["h"]), tuple(r["v"]), 8,
            )
            return JpegInput(
                spec=spec,
                coeffs=[
                    devjpeg.host_truncate_coeffs(c, 8) for c in r["coeffs"]
                ],
                qtables=r["qtables"].astype(np.float32),
            )

        monkeypatch.setattr(graphmod, "plan_jpeg_input", force_plan)

        def make():
            from image_to_pointcloud_tpu.serve.app_v1 import create_v1_app

            return (
                create_v1_app(
                    output_dir=str(tmp_path),
                    models=_tiny_model_manager(),
                    jpeg_device_decode=True,
                ),
                "*",
            )

        srv = _ServerThread(make)
        yield f"http://127.0.0.1:{srv.port}"
        srv.stop()

    def _submit_and_wait(self, base, payload, content_type, fmt="xyz"):
        import time as _t

        import httpx

        with httpx.Client(timeout=120.0) as c:
            r = c.post(
                f"{base}/process",
                files={"file": ("img" + content_type[-4:], payload, content_type)},
                data={"output_format": fmt, "point_density": "low"},
            )
            assert r.status_code == 200, r.text
            job_id = r.json()["job_id"]
            for _ in range(600):
                s = c.get(f"{base}/status/{job_id}").json()
                if s["status"] in ("completed", "error"):
                    break
                _t.sleep(0.2)
            assert s["status"] == "completed", s
            return c.get(f"{base}/download/{job_id}"), s

    def test_jpeg_end_to_end(self, v1_hybrid_server):
        data = _encode(_photo(w=120, h=88), quality=90)
        dl, status = self._submit_and_wait(
            v1_hybrid_server, data, "image/jpeg"
        )
        assert dl.status_code == 200 and len(dl.content) > 0
        res = status["results"]
        assert res["gisData"]["pointCount"] > 0
        assert res["depthMap"].startswith("data:image/png;base64,")
        assert len(res["preview"]["points"]) > 0

    def test_png_still_falls_back(self, v1_hybrid_server):
        from image_to_pointcloud_tpu.io.image import encode_png

        png = encode_png(_photo(w=96, h=64))
        dl, status = self._submit_and_wait(
            v1_hybrid_server, png, "image/png"
        )
        assert dl.status_code == 200
        assert status["results"]["gisData"]["pointCount"] > 0


class TestBatchingMixed:
    """One BatchingQueue drain containing both pixel and hybrid-JPEG
    items: they group into separate graph signatures and all resolve."""

    def test_mixed_drain(self):
        import asyncio
        import sys

        sys.path.insert(0, "tests")
        from test_serve import _tiny_model_manager

        from image_to_pointcloud_tpu.pipeline.graph import (
            JpegInput,
            PipelineOptions,
        )
        from image_to_pointcloud_tpu.serve.batching import BatchingQueue

        pipe = _tiny_model_manager().get("depth-anything-v2")
        data = _encode(_photo(w=120, h=88), quality=90)
        r = native.jpeg_coefficients(data)
        spec = devjpeg.JpegSpec(
            r["width"], r["height"], r["ncomp"],
            tuple(r["h"]), tuple(r["v"]), 8,
        )
        ji = JpegInput(
            spec=spec,
            coeffs=[devjpeg.host_truncate_coeffs(c, 8) for c in r["coeffs"]],
            qtables=r["qtables"].astype(np.float32),
        )
        from PIL import Image

        pix = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))

        async def scenario():
            q = BatchingQueue(pipe, max_batch=8, window_ms=20.0)
            try:
                res = await asyncio.gather(
                    q.submit(ji, 10.0, PipelineOptions()),
                    q.submit(pix, 10.0, PipelineOptions()),
                    q.submit(ji, 10.0, PipelineOptions()),
                )
            finally:
                await q.close()
            return res

        r1, r2, r3 = asyncio.run(scenario())
        assert r1.kept_point_count > 0
        assert r1.grid_hw == r2.grid_hw == r3.grid_hw
        # Hybrid and pixel results of the same JPEG agree to tolerance.
        assert abs(r1.kept_point_count - r2.kept_point_count) <= max(
            5, r2.kept_point_count // 500
        )
        np.testing.assert_array_equal(
            r1.packed[6] > 0.5, r3.packed[6] > 0.5
        )


class TestHostGridColors:
    """Host-side grid-color reconstruction (native/src/colorgrid.cpp):
    the D2H color ride-along's replacement must reproduce the device
    decode's colors at the strided grid positions."""

    @pytest.mark.skipif(not native.available(), reason="no native lib")
    @pytest.mark.parametrize(
        "kw,mode",
        [
            ({"quality": 88, "subsampling": 2}, "RGB"),  # 4:2:0
            ({"quality": 90, "subsampling": 1}, "RGB"),  # 4:2:2
            ({"quality": 90, "subsampling": 0}, "RGB"),  # 4:4:4
            ({"quality": 88}, "L"),  # grayscale
        ],
    )
    @pytest.mark.parametrize("step", [1, 2, 4])
    def test_matches_device_decode_at_grid(self, kw, mode, step):
        from PIL import Image

        img = _photo(w=205, h=133, noise=8.0, seed=4)
        if mode == "L":
            img = img[..., 0]
        buf = io.BytesIO()
        Image.fromarray(img, mode=mode).save(buf, "JPEG", **kw)
        dev, r, spec = _device_decode(buf.getvalue(), k=8)
        host = native.jpeg_grid_colors(
            [devjpeg.host_truncate_coeffs(c, 8) for c in r["coeffs"]],
            r["qtables"].astype(np.float32),
            spec,
            step,
        )
        assert host is not None
        ref = np.asarray(dev).astype(np.int32)[::step, ::step]
        assert host.shape == ref.shape
        # Same math, different float summation order: ≤1 level after
        # ties-to-even rounding.
        assert np.abs(host.astype(np.int32) - ref).max() <= 1

    @pytest.mark.skipif(not native.available(), reason="no native lib")
    def test_unsupported_layouts_return_none(self):
        from image_to_pointcloud_tpu.pipeline.graph import plan_jpeg_input

        data = _encode(_photo(w=160, h=120), quality=88)
        j = plan_jpeg_input(data)
        assert j is not None
        # Scaled decode (k<8): basis unsupported, must decline.
        spec_k4 = devjpeg.JpegSpec(
            j.spec.width, j.spec.height, j.spec.ncomp, j.spec.h, j.spec.v, 4
        )
        co4 = [c[:, :, :4, :4] for c in j.coeffs]
        assert (
            native.jpeg_grid_colors(co4, j.qtables, spec_k4, 2) is None
        )
        # Stride outside {1,2,4}: decline.
        assert native.jpeg_grid_colors(j.coeffs, j.qtables, j.spec, 3) is None

    def test_pipeline_host_colors_vs_ridealong(self):
        """End-to-end: the host-colors bundle layout must produce the
        SAME points and near-identical colors as the device 4:2:0
        ride-along (which is itself lossy vs the decoded RGB), while
        shipping a strictly smaller bundle."""
        if not native.available():
            pytest.skip("native toolchain unavailable")
        import sys

        sys.path.insert(0, "tests")
        from test_model_parity import _build_pair

        from image_to_pointcloud_tpu.pipeline.graph import (
            DepthPipeline,
            PipelineOptions,
            plan_jpeg_input,
        )

        _, model, variables = _build_pair(image_size=56)
        # quantized_transfer drives the bundle layouts under test (it is
        # the TPU default; the CPU test default keeps packed f32 rows).
        pipe = DepthPipeline(
            model.cfg, variables["params"], model_target=56,
            quantized_transfer=True,
        )
        data = _encode(_photo(w=140, h=96, noise=8.0), quality=88)
        j = plan_jpeg_input(data)
        assert j is not None
        assert j.grid_colors(2) is not None
        opts = PipelineOptions()

        assert pipe.host_colors_enabled  # default on
        h_on = pipe.submit_batch_jpeg([j], options=opts, want_preview=False)
        assert h_on[-1] is not None  # host_rgb engaged
        r_on = pipe.collect(h_on, want_preview=False, want_packed=True)[0]

        pipe.host_colors_enabled = False
        h_off = pipe.submit_batch_jpeg([j], options=opts, want_preview=False)
        assert h_off[-1] is None
        r_off = pipe.collect(h_off, want_preview=False, want_packed=True)[0]
        pipe.host_colors_enabled = True

        # Depth/geometry path is untouched by the color layout.
        np.testing.assert_array_equal(r_on.points, r_off.points)
        # Ground truth: the device-decoded RGB sampled at the grid.
        truth = _device_decode(data, k=8)[0].astype(np.float64)[::2, ::2]
        keep = r_on.packed[6] > 0.5
        truth_kept = truth.reshape(-1, 3)[keep]
        # Host reconstruction is decode-exact (±1 level, float order);
        # the ride-along's 4:2:0 grid-chroma subsample is lossier on
        # steep gradients (several tens of levels) — host colors must be
        # at least as faithful, not merely close to the ride-along.
        err_on = np.abs(r_on.colors.astype(np.float64) - truth_kept)
        err_off = np.abs(r_off.colors.astype(np.float64) - truth_kept)
        assert err_on.max() <= 1.0
        assert err_on.mean() <= err_off.mean()
        # And the bundle is strictly smaller: depth+keep only.
        assert h_on[0].shape[1] < h_off[0].shape[1]

        # Native fast path and numpy bundle path agree on the new layout.
        h2 = pipe.submit_batch_jpeg([j], options=opts, want_preview=False)
        fast = pipe.collect(h2, want_preview=False, want_packed=False)[0]
        np.testing.assert_array_equal(fast.points, r_on.points)
        np.testing.assert_array_equal(fast.colors, r_on.colors)
