"""HTTP contract tests: live first-party server, httpx client, tiny model.

Replays the reference frontend's request shapes
(frontend/src/App.jsx:953-969: multipart file + 8 settings fields) and
asserts the reference's response contracts on both API generations.
"""

import asyncio
import json
import threading
import time
from pathlib import Path

import httpx
import numpy as np
import pytest

from image_to_pointcloud_tpu.io.image import encode_png


# ---------- shared tiny-model service fixture ----------


class _ServerThread:
    """Runs an HttpServer + app on a private event loop thread."""

    def __init__(self, make_app):
        self.make_app = make_app
        self.port = None
        self.loop = None
        self.app = None
        self._ready = threading.Event()
        self.thread = threading.Thread(target=self._run, daemon=True)
        self.thread.start()
        # Generous: the tiny-model build shares this box's one CPU core
        # with whatever else is running (e.g. a TPU bench compile).
        assert self._ready.wait(180)

    def _run(self):
        from image_to_pointcloud_tpu.serve.http import HttpServer

        self.loop = asyncio.new_event_loop()
        asyncio.set_event_loop(self.loop)

        async def boot():
            app, cors = self.make_app()
            self.app = app
            server = HttpServer(app.router, "127.0.0.1", 0, cors_origin=cors)
            if hasattr(app, "startup"):
                await app.startup()
            await server.start()
            self.port = server.bound_port
            self._ready.set()

        self.loop.run_until_complete(boot())
        self.loop.run_forever()

    def stop(self):
        async def _shutdown():
            try:
                if hasattr(self.app, "shutdown"):
                    await self.app.shutdown()
            finally:
                self.loop.stop()  # always release run_forever

        fut = asyncio.run_coroutine_threadsafe(_shutdown(), self.loop)
        self.thread.join(timeout=30)
        if fut.done() and fut.exception() is not None:
            raise fut.exception()


def _tiny_model_manager():
    """ModelManager whose depth-anything-v2 is a tiny random-init model."""
    import sys

    sys.path.insert(0, "tests")
    from test_model_parity import _build_pair

    from image_to_pointcloud_tpu.pipeline.graph import DepthPipeline
    from image_to_pointcloud_tpu.serve.models import ModelManager

    _, model, variables = _build_pair(hidden=32, layers=4, heads=2, image_size=56)
    mm = ModelManager(use_bf16=False, use_flash_attention=False)
    pipe = DepthPipeline(model.cfg, variables["params"], model_target=56)
    mm._cache["depth-anything-v2"] = pipe
    return mm


@pytest.fixture(scope="module")
def v1_server(tmp_path_factory):
    out = tmp_path_factory.mktemp("outputs_v1")

    def make():
        from image_to_pointcloud_tpu.serve.app_v1 import create_v1_app

        return (
            create_v1_app(output_dir=str(out), models=_tiny_model_manager()),
            "*",
        )

    srv = _ServerThread(make)
    yield f"http://127.0.0.1:{srv.port}"
    srv.stop()


@pytest.fixture(scope="module")
def v2_server(tmp_path_factory):
    out = tmp_path_factory.mktemp("outputs_v2")

    def make():
        from image_to_pointcloud_tpu.serve.app_v2 import create_v2_app

        return (
            create_v2_app(
                output_dir=str(out),
                models=_tiny_model_manager(),
                model_name="depth-anything-v2",
            ),
            "http://localhost:3000",
        )

    srv = _ServerThread(make)
    yield f"http://127.0.0.1:{srv.port}"
    srv.stop()


def _test_image_png(h=70, w=63) -> bytes:
    rng = np.random.default_rng(7)
    return encode_png(rng.integers(0, 256, (h, w, 3)).astype(np.uint8))


def _poll(base, job_id, timeout=120):
    deadline = time.time() + timeout
    while time.time() < deadline:
        r = httpx.get(f"{base}/status/{job_id}", timeout=30)
        assert r.status_code == 200
        data = r.json()
        if data["status"] in ("completed", "error"):
            return data
        time.sleep(0.3)
    raise TimeoutError(f"job {job_id} did not finish")


# ---------- v1 contract ----------


@pytest.fixture(scope="module")
def v1_soak_server(tmp_path_factory):
    """v1 service with a tight retention cap (max_jobs=8, no eviction
    grace) for soak-style boundedness assertions."""
    out = tmp_path_factory.mktemp("outputs_soak")
    holder = {}

    def make():
        from image_to_pointcloud_tpu.serve.app_v1 import create_v1_app

        app = create_v1_app(
            output_dir=str(out),
            models=_tiny_model_manager(),
            max_jobs=8,
        )
        app.jobs.EVICT_GRACE_S = 0.0
        holder["app"] = app
        return app, "*"

    srv = _ServerThread(make)
    yield f"http://127.0.0.1:{srv.port}", holder["app"], out
    srv.stop()


class TestSoak:
    def test_30_jobs_registry_and_disk_bounded(self, v1_soak_server):
        """Production boundedness: with max_jobs set, a stream of jobs
        keeps the registry, the output dir, and the journal bounded —
        the deliberate fix for the reference's unbounded in-memory
        registry (backend/app.py:40, SURVEY.md §8 quirk 8; None keeps
        reference parity). Eviction also unlinks the job's artifact
        (V1Service on_evict)."""
        base, app, out = v1_soak_server
        png = _test_image_png(40, 40)
        ids = []
        for _ in range(30):
            r = httpx.post(
                f"{base}/process?output_format=ply&point_density=low",
                files={"file": ("t.png", png, "image/png")},
                timeout=60,
            )
            assert r.status_code == 200
            jid = r.json()["job_id"]
            final = _poll(base, jid)
            assert final["status"] == "completed", final["message"]
            ids.append(jid)

        # Registry bounded at the cap (in-flight slack only).
        assert len(app.jobs._jobs) <= 9
        # Newest job still fully served; oldest evicted end-to-end.
        assert httpx.get(f"{base}/status/{ids[-1]}", timeout=30).status_code == 200
        assert httpx.get(f"{base}/download/{ids[-1]}", timeout=30).status_code == 200
        assert httpx.get(f"{base}/status/{ids[0]}", timeout=30).status_code == 404
        assert httpx.get(f"{base}/download/{ids[0]}", timeout=30).status_code == 404
        # Evicted artifacts are unlinked; disk holds only live jobs.
        plys = list(out.glob("*.ply"))
        assert len(plys) <= 9, [p.name for p in plys]
        assert not (out / f"{ids[0]}.ply").exists()
        assert (out / f"{ids[-1]}.ply").exists()
        # Journal is append-bounded (compaction threshold is 1000
        # records; 30 jobs stay far under — the compaction mechanics
        # themselves are unit-tested in test_http_unit).
        journal = out / ".jobs.jsonl"
        assert journal.exists()
        assert sum(1 for _ in open(journal)) < 200


class TestV1:
    def test_models_endpoint(self, v1_server):
        r = httpx.get(f"{v1_server}/models", timeout=30)
        cards = {m["id"]: m for m in r.json()["models"]}
        assert cards["depth-anything-v2"]["supported"] is True
        assert cards["triposr"]["supported"] is False
        assert cards["instantmesh"]["supported"] is False

    def test_health(self, v1_server):
        r = httpx.get(f"{v1_server}/health", timeout=30)
        data = r.json()
        assert data["status"] == "healthy"
        assert data["max_file_size_mb"] == 50.0
        assert "models_loaded" in data and "active_jobs" in data

    def test_full_frontend_flow_ply(self, v1_server):
        """The exact FormData + query params the frontend sends."""
        files = {"file": ("test.png", _test_image_png(), "image/png")}
        params = {
            "model": "depth-anything-v2",
            "output_format": "ply",
            "point_density": "medium",
            "coordinate_system": "WGS84",
            "invert_depth": "true",
            "depth_scale": "15",
            "smooth_depth": "false",
            "fov": "75",
        }
        r = httpx.post(
            f"{v1_server}/process", params=params, files=files, timeout=60
        )
        assert r.status_code == 200
        body = r.json()
        assert body["status"] == "queued" and "job_id" in body

        final = _poll(v1_server, body["job_id"])
        assert final["status"] == "completed", final["message"]
        assert final["progress"] == 100
        res = final["results"]
        assert set(res) == {
            "pointCloud", "gisData", "downloadUrl", "preview",
            "meshPreview", "depthMap",
        }
        assert res["pointCloud"]["format"] == "PLY"
        assert res["pointCloud"]["points"] > 100
        assert res["downloadUrl"] == f"/download/{body['job_id']}"
        assert res["depthMap"].startswith("data:image/png;base64,")
        assert len(res["preview"]["points"]) == len(res["preview"]["colors"])
        assert len(res["preview"]["points"]) <= 20000
        g = res["gisData"]
        assert g["coordinateSystem"] == "WGS84" and g["pointCount"] > 0

        # download artifact and parse it
        d = httpx.get(f"{v1_server}{res['downloadUrl']}", timeout=30)
        assert d.status_code == 200
        from image_to_pointcloud_tpu.io import read_ply

        vert = read_ply(d.content)["vertex"]
        assert len(vert) == res["pointCloud"]["points"]

    def test_status_long_poll(self, v1_server):
        """Beyond-reference ``?wait_ms=`` long-poll (serve/jobs.py
        status_for): completion is observed in at most one request per
        state transition, with no sleep between requests; bad wait_ms
        values 400 without touching the job."""
        files = {"file": ("test.png", _test_image_png(), "image/png")}
        r = httpx.post(f"{v1_server}/process", files=files, timeout=60)
        assert r.status_code == 200
        job_id = r.json()["job_id"]

        # v1 milestones: pending→processing(10)→20→40→60→80→completed —
        # at most one long-poll round per transition (coalescing under
        # load can only reduce the count), plus the arming request.
        requests = 0
        final = None
        deadline = time.time() + 120
        while time.time() < deadline:
            s = httpx.get(
                f"{v1_server}/status/{job_id}?wait_ms=3000", timeout=30
            )
            assert s.status_code == 200
            requests += 1
            data = s.json()
            if data["status"] in ("completed", "error"):
                final = data
                break
        assert final is not None and final["status"] == "completed"
        # 7 transitions + armed-before-first + generous timeout slack
        # (each 3 s wait can also lapse on a slow box): the bound that
        # matters is "far fewer than 0.25 s-granularity polling" while
        # proving the loop isn't spinning (instant unchanged returns
        # would hit hundreds of requests inside 120 s).
        assert requests <= 40, f"{requests} requests — long-poll not blocking"

        # Completed jobs answer instantly regardless of wait_ms.
        t0 = time.time()
        s = httpx.get(f"{v1_server}/status/{job_id}?wait_ms=20000", timeout=30)
        assert s.status_code == 200 and time.time() - t0 < 5.0

        # Validation: non-numeric wait_ms is a 400, not a hang/500.
        s = httpx.get(f"{v1_server}/status/{job_id}?wait_ms=abc", timeout=30)
        assert s.status_code == 400

    def test_process_params_query_and_form(self, v1_server):
        """PARITY.md deviation 9: the reference declares settings as
        query params (backend/app.py:611-620) but its frontend sends
        form fields (App.jsx:953-962), which FastAPI drops. We honor
        both, form over query — assert via the gisData param echo
        (backend/app.py:391-417 key contract)."""
        png = _test_image_png()

        def run(params=None, form=None):
            files = {"file": ("t.png", png, "image/png")}
            r = httpx.post(
                f"{v1_server}/process",
                params=params,
                data=form,
                files=files,
                timeout=60,
            )
            assert r.status_code == 200
            final = _poll(v1_server, r.json()["job_id"])
            assert final["status"] == "completed", final["message"]
            return final["results"]["gisData"]

        settings = {
            "output_format": "ply",
            "point_density": "low",
            "coordinate_system": "UTM",
            "depth_scale": "25",
        }
        # Query-only (reference's documented contract) is honored.
        g = run(params=settings)
        assert g["coordinateSystem"] == "UTM"
        assert g["depthScale"] == 25.0 and g["pointDensity"] == "low"
        # Form-only (what the reference frontend actually sends) is
        # honored too — in the reference these are silently dropped.
        g = run(form=settings)
        assert g["coordinateSystem"] == "UTM"
        assert g["depthScale"] == 25.0 and g["pointDensity"] == "low"
        # Form fields win over conflicting query params.
        g = run(
            params={**settings, "depth_scale": "10"},
            form={"depth_scale": "25"},
        )
        assert g["depthScale"] == 25.0

    def test_concurrent_requests_all_complete(self, v1_server):
        """Eight simultaneous POSTs (same image size) are micro-batched
        onto the accelerator and every job completes with points."""
        import concurrent.futures as cf

        png = _test_image_png(70, 63)

        def submit():
            files = {"file": ("t.png", png, "image/png")}
            r = httpx.post(
                f"{v1_server}/process?output_format=ply",
                files=files, timeout=60,
            )
            assert r.status_code == 200
            return r.json()["job_id"]

        with cf.ThreadPoolExecutor(8) as pool:
            ids = list(pool.map(lambda _: submit(), range(8)))
        assert len(set(ids)) == 8
        for job_id in ids:
            final = _poll(v1_server, job_id)
            assert final["status"] == "completed", final["message"]
            assert final["results"]["pointCloud"]["points"] > 0

    def test_v1_jobs_surface(self, v1_server):
        """The unified v1 service also carries v2's job-management shape
        (SURVEY.md §0): GET /jobs, DELETE /jobs/{id}, /outputs mount."""
        files = {"file": ("t.png", _test_image_png(), "image/png")}
        r = httpx.post(
            f"{v1_server}/process?output_format=ply", files=files, timeout=60
        )
        job_id = r.json()["job_id"]
        final = _poll(v1_server, job_id)
        assert final["status"] == "completed"

        jl = httpx.get(f"{v1_server}/jobs", timeout=30).json()
        assert jl["total"] >= 1
        assert any(j["job_id"] == job_id for j in jl["jobs"])

        # Artifact reachable through the static mount too.
        fname = final["results"]["pointCloud"]["filepath"].split("/")[-1]
        s = httpx.get(f"{v1_server}/outputs/{fname}", timeout=30)
        assert s.status_code == 200 and s.content[:3] == b"ply"

        d = httpx.delete(f"{v1_server}/jobs/{job_id}", timeout=30)
        assert "deleted successfully" in d.json()["message"]
        assert httpx.get(
            f"{v1_server}/status/{job_id}", timeout=30
        ).status_code == 404
        assert httpx.get(
            f"{v1_server}/outputs/{fname}", timeout=30
        ).status_code == 404  # artifact removed with the job

    def test_metrics_endpoint(self, v1_server):
        """GET /metrics renders Prometheus exposition with request and job
        series (runs after the flow tests populate them)."""
        r = httpx.get(f"{v1_server}/metrics", timeout=30)
        assert r.status_code == 200
        assert r.headers["content-type"].startswith("text/plain")
        body = r.text
        assert "# TYPE ipc_http_requests_total counter" in body
        assert "ipc_http_requests_total" in body
        assert 'path="/status/{id}"' in body  # cardinality-bounded labels
        assert "ipc_job_seconds_bucket" in body

    def test_las_output_and_status_404(self, v1_server):
        files = {"file": ("t.png", _test_image_png(), "image/png")}
        r = httpx.post(
            f"{v1_server}/process",
            params={"output_format": "las", "point_density": "low"},
            files=files,
            timeout=60,
        )
        final = _poll(v1_server, r.json()["job_id"])
        assert final["status"] == "completed", final["message"]
        d = httpx.get(f"{v1_server}{final['results']['downloadUrl']}", timeout=30)
        from image_to_pointcloud_tpu.io import read_las

        out = read_las(d.content)
        assert len(out["points"]) == final["results"]["pointCloud"]["points"]

        assert httpx.get(f"{v1_server}/status/nope", timeout=30).status_code == 404

    def test_dummy_model_path(self, v1_server):
        files = {"file": ("t.png", _test_image_png(), "image/png")}
        r = httpx.post(
            f"{v1_server}/process",
            params={"model": "triposr", "output_format": "xyz"},
            files=files,
            timeout=60,
        )
        final = _poll(v1_server, r.json()["job_id"])
        assert final["status"] == "completed", final["message"]
        assert final["results"]["depthMap"].startswith("data:image/png")

    def test_mesh_ply_output(self, v1_server):
        files = {"file": ("t.png", _test_image_png(), "image/png")}
        r = httpx.post(
            f"{v1_server}/process",
            params={"output_format": "mesh_ply", "point_density": "high"},
            files=files,
            timeout=60,
        )
        final = _poll(v1_server, r.json()["job_id"])
        assert final["status"] == "completed", final["message"]
        mp = final["results"]["meshPreview"]
        assert mp and len(mp["faces"]) % 3 == 0 and len(mp["vertices"]) > 0
        d = httpx.get(f"{v1_server}{final['results']['downloadUrl']}", timeout=30)
        from image_to_pointcloud_tpu.io import read_ply

        parsed = read_ply(d.content)
        assert len(parsed["face"]) > 0

    def test_oversize_rejected(self, v1_server):
        big = b"x" * (51 * 1024 * 1024)
        files = {"file": ("big.png", big, "image/png")}
        r = httpx.post(f"{v1_server}/process", files=files, timeout=120)
        assert r.status_code == 413
        assert "exceeds maximum allowed size" in r.json()["detail"]

    def test_non_image_rejected(self, v1_server):
        files = {"file": ("x.txt", b"hello", "text/plain")}
        r = httpx.post(f"{v1_server}/process", files=files, timeout=30)
        assert r.status_code == 400
        assert r.json()["detail"] == "File must be an image"

    def test_malformed_numeric_params_422(self, v1_server):
        """FastAPI 422s malformed numeric query params before creating a
        job (reference backend/app.py:609-620); ours must too (was 500)."""
        r = httpx.post(
            f"{v1_server}/process?depth_scale=abc",
            files={"file": ("t.png", _test_image_png(), "image/png")},
            timeout=30,
        )
        assert r.status_code == 422

    def test_malformed_request_line_gets_400(self, v1_server):
        """A bare 'GET /' (no HTTP version) gets a 400 response, not a
        silent connection reset with a server-side traceback."""
        import socket
        from urllib.parse import urlsplit

        host, port = urlsplit(v1_server).netloc.split(":")
        with socket.create_connection((host, int(port)), timeout=10) as s:
            s.sendall(b"GET /\r\n\r\n")
            data = s.recv(4096)
        assert b"400" in data.split(b"\r\n", 1)[0]

    def test_download_before_completion(self, v1_server):
        assert (
            httpx.get(f"{v1_server}/download/zzz", timeout=30).status_code == 404
        )


# ---------- v2 contract ----------


def test_camera_uvs_roundtrip():
    """_camera_uvs inverts ops.unproject's pinhole mapping exactly:
    unprojecting pixel (u, v) at any depth and projecting back must
    land on (u/(w-1), v/(h-1)) — depth_scale cancels."""
    import numpy as np

    from image_to_pointcloud_tpu.ops.unproject import focal_length
    from image_to_pointcloud_tpu.serve.processor3d import Depth3DProcessor

    h = w = 512
    f = focal_length(h, w, None)
    rng = np.random.default_rng(7)
    u_pix = rng.uniform(0, w - 1, 200)
    v_pix = rng.uniform(0, h - 1, 200)
    z = rng.uniform(0.5, 30.0, 200)
    verts = np.stack(
        [(u_pix - w / 2.0) * z / f, (v_pix - h / 2.0) * z / f, z], axis=1
    )
    uvs = Depth3DProcessor._camera_uvs(None, verts, (h, w))
    np.testing.assert_allclose(uvs[:, 0], u_pix / (w - 1), atol=1e-5)
    np.testing.assert_allclose(uvs[:, 1], v_pix / (h - 1), atol=1e-5)


class TestV2:
    def test_root_and_models(self, v2_server):
        r = httpx.get(f"{v2_server}/", timeout=30)
        data = r.json()
        assert data["status"] == "ready"
        assert data["models"]["depth3d"] is True
        m = httpx.get(f"{v2_server}/models", timeout=30).json()
        assert m["total"] == 1 and m["models"][0]["id"] == "depth3d"

    def test_generation_flow(self, v2_server):
        files = {"file": ("t.png", _test_image_png(128, 128), "image/png")}
        data = {
            "model": "depth3d",
            "texture_resolution": "4096",  # clamps to 2048
            "guidance_scale": "20",  # clamps to 10
            "foreground_ratio": "1.3",
            "remove_background": "true",
            "target_count": "2000",
            "remesh_option": "none",
        }
        r = httpx.post(f"{v2_server}/process", data=data, files=files, timeout=60)
        assert r.status_code == 200
        body = r.json()
        assert body["status"] == "started"

        final = _poll(v2_server, body["job_id"])
        assert final["status"] == "completed", final["message"]
        res = final["results"]
        assert res["mesh"]["format"] == "GLB"
        assert res["metadata"]["texture_resolution"] == 2048
        assert res["metadata"]["guidance_scale"] == 10.0
        assert res["downloadUrl"].endswith("mesh.glb")

        glb = httpx.get(f"{v2_server}{res['downloadUrl']}", timeout=30)
        assert glb.status_code == 200
        assert glb.headers["content-type"] == "model/gltf-binary"
        assert glb.content[:4] == b"glTF"

        ply = httpx.get(f"{v2_server}{res['pointCloudUrl']}", timeout=30)
        assert ply.content[:3] == b"ply"

        meta = httpx.get(f"{v2_server}{res['metadataUrl']}", timeout=30)
        assert meta.json()["vertex_count"] == res["mesh"]["vertices"]

        # static mount serves the same artifact
        s = httpx.get(
            f"{v2_server}/outputs/{body['job_id']}/mesh.glb", timeout=30
        )
        assert s.status_code == 200 and s.content[:4] == b"glTF"

        # jobs list + delete
        jl = httpx.get(f"{v2_server}/jobs", timeout=30).json()
        assert jl["total"] >= 1
        dl = httpx.delete(f"{v2_server}/jobs/{body['job_id']}", timeout=30)
        assert "deleted successfully" in dl.json()["message"]
        assert (
            httpx.get(
                f"{v2_server}/status/{body['job_id']}", timeout=30
            ).status_code
            == 404
        )

    def test_remesh_retopology(self, v2_server):
        """remesh_option != none routes through the native Poisson-class
        reconstruction; the retopologized mesh keeps a baked texture via
        camera-projected UVs (reference SPAR3D textures after remeshing,
        spar3d_processor.py:181-189)."""
        import json as _json
        import struct

        from image_to_pointcloud_tpu import native

        files = {"file": ("t.png", _test_image_png(128, 128), "image/png")}
        data = {
            "model": "depth3d",
            "texture_resolution": "512",
            "target_count": "1500",
            "remesh_option": "triangle",
            "remove_background": "false",
        }
        r = httpx.post(f"{v2_server}/process", data=data, files=files, timeout=60)
        assert r.status_code == 200
        final = _poll(v2_server, r.json()["job_id"])
        assert final["status"] == "completed", final["message"]
        meta = final["results"]["metadata"]
        assert meta["remesh_option"] == "triangle"
        assert meta["has_textures"] is True
        if native.available():
            assert meta["face_count"] <= 3000
        glb = httpx.get(
            f"{v2_server}{final['results']['downloadUrl']}", timeout=30
        )
        assert glb.content[:4] == b"glTF"
        json_len = struct.unpack("<I", glb.content[12:16])[0]
        doc = _json.loads(glb.content[20 : 20 + json_len])
        prim = doc["meshes"][0]["primitives"][0]
        assert "TEXCOORD_0" in prim["attributes"]
        assert doc.get("images"), "remeshed GLB must embed the baked texture"
        uv_acc = doc["accessors"][prim["attributes"]["TEXCOORD_0"]]
        assert uv_acc["count"] == meta["vertex_count"]

    def test_bad_seed_422_without_job(self, v2_server):
        """A non-numeric seed must 422 before any job exists (was: 500
        after job creation, orphaning a forever-pending job)."""
        before = httpx.get(f"{v2_server}/jobs", timeout=30).json()
        r = httpx.post(
            f"{v2_server}/process",
            files={"file": ("t.png", _test_image_png(), "image/png")},
            data={"model": "depth3d", "seed": "abc"},
            timeout=30,
        )
        assert r.status_code == 422
        after = httpx.get(f"{v2_server}/jobs", timeout=30).json()
        assert len(after["jobs"]) == len(before["jobs"])  # no orphan

    def test_unknown_model_rejected(self, v2_server):
        files = {"file": ("t.png", _test_image_png(), "image/png")}
        r = httpx.post(
            f"{v2_server}/process",
            data={"model": "other"},
            files=files,
            timeout=30,
        )
        assert r.status_code == 400

    def test_health(self, v2_server):
        data = httpx.get(f"{v2_server}/health", timeout=30).json()
        assert data["status"] == "healthy"
        assert data["services"]["depth3d"] is True
        assert "accelerator" in data and "device_count" in data["accelerator"]


class TestHttpProtocolEdges:
    """Raw-socket protocol hardening (first-party server, no client lib
    shields these paths): every malformed frame must get a clean error
    response, never a hang, reset, or misparsed pipeline."""

    @pytest.fixture()
    def raw_server(self):
        def make_app():
            from image_to_pointcloud_tpu.serve.http import (
                Router,
                json_response,
            )

            class App:
                def __init__(self):
                    self.router = Router()

                    @self.router.get("/ok")
                    async def ok(req):
                        return json_response({"ok": True})

                    @self.router.post("/ok")
                    async def ok_post(req):
                        return json_response({"got": len(req.body)})

            return App(), "*"

        srv = _ServerThread(make_app)
        yield srv
        srv.stop()

    def _send(self, port, payload: bytes) -> bytes:
        import socket

        with socket.create_connection(("127.0.0.1", port), timeout=5) as s:
            s.sendall(payload)
            s.settimeout(5)
            out = b""
            try:
                while True:
                    chunk = s.recv(4096)
                    if not chunk:
                        break
                    out += chunk
            except TimeoutError:
                pass
            return out

    def test_negative_content_length_400(self, raw_server):
        r = self._send(
            raw_server.port,
            b"GET /ok HTTP/1.1\r\nContent-Length: -5\r\n\r\n",
        )
        assert r.startswith(b"HTTP/1.1 400")

    def test_huge_content_length_413(self, raw_server):
        r = self._send(
            raw_server.port,
            b"GET /ok HTTP/1.1\r\nContent-Length: 99999999999999999\r\n\r\n",
        )
        assert r.startswith(b"HTTP/1.1 413")

    def test_chunked_te_411_and_no_desync(self, raw_server):
        r = self._send(
            raw_server.port,
            b"POST /ok HTTP/1.1\r\nTransfer-Encoding: chunked\r\n\r\n"
            b"5\r\nhello\r\n0\r\n\r\n",
        )
        assert r.startswith(b"HTTP/1.1 411")
        # Exactly one response: the chunk stream must NOT be parsed as
        # pipelined follow-up requests.
        assert r.count(b"HTTP/1.1 ") == 1

    def test_oversized_headers_431(self, raw_server):
        r = self._send(
            raw_server.port,
            b"GET /ok HTTP/1.1\r\nX-A: " + b"b" * 70000 + b"\r\n\r\n",
        )
        assert r.startswith(b"HTTP/1.1 431")

    def test_expect_100_continue(self, raw_server):
        import socket

        with socket.create_connection(
            ("127.0.0.1", raw_server.port), timeout=5
        ) as s:
            s.sendall(
                b"POST /ok HTTP/1.1\r\nContent-Length: 5\r\n"
                b"Expect: 100-continue\r\n\r\n"
            )
            s.settimeout(5)
            interim = s.recv(64)
            assert interim.startswith(b"HTTP/1.1 100 Continue")
            s.sendall(b"hello")
            final = s.recv(4096)
            assert b"HTTP/1.1 200" in final

    def test_stalled_body_408(self, raw_server, monkeypatch):
        """A client that declares a Content-Length and stops sending is
        reaped with 408 after BODY_STALL_TIMEOUT_S (slowloris-via-body
        guard); slow-but-active uploads keep the clock resetting."""
        import socket

        from image_to_pointcloud_tpu.serve.http import HttpServer

        monkeypatch.setattr(HttpServer, "BODY_STALL_TIMEOUT_S", 0.5)
        with socket.create_connection(
            ("127.0.0.1", raw_server.port), timeout=10
        ) as s:
            s.sendall(
                b"POST /ok HTTP/1.1\r\nContent-Length: 100\r\n\r\nonly-ten."
            )
            s.settimeout(10)
            out = s.recv(4096)
            assert out.startswith(b"HTTP/1.1 408")
            # connection is closed after the error
            assert s.recv(4096) == b""

    def test_slow_active_body_completes(self, raw_server, monkeypatch):
        """Chunks arriving within the stall window reset it — a slow
        upload whose total time exceeds the window still succeeds."""
        import socket
        import time as _time

        from image_to_pointcloud_tpu.serve.http import HttpServer

        monkeypatch.setattr(HttpServer, "BODY_STALL_TIMEOUT_S", 0.6)
        with socket.create_connection(
            ("127.0.0.1", raw_server.port), timeout=10
        ) as s:
            s.sendall(b"POST /ok HTTP/1.1\r\nContent-Length: 12\r\n\r\n")
            for chunk in (b"abc", b"def", b"ghi", b"jkl"):
                _time.sleep(0.4)  # 4 x 0.4s = 1.6s total > 0.6s window
                s.sendall(chunk)
            s.settimeout(10)
            out = b""
            while b'"got"' not in out:
                chunk = s.recv(4096)
                assert chunk, f"connection closed early: {out!r}"
                out += chunk
            assert b"HTTP/1.1 200" in out
            assert b'"got": 12' in out

    def test_gzip_star_refusal_with_explicit_gzip(self):
        from image_to_pointcloud_tpu.serve.http import _accepts_gzip

        assert _accepts_gzip("*;q=0, gzip") is True
        assert _accepts_gzip("gzip;q=0, *") is False
        assert _accepts_gzip("*") is True
        assert _accepts_gzip("identity") is False


class TestOpenApi:
    """The reference's FastAPI apps auto-serve /openapi.json; ours is
    authored (serve/openapi.py) and must stay in sync with the routers."""

    def _router_paths(self, app) -> set:
        import re as _re

        paths = set()
        for method, pattern, _fn in app.router._routes:
            # Recover the template from the compiled pattern.
            t = pattern.pattern.strip("^$")
            t = _re.sub(r"\(\?P<(\w+)>\[\^/\]\+\)", r"{\1}", t)
            paths.add(t)
        return paths

    def test_v1_document_matches_router(self, tmp_path):
        from image_to_pointcloud_tpu.serve.app_v1 import V1Service
        from image_to_pointcloud_tpu.serve.openapi import v1_openapi

        svc = V1Service(output_dir=str(tmp_path), durable_jobs=False)
        doc = v1_openapi()
        assert doc["openapi"].startswith("3.")
        routed = self._router_paths(svc)
        for path in doc["paths"]:
            assert path in routed, f"{path} documented but not routed"
        # The reference's five core endpoints are all documented.
        for p in ("/process", "/status/{job_id}", "/download/{job_id}",
                  "/models", "/health"):
            assert p in doc["paths"]
        # The 8 reference query params (backend/app.py:611-620) + file.
        params = {
            q["name"] for q in doc["paths"]["/process"]["post"]["parameters"]
        }
        assert params >= {
            "model", "output_format", "point_density", "coordinate_system",
            "invert_depth", "depth_scale", "smooth_depth", "fov",
        }

    def test_v2_document_matches_router(self, tmp_path):
        from image_to_pointcloud_tpu.serve.app_v2 import V2Service
        from image_to_pointcloud_tpu.serve.openapi import v2_openapi

        svc = V2Service(output_dir=str(tmp_path), durable_jobs=False)
        doc = v2_openapi()
        routed = self._router_paths(svc)
        for path in doc["paths"]:
            assert path in routed, f"{path} documented but not routed"
        form = doc["paths"]["/process"]["post"]["requestBody"][
            "content"]["multipart/form-data"]["schema"]["properties"]
        # Clamp ranges mirror backend/main.py:258-267.
        assert form["texture_resolution"]["minimum"] == 512
        assert form["target_count"]["maximum"] == 20000


class TestLazyExport:
    """Deferred artifact export (PARITY.md deviation 11): /process
    completes without touching disk; the first GET /download writes the
    file. The v1 contract only promises the artifact exists when fetched
    (reference backend/app.py:681-700)."""

    @pytest.fixture(scope="class")
    def lazy_server(self, tmp_path_factory):
        out = tmp_path_factory.mktemp("outputs_lazy")

        def make():
            from image_to_pointcloud_tpu.serve.app_v1 import create_v1_app

            return (
                create_v1_app(
                    output_dir=str(out),
                    models=_tiny_model_manager(),
                    durable_jobs=False,
                ),
                "*",
            )

        srv = _ServerThread(make)
        yield srv, out
        srv.stop()

    def _submit(self, base, fmt="ply"):
        files = {"file": ("t.png", _test_image_png(), "image/png")}
        r = httpx.post(
            f"{base}/process",
            params={"output_format": fmt},
            files=files,
            timeout=60,
        )
        assert r.status_code == 200
        jid = r.json()["job_id"]
        final = _poll(base, jid)
        assert final["status"] == "completed", final["message"]
        return jid, final

    def test_no_file_until_download_then_valid(self, lazy_server):
        srv, out = lazy_server
        base = f"http://127.0.0.1:{srv.port}"
        jid, final = self._submit(base, "ply")
        fp = Path(final["results"]["pointCloud"]["filepath"])
        assert not fp.exists(), "lazy export must not write during the job"
        assert srv.app._pending_export_bytes > 0

        d = httpx.get(f"{base}/download/{jid}", timeout=30)
        assert d.status_code == 200
        assert fp.exists()
        from image_to_pointcloud_tpu.io import read_ply

        vert = read_ply(d.content)["vertex"]
        assert len(vert) == final["results"]["pointCloud"]["points"]
        # Entry released after materialization; re-download serves the file.
        assert jid not in srv.app._pending_exports
        d2 = httpx.get(f"{base}/download/{jid}", timeout=30)
        assert d2.status_code == 200 and d2.content == d.content

    def test_las_lazy_roundtrip(self, lazy_server):
        srv, _ = lazy_server
        base = f"http://127.0.0.1:{srv.port}"
        jid, final = self._submit(base, "las")
        fp = Path(final["results"]["pointCloud"]["filepath"])
        assert fp.suffix == ".las" and not fp.exists()
        d = httpx.get(f"{base}/download/{jid}", timeout=30)
        assert d.status_code == 200 and d.content[:4] == b"LASF"

    def test_delete_discards_pending(self, lazy_server):
        srv, _ = lazy_server
        base = f"http://127.0.0.1:{srv.port}"
        jid, final = self._submit(base, "ply")
        assert jid in srv.app._pending_exports
        before = srv.app._pending_export_bytes
        r = httpx.delete(f"{base}/jobs/{jid}", timeout=30)
        assert r.status_code == 200
        assert jid not in srv.app._pending_exports
        assert srv.app._pending_export_bytes < before
        assert not Path(final["results"]["pointCloud"]["filepath"]).exists()

    def test_spill_bounds_pending_ram(self, lazy_server):
        srv, _ = lazy_server
        base = f"http://127.0.0.1:{srv.port}"
        jid1, final1 = self._submit(base, "ply")
        # Shrink the budget below one entry: the NEXT defer spills the
        # older pending entry to disk (FIFO), never the newest.
        srv.app.lazy_export_max_bytes = 1
        try:
            jid2, final2 = self._submit(base, "ply")
            fp1 = Path(final1["results"]["pointCloud"]["filepath"])
            deadline = time.time() + 30
            while not fp1.exists() and time.time() < deadline:
                time.sleep(0.1)
            assert fp1.exists(), "older entry should spill to disk"
            assert jid2 in srv.app._pending_exports
        finally:
            srv.app.lazy_export_max_bytes = 256 * 1024 * 1024

    def test_drain_writes_all_pending(self, lazy_server):
        srv, _ = lazy_server
        base = f"http://127.0.0.1:{srv.port}"
        jid, final = self._submit(base, "xyz")
        fp = Path(final["results"]["pointCloud"]["filepath"])
        assert not fp.exists()
        fut = asyncio.run_coroutine_threadsafe(
            _as_coro(srv.app.drain_pending_exports), srv.loop
        )
        n = fut.result(timeout=30)
        assert n >= 1 and fp.exists()
        assert jid not in srv.app._pending_exports

    def test_concurrent_downloads_one_export(self, lazy_server):
        """Two simultaneous first-downloads of a pending artifact must
        both succeed with identical bytes (idempotent _start_export —
        one executor write, second awaiter shields on the same future)."""
        import concurrent.futures as cf

        srv, _ = lazy_server
        base = f"http://127.0.0.1:{srv.port}"
        jid, final = self._submit(base, "ply")
        assert jid in srv.app._pending_exports

        def dl():
            return httpx.get(f"{base}/download/{jid}", timeout=30)

        with cf.ThreadPoolExecutor(2) as pool:
            r1, r2 = list(pool.map(lambda _: dl(), range(2)))
        assert r1.status_code == 200 and r2.status_code == 200
        assert r1.content == r2.content
        assert jid not in srv.app._pending_exports

    def test_eager_mode_writes_during_job(self, tmp_path_factory):
        out = tmp_path_factory.mktemp("outputs_eager")

        def make():
            from image_to_pointcloud_tpu.serve.app_v1 import create_v1_app

            return (
                create_v1_app(
                    output_dir=str(out),
                    models=_tiny_model_manager(),
                    durable_jobs=False,
                    lazy_export=False,
                ),
                "*",
            )

        srv = _ServerThread(make)
        try:
            base = f"http://127.0.0.1:{srv.port}"
            jid, final = self._submit(base, "ply")
            assert Path(final["results"]["pointCloud"]["filepath"]).exists()
            assert not srv.app._pending_exports
        finally:
            srv.stop()


async def _as_coro(fn, *a):
    return fn(*a)


# ---------- multi-chip serving rehearsal (VERDICT r4 item 6) ----------


class TestV1MeshServing:
    """The ACTUAL v1 service booted over the virtual 8-device mesh
    (``--mesh data=8`` equivalent), concurrent requests coalescing in
    the micro-batcher (6 jobs pad to the mesh's data axis), responses
    byte-equal vs the single-device server — extends the dryrun's DP=8
    graph parity (MULTICHIP_r*.json) to the HTTP serving surface.
    Replaces-the-reference analogue: one BackgroundTask per image on
    one device (backend/app.py:662)."""

    N_JOBS = 6  # deliberately not divisible by 8: exercises _data_pad

    @staticmethod
    def _make_server(out_dir, mesh):
        def make():
            import sys

            sys.path.insert(0, "tests")
            from test_model_parity import _build_pair

            from image_to_pointcloud_tpu.pipeline.graph import DepthPipeline
            from image_to_pointcloud_tpu.serve.app_v1 import create_v1_app
            from image_to_pointcloud_tpu.serve.models import ModelManager

            _, model, variables = _build_pair(
                hidden=32, layers=4, heads=2, image_size=56
            )
            mm = ModelManager(use_bf16=False, use_flash_attention=False)
            mm._cache["depth-anything-v2"] = DepthPipeline(
                model.cfg, variables["params"], model_target=56, mesh=mesh
            )
            return (
                create_v1_app(
                    output_dir=str(out_dir),
                    models=mm,
                    durable_jobs=False,
                    batch_window_ms=200.0,
                    max_batch=8,
                ),
                "*",
            )

        return _ServerThread(make)

    def _run_jobs(self, base):
        """Submit N distinct same-size images concurrently; return
        [(status_results, ply_bytes)] in submission order."""
        from concurrent.futures import ThreadPoolExecutor

        imgs = [_test_image_png(70, 63)] + [
            encode_png(
                np.random.default_rng(100 + i)
                .integers(0, 256, (70, 63, 3))
                .astype(np.uint8)
            )
            for i in range(1, self.N_JOBS)
        ]

        def submit(png):
            r = httpx.post(
                f"{base}/process",
                params={"output_format": "ply", "point_density": "medium"},
                files={"file": ("mesh.png", png, "image/png")},
                timeout=60,
            )
            assert r.status_code == 200
            return r.json()["job_id"]

        with ThreadPoolExecutor(self.N_JOBS) as pool:
            jids = list(pool.map(submit, imgs))
        out = []
        for jid in jids:
            final = _poll(base, jid, timeout=300)
            assert final["status"] == "completed", final.get("message")
            dl = httpx.get(f"{base}/download/{jid}", timeout=120)
            assert dl.status_code == 200
            out.append((final["results"], dl.content))
        return out

    def test_dp8_http_serving_byte_equal(self, tmp_path_factory):
        from image_to_pointcloud_tpu.parallel.sharding import make_mesh

        srv_mesh = self._make_server(
            tmp_path_factory.mktemp("outputs_mesh8"), make_mesh(data=8)
        )
        try:
            mesh_results = self._run_jobs(f"http://127.0.0.1:{srv_mesh.port}")
        finally:
            srv_mesh.stop()
        srv_one = self._make_server(
            tmp_path_factory.mktemp("outputs_one"), None
        )
        try:
            one_results = self._run_jobs(f"http://127.0.0.1:{srv_one.port}")
        finally:
            srv_one.stop()

        import tempfile

        from image_to_pointcloud_tpu.io import read_ply

        def _parse(ply_bytes):
            with tempfile.NamedTemporaryFile(suffix=".ply") as f:
                f.write(ply_bytes)
                f.flush()
                return read_ply(f.name)["vertex"]

        for i, ((rm, plym), (r1, ply1)) in enumerate(
            zip(mesh_results, one_results)
        ):
            # Artifact: same point set within the established DP
            # tolerances (__graft_entry__.dryrun_multichip uses
            # atol=1e-4 f32 / 3e-3 quantized — sharded reductions
            # reorder float math), colors exactly equal.
            vm = _parse(plym)
            v1_ = _parse(ply1)
            assert vm.shape == v1_.shape, f"job {i}: point count differs"
            for f in ("x", "y", "z"):
                np.testing.assert_allclose(
                    vm[f], v1_[f], atol=3e-3, err_msg=f"job {i} {f}"
                )
            for f in ("red", "green", "blue"):
                np.testing.assert_array_equal(vm[f], v1_[f], err_msg=str(i))
            # Inline preview: same decimation stride, same colors.
            pm = np.asarray(rm["preview"]["points"], np.float32)
            p1 = np.asarray(r1["preview"]["points"], np.float32)
            assert pm.shape == p1.shape, i
            np.testing.assert_allclose(pm, p1, atol=3e-3)
            assert rm["preview"]["colors"] == r1["preview"]["colors"], i
            # Depth preview PNG data URL (u8 PLASMA bins) and GIS data.
            assert rm["depthMap"] == r1["depthMap"], i
            bm = rm["gisData"]["bounds"]
            b1 = r1["gisData"]["bounds"]
            for key in bm:
                np.testing.assert_allclose(
                    np.asarray(bm[key]), np.asarray(b1[key]), atol=3e-3
                )
            assert (
                rm["gisData"]["pointCount"] == r1["gisData"]["pointCount"]
            ), i


def test_bucket_sizes_contract():
    """Bucket set: powers of two + 3·2^k mids (12, 24, …) capped at
    max_batch — mids exist because closed-loop cohorts land between
    powers of two (round-5 drain logs: n=12 padded to 16, +33% dropped
    device work). Must always contain 1 and max_batch, ascending."""
    from image_to_pointcloud_tpu.serve.batching import bucket_sizes

    assert bucket_sizes(16) == [1, 2, 4, 8, 12, 16]
    assert bucket_sizes(32) == [1, 2, 4, 8, 12, 16, 24, 32]
    assert bucket_sizes(8) == [1, 2, 4, 8]
    assert bucket_sizes(1) == [1]
    for mb in (3, 5, 24, 48):
        bs = bucket_sizes(mb)
        assert bs[0] == 1 and bs[-1] == mb and bs == sorted(set(bs))
