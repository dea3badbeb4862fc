"""Unit tests for the first-party HTTP runtime: parsing, routing, registry,
micro-batching."""

import asyncio

import numpy as np
import pytest

from image_to_pointcloud_tpu.serve.http import (
    HTTPError,
    Request,
    Response,
    Router,
    json_response,
)
from image_to_pointcloud_tpu.serve.jobs import JobRegistry, JobStatus


def _req(method="GET", path="/", headers=None, body=b"", query=None):
    return Request(
        method=method,
        path=path,
        query=query or {},
        headers=headers or {},
        body=body,
    )


class TestMultipart:
    def _multipart(self, boundary, parts):
        out = b""
        for head, content in parts:
            out += b"--" + boundary + b"\r\n" + head + b"\r\n\r\n" + content + b"\r\n"
        return out + b"--" + boundary + b"--\r\n"

    def test_file_and_fields(self):
        b = b"XbOuNdX"
        body = self._multipart(
            b,
            [
                (
                    b'Content-Disposition: form-data; name="file"; filename="a.png"\r\n'
                    b"Content-Type: image/png",
                    b"\x89PNGdata",
                ),
                (b'Content-Disposition: form-data; name="model"', b"depth-anything-v2"),
            ],
        )
        req = _req(
            "POST",
            "/process",
            headers={"content-type": f'multipart/form-data; boundary="{b.decode()}"'},
            body=body,
        )
        assert req.files["file"].filename == "a.png"
        assert req.files["file"].content_type == "image/png"
        assert req.files["file"].data == b"\x89PNGdata"
        assert req.form["model"] == "depth-anything-v2"

    def test_binary_content_with_crlf(self):
        b = b"bnd"
        payload = b"ab\r\ncd" * 10
        body = self._multipart(
            b,
            [(b'Content-Disposition: form-data; name="file"; filename="x"', payload)],
        )
        req = _req(
            "POST", "/p",
            headers={"content-type": f"multipart/form-data; boundary={b.decode()}"},
            body=body,
        )
        assert req.files["file"].data == payload

    def test_trailing_newline_payload_preserved(self):
        """Only the ONE framing \\r\\n is removed per side — a payload
        that genuinely ends in newline bytes must arrive intact
        (regression: bytes.strip ate every trailing 0x0D/0x0A)."""
        b = b"bnd2"
        for payload in (b"data ends in LF\n", b"crlf tail\r\n", b"\r\nlead"):
            body = self._multipart(
                b,
                [(b'Content-Disposition: form-data; name="file"; filename="x"', payload)],
            )
            req = _req(
                "POST", "/p",
                headers={"content-type": f"multipart/form-data; boundary={b.decode()}"},
                body=body,
            )
            assert req.files["file"].data == payload

    def test_urlencoded_form(self):
        req = _req(
            "POST", "/p",
            headers={"content-type": "application/x-www-form-urlencoded"},
            body=b"a=1&b=hello%20world",
        )
        assert req.form == {"a": "1", "b": "hello world"}

    def test_garbage_body_no_crash(self):
        req = _req(
            "POST", "/p",
            headers={"content-type": "multipart/form-data; boundary=zz"},
            body=b"\x00\xff random garbage without boundary",
        )
        assert req.files == {} and req.form == {}


class TestRouter:
    def _dispatch(self, router, req):
        return asyncio.get_event_loop().run_until_complete(router.dispatch(req))

    def test_path_params_and_405(self):
        r = Router()

        @r.get("/status/{job_id}")
        async def status(req):
            return json_response({"id": req.path_params["job_id"]})

        loop = asyncio.new_event_loop()
        try:
            resp = loop.run_until_complete(r.dispatch(_req(path="/status/abc-123")))
            assert b"abc-123" in resp.body
            with pytest.raises(HTTPError) as e:
                loop.run_until_complete(
                    r.dispatch(_req("POST", "/status/abc-123"))
                )
            assert e.value.status == 405
            with pytest.raises(HTTPError) as e:
                loop.run_until_complete(r.dispatch(_req(path="/nope")))
            assert e.value.status == 404
        finally:
            loop.close()

    def test_static_mount_traversal_blocked(self, tmp_path):
        (tmp_path / "ok.txt").write_bytes(b"fine")
        secret = tmp_path.parent / "secret.txt"
        secret.write_bytes(b"secret")
        r = Router()
        r.mount_static("/outputs", tmp_path)
        loop = asyncio.new_event_loop()
        try:
            resp = loop.run_until_complete(r.dispatch(_req(path="/outputs/ok.txt")))
            assert resp.body == b"fine"
            with pytest.raises(HTTPError) as e:
                loop.run_until_complete(
                    r.dispatch(_req(path="/outputs/../secret.txt"))
                )
            assert e.value.status == 404
        finally:
            loop.close()

    def test_cors_preflight(self):
        r = Router()
        loop = asyncio.new_event_loop()
        try:
            resp = loop.run_until_complete(r.dispatch(_req("OPTIONS", "/anything")))
            assert resp.status == 204
        finally:
            loop.close()

    def test_response_encoding(self):
        resp = json_response({"a": 1}, 200)
        raw = resp.encode("*")
        assert raw.startswith(b"HTTP/1.1 200 OK\r\n")
        assert b"access-control-allow-origin: *" in raw
        assert raw.endswith(b'{"a": 1}')


class TestJobRegistry:
    def test_concurrent_updates_are_serialized(self):
        async def run():
            reg = JobRegistry()
            job = await reg.create(model="m")

            async def bump(n):
                for _ in range(n):
                    await reg.update(job.job_id, progress=min(100, 1))

            await asyncio.gather(*[bump(50) for _ in range(8)])
            await reg.update(
                job.job_id, status=JobStatus.COMPLETED, progress=100
            )
            got = reg.get(job.job_id)
            assert got.status == "completed" and got.progress == 100
            assert len(reg) == 1
            assert await reg.delete(job.job_id)
            assert not await reg.delete(job.job_id)

        asyncio.run(run())

    def test_wait_change_wakes_on_update(self):
        async def run():
            reg = JobRegistry()
            job = await reg.create()

            async def later():
                await asyncio.sleep(0.05)
                await reg.update(job.job_id, progress=40, message="Working")

            t0 = asyncio.get_running_loop().time()
            task = asyncio.ensure_future(later())
            # Generous wait; must return at the update, not the timeout.
            await reg.wait_change(job.job_id, 5000)
            elapsed = asyncio.get_running_loop().time() - t0
            await task
            assert elapsed < 2.0, f"woke by timeout, not update ({elapsed:.2f}s)"
            assert reg.get(job.job_id).progress == 40

        asyncio.run(run())

    def test_wait_change_timeout_and_terminal(self):
        async def run():
            reg = JobRegistry()
            job = await reg.create()
            t0 = asyncio.get_running_loop().time()
            await reg.wait_change(job.job_id, 80)  # nothing changes
            assert asyncio.get_running_loop().time() - t0 >= 0.07
            # Terminal and unknown jobs return immediately.
            await reg.update(job.job_id, status=JobStatus.COMPLETED)
            t0 = asyncio.get_running_loop().time()
            await reg.wait_change(job.job_id, 5000)
            await reg.wait_change("nope", 5000)
            assert asyncio.get_running_loop().time() - t0 < 1.0

        asyncio.run(run())

    def test_wait_change_wakes_on_delete(self):
        async def run():
            from image_to_pointcloud_tpu.serve.http import HTTPError

            reg = JobRegistry()
            job = await reg.create()

            async def later():
                await asyncio.sleep(0.05)
                await reg.delete(job.job_id)

            task = asyncio.ensure_future(later())
            with pytest.raises(HTTPError) as ei:
                await reg.status_for(job.job_id, "5000")
            await task
            assert ei.value.status == 404

        asyncio.run(run())

    def test_status_for_validates_wait_ms(self):
        async def run():
            from image_to_pointcloud_tpu.serve.http import HTTPError

            reg = JobRegistry()
            job = await reg.create()
            # None → instant snapshot, no validation involved.
            assert (await reg.status_for(job.job_id, None)) is job
            # Non-numeric → 400.
            with pytest.raises(HTTPError) as ei:
                await reg.status_for(job.job_id, "soon")
            assert ei.value.status == 400
            # Negative clamps to 0 (instant), absurd values clamp to 30 s
            # (not waited out here — just must not raise).
            assert (await reg.status_for(job.job_id, "-5")) is job
            with pytest.raises(HTTPError):
                await reg.status_for("nope", "100")

        asyncio.run(run())

    def test_each_transition_gets_a_fresh_event(self):
        async def run():
            reg = JobRegistry()
            job = await reg.create()
            await reg.update(job.job_id, progress=10)  # signal, no waiter
            # A waiter arming AFTER that signal must not see a stale set().
            t0 = asyncio.get_running_loop().time()
            await reg.wait_change(job.job_id, 80)
            assert asyncio.get_running_loop().time() - t0 >= 0.07

        asyncio.run(run())

    def test_v1_v2_shapes(self):
        async def run():
            reg = JobRegistry()
            job = await reg.create(model="depth-anything-v2")
            v1 = job.to_v1()
            assert set(v1) == {"job_id", "status", "progress", "message", "results"}
            v2 = job.to_v2()
            assert "created_at" in v2 and "model" in v2 and "results" not in v2

        asyncio.run(run())


class TestBatchingQueue:
    def test_coalesces_same_signature(self, rng):
        from image_to_pointcloud_tpu.pipeline.graph import (
            PipelineOptions,
            PipelineResult,
        )
        from image_to_pointcloud_tpu.serve.batching import BatchingQueue

        calls = []

        class FakePipeline:
            # The batcher drives the real split dispatch interface
            # (submit_batch → collect, pipeline/graph.py:572/604).
            def submit_batch(self, images, depth_scales=None, options=None):
                calls.append(len(images))
                return list(images)

            def collect(self, handle, want_packed=True, want_preview_rgb=True):
                return [
                    PipelineResult(
                        points=np.zeros((1, 3), np.float32),
                        colors=np.zeros((1, 3), np.float32),
                        depth_preview_rgb=None,
                        raw_point_count=1,
                        kept_point_count=1,
                    )
                    for _ in handle
                ]

        async def run():
            q = BatchingQueue(FakePipeline(), max_batch=8, window_ms=30.0)
            img = rng.integers(0, 255, (16, 16, 3)).astype(np.uint8)
            opts = PipelineOptions()
            outs = await asyncio.gather(
                *[q.submit(img, 10.0, opts) for _ in range(5)]
            )
            assert len(outs) == 5
            await q.close()  # no worker task may outlive the loop
            await q.close()  # idempotent

        asyncio.run(run())
        assert max(calls) >= 4  # most requests coalesced into one dispatch
        # Dispatched batch sizes are power-of-two buckets: arbitrary
        # arrival counts must not each compile their own graph signature.
        assert all(c & (c - 1) == 0 for c in calls), calls

    def test_close_cancels_in_flight(self, rng):
        """close() must also cancel items the worker has already dequeued
        into its current batch (not just ones still in the queue) — their
        submitters would otherwise await forever during shutdown."""
        from image_to_pointcloud_tpu.pipeline.graph import PipelineOptions
        from image_to_pointcloud_tpu.serve.batching import BatchingQueue

        class NeverPipeline:
            def submit_batch(self, images, depth_scales=None, options=None):
                raise AssertionError("must not dispatch")

        async def run():
            # Long window: the worker dequeues the item, then sleeps in
            # the coalescing window when close() lands.
            q = BatchingQueue(NeverPipeline(), window_ms=5000.0)
            img = rng.integers(0, 255, (8, 8, 3)).astype(np.uint8)
            task = asyncio.ensure_future(
                q.submit(img, 10.0, PipelineOptions())
            )
            await asyncio.sleep(0.1)  # worker is inside the window
            await q.close()
            with pytest.raises(asyncio.CancelledError):
                await task

        asyncio.run(run())

    def test_failed_drain_does_not_poison_pipeline(self, rng):
        """With pipelined drains (2 in flight), one batch failing on
        dispatch must fail only its own submitters — later batches
        still process, and the drain semaphore is released (a leak
        would deadlock the queue after two failures)."""
        from image_to_pointcloud_tpu.pipeline.graph import (
            PipelineOptions,
            PipelineResult,
        )
        from image_to_pointcloud_tpu.serve.batching import BatchingQueue

        calls = {"n": 0}

        class EveryOtherFails:
            def submit_batch(self, images, depth_scales=None, options=None):
                calls["n"] += 1
                if calls["n"] % 2 == 1:
                    raise RuntimeError("UNAVAILABLE: relay reset")
                return list(images)

            def collect(self, handle, want_packed=True, want_preview_rgb=True):
                return [
                    PipelineResult(
                        points=np.zeros((1, 3), np.float32),
                        colors=np.zeros((1, 3), np.float32),
                        depth_preview_rgb=None,
                        raw_point_count=1,
                        kept_point_count=1,
                    )
                    for _ in handle
                ]

        async def run():
            q = BatchingQueue(EveryOtherFails(), max_batch=4, window_ms=1.0)
            img = rng.integers(0, 255, (8, 8, 3)).astype(np.uint8)
            opts = PipelineOptions()
            results = []
            # Serial submits force 4+ distinct drains through the
            # semaphore; odd drains raise, even drains succeed.
            for _ in range(4):
                try:
                    results.append(await q.submit(img, 10.0, opts))
                except RuntimeError as e:
                    results.append(e)
            await q.close()
            return results

        results = asyncio.run(run())
        oks = [r for r in results if not isinstance(r, Exception)]
        errs = [r for r in results if isinstance(r, Exception)]
        assert len(oks) == 2 and len(errs) == 2
        assert all("UNAVAILABLE" in str(e) for e in errs)


class TestStaticUI:
    """The first-party frontend is served from the /ui static mount
    (frontend/ at the repo root; reference serves its React app from a
    separate Vite server — frontend/vite.config.js)."""

    def _router(self):
        from pathlib import Path

        r = Router()
        r.mount_static("/ui", Path(__file__).resolve().parents[1] / "frontend")
        return r

    def test_index_and_assets_inline(self):
        r = self._router()

        async def run():
            # extensionless mount redirects so relative asset URLs work
            resp = await r.dispatch(_req("GET", "/ui"))
            assert resp.status == 308 and resp.headers["location"] == "/ui/"
            for path, ctype in [
                ("/ui/", "text/html"),
                ("/ui/index.html", "text/html"),
                ("/ui/src/app.js", "text/javascript"),
                ("/ui/src/viewer.js", "text/javascript"),
                ("/ui/src/style.css", "text/css"),
            ]:
                resp = await r.dispatch(_req("GET", path))
                assert resp.status == 200, path
                assert resp.headers["content-type"].startswith(ctype), path
                # UI assets must render inline, not download.
                assert "content-disposition" not in {
                    k.lower() for k in resp.headers
                }, path
                assert len(resp.body) > 100, path

        asyncio.run(run())

    def test_traversal_blocked(self):
        r = self._router()

        async def run():
            with pytest.raises(HTTPError) as ei:
                await r.dispatch(_req("GET", "/ui/../SURVEY.md"))
            assert ei.value.status == 404

        asyncio.run(run())

    def test_dotfiles_blocked(self, tmp_path):
        (tmp_path / ".jobs.jsonl").write_text("secret")
        r = Router()
        r.mount_static("/outputs", tmp_path)

        async def run():
            with pytest.raises(HTTPError) as ei:
                await r.dispatch(_req("GET", "/outputs/.jobs.jsonl"))
            assert ei.value.status == 404

        asyncio.run(run())

    def test_missing_asset_404(self):
        r = self._router()

        async def run():
            with pytest.raises(HTTPError) as ei:
                await r.dispatch(_req("GET", "/ui/src/nope.js"))
            assert ei.value.status == 404

        asyncio.run(run())


class TestJobJournal:
    """Durable job registry: survives restarts (the reference loses all
    jobs — SURVEY.md §5 checkpoint/resume: none)."""

    def test_restart_semantics(self, tmp_path):
        path = tmp_path / "jobs.jsonl"

        async def first_life():
            reg = JobRegistry(journal_path=path)
            done = await reg.create(model="depth-anything-v2")
            await reg.update(
                done.job_id, status=JobStatus.COMPLETED, progress=100,
                results={
                    "pointCloud": {"filepath": "/tmp/x.ply", "points": 9},
                    "downloadUrl": f"/download/{done.job_id}",
                    "preview": {"points": [[0, 0, 0]] * 1000},
                    "depthMap": "data:image/png;base64,xxxx",
                },
            )
            inflight = await reg.create(model="depth-anything-v2")
            await reg.update(
                inflight.job_id, status=JobStatus.PROCESSING, progress=40
            )
            gone = await reg.create()
            await reg.update(gone.job_id, status=JobStatus.ERROR, message="x")
            assert await reg.delete(gone.job_id)
            reg.close()
            return done.job_id, inflight.job_id, gone.job_id

        done_id, inflight_id, gone_id = asyncio.run(first_life())

        reg2 = JobRegistry(journal_path=path)
        # Completed job survives with download info; heavy inline preview
        # payloads are slimmed (frontend regenerates them client-side).
        job = reg2.get(done_id)
        assert job is not None and job.status == JobStatus.COMPLETED
        # Completed jobs keep progress 100 across restarts (regression:
        # a refactor reset terminal progress to 0 on restore).
        assert job.progress == 100
        assert job.results["pointCloud"]["points"] == 9
        assert "preview" not in job.results and "depthMap" not in job.results
        # Mid-flight job fails explicitly instead of polling forever.
        j2 = reg2.get(inflight_id)
        assert j2.status == JobStatus.ERROR
        assert "restart" in j2.message
        # Deleted job stays deleted.
        assert reg2.get(gone_id) is None
        reg2.close()

    def test_corrupt_lines_skipped_and_compaction(self, tmp_path):
        path = tmp_path / "jobs.jsonl"

        async def make():
            reg = JobRegistry(journal_path=path)
            for _ in range(5):
                j = await reg.create()
                await reg.update(
                    j.job_id, status=JobStatus.COMPLETED, results={"ok": 1}
                )
            reg.close()

        asyncio.run(make())
        with open(path, "a") as f:
            f.write("{corrupt json\n")
        size_before = path.stat().st_size
        reg2 = JobRegistry(journal_path=path)
        assert len(reg2) == 5
        reg2.close()
        # Compaction rewrote one snapshot per job (creation + completion
        # records collapsed, corrupt line dropped).
        assert path.stat().st_size < size_before

    def test_restored_jobs_are_evictable(self, tmp_path):
        """Journal-restored terminal jobs must count as long-finished
        (regression: missing finished_at defaulted to `now` in the
        eviction guard, so restored jobs could never be evicted and the
        registry grew past max_jobs forever)."""
        path = tmp_path / "jobs.jsonl"

        async def first_life():
            reg = JobRegistry(journal_path=path)
            for _ in range(4):
                j = await reg.create()
                await reg.update(
                    j.job_id, status=JobStatus.COMPLETED, results={"ok": 1}
                )
            reg.close()

        asyncio.run(first_life())

        async def second_life():
            reg2 = JobRegistry(journal_path=path, max_jobs=2)
            reg2.EVICT_GRACE_S = 0  # don't depend on host uptime > grace
            assert len(reg2) == 4  # replayed
            j = await reg2.create()  # triggers eviction of restored jobs
            assert len(reg2) <= 3  # 2 cap + the new in-flight job
            reg2.close()

        asyncio.run(second_life())

    def test_second_process_cannot_share_journal(self, tmp_path):
        """Two registries on one journal file would clobber each other
        on compaction (v1+v2 from one output dir); the flock refuses."""
        path = tmp_path / "jobs.jsonl"
        reg = JobRegistry(journal_path=path)
        with pytest.raises(RuntimeError, match="owned by another process"):
            JobRegistry(journal_path=path)
        reg.close()
        # Released on close: a restart can reopen it.
        reg2 = JobRegistry(journal_path=path)
        reg2.close()

    def test_journal_compacts_under_churn(self, tmp_path):
        """With max_jobs eviction the registry is bounded; the journal
        file must be too (periodic compaction, not only at startup)."""
        path = tmp_path / "jobs.jsonl"

        async def churn():
            reg = JobRegistry(journal_path=path, max_jobs=5)
            reg.EVICT_GRACE_S = 0.0  # immediate eviction for the test
            for _ in range(700):
                j = await reg.create(model="m")
                await reg.update(
                    j.job_id, status=JobStatus.COMPLETED, progress=100,
                    results={"pointCloud": {"filepath": "x", "points": 1}},
                )
            reg.close()

        asyncio.run(churn())
        # 700 jobs x (2 puts + ~1 delete) would be ~2000+ lines unbounded;
        # compaction keeps it near the live-set size.
        lines = [l for l in path.read_text().splitlines() if l.strip()]
        assert len(lines) <= 400, len(lines)

    def test_no_journal_is_pure_memory(self, tmp_path):
        async def run():
            reg = JobRegistry()
            j = await reg.create()
            assert reg.get(j.job_id) is not None

        asyncio.run(run())
        assert list(tmp_path.iterdir()) == []


class TestMetrics:
    """First-party Prometheus exposition (serve/metrics) — the reference
    has no metrics at all (SURVEY.md §5)."""

    def test_counter_gauge_histogram_render(self):
        from image_to_pointcloud_tpu.serve.metrics import MetricsRegistry

        reg = MetricsRegistry()
        c = reg.counter("t_requests_total", "reqs")
        c.inc(method="GET", status="200")
        c.inc(method="GET", status="200")
        c.inc(method="POST", status="500")
        g = reg.gauge("t_temp", "gauge")
        g.set(3.5)
        h = reg.histogram("t_lat", "latency", buckets=(0.1, 1.0))
        h.observe(0.05)
        h.observe(0.5)
        h.observe(5.0)
        out = reg.render()
        assert 't_requests_total{method="GET",status="200"} 2' in out
        assert 't_requests_total{method="POST",status="500"} 1' in out
        assert "t_temp 3.5" in out
        assert 't_lat_bucket{le="0.1"} 1' in out
        assert 't_lat_bucket{le="1"} 2' in out
        assert 't_lat_bucket{le="+Inf"} 3' in out
        assert "t_lat_count 3" in out
        assert "# TYPE t_requests_total counter" in out
        assert "# TYPE t_lat histogram" in out

    def test_histogram_timer(self):
        from image_to_pointcloud_tpu.serve.metrics import MetricsRegistry

        reg = MetricsRegistry()
        h = reg.histogram("t_timer", "t", buckets=(10.0,))
        with h.time(stage="x"):
            pass
        assert 't_timer_count{stage="x"} 1' in reg.render()

    def test_path_class_bounds_cardinality(self):
        from image_to_pointcloud_tpu.serve.metrics import path_class

        a = path_class("/status/0c9f5a6e-1111-2222-3333-444455556666")
        b = path_class("/status/ffff0000-aaaa-bbbb-cccc-ddddeeee9999")
        assert a == b == "/status/{id}"
        assert path_class("/download/abc12345678901234/mesh.glb") == "/download/{id}/{id}"
        assert path_class("/health") == "/health"


class TestTransientRetry:
    def test_classifier(self):
        from image_to_pointcloud_tpu.serve.app_v1 import _is_transient

        class FakeJaxError(Exception):
            pass

        assert _is_transient(
            FakeJaxError("UNAVAILABLE: TPU backend setup/compile error")
        )
        assert _is_transient(FakeJaxError("Socket closed"))
        assert not _is_transient(ValueError("bad input shape"))

    def test_job_retries_once_on_transient(self, rng, tmp_path):
        """A single transient inference failure completes the job on
        retry instead of erroring it."""
        from image_to_pointcloud_tpu.pipeline.graph import PipelineResult
        from image_to_pointcloud_tpu.serve.app_v1 import V1Service
        from image_to_pointcloud_tpu.serve.models import ModelManager

        calls = {"n": 0}

        class FlakyPipeline:
            quantized_transfer = False

            def submit_batch(self, images, depth_scales=None, options=None):
                calls["n"] += 1
                if calls["n"] == 1:
                    raise RuntimeError("UNAVAILABLE: tunnel reset")
                return list(images)

            def collect(self, handle, want_packed=True, want_preview_rgb=True):
                return [
                    PipelineResult(
                        points=np.zeros((5, 3), np.float32),
                        colors=np.zeros((5, 3), np.float32),
                        depth_preview_rgb=np.zeros((4, 4, 3), np.uint8),
                        raw_point_count=5,
                        kept_point_count=5,
                    )
                    for _ in handle
                ]

        mm = ModelManager(use_bf16=False, use_flash_attention=False)
        mm._cache["depth-anything-v2"] = FlakyPipeline()
        svc = V1Service(
            output_dir=str(tmp_path), models=mm, durable_jobs=False,
            batch_window_ms=0.0,
        )

        from PIL import Image
        import io as _io

        buf = _io.BytesIO()
        Image.fromarray(
            rng.integers(0, 255, (16, 16, 3)).astype(np.uint8)
        ).save(buf, "PNG")

        async def run():
            job = await svc.jobs.create(model="depth-anything-v2")
            await svc._process_job(
                job.job_id, buf.getvalue(),
                {
                    "model": "depth-anything-v2",
                    "output_format": "ply",
                    "point_density": "medium",
                    "coordinate_system": "WGS84",
                    "invert_depth": True,
                    "depth_scale": 10.0,
                    "smooth_depth": False,
                },
            )
            return svc.jobs.get(job.job_id)

        job = asyncio.run(run())
        assert calls["n"] == 2
        assert job.status == JobStatus.COMPLETED, job.message


class TestReviewRegressions:
    """Regression coverage for the session code-review findings."""

    def test_ui_mount_redirects_extensionless(self):
        from pathlib import Path

        r = Router()
        r.mount_static("/ui", Path(__file__).resolve().parents[1] / "frontend")

        async def run():
            resp = await r.dispatch(_req("GET", "/ui"))
            assert resp.status == 308
            assert resp.headers["location"] == "/ui/"

        asyncio.run(run())

    def test_metric_label_escaping(self):
        from image_to_pointcloud_tpu.serve.metrics import MetricsRegistry

        reg = MetricsRegistry()
        c = reg.counter("t_esc", "")
        c.inc(path='/a"b\\c')
        out = reg.render()
        assert 'path="/a\\"b\\\\c"' in out

    def test_path_class_cardinality_cap(self):
        from image_to_pointcloud_tpu.serve import metrics as mm

        known_before = set(mm._KNOWN_CLASSES)
        try:
            mm._KNOWN_CLASSES.clear()
            for i in range(mm._MAX_PATH_CLASSES):
                mm.path_class(f"/probe{i}")
            assert mm.path_class("/brand-new-path") == "other"
            # Known classes keep resolving to themselves.
            assert mm.path_class("/probe0") == "/probe0"
        finally:
            mm._KNOWN_CLASSES.clear()
            mm._KNOWN_CLASSES.update(known_before)

    def test_journal_write_after_close_is_swallowed(self, tmp_path):
        async def run():
            reg = JobRegistry(journal_path=tmp_path / "j.jsonl")
            job = await reg.create()
            reg.close()
            # Terminal update after close (graceful-shutdown race) must
            # not raise.
            await reg.update(job.job_id, status=JobStatus.COMPLETED)
            assert await reg.delete(job.job_id)

        asyncio.run(run())

    def test_jobs_limit_validation(self):
        # Handler-level: non-integer limit → 422 (not a 500).
        import tempfile

        from image_to_pointcloud_tpu.serve.app_v1 import create_v1_app
        from image_to_pointcloud_tpu.serve.models import ModelManager

        with tempfile.TemporaryDirectory() as d:
            app = create_v1_app(
                output_dir=d, models=ModelManager(), durable_jobs=False
            )

            async def run():
                with pytest.raises(HTTPError) as ei:
                    await app.router.dispatch(
                        _req("GET", "/jobs", query={"limit": "abc"})
                    )
                assert ei.value.status == 422

            asyncio.run(run())


class TestDeleteInFlight:
    def test_update_after_delete_is_ignored(self):
        """DELETE /jobs/{id} while the job task is mid-flight: subsequent
        updates from the task are dropped, not KeyErrors."""

        async def run():
            reg = JobRegistry()
            job = await reg.create()
            assert await reg.delete(job.job_id)
            # Task still running — its progress/terminal updates no-op.
            await reg.update(job.job_id, progress=60)
            await reg.update(job.job_id, status=JobStatus.COMPLETED)
            assert reg.get(job.job_id) is None

        asyncio.run(run())


class TestRetentionCap:
    def test_oldest_terminal_evicted_inflight_kept(self):
        async def run():
            reg = JobRegistry(max_jobs=3)
            reg.EVICT_GRACE_S = 0.0  # no grace in tests
            done = []
            for i in range(3):
                j = await reg.create(model=f"m{i}")
                await reg.update(j.job_id, status=JobStatus.COMPLETED)
                done.append(j.job_id)
            inflight = await reg.create(model="active")
            await reg.update(inflight.job_id, status=JobStatus.PROCESSING)
            # In-flight jobs are never evicted; over-cap resolves on the
            # next terminal transition (longest-finished evicted first).
            await reg.update(inflight.job_id, status=JobStatus.COMPLETED)
            assert len(reg) == 3
            assert reg.get(done[0]) is None
            assert reg.get(done[1]) is not None
            assert reg.get(inflight.job_id) is not None

        asyncio.run(run())

    def test_grace_window_protects_fresh_results(self):
        async def run():
            reg = JobRegistry(max_jobs=1)  # default 60 s grace
            evicted = []
            reg._on_evict = evicted.append
            a = await reg.create()
            await reg.update(a.job_id, status=JobStatus.COMPLETED)
            b = await reg.create()
            await reg.update(b.job_id, status=JobStatus.COMPLETED)
            # Both finished within the grace window: the cap is soft, the
            # fresh result must still be pollable.
            assert reg.get(a.job_id) is not None
            assert reg.get(b.job_id) is not None
            assert evicted == []

        asyncio.run(run())

    def test_none_keeps_everything(self):
        async def run():
            reg = JobRegistry()
            for _ in range(50):
                j = await reg.create()
                await reg.update(j.job_id, status=JobStatus.COMPLETED)
            assert len(reg) == 50  # reference parity: unbounded

        asyncio.run(run())


class TestGzip:
    def test_large_json_gzipped_when_accepted(self):
        import gzip

        from image_to_pointcloud_tpu.serve.http import _maybe_gzip

        body = json_response({"x": [1] * 100000})
        req = _req(headers={"accept-encoding": "gzip, deflate"})
        orig = bytes(body.body)
        asyncio.run(_maybe_gzip(req, body))
        assert body.headers["content-encoding"] == "gzip"
        assert body.headers["vary"] == "accept-encoding"
        assert len(body.body) < len(orig) // 3
        assert gzip.decompress(body.body) == orig

    def test_small_or_unaccepted_untouched(self):
        from image_to_pointcloud_tpu.serve.http import _maybe_gzip

        small = json_response({"ok": 1})
        asyncio.run(_maybe_gzip(_req(headers={"accept-encoding": "gzip"}), small))
        assert "content-encoding" not in small.headers

        big = json_response({"x": [1] * 100000})
        asyncio.run(_maybe_gzip(_req(), big))  # no accept-encoding header
        assert "content-encoding" not in big.headers

        refused = json_response({"x": [1] * 100000})
        asyncio.run(_maybe_gzip(
            _req(headers={"accept-encoding": "gzip;q=0, identity"}), refused
        ))  # RFC 9110: q=0 is an explicit refusal
        assert "content-encoding" not in refused.headers


class TestWarmupResilience:
    def test_warmup_survives_transient_compile_failure(self, tmp_path):
        """One flaky signature must not abort the rest of the warmup
        (this rig's remote-compile relay flaps; a dead warmup thread
        leaves every bucket cold)."""
        from image_to_pointcloud_tpu.serve.app_v1 import V1Service
        from image_to_pointcloud_tpu.serve.models import ModelManager

        calls = []

        class FlakyPipe:
            def run_batch(self, images, depth_scales=None, options=None):
                calls.append(len(images))
                if len(images) == 2:  # bucket 2 always fails
                    raise RuntimeError("UNAVAILABLE: relay down")
                return []

        mm = ModelManager(use_bf16=False, use_flash_attention=False)
        mm._cache["depth-anything-v2"] = FlakyPipe()
        svc = V1Service(
            output_dir=str(tmp_path), models=mm,
            warmup_sizes=[(8, 8)], durable_jobs=False, max_batch=8,
        )
        svc.warmup()  # must not raise
        # buckets 1,4,8 warmed once; bucket 2 tried twice.
        assert sorted(calls) == [1, 2, 2, 4, 8]

    def test_warmup_covers_hybrid_jpeg_buckets(self, tmp_path):
        """With --jpeg-device-decode the warmup must also compile the
        hybrid-ingest graph per bucket (a cold JpegSpec signature costs
        the same minutes-long remote compile the pixel path is warmed
        against), using a synthesized photographic JPEG."""
        pytest.importorskip("PIL")
        import io

        from PIL import Image

        from image_to_pointcloud_tpu.pipeline.graph import plan_jpeg_input
        from image_to_pointcloud_tpu.serve.app_v1 import V1Service
        from image_to_pointcloud_tpu.serve.models import ModelManager

        probe = np.full((64, 64, 3), 128, np.uint8)
        buf = io.BytesIO()
        Image.fromarray(probe).save(buf, format="JPEG", quality=88)
        if plan_jpeg_input(buf.getvalue()) is None:
            pytest.skip("native jpeg module unavailable")

        pixel_calls, jpeg_calls = [], []

        class RecordingPipe:
            def run_batch(self, images, depth_scales=None, options=None):
                pixel_calls.append(len(images))
                return []

            def submit_batch_jpeg(self, jpegs, options=None):
                jpeg_calls.append(len(jpegs))
                return "handle"

            def collect(self, handle):
                assert handle == "handle"
                return []

        mm = ModelManager(use_bf16=False, use_flash_attention=False)
        mm._cache["depth-anything-v2"] = RecordingPipe()
        svc = V1Service(
            output_dir=str(tmp_path), models=mm,
            warmup_sizes=[(64, 64)], durable_jobs=False, max_batch=4,
            jpeg_device_decode=True,
        )
        svc.warmup()
        assert pixel_calls == [1, 2, 4]
        # One shared JpegInput per size, submitted per bucket; every
        # item of a bucket shares the spec (submit_batch_jpeg contract).
        assert jpeg_calls == [1, 2, 4]


class TestMeshPreviewColorPrecision:
    def test_colors_divide_in_f64(self):
        """f32 color 1 must serialize as float64(1)/255 (reference
        .tolist() doubles), not float64(np.float32(1/255))."""
        import json

        from image_to_pointcloud_tpu.serve.app_v1 import V1Service
        from image_to_pointcloud_tpu.serve.rawjson import dumps_raw

        dv = np.zeros((3, 3), np.float32)
        dc = np.array([[1, 2, 255]] * 3, np.float32)
        df = np.array([[0, 1, 2]], np.int32)
        prev = V1Service._mesh_preview(dv, dc, df)
        cols = json.loads(dumps_raw({"c": prev["colors"]}))["c"]
        assert cols[0][0] == 1 / 255
        assert cols[0][1] == 2 / 255
        assert cols[0][2] == 1.0
