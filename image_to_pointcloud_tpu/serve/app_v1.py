"""v1 service: the reference's "Image to Point Cloud API" contract.

Route-for-route, field-for-field reproduction of the reference v1 app
(backend/app.py:609-747) on the first-party HTTP server, with the TPU
pipeline underneath:

* ``POST /process`` — multipart file + query params (model, output_format,
  point_density, coordinate_system, invert_depth, depth_scale,
  smooth_depth, fov), 50 MB cap, returns ``{"job_id", "status":"queued"}``
* ``GET /status/{job_id}`` — job state machine with the reference's
  progress milestones 10/20/40/60/80/100 and messages
* ``GET /download/{job_id}`` — the exported artifact
* ``GET /models`` — capability cards
* ``GET /health``

Results dict keys match backend/app.py:545-559 exactly (pointCloud,
gisData, downloadUrl, preview{points,colors}, meshPreview, depthMap), so
the reference React frontend works unmodified.

Quirk handling (SURVEY.md §8): the reference accepts ``fov`` but drops
it (its request model has no such field), so every request uses the
``max(h,w)*1.2`` focal default. We stay bug-compatible by default for
golden parity; construct the app with ``honor_fov=True`` to apply the
client's fov.
"""

from __future__ import annotations

import asyncio
import logging
import os
from collections import OrderedDict
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

import numpy as np

from image_to_pointcloud_tpu.io import (
    generate_gis_metadata,
    png_data_url,
    write_las,
    write_ply_mesh,
    write_ply_points,
    write_xyz,
)
from image_to_pointcloud_tpu.io.image import decode_image_rgb
from image_to_pointcloud_tpu.pipeline.graph import (
    PipelineOptions,
    demo_depth_map_graph,
    dummy_point_cloud_graph,
)
from image_to_pointcloud_tpu.pipeline.meshing import (
    decimate_grid_mesh,
    grid_mesh_from_packed,
    vertex_normals,
)
from image_to_pointcloud_tpu.serve import metrics as m
from image_to_pointcloud_tpu.serve.http import (
    HTTPError,
    Request,
    Response,
    Router,
    file_response,
    json_response,
)
from image_to_pointcloud_tpu.serve.jobs import JobRegistry, JobStatus
from image_to_pointcloud_tpu.serve.models import DUMMY_MODELS, ModelManager

logger = logging.getLogger(__name__)

MAX_FILE_SIZE = 50 * 1024 * 1024  # reference backend/app.py:45
MAX_PREVIEW_POINTS = 20000  # reference backend/app.py:496
MESH_FORMATS = {"mesh_ply", "mesh"}

# Capability cards served by GET /models (reference backend/app.py:702-737).
MODEL_CARDS = [
    {
        "id": "depth-anything-v2",
        "name": "Depth Anything V2",
        "description": "Superior depth estimation + point cloud",
        "license": "Apache-2.0",
        "recommended": True,
        "supported": True,
        "speed": "2-3s",
        "quality": "High",
    },
    {
        "id": "triposr",
        "name": "TripoSR",
        "description": "Fast mesh generation (1-2 seconds)",
        "license": "MIT",
        "recommended": False,
        "supported": False,
        "speed": "1-2s",
        "quality": "Medium",
    },
    {
        "id": "instantmesh",
        "name": "InstantMesh",
        "description": "High quality 3D assets (~10 seconds)",
        "license": "Custom",
        "supported": False,
        "speed": "~10s",
        "quality": "Very High",
    },
]


def _is_transient(e: Exception) -> bool:
    """Accelerator-runtime errors worth one retry (tunnel resets, device
    momentarily unavailable) vs real pipeline bugs."""
    text = f"{type(e).__name__}: {e}"
    return any(
        s in text
        for s in ("UNAVAILABLE", "DEADLINE_EXCEEDED", "RESOURCE_EXHAUSTED",
                  "Socket closed", "Connection reset")
    )


from image_to_pointcloud_tpu.serve.rawjson import (
    float_triplets as _triplets_json,
    int_list as _ints_json,
)


def _parse_bool(v: str | bool, default: bool) -> bool:
    if isinstance(v, bool):
        return v
    if v is None:
        return default
    return v.lower() in ("1", "true", "yes", "on")


class V1Service:
    def __init__(
        self,
        *,
        output_dir: str = "outputs",
        models: ModelManager | None = None,
        honor_fov: bool = False,
        mesh_method: str = "grid",
        batch_window_ms: float = 5.0,
        max_batch: int = 16,
        warmup_sizes: "list[tuple[int, int]] | None" = None,
        durable_jobs: bool = True,
        max_jobs: int | None = None,
        defaults=None,
        max_file_size: int = MAX_FILE_SIZE,
        max_preview_points: int = MAX_PREVIEW_POINTS,
        mesh_preview_tris: int = 20000,
        jpeg_device_decode: bool = False,
        lazy_export: bool = True,
        lazy_export_max_bytes: int = 256 * 1024 * 1024,
    ):
        from image_to_pointcloud_tpu.core.config import ProcessingDefaults

        self.output_dir = Path(output_dir)
        self.output_dir.mkdir(exist_ok=True, parents=True)
        self.models = models or ModelManager()
        self.honor_fov = honor_fov
        # The config tree's knobs actually apply here (core/config.py is
        # the single knob surface, not decoration): request defaults,
        # upload cap, preview/mesh decimation targets.
        self.defaults = defaults or ProcessingDefaults()
        self.max_file_size = int(max_file_size)
        self.max_preview_points = int(max_preview_points)
        self.mesh_preview_tris = int(mesh_preview_tris)
        # Opt-in hybrid JPEG ingest (core/config.py jpeg_device_decode):
        # eligible large JPEGs skip the host pixel decode and
        # ship DCT coefficients instead (pipeline.graph.plan_jpeg_input).
        self.jpeg_device_decode = bool(jpeg_device_decode)
        # "grid" (default; exact depth-grid triangulation, PARITY.md
        # deviation 2) | "poisson" | "bpa" (the reference's actual
        # Open3D algorithms, backend/app.py:283-305, via native/).
        self.mesh_method = mesh_method
        # Lazy export (PARITY.md deviation 11): point-format artifacts
        # are packed+written on first GET /download, not during the job.
        # Entries: job_id -> {fmt, base, points, colors, nbytes, future}.
        # FIFO spill keeps pending RAM under lazy_export_max_bytes.
        self.lazy_export = bool(lazy_export)
        self.lazy_export_max_bytes = int(lazy_export_max_bytes)
        self._pending_exports: "OrderedDict[str, dict]" = OrderedDict()
        self._pending_export_bytes = 0
        # Durable registry: finished jobs (and their /download URLs)
        # survive restarts — the reference loses all jobs (SURVEY.md §5).
        def _evict_artifacts(job):
            self._discard_pending_export(job.job_id)
            fp = ((job.results or {}).get("pointCloud") or {}).get("filepath")
            if fp and Path(fp).exists():
                Path(fp).unlink()

        self.jobs = JobRegistry(
            journal_path=self.output_dir / ".jobs.jsonl" if durable_jobs else None,
            max_jobs=max_jobs,
            on_evict=_evict_artifacts,
        )
        self.loaded_model_names: set[str] = set()
        # 4 > cores on this rig, deliberately: decode (zlib), PLY/PNG
        # writes and disk I/O all release the GIL, so extra threads
        # overlap I/O waits; pure-Python stages still serialize on the
        # GIL either way. The reference uses 2 (spar3d_processor.py:40).
        self.executor = ThreadPoolExecutor(max_workers=4)
        self.batch_window_ms = batch_window_ms
        self.max_batch = max_batch
        self._batchers: dict[str, object] = {}
        self.warmup_sizes = warmup_sizes or []
        # Strong refs to in-flight job tasks: the event loop only holds
        # weak ones, so a fire-and-forget task could be GC'd mid-job.
        self._tasks: set = set()
        self.router = self._build_router()

    def _spawn(self, coro) -> None:
        task = asyncio.get_running_loop().create_task(coro)
        self._tasks.add(task)
        task.add_done_callback(self._tasks.discard)

    async def shutdown(self) -> None:
        """Stop batching drain tasks and the executor (graceful exit; the
        reference has no shutdown path for v1 — uvicorn just dies)."""
        for batcher in self._batchers.values():
            await batcher.close()
        self._batchers.clear()
        if self._pending_exports:
            # First let any in-flight (download-triggered) exports
            # finish: executor.shutdown(cancel_futures=True) below
            # would cancel a queued-but-not-started future and lose an
            # artifact the durable journal promises across restarts.
            inflight = [
                e["future"]
                for e in self._pending_exports.values()
                if e["future"] is not None
            ]
            if inflight:
                await asyncio.gather(*inflight, return_exceptions=True)
            # Blocking on the loop is fine here: the listener is already
            # closed, and keeping this on the loop thread preserves the
            # "pending-exports state is loop-only" invariant.
            n = self.drain_pending_exports()
            logger.info("shutdown: wrote %d deferred artifacts", n)
        self.executor.shutdown(wait=False, cancel_futures=True)

    def warmup(self, model_name: str = "depth-anything-v2") -> None:
        """Pre-compile the pipeline for standard input sizes so the first
        request isn't a minutes-long XLA compile (pairs with the
        persistent compilation cache — each signature compiles once ever).
        Blocking; call from a startup thread."""
        import numpy as _np

        pipeline = self.models.get(model_name)
        self.loaded_model_names.add(model_name)
        # Warm every micro-batch bucket per size (the batching queue
        # only dispatches bucket sizes — powers of two + 3·2^k mids,
        # serve/batching.bucket_sizes), so concurrent traffic never
        # hits a cold compile either.
        from image_to_pointcloud_tpu.serve.batching import bucket_sizes

        buckets = bucket_sizes(self.max_batch)
        ok = 0
        total = 0
        for h, w in self.warmup_sizes:
            # Hybrid-ingest graphs compile per (JpegSpec, capacity,
            # batch) signature; without warming them the first real
            # JPEG upload of each size eats the same minutes-long
            # remote compile the pixel path is protected from here.
            # A photographic-statistics gradient+noise frame at PIL's
            # default 4:2:0 subsampling lands in the spec and capacity
            # bucket ordinary uploads hit.
            jpeg_plan = None
            if self.jpeg_device_decode:
                try:
                    import io as _io

                    from PIL import Image as _Image

                    from image_to_pointcloud_tpu.pipeline.graph import (
                        plan_jpeg_input,
                    )

                    yy, xx = _np.mgrid[0:h, 0:w]
                    rng = _np.random.default_rng(0)
                    frame = (
                        96.0
                        + 64.0 * _np.sin(xx / 37.0)
                        + 48.0 * _np.cos(yy / 23.0)
                        + rng.normal(0.0, 6.0, (h, w))
                    )
                    frame = (
                        _np.clip(frame, 0, 255)
                        .astype(_np.uint8)[..., None]
                        .repeat(3, axis=-1)
                    )
                    buf = _io.BytesIO()
                    _Image.fromarray(frame).save(
                        buf, format="JPEG", quality=88
                    )
                    jpeg_plan = plan_jpeg_input(buf.getvalue())
                    if jpeg_plan is None:
                        # None is a decline, not an error (native module
                        # missing, or the sparse-margin gate rejected the
                        # synth frame) — surface it, or the hybrid path
                        # stays cold with a clean-looking warmup log and
                        # the first real JPEG eats the remote compile.
                        logger.warning(
                            "Warmup JPEG %dx%d: plan_jpeg_input declined; "
                            "hybrid-ingest graphs stay cold for this size",
                            h, w,
                        )
                except Exception as e:  # noqa: BLE001
                    logger.warning("Warmup JPEG synth %dx%d: %s", h, w, e)
            for b in buckets:
                variants = [("pixel", None)]
                if jpeg_plan is not None:
                    variants.append(("jpeg", jpeg_plan))
                    if os.environ.get("IPC_TPU_WARMUP_JPEG_ONLY") == "1":
                        # Halve the warmup compile bill when the
                        # deployment serves (or is being benched with)
                        # JPEG uploads only: pixel-path graphs compile
                        # on first PNG upload instead, and the
                        # persistent cache keeps either set across
                        # restarts. On this rig's remote compile helper
                        # a full two-path warmup is ~10 multi-minute
                        # compiles.
                        variants = [("jpeg", jpeg_plan)]
                for kind, plan in variants:
                    total += 1
                    logger.info(
                        "Warmup compile %dx%d batch=%d (%s)", h, w, b, kind
                    )
                    # A transient remote-compile failure (this rig's
                    # relay flaps) must not abort the rest of the
                    # warmup — the failed signature just compiles on
                    # first real use.
                    for attempt in (0, 1):
                        try:
                            if plan is None:
                                imgs = _np.zeros((b, h, w, 3), _np.uint8)
                                pipeline.run_batch(
                                    imgs, options=PipelineOptions()
                                )
                            else:
                                pipeline.collect(
                                    pipeline.submit_batch_jpeg(
                                        [plan] * b,
                                        options=PipelineOptions(),
                                    )
                                )
                            ok += 1
                            break
                        except Exception as e:  # noqa: BLE001
                            logger.warning(
                                "Warmup %dx%d batch=%d (%s) failed "
                                "(attempt %d): %s",
                                h, w, b, kind, attempt + 1, e,
                            )
        logger.info("Warmup complete (%d/%d signatures)", ok, total)

    # ---------- pipeline task ----------

    async def _process_job(self, job_id: str, data: bytes, req: dict) -> None:
        jobs = self.jobs
        loop = asyncio.get_running_loop()
        import time as _time

        timings: dict[str, float] = {}
        t_start = _time.perf_counter()

        def _mark(stage, t0):
            timings[stage] = round(_time.perf_counter() - t0, 4)

        try:
            await jobs.update(
                job_id, status=JobStatus.PROCESSING, progress=10,
                message="Loading AI model...",
            )
            model_name = req["model"]
            t0 = _time.perf_counter()
            if model_name not in DUMMY_MODELS:
                pipeline = await loop.run_in_executor(
                    self.executor, self.models.get, model_name
                )
            self.loaded_model_names.add(model_name)
            _mark("model_load", t0)

            await jobs.update(job_id, progress=20, message="Processing image...")
            t0 = _time.perf_counter()
            image = None
            if self.jpeg_device_decode and model_name not in DUMMY_MODELS:
                # Hybrid ingest: entropy-decode only; pixels materialize
                # on device. Returns None for non-JPEGs, unsupported
                # streams, or images too small to benefit — those take
                # the classic host decode below.
                from image_to_pointcloud_tpu.ops.unproject import (
                    DENSITY_STRIDES,
                )
                from image_to_pointcloud_tpu.pipeline.graph import (
                    plan_jpeg_input,
                )

                _step = DENSITY_STRIDES[req["point_density"]]

                def _plan_with_colors(d=data, s=_step):
                    j = plan_jpeg_input(d)
                    if j is not None:
                        # Pre-reconstruct host grid colors here on the
                        # executor (cached in the JpegInput): the
                        # batcher's drain then takes the D2H bundle diet
                        # without paying the ~2 ms/img on its own path.
                        j.grid_colors(s)
                    return j

                image = await loop.run_in_executor(
                    self.executor, _plan_with_colors
                )
            if image is None:
                image = await loop.run_in_executor(
                    self.executor, decode_image_rgb, data
                )
            _mark("decode", t0)

            opts = PipelineOptions(
                density=req["point_density"],
                invert_depth=req["invert_depth"],
                smooth_depth=req["smooth_depth"],
                smooth_ksize=req.get("smooth_ksize", 5),
                fov=(req.get("fov") if self.honor_fov else None),
            )

            depth_data_url = None
            packed = None
            grid_hw = None
            if model_name not in DUMMY_MODELS:
                await jobs.update(
                    job_id, progress=40, message="Estimating depth with AI..."
                )
                from image_to_pointcloud_tpu.serve.batching import BatchingQueue

                batcher = self._batchers.get(model_name)
                if batcher is None:
                    batcher = BatchingQueue(
                        pipeline,
                        window_ms=self.batch_window_ms,
                        max_batch=self.max_batch,
                    )
                    self._batchers[model_name] = batcher
                await jobs.update(
                    job_id, progress=60, message="Generating 3D point cloud..."
                )
                t0 = _time.perf_counter()
                # Bounded retry: accelerator tunnels/runtimes can throw
                # transient UNAVAILABLE-class errors (observed on this
                # rig's relay); one backoff+retry masks a hiccup without
                # hiding a real failure. The reference has no retries
                # anywhere (SURVEY.md §5 failure detection).
                # Packed 7×N grids are host-assembled only for mesh
                # output via grid triangulation; point formats and the
                # point-based reconstructions skip that host cost.
                need_packed = (
                    req["output_format"].lower() in MESH_FORMATS
                    and self.mesh_method == "grid"
                )
                try:
                    res = await batcher.submit(
                        image, req["depth_scale"], opts,
                        want_packed=need_packed,
                    )
                except Exception as first_err:  # noqa: BLE001
                    if not _is_transient(first_err):
                        raise
                    logger.warning(
                        "Job %s: transient inference failure (%s); retrying",
                        job_id, first_err,
                    )
                    m.JOBS_TOTAL.inc(api="v1", status="retried")
                    await asyncio.sleep(1.0)
                    res = await batcher.submit(
                        image, req["depth_scale"], opts,
                        want_packed=need_packed,
                    )
                _mark("inference_unproject_refine", t0)
                t0 = _time.perf_counter()
                if res.depth_preview_gray is not None:
                    from image_to_pointcloud_tpu.io.image import (
                        png_data_url_palette,
                    )
                    from image_to_pointcloud_tpu.ops.colormap import PLASMA_RGB

                    depth_data_url = png_data_url_palette(
                        res.depth_preview_gray, PLASMA_RGB
                    )
                else:
                    depth_data_url = png_data_url(res.depth_preview_rgb)
                _mark("preview_encode", t0)
                points, colors = res.points, res.colors
                packed = res  # keep for mesh path
            else:
                await jobs.update(
                    job_id, progress=40,
                    message=f"Processing with {model_name}...",
                )
                points, colors = await loop.run_in_executor(
                    self.executor,
                    dummy_point_cloud_graph,
                    image,
                    req["point_density"],
                )
                import jax.numpy as jnp

                demo = await loop.run_in_executor(
                    self.executor,
                    lambda: np.asarray(demo_depth_map_graph(jnp.asarray(image))),
                )
                depth_data_url = png_data_url(demo)

            await jobs.update(
                job_id, progress=80, message="Saving point cloud..."
            )

            # Preview decimation (reference backend/app.py:496-506).
            if len(points) > self.max_preview_points:
                stride = max(1, len(points) // self.max_preview_points)
                pprev, cprev = points[::stride], colors[::stride]
            else:
                pprev, cprev = points, colors
            preview_points = _triplets_json(pprev)
            preview_colors = _triplets_json(cprev)

            fmt = req["output_format"].lower()
            mesh_preview = None
            base = str(self.output_dir / job_id)
            t0 = _time.perf_counter()
            if fmt in MESH_FORMATS:
                filepath, mesh_preview = await loop.run_in_executor(
                    self.executor, self._export_mesh, base, req, packed, points, colors
                )
            elif self.lazy_export:
                # Deferred: pack+write happens on the first GET /download
                # (PARITY.md deviation 11). The mesh path stays eager —
                # its reconstruction also feeds the meshPreview key of
                # the completed-status contract.
                filepath = self._defer_export(job_id, fmt, points, colors, base)
            else:
                filepath = await loop.run_in_executor(
                    self.executor, self._export_points, base, fmt, points, colors
                )
            _mark("export", t0)
            timings["total"] = round(_time.perf_counter() - t_start, 4)

            metadata = generate_gis_metadata(
                points,
                coordinate_system=req["coordinate_system"],
                model=model_name,
                output_format=req["output_format"],
                point_density=req["point_density"],
                depth_scale=req["depth_scale"],
                invert_depth=req["invert_depth"],
                smooth_depth=req["smooth_depth"],
                gps_coords=req.get("gps_coords"),
            )

            await jobs.update(
                job_id,
                status=JobStatus.COMPLETED,
                progress=100,
                message="Processing complete!",
                results={
                    "pointCloud": {
                        "filepath": filepath,
                        "points": len(points),
                        "format": req["output_format"].upper(),
                    },
                    "gisData": metadata,
                    "downloadUrl": f"/download/{job_id}",
                    "preview": {
                        "points": preview_points,
                        "colors": preview_colors,
                    },
                    "meshPreview": mesh_preview,
                    "depthMap": depth_data_url,
                },
            )
            job = jobs.get(job_id)
            if job is not None:
                job.extra["timings"] = timings
            m.JOBS_TOTAL.inc(api="v1", status="completed")
            m.JOB_DURATION.observe(timings["total"], api="v1")
            m.IMAGES_PROCESSED.inc(model=model_name)
        except Exception as e:  # noqa: BLE001
            logger.exception("Job %s failed", job_id)
            m.JOBS_TOTAL.inc(api="v1", status="error")
            await jobs.update(
                job_id, status=JobStatus.ERROR, message=f"Error: {e}"
            )

    @staticmethod
    def _artifact_path(base: str, fmt: str) -> str:
        """Planned artifact path for a point format (mirrors the
        _export_points dispatch; 'laz' writes uncompressed .las —
        bug-compatible, reference backend/app.py:319/345)."""
        ext = {"ply": ".ply", "las": ".las", "laz": ".las", "xyz": ".xyz"}.get(fmt)
        if ext is None:
            raise ValueError(f"Unsupported format: {fmt}")
        return base + ext

    def _defer_export(self, job_id, fmt, points, colors, base) -> str:
        """Register a pending lazy export; returns the planned filepath.

        Event-loop-only state (no locks needed: _process_job, the
        download route and eviction hooks all run on the loop thread).
        """
        filepath = self._artifact_path(base, fmt)  # validates fmt now
        nbytes = int(
            getattr(points, "nbytes", 0) + getattr(colors, "nbytes", 0)
        )
        self._pending_exports[job_id] = {
            "fmt": fmt,
            "base": base,
            "points": points,
            "colors": colors,
            "nbytes": nbytes,
            "future": None,
        }
        self._pending_export_bytes += nbytes
        # FIFO spill: keep pending RAM bounded by writing the oldest
        # un-started entries out now.
        while self._pending_export_bytes > self.lazy_export_max_bytes:
            oldest = next(
                (
                    jid
                    for jid, e in self._pending_exports.items()
                    if e["future"] is None
                ),
                None,
            )
            if oldest is None or oldest == job_id:
                break
            self._start_export(oldest)
        return filepath

    def _start_export(self, job_id: str):
        """Kick the executor export for a pending entry (idempotent);
        returns the asyncio future, or None if nothing is pending."""
        entry = self._pending_exports.get(job_id)
        if entry is None:
            return None
        if entry["future"] is None:
            loop = asyncio.get_running_loop()
            fut = loop.run_in_executor(
                self.executor,
                self._export_points,
                entry["base"],
                entry["fmt"],
                entry["points"],
                entry["colors"],
            )

            def _done(_f):
                if self._pending_exports.pop(job_id, None) is not None:
                    self._pending_export_bytes -= entry["nbytes"]

            fut.add_done_callback(_done)
            entry["future"] = fut
        return entry["future"]

    async def _ensure_exported(self, job_id: str) -> None:
        """Materialize a lazily-deferred artifact (first /download)."""
        fut = self._start_export(job_id)
        if fut is not None:
            await asyncio.shield(fut)

    def _discard_pending_export(self, job_id: str) -> None:
        entry = self._pending_exports.pop(job_id, None)
        if entry is not None:
            self._pending_export_bytes -= entry["nbytes"]

    def drain_pending_exports(self) -> int:
        """Write every pending artifact now (graceful shutdown: lazy
        entries live only in RAM, and the durable journal's completed
        jobs promise a working /download after restart). Blocking;
        returns the number written."""
        n = 0
        for job_id in list(self._pending_exports):
            entry = self._pending_exports.get(job_id)
            if entry is None or entry["future"] is not None:
                continue  # in-flight exports finish in the executor
            try:
                self._export_points(
                    entry["base"], entry["fmt"], entry["points"], entry["colors"]
                )
                n += 1
            except Exception:  # noqa: BLE001
                logger.exception("drain: export for %s failed", job_id)
            self._discard_pending_export(job_id)
        return n

    def _export_points(self, base, fmt, points, colors) -> str:
        if fmt == "ply":
            return write_ply_points(base + ".ply", points, colors)
        if fmt in ("las", "laz"):
            return write_las(base + ".las", points, colors)
        if fmt == "xyz":
            return write_xyz(base + ".xyz", points, colors)
        raise ValueError(f"Unsupported format: {fmt}")

    def _export_mesh(self, base, req, res, points, colors):
        """mesh_ply path: surface reconstruction + decimated preview
        (reference backend/app.py:509-535).

        ``mesh_method="grid"`` (default) triangulates the depth grid
        exactly — the cloud's topology is known, so this beats Poisson
        on fidelity and cost (PARITY.md deviation 2). ``"poisson"`` /
        ``"bpa"`` run the reference's actual algorithms (Open3D
        create_from_point_cloud_poisson depth=8 + bbox crop /
        ball_pivoting with mean-NN radii, backend/app.py:283-305) via
        the native reconstructions in pipeline/meshing.py."""
        if self.mesh_method in ("poisson", "bpa"):
            from image_to_pointcloud_tpu.pipeline.meshing import (
                reconstruct_cloud,
            )

            out = reconstruct_cloud(
                points, colors, method=self.mesh_method, depth=8
            )
            if out is None:
                from image_to_pointcloud_tpu import native

                if not native.available():
                    raise ValueError(
                        f"mesh_method={self.mesh_method} requires the "
                        "native reconstruction library (native/ build "
                        "failed or g++ unavailable)"
                    )
                raise ValueError("Not enough points for meshing")
            verts, vcols, faces = out
            norms = vertex_normals(verts, faces)
            filepath = write_ply_mesh(
                base + ".ply", verts, faces, colors=vcols, normals=norms
            )
            # ≤20k-face preview (reference app.py:516
            # simplify_quadric_decimation(20000)) — quadric-decimate
            # the full mesh rather than reconstructing twice.
            dv, dc, df = verts, vcols, faces
            if len(faces) > self.mesh_preview_tris:
                from image_to_pointcloud_tpu import native

                dec = native.decimate_mesh(
                    verts, vcols, faces, self.mesh_preview_tris
                )
                if dec is not None:
                    dv, dc, df = dec
            return filepath, self._mesh_preview(dv, dc, df)

        if res is None or res.packed is None:
            raise ValueError("Mesh output requires a depth model")
        verts, vcols, faces, _ = grid_mesh_from_packed(res.packed, res.grid_hw)
        norms = vertex_normals(verts, faces)
        filepath = write_ply_mesh(
            base + ".ply", verts, faces, colors=vcols, normals=norms
        )

        # Decimated preview ≤ 20k triangles (reference app.py:515-535).
        dv, dc, df, _ = decimate_grid_mesh(
            res.packed, res.grid_hw, self.mesh_preview_tris
        )
        return filepath, self._mesh_preview(dv, dc, df)

    @staticmethod
    def _mesh_preview(dv, dc, df) -> dict:
        """meshPreview payload (reference app.py:518-535 shape:
        vertices/normals/colors/flat faces; colors as exact doubles)."""
        dn = vertex_normals(dv, df)
        return {
            "vertices": _triplets_json(dv),
            "normals": _triplets_json(dn),
            # Divide in f64: with f32 colors `dc / 255.0` stays f32
            # (NumPy doesn't promote on a Python scalar), quantizing
            # e.g. 1/255 to 0.0039215688… vs the reference's f64
            # 0.00392156862745098.
            "colors": _triplets_json(dc.astype(np.float64) / 255.0),
            "faces": _ints_json(df.reshape(-1)),
        }

    # ---------- routes ----------

    def _build_router(self) -> Router:
        r = Router()
        svc = self
        # v2's static artifact mount folded into the unified v1 service
        # (SURVEY.md §0; reference backend/main.py:397).
        async def _prepare_output(rel: str) -> None:
            # v1 artifacts are flat "{job_id}.{ext}": materialize a
            # lazily-deferred export before the static handler's
            # existence check (PARITY.md deviation 11).
            await svc._ensure_exported(Path(rel).stem)

        r.mount_static("/outputs", self.output_dir, prepare=_prepare_output)

        @r.post("/process")
        async def process(req: Request):
            f = req.files.get("file")
            if f is None:
                raise HTTPError(400, "File must be an image")
            if not f.content_type.startswith("image/"):
                raise HTTPError(400, "File must be an image")
            data = f.data
            if len(data) > svc.max_file_size:
                raise HTTPError(
                    413,
                    f"File size ({len(data)/1024/1024:.1f}MB) exceeds maximum "
                    f"allowed size ({svc.max_file_size/1024/1024:.0f}MB)",
                )
            q = {**req.query, **req.form}
            d = svc.defaults  # core/config.py ProcessingDefaults
            try:
                request = {
                    "model": q.get("model", d.model),
                    "output_format": q.get("output_format", d.output_format),
                    "point_density": q.get("point_density", d.point_density),
                    "coordinate_system": q.get(
                        "coordinate_system", d.coordinate_system
                    ),
                    "invert_depth": _parse_bool(
                        q.get("invert_depth"), d.invert_depth
                    ),
                    "depth_scale": float(q.get("depth_scale", d.depth_scale)),
                    "smooth_depth": _parse_bool(
                        q.get("smooth_depth"), d.smooth_depth
                    ),
                    "fov": float(q.get("fov", d.fov)),
                }
            except ValueError as e:
                # FastAPI answers malformed numeric params with 422
                # before any job exists (reference backend/app.py:609-620).
                raise HTTPError(422, f"Invalid parameter value: {e}") from None
            job = await svc.jobs.create(message="Job queued", model=request["model"])
            svc._spawn(svc._process_job(job.job_id, data, request))
            return json_response({"job_id": job.job_id, "status": "queued"})

        @r.get("/status/{job_id}")
        async def status(req: Request):
            # Reference contract: instant snapshot (backend/app.py:666-676).
            # Beyond-reference: ``?wait_ms=N`` long-polls the next state
            # change (jobs.JobRegistry.status_for) — same response shape.
            job = await svc.jobs.status_for(
                req.path_params["job_id"], req.query.get("wait_ms")
            )
            if job.status in (JobStatus.COMPLETED, JobStatus.ERROR):
                return Response(
                    headers={"content-type": "application/json"},
                    body=job.terminal_body(job.to_v1),
                )
            return json_response(job.to_v1())

        @r.get("/download/{job_id}")
        async def download(req: Request):
            job = svc.jobs.get(req.path_params["job_id"])
            if job is None:
                raise HTTPError(404, "Job not found")
            if job.status != JobStatus.COMPLETED:
                raise HTTPError(400, "Job not completed")
            filepath = job.results["pointCloud"]["filepath"]
            # Lazy export: first download writes the artifact
            # (PARITY.md deviation 11).
            await svc._ensure_exported(job.job_id)
            if not Path(filepath).exists():
                raise HTTPError(404, "File not found")
            return await file_response(
                filepath,
                media_type="application/octet-stream",
                filename=Path(filepath).name,
            )

        @r.get("/models")
        async def models(req: Request):
            return json_response({"models": MODEL_CARDS})

        @r.get("/health")
        async def health(req: Request):
            return json_response(
                {
                    "status": "healthy",
                    "models_loaded": sorted(svc.loaded_model_names),
                    "active_jobs": len(svc.jobs),
                    "max_file_size_mb": svc.max_file_size / (1024 * 1024),
                }
            )

        @r.get("/openapi.json")
        async def openapi_doc(req: Request):
            """FastAPI auto-serves this on the reference app; clients
            written against it can introspect here too
            (serve/openapi.py mirrors backend/app.py:609-747)."""
            from image_to_pointcloud_tpu.serve.openapi import v1_openapi

            return json_response(v1_openapi())

        @r.get("/docs")
        async def docs_page(req: Request):
            """Self-contained HTML API docs (the reference's FastAPI
            serves Swagger UI here; ours must work air-gapped)."""
            from image_to_pointcloud_tpu.serve.openapi import (
                docs_html,
                v1_openapi,
            )

            return Response(
                headers={"content-type": "text/html; charset=utf-8"},
                body=docs_html(v1_openapi()).encode(),
            )

        @r.get("/timings/{job_id}")
        async def job_timings(req: Request):
            """Per-stage wall-clock of a completed job (additive endpoint —
            the v1 results dict stays byte-compatible with the reference)."""
            job = svc.jobs.get(req.path_params["job_id"])
            if job is None:
                raise HTTPError(404, "Job not found")
            return json_response({"job_id": job.job_id, "timings": job.extra.get("timings", {})})

        @r.get("/jobs")
        async def list_jobs(req: Request):
            """v2's job listing folded into the unified v1 service
            (SURVEY.md §0; shape matches backend/main.py:355-376)."""
            try:
                limit = max(0, int(req.query.get("limit", 10)))
            except ValueError:
                raise HTTPError(422, "limit must be an integer")
            status_f = req.query.get("status")
            rows = [
                {
                    "job_id": j.job_id,
                    "status": j.status,
                    "progress": j.progress,
                    "created_at": j.created_at,
                    "model": j.model,
                }
                for j in svc.jobs.list(status_f)
            ]
            rows.sort(key=lambda x: x["created_at"], reverse=True)
            return json_response({"jobs": rows[:limit], "total": len(rows)})

        @r.delete("/jobs/{job_id}")
        async def delete_job(req: Request):
            """v2's job deletion folded into v1 (backend/main.py:378-395);
            removes the job's exported artifacts too."""
            job_id = req.path_params["job_id"]
            job = svc.jobs.get(job_id)
            if not await svc.jobs.delete(job_id):
                raise HTTPError(404, "Job not found")
            svc._discard_pending_export(job_id)
            if job is not None and job.results:
                fp = (job.results.get("pointCloud") or {}).get("filepath")
                if fp and Path(fp).exists():
                    Path(fp).unlink()
            return json_response(
                {"message": f"Job {job_id} deleted successfully"}
            )

        @r.get("/metrics")
        async def metrics_route(req: Request):
            """Prometheus text exposition (framework observability — the
            reference has no metrics at all, SURVEY.md §5)."""
            return Response(
                headers={"content-type": "text/plain; version=0.0.4"},
                body=m.REGISTRY.render().encode(),
            )

        @r.post("/profile/start")
        async def profile_start(req: Request):
            """Start a jax.profiler trace (framework observability — the
            reference has no tracing at all, SURVEY.md §5)."""
            import jax

            trace_dir = str(svc.output_dir / "traces")
            jax.profiler.start_trace(trace_dir)
            svc._tracing = True
            return json_response({"tracing": True, "dir": trace_dir})

        @r.post("/profile/stop")
        async def profile_stop(req: Request):
            import jax

            if not getattr(svc, "_tracing", False):
                raise HTTPError(400, "No trace in progress")
            jax.profiler.stop_trace()
            svc._tracing = False
            return json_response({"tracing": False})

        return r


def create_v1_app(**kwargs) -> V1Service:
    return V1Service(**kwargs)
