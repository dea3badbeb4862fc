"""Service entry point: ``python -m image_to_pointcloud_tpu.serve``.

Mirrors the reference's two alternative uvicorn entry points
(``backend/app.py`` v1 vs ``backend/main.py`` v2, both :8000) as a
``--generation`` flag on one CLI.
"""

from __future__ import annotations

import argparse
import asyncio
import logging
import os
import time as _time


def main() -> None:
    # Defaults come from the typed config tree (core/config.py): built-in
    # reference defaults ← optional JSON file (IPC_TPU_CONFIG) ←
    # IPC_TPU_* env vars ← CLI flags (highest precedence).
    import os

    from image_to_pointcloud_tpu.core.config import load_config

    cfg = load_config(os.environ.get("IPC_TPU_CONFIG"))

    parser = argparse.ArgumentParser(description="TPU image→point-cloud service")
    parser.add_argument("--host", default=cfg.host)
    parser.add_argument("--port", type=int, default=cfg.port)
    parser.add_argument(
        "--generation", choices=["v1", "v2"], default="v1",
        help="v1 = depth point-cloud API (reference backend/app.py); "
        "v2 = textured 3D asset API (reference backend/main.py)",
    )
    parser.add_argument("--output-dir", default=cfg.output_dir)
    parser.add_argument("--checkpoint-dir", default=cfg.checkpoint_dir)
    parser.add_argument(
        "--honor-fov", action="store_true", default=cfg.honor_fov
    )
    parser.add_argument(
        "--mesh-method", choices=["grid", "poisson", "bpa"],
        default=cfg.mesh_method,
        help="v1 mesh_ply reconstruction: 'grid' = exact depth-grid "
        "triangulation (default), 'poisson'/'bpa' = the reference's "
        "Open3D algorithms (backend/app.py:283-305) via native/",
    )
    parser.add_argument(
        "--jpeg-device-decode", action="store_true",
        default=cfg.jpeg_device_decode,
        help="hybrid ingest for large JPEGs: host Huffman only, "
        "dequant/IDCT/upsample/color on device at reduced scale "
        "(ops/jpeg.py; documented decode deviation in PARITY.md)",
    )
    parser.add_argument(
        "--eager-export", action="store_true", default=not cfg.lazy_export,
        help="write point-cloud artifacts during the job instead of on "
        "first GET /download (lazy is the default; PARITY.md dev. 11)",
    )
    parser.add_argument(
        "--warmup", default=cfg.warmup,
        help="comma-separated HxW sizes to pre-compile at startup, e.g. '518x518,480x640'",
    )
    parser.add_argument(
        "--mesh", default=cfg.mesh,
        help="multi-chip serving mesh: 'auto' (DP over all devices), "
        "'data=N,model=M[,seq=S]' (batches shard over data, encoder "
        "params shard megatron-style over model), or 'pipe=S,data=N' "
        "(GPipe: encoder stages pipeline over S chips)",
    )
    parser.add_argument(
        "--ui", action="store_true", default=cfg.serve_ui,
        help="serve the first-party frontend at /ui (the reference runs its "
        "frontend as a separate Vite server on :3000; ours can also ride the "
        "backend process)",
    )
    parser.add_argument(
        "--log-json", action="store_true", default=cfg.log_json,
        help="JSON-lines structured logging (the reference declares "
        "python-json-logger but never wires it — SURVEY.md §5)",
    )
    args = parser.parse_args()

    from image_to_pointcloud_tpu.utils.logging import configure_logging

    configure_logging(json_lines=args.log_json)

    from image_to_pointcloud_tpu.serve.http import HttpServer
    from image_to_pointcloud_tpu.serve.models import ModelManager
    from image_to_pointcloud_tpu.utils.cache import enable_persistent_cache
    from image_to_pointcloud_tpu.utils.chiplock import register_tpu_holder

    enable_persistent_cache()
    # Single-holder TPU enforcement (utils/chiplock.py): a resident
    # server starves any other process's graph loads on this rig, so
    # every server registers a pidfile that bench.py's preflight can
    # enumerate and evict. Advisory on failure.
    register_tpu_holder(f"serve_{args.generation}")

    # The pipeline's size caps are module-level parity constants
    # (backend/app.py:43-44); apply config overrides before any graph
    # builds so every compiled signature sees the configured values.
    from image_to_pointcloud_tpu.pipeline import graph as _graph

    _graph.MAX_IMAGE_DIM = cfg.max_image_dim
    _graph.DEPTH_PREVIEW_MAX = cfg.depth_preview_max

    mesh = None
    if args.mesh == "auto":
        mesh = "auto"
    elif args.mesh:
        spec = dict(kv.split("=") for kv in args.mesh.split(","))
        if "pipe" in spec:
            # GPipe pipeline parallelism over the encoder stages
            # (parallel/pipeline_par), e.g. --mesh pipe=4,data=2.
            from image_to_pointcloud_tpu.parallel.pipeline_par import (
                make_pipe_mesh,
            )

            mesh = make_pipe_mesh(**{k: int(v) for k, v in spec.items()})
        else:
            from image_to_pointcloud_tpu.parallel.sharding import make_mesh

            mesh = make_mesh(**{k: int(v) for k, v in spec.items()})

    models = ModelManager(checkpoint_dir=args.checkpoint_dir, mesh=mesh)

    async def run() -> None:
        if args.generation == "v1":
            from image_to_pointcloud_tpu.serve.app_v1 import create_v1_app

            warmup_sizes = []
            if args.warmup:
                for tok in args.warmup.split(","):
                    hh, ww = tok.lower().split("x")
                    warmup_sizes.append((int(hh), int(ww)))
            app = create_v1_app(
                output_dir=args.output_dir,
                models=models,
                honor_fov=args.honor_fov,
                mesh_method=args.mesh_method,
                jpeg_device_decode=args.jpeg_device_decode,
                warmup_sizes=warmup_sizes,
                batch_window_ms=cfg.batch_window_ms,
                max_batch=cfg.max_batch,
                durable_jobs=cfg.durable_jobs,
                max_jobs=cfg.max_jobs,
                defaults=cfg.defaults,
                max_file_size=cfg.max_file_size,
                max_preview_points=cfg.max_preview_points,
                mesh_preview_tris=cfg.mesh_preview_tris,
                lazy_export=not args.eager_export,
                lazy_export_max_bytes=cfg.lazy_export_max_bytes,
            )
            server = HttpServer(
                app.router, args.host, args.port,
                cors_origin=cfg.cors_origin_v1,
            )
            if warmup_sizes:
                import threading

                threading.Thread(target=app.warmup, daemon=True).start()
        else:
            if args.jpeg_device_decode:
                # v2's preprocess (matte, foreground crop, 512² resize —
                # serve/processor3d.py) needs host pixels, so hybrid
                # ingest cannot apply; say so instead of silently
                # dropping the flag.
                logging.getLogger(__name__).warning(
                    "--jpeg-device-decode applies to --generation v1 "
                    "only; ignored for v2"
                )
            from image_to_pointcloud_tpu.serve.app_v2 import create_v2_app

            app = create_v2_app(
                output_dir=args.output_dir,
                models=models,
                durable_jobs=cfg.durable_jobs,
                max_jobs=cfg.max_jobs,
                v2_defaults=cfg.v2,
            )
            server = HttpServer(
                app.router, args.host, args.port,
                cors_origin=cfg.cors_origin_v2,
            )
        if args.ui:
            from pathlib import Path

            ui_dir = Path(__file__).resolve().parents[2] / "frontend"
            app.router.mount_static("/ui", ui_dir)
        await server.start()
        logging.info(
            "Serving %s API on %s:%d", args.generation, args.host, server.bound_port
        )
        if args.generation == "v2":
            # Bind BEFORE loading the model: the remote compile helper
            # can hang outright (CLAUDE.md), and a hung load must leave
            # /health answering (and /process 503ing) rather than a
            # silent unbound port. Requests are served while this awaits.
            await app.startup()
        # Optional device keepalive (IPC_TPU_KEEPALIVE_S=N, off by
        # default): dispatch a trivial op every N seconds. On
        # relay-tunneled rigs the first dispatch after an idle gap
        # stalls seconds (connection/driver warm-up); a ~1 ms heartbeat
        # keeps the path hot so request latency doesn't pay it.
        try:
            ka = float(os.environ.get("IPC_TPU_KEEPALIVE_S", "0") or 0)
        except ValueError:
            logging.warning(
                "IPC_TPU_KEEPALIVE_S=%r is not a number; keepalive off",
                os.environ.get("IPC_TPU_KEEPALIVE_S"),
            )
            ka = 0.0
        if ka > 0:
            import threading as _threading

            def _keepalive() -> None:
                import jax.numpy as _jnp

                first = True
                while True:
                    try:
                        (_jnp.zeros((8,)) + 1.0).block_until_ready()
                        if first:
                            # The first beat compiles; if the remote
                            # compile helper is down it HANGS here (no
                            # exception) — this log line is how an
                            # operator sees whether the heartbeat is
                            # actually running.
                            logging.info("device keepalive active (%.1fs)", ka)
                            first = False
                    except Exception:  # noqa: BLE001
                        pass  # device briefly unavailable; keep trying
                    _time.sleep(ka)

            _threading.Thread(target=_keepalive, daemon=True).start()
        # Graceful shutdown: stop accepting, flush the job journal, run
        # app shutdown hooks (the reference relies on process kill and
        # loses all state — SURVEY.md §5).
        import signal

        stop = asyncio.Event()
        loop = asyncio.get_running_loop()
        for sig in (signal.SIGTERM, signal.SIGINT):
            try:
                loop.add_signal_handler(sig, stop.set)
            except NotImplementedError:  # non-unix
                pass
        serve_task = asyncio.create_task(server.serve_forever())
        stop_task = asyncio.create_task(stop.wait())
        # Exit on SIGTERM/SIGINT *or* a crashed accept loop — a dead
        # server must kill the process (supervisors restart it), not
        # linger silently.
        await asyncio.wait(
            {serve_task, stop_task}, return_when=asyncio.FIRST_COMPLETED
        )
        logging.info("Shutting down...")
        stop_task.cancel()
        serve_err = None
        if serve_task.done():
            serve_err = serve_task.exception()
        else:
            serve_task.cancel()
        await server.stop()
        if hasattr(app, "shutdown"):
            await app.shutdown()
        app.jobs.close()
        if serve_err is not None:
            raise serve_err

    asyncio.run(run())


if __name__ == "__main__":
    main()
