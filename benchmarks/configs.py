"""Measure the five BASELINE.json configs on the current backend.

1. "MiDaS-small" slot, 256²: single JPEG → relative depth → PLY (p50
   img→PLY latency — the BASELINE latency metric). Honest label: the
   model is DA-V2-Small (a DPT-class stand-in for MiDaS; the real MiDaS
   EfficientNet-lite encoder is not implemented).
2. Depth-Anything-Base 518², batch-8 depth + unprojection.
3. ZoeDepth metric depth with real intrinsics → metric cloud — the real
   architecture (BEiT + adaptive bins, models/zoedepth.py) at
   zoedepth-small scale (BEiT-base; no released weights at this size).
4. High-res 1024² tiled inference + voxel downsample to ≤1M points.
5. Video: 30-frame clip, temporally batched → fused cloud.

Each config prints its own JSON line as it completes (a relay timeout
still yields the earlier lines). Compiles are cached persistently, so a
second run is measurement-only.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/configs.py [configs...]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

import numpy as np


def _emit(name, latencies_s, unit_n=1):
    lat = np.asarray(latencies_s)
    p50 = float(np.percentile(lat, 50))
    print(
        json.dumps(
            {
                "config": name,
                "p50_ms": round(p50 * 1e3, 1),
                # p50-based: one multi-second relay stall out of 8 runs
                # would otherwise dominate a mean-based rate on this
                # rig's tunneled link. The mean rate rides along.
                "img_per_s_p50": round(unit_n / p50, 2),
                "img_per_s_mean": round(
                    unit_n * len(lat) / float(lat.sum()), 2
                ),
                "runs": len(lat),
            }
        ),
        flush=True,
    )


def main() -> None:
    import jax
    import jax.numpy as jnp

    from image_to_pointcloud_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    from image_to_pointcloud_tpu import io as pcio
    from image_to_pointcloud_tpu.models import preset
    from image_to_pointcloud_tpu.pipeline.advanced import (
        CameraIntrinsics,
        HighResPipeline,
        MetricPipeline,
        VideoPipeline,
    )
    from image_to_pointcloud_tpu.pipeline.graph import (
        DepthPipeline,
        PipelineOptions,
    )

    on_tpu = jax.default_backend() not in ("cpu",)
    which = set(sys.argv[1:]) or {"1", "2", "3", "4", "5"}
    rng = np.random.default_rng(0)

    def params_for(cfg):
        from image_to_pointcloud_tpu.models import build_model

        model = build_model(cfg)
        ps = cfg.backbone.patch_size
        return model.init(
            jax.random.PRNGKey(0),
            np.zeros((1, 2 * ps, 2 * ps, 3), np.float32),
        )["params"]

    reps = 8 if on_tpu else 2

    if "1" in which:
        cfg = preset("midas-small")
        if on_tpu:
            cfg = cfg.with_dtype(jnp.bfloat16)
        pipe = DepthPipeline(cfg, params_for(cfg), model_target=256)
        img = rng.integers(0, 255, (256, 256, 3)).astype(np.uint8)
        opts = PipelineOptions(density="high")
        out = os.path.join(tempfile.mkdtemp(), "c1.ply")
        pipe.run(img, options=opts)  # compile
        lat = []
        for _ in range(reps):
            t0 = time.perf_counter()
            res = pipe.run(img, options=opts, want_preview=False)
            pcio.write_ply_points(out, res.points, res.colors)
            lat.append(time.perf_counter() - t0)
        _emit("1_midas_slot_da_small_256_jpeg_to_ply", lat)

    if "2" in which:
        cfg = preset("depth-anything-v2-base")
        if on_tpu:
            cfg = cfg.with_dtype(jnp.bfloat16)
        pipe = DepthPipeline(cfg, params_for(cfg))
        imgs = rng.integers(0, 255, (8, 518, 518, 3)).astype(np.uint8)
        opts = PipelineOptions(density="medium")
        pipe.run_batch(imgs, options=opts, want_preview=False)  # compile
        lat = []
        for _ in range(max(3, reps // 2)):
            t0 = time.perf_counter()
            pipe.run_batch(
                imgs, options=opts, want_preview=False, want_packed=False
            )
            lat.append(time.perf_counter() - t0)
        _emit("2_da_base_518_batch8", lat, unit_n=8)

    if "3" in which:
        cfg = preset("zoedepth-small")
        if on_tpu:
            cfg = cfg.with_dtype(jnp.bfloat16)
        pipe = MetricPipeline(cfg, params_for(cfg))
        img = rng.integers(0, 255, (518, 518, 3)).astype(np.uint8)
        intr = CameraIntrinsics(fx=500.0, fy=500.0, cx=259.0, cy=259.0)
        pipe.run(img, intr)  # compile
        lat = []
        for _ in range(reps):
            t0 = time.perf_counter()
            pts, cols = pipe.run(img, intr)
            lat.append(time.perf_counter() - t0)
        _emit("3_zoedepth_metric_intrinsics", lat)
        # Batched (the throughput configuration, mirroring config 2):
        # one fused batch-8 dispatch, per-image intrinsics.
        imgs = rng.integers(0, 255, (8, 518, 518, 3)).astype(np.uint8)
        intrs = [intr] * 8
        pipe.run_batch(imgs, intrs)  # compile
        lat = []
        for _ in range(max(3, reps // 2)):
            t0 = time.perf_counter()
            pipe.run_batch(imgs, intrs)
            lat.append(time.perf_counter() - t0)
        _emit("3_zoedepth_metric_intrinsics_batch8", lat, unit_n=8)

    if "4" in which:
        cfg = preset("depth-anything-v2-small")
        if on_tpu:
            cfg = cfg.with_dtype(jnp.bfloat16)
        pipe = HighResPipeline(cfg, params_for(cfg))
        img = rng.integers(0, 255, (1024, 1024, 3)).astype(np.uint8)
        pipe.run(img, voxel_budget=1_000_000)  # compile
        lat = []
        for _ in range(max(3, reps // 2)):
            t0 = time.perf_counter()
            pts, cols = pipe.run(img, voxel_budget=1_000_000)
            lat.append(time.perf_counter() - t0)
        _emit("4_highres_1024_tiled_voxel1M", lat)

    if "5" in which:
        cfg = preset("depth-anything-v2-small")
        if on_tpu:
            cfg = cfg.with_dtype(jnp.bfloat16)
        pipe = VideoPipeline(cfg, params_for(cfg))
        clip = rng.integers(0, 255, (30, 518, 518, 3)).astype(np.uint8)
        pipe.run(clip, step=2)  # compile
        lat = []
        for _ in range(max(3, reps // 2)):
            t0 = time.perf_counter()
            pts, cols = pipe.run(clip, step=2)
            lat.append(time.perf_counter() - t0)
        _emit("5_video_30frame_fused", lat, unit_n=30)


if __name__ == "__main__":
    main()
