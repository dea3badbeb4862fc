"""Window-fair batch-size sweep of the e2e JPEG-ingest loop.

Per-batch fixed costs on this rig (relay RPC latency for H2D, execute,
D2H — roughly 80-90 ms/batch in a mid-grade window) do not scale with
batch size, so larger batches amortize them. Historical data point
"batch 32 slower than 16" (RESULTS.md 2026-08-16) predates the sparse
JPEG ingest and both transfer diets; this sweep re-tests with the
product payloads, interleaving batch sizes round-robin so one relay
window prices every size.

Usage: python benchmarks/batch_sweep.py [rounds] [sizes,comma,separated]
"""

from __future__ import annotations

import sys
import time

import numpy as np

from synth import jpeg_bytes, photo


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    sizes = (
        [int(s) for s in sys.argv[2].split(",")]
        if len(sys.argv) > 2
        else [16, 24, 32]
    )

    from image_to_pointcloud_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    import jax
    import jax.numpy as jnp

    from image_to_pointcloud_tpu.models import DepthAnything, preset
    from image_to_pointcloud_tpu.pipeline.graph import (
        DepthPipeline,
        PipelineOptions,
        plan_jpeg_input,
    )

    on_tpu = jax.default_backend() not in ("cpu",)
    if not on_tpu:
        rounds = min(rounds, 2)

    cfg = preset("depth-anything-v2-small")
    if on_tpu:
        cfg = cfg.with_dtype(jnp.bfloat16).with_flash_attention(True)
    model = DepthAnything(cfg)
    params = model.init(
        jax.random.PRNGKey(0), np.zeros((1, 28, 28, 3), np.float32)
    )["params"]
    pipe = DepthPipeline(cfg, params)
    opts = PipelineOptions(density="medium", refine=True)

    nmax = max(sizes)
    imgs = np.stack([photo(518, 518, s) for s in range(nmax)])
    datas = [jpeg_bytes(imgs[i]) for i in range(nmax)]

    def run_once(b: int) -> None:
        """One bench.py-equivalent iteration: replan + submit + collect
        (depth-1 here: the sweep compares serialized per-batch cost;
        bench.py's 3-deep queue changes all sizes equally)."""
        jp = [plan_jpeg_input(d) for d in datas[:b]]
        h = pipe.submit_batch_jpeg(jp, options=opts, want_preview=False)
        pipe.collect(h, want_preview=False, want_packed=False)

    for b in sizes:  # compile/warm every size before any timing
        t0 = time.perf_counter()
        run_once(b)
        print(f"batch {b}: warm in {time.perf_counter() - t0:.1f}s",
              flush=True)

    times: dict[int, list[float]] = {b: [] for b in sizes}
    for r in range(rounds):
        for b in sizes:
            t0 = time.perf_counter()
            run_once(b)
            times[b].append(time.perf_counter() - t0)

    for b in sizes:
        ts = sorted(times[b])
        k = max(1, len(ts) // 2)
        fast = sum(ts[:k]) / k
        print(
            f"batch {b:3d}: best-half-mean {fast * 1e3:7.1f} ms/batch = "
            f"{b / fast:6.1f} img/s   (median {sorted(ts)[len(ts) // 2] * 1e3:.1f} ms)",
            flush=True,
        )


if __name__ == "__main__":
    main()
