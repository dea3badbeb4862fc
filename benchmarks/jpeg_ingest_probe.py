"""A/B probe: pixel payload vs sparse-JPEG payload through the fused
serving graph on the real TPU.

Quantifies what the blocked-sparse hybrid ingest (ops/jpeg_sparse.py)
buys on this rig's serialized H2D link, and validates the device
scatter's cost on real hardware. Batch-16 518x518, the headline bench
configuration; JPEG quality 88 photographic content.

Usage: python benchmarks/jpeg_ingest_probe.py [iters]
"""

from __future__ import annotations

import sys
import time

import numpy as np

# Same content as bench.py's inline copy (asserted identical by
# tests/test_bench_contract.py) — the A/B ratio only explains the
# headline if both measure the same JPEG payload.
from synth import jpeg_bytes, photo


def main() -> None:
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    batch = 16

    from image_to_pointcloud_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    import jax.numpy as jnp

    from image_to_pointcloud_tpu.models import DepthAnything, preset
    from image_to_pointcloud_tpu.pipeline.graph import (
        DepthPipeline,
        PipelineOptions,
        plan_jpeg_input,
        plan_sparse_batch,
    )

    import jax

    cfg = preset("depth-anything-v2-small")
    if jax.default_backend() != "cpu":
        cfg = cfg.with_dtype(jnp.bfloat16).with_flash_attention(True)
    model = DepthAnything(cfg)
    params = model.init(
        jax.random.PRNGKey(0), np.zeros((1, 28, 28, 3), np.float32)
    )["params"]
    pipe = DepthPipeline(cfg, params)
    opts = PipelineOptions(density="medium", refine=True)

    imgs = np.stack([photo(518, 518, s) for s in range(batch)])
    datas = [jpeg_bytes(imgs[i]) for i in range(batch)]

    t0 = time.perf_counter()
    jpegs = [plan_jpeg_input(d) for d in datas]
    plan_ms = (time.perf_counter() - t0) * 1000 / batch
    assert all(j is not None for j in jpegs), "planner rejected a JPEG"
    # Per-image H2D bytes from the product packer itself (includes the
    # per-row overheads shared with the dense layout — qtables, padded
    # scale word — so the pixel comparison is apples-to-apples).
    caps = plan_sparse_batch(jpegs)
    assert caps is not None, "chooser fell back to the dense payload"
    sparse_row = pipe.pack_jpeg_sparse_payload(
        jpegs, np.full((batch,), 10.0, np.float32), *caps
    ).shape[1]
    pixel_row = 518 * 518 * 3 + 4
    print(
        f"plan {plan_ms:.1f} ms/img host; payload/img: sparse "
        f"{sparse_row / 1024:.0f} KB vs pixels {pixel_row / 1024:.0f} KB "
        f"({sparse_row / pixel_row:.2f}x)",
        flush=True,
    )

    def run(submit):
        # Warmup (compile) + steady state, 3 in flight like bench.py.
        from collections import deque

        pipe.collect(submit(), want_preview=False, want_packed=False)
        pending = deque()
        t0 = time.perf_counter()
        for _ in range(3):
            pending.append(submit())
        for _ in range(iters - 3):
            pending.append(submit())
            pipe.collect(
                pending.popleft(), want_preview=False, want_packed=False
            )
        while pending:
            pipe.collect(
                pending.popleft(), want_preview=False, want_packed=False
            )
        return batch * iters / (time.perf_counter() - t0)

    tp_px = run(
        lambda: pipe.submit_batch(imgs, options=opts, want_preview=False)
    )
    print(f"pixel payload:  {tp_px:.1f} img/s e2e", flush=True)
    tp_js = run(
        lambda: pipe.submit_batch_jpeg(jpegs, options=opts, want_preview=False)
    )
    print(f"sparse jpeg:    {tp_js:.1f} img/s e2e ({tp_js / tp_px:.2f}x)",
          flush=True)
    # Include per-iteration re-planning (the serving path overlaps this
    # on an executor thread; serial here = worst case for 1 core).
    tp_plan = run(
        lambda: pipe.submit_batch_jpeg(
            [plan_jpeg_input(d) for d in datas],
            options=opts,
            want_preview=False,
        )
    )
    print(
        f"sparse + serial replan: {tp_plan:.1f} img/s e2e "
        f"({tp_plan / tp_px:.2f}x)",
        flush=True,
    )


if __name__ == "__main__":
    main()
