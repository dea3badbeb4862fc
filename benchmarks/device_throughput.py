"""Device-side throughput of the fused pipeline graph (no host transfers).

Measures the north-star compute number — image->point-cloud conversions
per second per chip with the full fused graph (preprocess -> DA-V2-Small
forward -> normalize -> unproject -> grid-kNN outlier mask -> depth16
bundle pack) — by reducing every output to one scalar on device so only
4 bytes cross the link per step. This isolates chip capability from this
rig's tunneled-relay link (see benchmarks/RESULTS.md).

Usage: python benchmarks/device_throughput.py [--model NAME] [--size N] [batch ...]
Prints one JSON line per batch size.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from image_to_pointcloud_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    from image_to_pointcloud_tpu.models import build_model, preset
    from image_to_pointcloud_tpu.pipeline.graph import DepthPipeline, PipelineOptions

    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="depth-anything-v2-small")
    ap.add_argument("--size", type=int, default=518,
                    help="square input image side (518 DA-native; 384 for "
                    "dpt-large/zoedepth natives)")
    ap.add_argument("batches", nargs="*", type=int)
    args = ap.parse_args()

    on_tpu = jax.default_backend() not in ("cpu",)
    batches = args.batches or ([16, 32] if on_tpu else [2])

    cfg = preset(args.model)
    if on_tpu:
        cfg = cfg.with_dtype(jnp.bfloat16).with_flash_attention(True)
    model = build_model(cfg)
    ps = cfg.backbone.patch_size
    params = model.init(
        jax.random.PRNGKey(0), np.zeros((1, 2 * ps, 2 * ps, 3), np.float32)
    )["params"]
    pipe = DepthPipeline(cfg, params)
    opts = PipelineOptions(density="medium", refine=True)

    rng = np.random.default_rng(0)
    size = args.size
    for batch in batches:
        imgs = rng.integers(0, 255, (batch, size, size, 3)).astype(np.uint8)

        # Build the exact serving graph, then reduce outputs to a scalar so
        # the only D2H is 4 bytes. Inputs are uploaded once, outside the
        # timed loop (H2D is charged to the e2e bench, not this one).
        base = pipe.compiled_graph(batch, (size, size), opts, False)

        def scalar_graph(params, payload):
            out, prev = base(params, payload)
            return jnp.sum(out, dtype=jnp.int32) + jnp.sum(
                prev, dtype=jnp.int32
            )

        fn = jax.jit(scalar_graph)
        payload = pipe.pack_payload(
            imgs, np.full((batch,), 10.0, np.float32)
        )
        dev_payload = jax.device_put(payload)

        # Warmup (compile) + steady state.
        np.asarray(fn(pipe.params, dev_payload))
        iters = 10 if on_tpu else 2
        t0 = time.perf_counter()
        for _ in range(iters - 1):
            fn(pipe.params, dev_payload)
        np.asarray(fn(pipe.params, dev_payload))
        elapsed = time.perf_counter() - t0
        print(
            json.dumps(
                {
                    "metric": "device_graph_img_per_s",
                    "model": args.model,
                    "size": size,
                    "batch": batch,
                    "value": round(batch * iters / elapsed, 1),
                    "ms_per_batch": round(elapsed / iters * 1e3, 1),
                    "backend": jax.default_backend(),
                }
            )
        )


if __name__ == "__main__":
    main()
