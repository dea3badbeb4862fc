"""A/B: Pallas flash attention vs XLA fused attention at 518² (1370 tok).

The Block gate (models/dinov2.py flash_min_seq) defaults flash OFF below
2048 tokens; this measures whether that's still right for the flagship
518² config by timing the full fused serving graph both ways with the
peak-sustained-window method (see bench.py's device probe).

Usage: python benchmarks/flash_ab.py [batch]
Prints one JSON line per arm.
"""

from __future__ import annotations

import dataclasses
import json
import sys
import time

import numpy as np


def measure(pipe, opts, imgs, batch, on_tpu):
    import jax

    fn = pipe.compiled_graph(batch, (518, 518), opts, False)
    payload = pipe.pack_payload(imgs, np.full((batch,), 10.0, np.float32))
    dev_payload = jax.device_put(payload)
    from collections import deque

    _, p = fn(pipe.params, dev_payload)
    np.asarray(p)
    probes: deque = deque()
    iters = 16 if on_tpu else 2
    stamps = [time.perf_counter()]
    for _ in range(iters):
        _, p = fn(pipe.params, dev_payload)
        probes.append(p)
        if len(probes) > 2:
            np.asarray(probes.popleft())
            stamps.append(time.perf_counter())
    while probes:
        np.asarray(probes.popleft())
        stamps.append(time.perf_counter())
    w = min(4, len(stamps) - 1)
    return max(
        batch * w / (stamps[i + w] - stamps[i])
        for i in range(len(stamps) - w)
    )


def main() -> None:
    import jax
    import jax.numpy as jnp

    from image_to_pointcloud_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    from image_to_pointcloud_tpu.models import DepthAnything, preset
    from image_to_pointcloud_tpu.pipeline.graph import (
        DepthPipeline,
        PipelineOptions,
    )

    on_tpu = jax.default_backend() not in ("cpu",)
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else (16 if on_tpu else 2)
    opts = PipelineOptions(density="medium", refine=True)
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 255, (batch, 518, 518, 3)).astype(np.uint8)

    base = preset("depth-anything-v2-small")
    if on_tpu:
        base = base.with_dtype(jnp.bfloat16)
    arms = {
        "xla_fused": base.with_flash_attention(True),  # gate off at 1370
        "pallas_flash": dataclasses.replace(
            base.with_flash_attention(True),
            backbone=dataclasses.replace(
                base.with_flash_attention(True).backbone, flash_min_seq=1
            ),
        ),
    }
    params = None
    for name, cfg in arms.items():
        model = DepthAnything(cfg)
        if params is None:
            params = model.init(
                jax.random.PRNGKey(0), np.zeros((1, 28, 28, 3), np.float32)
            )["params"]
        pipe = DepthPipeline(cfg, params)
        tp = measure(pipe, opts, imgs, batch, on_tpu)
        print(
            json.dumps(
                {
                    "arm": name,
                    "peak_img_per_s": round(tp, 1),
                    "batch": batch,
                    "backend": jax.default_backend(),
                }
            )
        )


if __name__ == "__main__":
    main()
