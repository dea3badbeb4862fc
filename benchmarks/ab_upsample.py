"""Interleaved A/B: stack/reshape vs matmul form of the libjpeg
"fancy" 2x chroma upsample inside the JPEG-sparse decode subgraph.

Relay windows dominate single-run comparisons on this rig
(CLAUDE.md), so both variants are compiled in one process and their
dispatches interleaved A/B/A/B...; each variant reports its best
4-step contiguous window. Ad-hoc tool for the round-3 decision on
ops/jpeg.py:_fancy_upsample_axis; not part of the bench contract.

Usage: python benchmarks/ab_upsample.py [iters-per-variant] [batch]
"""

from __future__ import annotations

import sys
import time

import numpy as np

from synth import jpeg_bytes, photo


def main() -> None:
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    from image_to_pointcloud_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    import jax
    import jax.numpy as jnp

    from image_to_pointcloud_tpu.ops import jpeg as jpeg_mod
    from image_to_pointcloud_tpu.pipeline.graph import (
        _unpack_jpeg_sparse_batch,
        plan_jpeg_input,
        plan_sparse_batch,
    )
    from image_to_pointcloud_tpu.pipeline.graph import DepthPipeline
    from image_to_pointcloud_tpu.models import DepthAnything, preset

    cfg = preset("depth-anything-v2-small")
    model = DepthAnything(cfg)
    params = model.init(
        jax.random.PRNGKey(0), np.zeros((1, 28, 28, 3), np.float32)
    )["params"]
    pipe = DepthPipeline(cfg, params)

    imgs = np.stack([photo(518, 518, s) for s in range(batch)])
    jpegs = [plan_jpeg_input(jpeg_bytes(imgs[i])) for i in range(batch)]
    assert all(j is not None for j in jpegs)
    spec = jpegs[0].spec
    caps = plan_sparse_batch(jpegs)
    assert caps is not None
    cap, exc_cap = caps
    payload = pipe.pack_jpeg_sparse_payload(
        jpegs, np.full((batch,), 10.0, np.float32), *caps
    )
    dev_payload = jax.device_put(payload)

    matmul_impl = jpeg_mod._fancy_upsample_axis

    def stack_impl(p, axis):
        p = jnp.moveaxis(p, axis, 0)
        left = jnp.concatenate([p[:1], p[:-1]], 0)
        right = jnp.concatenate([p[1:], p[-1:]], 0)
        even = 0.75 * p + 0.25 * left
        odd = 0.75 * p + 0.25 * right
        out = jnp.stack([even, odd], 1).reshape((-1,) + p.shape[1:])
        return jnp.moveaxis(out, 0, axis)

    def decode(payload_u8):
        img, scales = _unpack_jpeg_sparse_batch(payload_u8, spec, cap, exc_cap)
        return jnp.sum(img) + jnp.sum(scales)

    compiled = {}
    for name, impl in (("matmul", matmul_impl), ("stack", stack_impl)):
        jpeg_mod._fancy_upsample_axis = impl
        fn = jax.jit(decode)
        t0 = time.perf_counter()
        ref = np.asarray(fn(dev_payload))  # trace+compile with this impl
        print(f"{name}: compiled+warm in {time.perf_counter() - t0:.1f}s "
              f"checksum {ref:.1f}", flush=True)
        compiled[name] = fn
    jpeg_mod._fancy_upsample_axis = matmul_impl

    stamps = {"matmul": [time.perf_counter()], "stack": None}
    times = {"matmul": [], "stack": []}
    for i in range(iters):
        for name in ("matmul", "stack"):
            t0 = time.perf_counter()
            np.asarray(compiled[name](dev_payload))
            times[name].append(time.perf_counter() - t0)

    for name in ("matmul", "stack"):
        ts = times[name]
        w = min(4, len(ts))
        best = min(sum(ts[i : i + w]) / w for i in range(len(ts) - w + 1))
        med = sorted(ts)[len(ts) // 2]
        print(
            f"{name:7s} best-{w}-window {best * 1e3:7.1f} ms/batch-{batch} "
            f"median {med * 1e3:7.1f} ms",
            flush=True,
        )


if __name__ == "__main__":
    main()
