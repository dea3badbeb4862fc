"""Stage breakdown of bench.py's e2e loop: where do the ms/batch go
when nothing overlaps?

Times, per batch-16 (best-of over iters, same window):
  replan     host JPEG Huffman decode + sparse pack (plan_jpeg_input x B)
  pack       pack_jpeg_sparse_payload (host)
  h2d        jax.device_put(payload) blocked to completion
  compute    compiled serving graph on a device-resident payload,
             1-scalar pull (dispatch + chip time)
  d2h        np.asarray of the full output bundle from a completed run
  reconstruct collect() host half over a host-resident bundle (native
             dequant+unproject+compact), approximated by calling
             collect on a fresh handle minus its d2h (reported as
             collect_total and collect_host = collect_total - d2h)

The serialized-link hypothesis says e2e ms/batch ~= sum of rows; a
large gap means some stages do overlap and byte-diet estimates must
discount accordingly.

Usage: python benchmarks/e2e_breakdown.py [iters] [batch]
"""

from __future__ import annotations

import sys
import time

import numpy as np

from synth import jpeg_bytes, photo


def best(fn, iters: int) -> float:
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    ts.sort()
    # median of the fastest half: robust to relay stalls without
    # cherry-picking a single lucky dispatch
    k = max(1, len(ts) // 2)
    return sum(ts[:k]) / k * 1e3


def main() -> None:
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    from image_to_pointcloud_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    import jax
    import jax.numpy as jnp

    from image_to_pointcloud_tpu.models import DepthAnything, preset
    from image_to_pointcloud_tpu.pipeline.graph import (
        DepthPipeline,
        PipelineOptions,
        plan_jpeg_input,
        plan_sparse_batch,
    )

    on_tpu = jax.default_backend() not in ("cpu",)
    if not on_tpu:
        iters = min(iters, 2)

    cfg = preset("depth-anything-v2-small")
    if on_tpu:
        cfg = cfg.with_dtype(jnp.bfloat16).with_flash_attention(True)
    model = DepthAnything(cfg)
    params = model.init(
        jax.random.PRNGKey(0), np.zeros((1, 28, 28, 3), np.float32)
    )["params"]
    pipe = DepthPipeline(cfg, params)
    opts = PipelineOptions(density="medium", refine=True)

    imgs = np.stack([photo(518, 518, s) for s in range(batch)])
    datas = [jpeg_bytes(imgs[i]) for i in range(batch)]
    jpegs = [plan_jpeg_input(d) for d in datas]
    assert all(j is not None for j in jpegs)
    spec = jpegs[0].spec
    caps = plan_sparse_batch(jpegs)
    assert caps is not None
    scales = np.full((batch,), 10.0, np.float32)

    print(f"batch {batch}, iters {iters}, backend {jax.default_backend()}",
          flush=True)

    ms = best(lambda: [plan_jpeg_input(d) for d in datas], iters)
    print(f"replan (host huffman+pack) {ms:8.1f} ms/batch", flush=True)

    payload = pipe.pack_jpeg_sparse_payload(jpegs, scales, *caps)
    ms = best(
        lambda: pipe.pack_jpeg_sparse_payload(jpegs, scales, *caps), iters
    )
    print(f"pack payload (host)        {ms:8.1f} ms/batch "
          f"({payload.nbytes / batch / 1024:.0f} KB/img)", flush=True)

    def h2d():
        jax.device_put(payload).block_until_ready()

    h2d()  # warm
    ms = best(h2d, iters)
    print(f"h2d upload                 {ms:8.1f} ms/batch", flush=True)

    fn = pipe.compiled_graph_jpeg(batch, spec, opts, False, sparse_cap=caps)
    dev_payload = jax.device_put(payload)

    def compute():
        out, prev = fn(pipe.params, dev_payload)
        np.asarray(prev)  # 1-byte placeholder pull

    compute()  # warm
    ms = best(compute, iters)
    print(f"compute (dispatch+chip)    {ms:8.1f} ms/batch", flush=True)

    out, prev = fn(pipe.params, dev_payload)
    np.asarray(prev)
    bundle_bytes = out.shape[0] * out.shape[1]

    outs = [fn(pipe.params, dev_payload)[0] for _ in range(iters)]
    for o in outs:
        o.block_until_ready()
    ms = best(lambda: np.asarray(outs.pop()), len(outs) - 1) if iters > 1 else 0
    print(f"d2h bundle pull            {ms:8.1f} ms/batch "
          f"({bundle_bytes / batch / 1024:.0f} KB/img)", flush=True)
    d2h_ms = ms

    handle = pipe.submit_batch_jpeg(jpegs, depth_scales=scales, options=opts,
                                    want_preview=False)
    pipe.collect(handle, want_preview=False, want_packed=False)

    def coll():
        h = pipe.submit_batch_jpeg(jpegs, depth_scales=scales, options=opts,
                                   want_preview=False)
        h[0].block_until_ready()
        t0 = time.perf_counter()
        pipe.collect(h, want_preview=False, want_packed=False)
        return time.perf_counter() - t0

    ts = sorted(coll() for _ in range(iters))
    k = max(1, len(ts) // 2)
    ms = sum(ts[:k]) / k * 1e3
    print(f"collect (d2h+reconstruct)  {ms:8.1f} ms/batch "
          f"(host half ~{ms - d2h_ms:.1f})", flush=True)


if __name__ == "__main__":
    main()
