"""Device-side stage ablation of the JPEG-sparse ingest graph.

Mirrors the pixel-graph ablation in RESULTS.md: cumulative jitted
subgraphs over the SAME sparse payload rows the product ships
(pack_jpeg_sparse_payload), every output reduced to one scalar so only
4 bytes cross the link per step. Answers "where do the extra ms of the
JPEG-ingest graph go" (VERDICT r2 item 2): payload unpack (bitcasts),
sparse coefficient scatter, dequant+IDCT, chroma upsample + color,
then the full serving graph for the end-to-end device cost.

Usage: python benchmarks/jpeg_stage_ablation.py [iters] [batch]
Prints one line per stage; best-of-window over `iters` steps.
"""

from __future__ import annotations

import sys
import time

import numpy as np

from synth import jpeg_bytes, photo


def _best_window(fn, dev_args, iters: int, w: int = 4) -> float:
    """ms/step over the best w-step contiguous window (relay-stall
    robust, same convention as bench.py / RESULTS.md)."""
    np.asarray(fn(*dev_args))  # warm / compile
    stamps = [time.perf_counter()]
    for _ in range(iters):
        np.asarray(fn(*dev_args))
        stamps.append(time.perf_counter())
    w = min(w, len(stamps) - 1)
    return min(
        (stamps[i + w] - stamps[i]) / w for i in range(len(stamps) - w)
    ) * 1e3


def main() -> None:
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    from image_to_pointcloud_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    import jax
    import jax.numpy as jnp

    from image_to_pointcloud_tpu.models import DepthAnything, preset
    from image_to_pointcloud_tpu.ops.jpeg import _idct_plane
    from image_to_pointcloud_tpu.ops.jpeg_sparse import scatter_from_blocks
    from image_to_pointcloud_tpu.pipeline.graph import (
        DepthPipeline,
        PipelineOptions,
        _unpack_jpeg_sparse_batch,
        _unpack_jpeg_sparse_fields,
        plan_jpeg_input,
        plan_sparse_batch,
    )

    on_tpu = jax.default_backend() not in ("cpu",)
    if not on_tpu:
        iters = min(iters, 3)

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
    jpegs = [plan_jpeg_input(jpeg_bytes(imgs[i])) for i in range(batch)]
    assert all(j is not None for j in jpegs)
    spec = jpegs[0].spec
    caps = plan_sparse_batch(jpegs)
    assert caps is not None
    payload = pipe.pack_jpeg_sparse_payload(
        jpegs, np.full((batch,), 10.0, np.float32), *caps
    )
    dev_payload = jax.device_put(payload)
    print(
        f"payload {payload.shape[1] / 1024:.0f} KB/img, spec {spec}, "
        f"caps {caps}, batch {batch}",
        flush=True,
    )

    # --- cumulative stage subgraphs (each jitted standalone) ---------
    cap, exc_cap = caps

    def split(payload_u8):
        """The raw slices+bitcasts of _unpack_jpeg_sparse_batch,
        without the scatter/decode (the product's shared reader)."""
        return _unpack_jpeg_sparse_fields(payload_u8, spec, cap, exc_cap)[:7]

    def s0_null(payload_u8):
        # Dispatch floor: one trivial reduction over the resident
        # payload — everything a stage pays that is NOT its own math
        # (relay RPC, scalar pull). Subtract this from every row.
        return jnp.sum(payload_u8[:, ::997].astype(jnp.int32))

    def s1_unpack(payload_u8):
        parts = split(payload_u8)
        return sum(jnp.sum(p, dtype=jnp.int32).astype(jnp.float32)
                   for p in parts)

    def s2_scatter(payload_u8):
        counts, dc, pos, val, ei, ev, qt = split(payload_u8)

        def one(c, d, p, v, i, e):
            grids = scatter_from_blocks(c, d, p, v, i, e, spec)
            return sum(jnp.sum(g, dtype=jnp.int32) for g in grids)

        return jnp.sum(jax.vmap(one)(counts, dc, pos, val, ei, ev)) + jnp.sum(
            qt
        )

    def s3_idct(payload_u8):
        counts, dc, pos, val, ei, ev, qt = split(payload_u8)

        def one(c, d, p, v, i, e, q):
            grids = scatter_from_blocks(c, d, p, v, i, e, spec)
            acc = jnp.float32(0)
            for comp in range(spec.ncomp):
                qk = q[comp].reshape(8, 8)[: spec.k, : spec.k]
                acc += jnp.sum(_idct_plane(grids[comp], qk, spec.k))
            return acc

        return jnp.sum(jax.vmap(one)(counts, dc, pos, val, ei, ev, qt))

    def s4_full_decode(payload_u8):
        img, scales = _unpack_jpeg_sparse_batch(
            payload_u8, spec, cap, exc_cap
        )
        return jnp.sum(img) + jnp.sum(scales)

    stages = [
        ("null (dispatch floor)", s0_null),
        ("payload unpack (slices+bitcasts)", s1_unpack),
        ("+ sparse coefficient scatter", s2_scatter),
        ("+ dequant + IDCT", s3_idct),
        ("+ chroma upsample + YCbCr->RGB", s4_full_decode),
    ]
    for name, fn in stages:
        ms = _best_window(jax.jit(fn), (dev_payload,), iters)
        print(f"{name:40s} {ms:8.1f} ms/batch-{batch}", flush=True)

    # Full serving graphs for context: JPEG-sparse vs pixel payload.
    fn_jpeg = pipe.compiled_graph_jpeg(batch, spec, opts, False,
                                       sparse_cap=caps)

    def g_jpeg(payload_u8):
        out, prev = fn_jpeg(pipe.params, payload_u8)
        return jnp.sum(out, dtype=jnp.int32) + jnp.sum(prev, dtype=jnp.int32)

    ms = _best_window(jax.jit(g_jpeg), (dev_payload,), iters)
    print(
        f"{'full JPEG serving graph':40s} {ms:8.1f} ms/batch-{batch} "
        f"({batch / ms * 1e3:.1f} img/s)",
        flush=True,
    )

    fn_px = pipe.compiled_graph(batch, (518, 518), opts, False)
    px_payload = jax.device_put(
        pipe.pack_payload(imgs, np.full((batch,), 10.0, np.float32))
    )

    def g_px(payload_u8):
        out, prev = fn_px(pipe.params, payload_u8)
        return jnp.sum(out, dtype=jnp.int32) + jnp.sum(prev, dtype=jnp.int32)

    ms = _best_window(jax.jit(g_px), (px_payload,), iters)
    print(
        f"{'full pixel serving graph':40s} {ms:8.1f} ms/batch-{batch} "
        f"({batch / ms * 1e3:.1f} img/s)",
        flush=True,
    )


if __name__ == "__main__":
    main()
