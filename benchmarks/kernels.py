"""Per-kernel microbenchmarks: the compute stages of the fused pipeline.

Usage:
    python benchmarks/kernels.py [--size 518] [--batch 8] [--iters 20]

Times each hot kernel in isolation (resize, normalize, depthnorm,
gaussian, unproject, outlier, colormap, model forward, full fused
graph) on whatever backend JAX selects, printing one JSON line per
kernel. Timing is wall-clock around ``np.asarray`` of the outputs —
on this rig's tunneled TPU, ``block_until_ready`` does not actually
block (see CLAUDE.md), so materialization is the only honest fence.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def _bench(name, fn, iters, *, sink=None):
    fn()  # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    if sink is not None:
        sink(out)
    dt = (time.perf_counter() - t0) / iters
    print(json.dumps({"kernel": name, "ms": round(dt * 1000, 3)}))
    return dt


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=518)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import os

    import jax

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        # The env var alone does not override this rig's preset axon
        # platform; honor it explicitly so the published CPU regression
        # table is reproducible.
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from image_to_pointcloud_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    from image_to_pointcloud_tpu.models import (
        DepthAnything,
        normalize_pixels,
        preset,
    )
    from image_to_pointcloud_tpu.ops import (
        apply_colormap,
        gaussian_blur,
        normalize_depth,
        statistical_outlier_mask,
        unproject,
    )
    from image_to_pointcloud_tpu.ops.outlier import grid_knn_mean_distances
    from image_to_pointcloud_tpu.ops.resize import resize_batched
    from image_to_pointcloud_tpu.pipeline.graph import DepthPipeline, PipelineOptions

    on_tpu = jax.default_backend() not in ("cpu",)
    s, b, iters = args.size, args.batch, args.iters
    print(json.dumps({
        "backend": jax.default_backend(), "size": s, "batch": b,
    }))

    rng = np.random.default_rng(0)
    img_u8 = jnp.asarray(rng.integers(0, 255, (b, s, s, 3)), jnp.uint8)
    img_f = img_u8.astype(jnp.float32)
    depth = jnp.asarray(rng.random((b, s, s)), jnp.float32)
    dn1 = jnp.asarray(rng.random((s, s)), jnp.float32)
    gray = jnp.asarray(rng.integers(0, 255, (b, s, s)), jnp.uint8)

    mat = lambda x: np.asarray(x)  # noqa: E731 — materialization fence

    resize_fn = jax.jit(lambda x: resize_batched(x, (s // 2, s // 2), "area"))
    _bench("resize_area_half", lambda: mat(resize_fn(img_f)), iters)

    norm_fn = jax.jit(lambda x: normalize_pixels(x))
    _bench("normalize_pixels", lambda: mat(norm_fn(img_f)), iters)

    dn_fn = jax.jit(jax.vmap(lambda d: normalize_depth(d, True)))
    _bench("depthnorm_robust", lambda: mat(dn_fn(depth)), iters)

    g_fn = jax.jit(jax.vmap(lambda d: gaussian_blur(d, 5)))
    _bench("gaussian_blur5", lambda: mat(g_fn(depth)), iters)

    un_fn = jax.jit(
        jax.vmap(
            lambda d, im: unproject(d, im, depth_scale=10.0, step=2, h=s, w=s)
        )
    )
    _bench("unproject_step2", lambda: mat(un_fn(depth, img_f)), iters)

    hh = -(-s // 2)
    grids = jnp.asarray(rng.random((b, hh, hh, 3)), jnp.float32)
    if on_tpu:
        from image_to_pointcloud_tpu.ops.outlier_pallas import (
            grid_knn_mean_distances_pallas,
        )

        knn_fn = jax.jit(grid_knn_mean_distances_pallas)
    else:
        knn_fn = jax.jit(jax.vmap(grid_knn_mean_distances))
    _bench("outlier_grid_knn", lambda: mat(knn_fn(grids)), iters)

    n_small = 4096
    cloud = jnp.asarray(rng.random((n_small, 3)), jnp.float32)
    exact_fn = jax.jit(statistical_outlier_mask)
    _bench(f"outlier_exact_{n_small}", lambda: mat(exact_fn(cloud)), max(3, iters // 4))

    cm_fn = jax.jit(jax.vmap(apply_colormap))
    _bench("plasma_colormap", lambda: mat(cm_fn(gray)), iters)

    cfg = preset("depth-anything-v2-small")
    if on_tpu:
        cfg = cfg.with_dtype(jnp.bfloat16).with_flash_attention(True)
    model = DepthAnything(cfg)
    params = model.init(
        jax.random.PRNGKey(0), np.zeros((1, 28, 28, 3), np.float32)
    )["params"]
    x518 = jnp.asarray(rng.normal(0, 1, (b, s, s, 3)), jnp.float32)
    fwd = jax.jit(lambda p, x: model.apply({"params": p}, x))
    _bench("model_forward", lambda: mat(fwd(params, x518)), max(3, iters // 4))

    pipe = DepthPipeline(cfg, params)
    opts = PipelineOptions(density="medium", refine=True)
    imgs_np = np.asarray(img_u8)

    def full():
        return pipe.run_batch(
            imgs_np, options=opts, want_preview=False, want_packed=False
        )

    _bench("full_pipeline_e2e", full, max(3, iters // 4))


if __name__ == "__main__":
    main()
