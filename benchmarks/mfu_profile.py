"""Per-op device-time breakdown of a model forward via jax.profiler.

VERDICT r3 item 3 asks where the non-matmul time goes in the flagship
DA-V2-Small 518² graph (MFU 21.6% at the recorded 331.6 img/s peak).
The axon relay's profiler plugin emits real per-op device events
(hlo_category + bytes_accessed + long_name with shapes) into the
standard trace.json.gz, so this harness:

  1. builds the bf16 model forward exactly as serving configures it
     (models/__init__.py build_model + with_dtype(bf16) — the model the
     reference runs at backend/app.py:111-113),
  2. profiles N executions with jax.profiler.trace,
  3. aggregates device-op durations by HLO category and prints the top
     individual ops with shapes, bytes and achieved FLOP/s.

Usage: python benchmarks/mfu_profile.py [--model NAME] [--size 518]
           [--batch 16] [--steps 5] [--full-graph] [--json]
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import re
import tempfile
import time


def _classify(category: str, name: str, long_name: str) -> str:
    """Bucket an HLO category into a coarse op class."""
    c = category.lower()
    if "convolution" in c or c == "dot" or "dot fusion" in c:
        return "matmul/conv"
    if "copy" in c or "transpose" in c or "bitcast" in c or "reshape" in c:
        return "relayout/copy"
    if "all-reduce" in c or "collective" in c or "all-gather" in c:
        return "collective"
    if "reduce" in c or "sort" in c or "scan" in c:
        return "reduce/sort"
    if "scatter" in c or "gather" in c or "dynamic" in c:
        return "gather/scatter"
    if "fusion" in c or "loop" in c or "elementwise" in c or "input" in c:
        return "elementwise-fusion"
    return c or "other"


def _parse_trace(trace_dir: str) -> list[dict]:
    paths = glob.glob(
        os.path.join(trace_dir, "plugins", "profile", "*", "*.trace.json.gz")
    )
    if not paths:
        raise RuntimeError(f"no trace.json.gz under {trace_dir}")
    data = json.loads(gzip.open(sorted(paths)[-1]).read())
    evs = data.get("traceEvents", [])
    device_pids = {
        e["pid"]
        for e in evs
        if e.get("ph") == "M"
        and e.get("name") == "process_name"
        and "TPU" in e.get("args", {}).get("name", "")
    }
    out = []
    for e in evs:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        args = e.get("args", {})
        # Per-op events carry hlo_category; the whole-program envelope
        # (jit_<name> on its own tid) does not — keep both, tagged.
        out.append(
            {
                "name": e.get("name", ""),
                "dur_us": float(e.get("dur", 0.0)),
                "category": args.get("hlo_category", ""),
                "bytes": int(args.get("bytes_accessed", 0) or 0),
                "long_name": args.get("long_name", ""),
            }
        )
    return out


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from image_to_pointcloud_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    from image_to_pointcloud_tpu.models import build_model, preset

    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="depth-anything-v2-small")
    ap.add_argument("--size", type=int, default=518)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--full-graph", action="store_true",
                    help="profile the whole serving pipeline graph instead "
                    "of the bare model forward")
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()

    on_tpu = jax.default_backend() not in ("cpu",)
    cfg = preset(args.model)
    if on_tpu:
        cfg = cfg.with_dtype(jnp.bfloat16).with_flash_attention(True)
    model = build_model(cfg)
    ps = cfg.backbone.patch_size
    params = model.init(
        jax.random.PRNGKey(0), np.zeros((1, 2 * ps, 2 * ps, 3), np.float32)
    )["params"]

    rng = np.random.default_rng(0)
    if args.full_graph:
        from image_to_pointcloud_tpu.pipeline.graph import (
            DepthPipeline,
            PipelineOptions,
        )

        pipe = DepthPipeline(cfg, params)
        opts = PipelineOptions(density="medium", refine=True)
        base = pipe.compiled_graph(args.batch, (args.size, args.size), opts, False)

        def fwd(p, x):
            out, prev = base(p, x)
            return jnp.sum(out, dtype=jnp.int32) + jnp.sum(prev, dtype=jnp.int32)

        imgs = rng.integers(
            0, 255, (args.batch, args.size, args.size, 3)
        ).astype(np.uint8)
        payload = pipe.pack_payload(imgs, np.full((args.batch,), 10.0, np.float32))
        x = jax.device_put(payload)
        params = pipe.params
    else:

        def fwd(p, x):
            return jnp.sum(model.apply({"params": p}, x), dtype=jnp.float32)

        x = jax.device_put(
            rng.standard_normal(
                (args.batch, args.size, args.size, 3), dtype=np.float32
            )
        )

    fn = jax.jit(fwd)
    lowered = fn.lower(params, x)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    cost = cost[0] if isinstance(cost, (list, tuple)) else cost
    total_flops = float(cost.get("flops", 0.0))

    # Warmup.
    np.asarray(fn(params, x))
    t0 = time.perf_counter()
    np.asarray(fn(params, x))
    wall_once = time.perf_counter() - t0

    tdir = tempfile.mkdtemp(prefix="mfu_trace_")
    with jax.profiler.trace(tdir):
        for _ in range(args.steps):
            fn(params, x).block_until_ready()

    evs = _parse_trace(tdir)
    per_op = [e for e in evs if e["category"]]
    envelopes = [e for e in evs if not e["category"] and e["name"].startswith("jit")]

    by_class = collections.defaultdict(lambda: [0.0, 0])
    by_op = collections.defaultdict(lambda: [0.0, 0, "", 0])
    for e in per_op:
        cls = _classify(e["category"], e["name"], e["long_name"])
        by_class[cls][0] += e["dur_us"]
        by_class[cls][1] += 1
        # Key individual ops by their HLO result signature so repeated
        # executions of the same op aggregate.
        m = re.match(r"%?([\w.\-]+) = (\S+)", e["long_name"])
        key = (e["name"], m.group(2) if m else "")
        by_op[key][0] += e["dur_us"]
        by_op[key][1] += 1
        by_op[key][2] = e["category"]
        by_op[key][3] = e["bytes"]

    steps = max(args.steps, 1)
    total_op_us = sum(v[0] for v in by_class.values())
    env_us = sum(e["dur_us"] for e in envelopes)
    per_step_us = (env_us / len(envelopes)) if envelopes else total_op_us / steps

    peak_tflops = 197.0  # TPU v5e bf16
    step_s = per_step_us / 1e6
    mfu = (total_flops / step_s) / (peak_tflops * 1e12) if step_s else 0.0

    rows = sorted(by_class.items(), key=lambda kv: -kv[1][0])
    summary = {
        "metric": "mfu_profile",
        "model": args.model,
        "size": args.size,
        "batch": args.batch,
        "full_graph": bool(args.full_graph),
        "backend": jax.default_backend(),
        "device_us_per_step": round(per_step_us, 1),
        "img_per_s_device": round(args.batch / step_s, 1) if step_s else 0,
        "graph_gflops": round(total_flops / 1e9, 1),
        "mfu_pct": round(100 * mfu, 1),
        "wall_once_ms": round(wall_once * 1e3, 1),
        "classes": {
            k: {"us_per_step": round(v[0] / steps, 1),
                "pct": round(100 * v[0] / total_op_us, 1),
                "ops": v[1] // steps}
            for k, v in rows
        },
    }
    print(json.dumps(summary))
    if not args.json:
        print(f"\n== op classes (per step, device) ==")
        for k, (us, n) in rows:
            print(f"  {k:24s} {us/steps:10.1f} us  {100*us/total_op_us:5.1f}%  ({n//steps} ops)")
        print(f"\n== top 25 ops by device time ==")
        top = sorted(by_op.items(), key=lambda kv: -kv[1][0])[:25]
        for (name, sig), (us, n, cat, nbytes) in top:
            gbs = nbytes * (n / steps) / (us / steps * 1e-6) / 1e9 if us else 0.0
            print(
                f"  {us/steps:9.1f} us  {100*us/total_op_us:5.1f}%  [{cat:22s}] "
                f"{name[:28]:28s} {sig[:44]:44s} {gbs:7.1f} GB/s"
            )


if __name__ == "__main__":
    main()
