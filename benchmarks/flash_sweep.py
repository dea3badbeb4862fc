"""Block-size sweep for the Pallas flash-attention kernel.

The flagship attention shape (DA-V2-Small 518²: B·H=96, N=1370 padded
to 1536, D=64) spends ~1.9 ms/layer in the kernel at the round-4
default blocks (256, 256) — ~15% MXU for d_head=64 dots. This sweeps
(block_q, block_k) on the BARE op (small graphs → fast remote
compiles) with the pipelined-peak method, plus the XLA fused path as
the reference arm, and prints one JSON line per arm.

Usage: PYTHONPATH=... python benchmarks/flash_sweep.py [batch] [heads]
"""

from __future__ import annotations

import json
import math
import sys
import time

import numpy as np


def measure(fn, q, k, v, reps=64, rounds=6):
    """ms per op via an in-graph scan repeat.

    A bare 1-layer attention is ~2 ms — invisible under this rig's
    ~25 ms serialized dispatch round trip (the first version of this
    sweep measured a flat 27 ms for every arm INCLUDING the XLA
    reference: pure relay latency). Chaining ``reps`` applications
    inside one jitted ``lax.scan`` (output feeds the next query, so
    nothing dead-code-eliminates) amortizes the round trip to
    latency/reps and times the kernel itself. Best-of-``rounds``
    single dispatches (CLAUDE.md: best-of within a window)."""
    import jax

    @jax.jit
    def go(q, k, v):
        def body(c, _):
            o = fn(c, k, v)
            return o.astype(c.dtype), ()

        out, _ = jax.lax.scan(body, q, None, length=reps)
        return out

    np.asarray(go(q, k, v)[0, 0, 0, :1])  # compile + settle
    best = None
    for _ in range(rounds):
        t0 = time.perf_counter()
        np.asarray(go(q, k, v)[0, 0, 0, :1])
        dt = (time.perf_counter() - t0) / reps
        best = dt if best is None else min(best, dt)
    return best


def main() -> None:
    import jax
    import jax.numpy as jnp

    from image_to_pointcloud_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    from image_to_pointcloud_tpu.models.attention import (
        _attention_xla,
        flash_attention,
    )

    on_tpu = jax.default_backend() not in ("cpu",)
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    h = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    n, d = 1370, 64
    dt = jnp.bfloat16 if on_tpu else jnp.float32
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, h, n, d)), dt)
    k = jnp.asarray(rng.standard_normal((b, h, n, d)), dt)
    v = jnp.asarray(rng.standard_normal((b, h, n, d)), dt)
    scale = 1.0 / math.sqrt(d)

    # Attention FLOPs (two dots over the true N, ignoring padding).
    flops = 2 * 2 * b * h * n * n * d

    import functools

    xla = jax.jit(functools.partial(_attention_xla, scale=scale))
    t = measure(xla, q, k, v)
    print(
        json.dumps(
            {
                "arm": "xla_fused",
                "ms": round(t * 1e3, 3),
                "tflops": round(flops / t / 1e12, 1),
            }
        ),
        flush=True,
    )

    for bq, bk, pack in [
        (256, 256, 1),
        (512, 512, 1),
        (512, 1536, 1),
        (256, 1536, 1),
        (1536, 512, 1),
        # Head packing (round-5): independent per-program head slices
        # for MXU/VPU overlap (models/attention._flash_kernel_packed).
        (256, 256, 2),
        (256, 256, 4),
        (512, 512, 2),
        (256, 1536, 2),
        (512, 1536, 2),
        (768, 1536, 1),
    ]:
        fn = jax.jit(
            functools.partial(
                flash_attention, block_q=bq, block_k=bk, head_pack=pack
            )
        )
        try:
            t = measure(fn, q, k, v)
        except Exception as e:  # noqa: BLE001
            print(
                json.dumps(
                    {"arm": f"flash_{bq}x{bk}_p{pack}", "error": repr(e)[:120]}
                ),
                flush=True,
            )
            continue
        print(
            json.dumps(
                {
                    "arm": f"flash_{bq}x{bk}_p{pack}",
                    "ms": round(t * 1e3, 3),
                    "tflops": round(flops / t / 1e12, 1),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
