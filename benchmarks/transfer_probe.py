"""Probe the host<->device link: bandwidth + per-transfer latency.

Zero XLA compiles (device_put / np.asarray only), so this is safe to run
even when the remote compile helper is down. Prints a JSON dict with
H2D/D2H bandwidth (MB/s) and small-transfer round-trip latency (ms),
plus the implied per-batch transfer budget for the flagship bench config
(batch 16 x 518x518 u8 upload, depth16 bundle download).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/transfer_probe.py
"""

from __future__ import annotations

import json
import time

import jax
import numpy as np


def _median_time(fn, iters=5):
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main() -> None:
    dev = jax.devices()[0]
    rng = np.random.default_rng(0)

    # Warm the link.
    small = rng.integers(0, 255, (64,), np.uint8)
    np.asarray(jax.device_put(small, dev))

    # Small-transfer latency (round trip: put + pull 64 B).
    t_rt = _median_time(lambda: np.asarray(jax.device_put(small, dev)), 9)

    # H2D latency alone (put 64 B, block).
    t_h2d_small = _median_time(
        lambda: jax.device_put(small, dev).block_until_ready(), 9
    )

    # H2D bandwidth: the bench upload (16 x 518 x 518 x 3 u8 = 12.9 MB).
    big_up = rng.integers(0, 255, (16, 518, 518, 3), np.uint8)
    t_h2d = _median_time(
        lambda: jax.device_put(big_up, dev).block_until_ready(), 4
    )
    h2d_mb = big_up.nbytes / 1e6

    # D2H bandwidth: the depth16 bundle (16 x ~142.5 KB = 2.28 MB).
    n = 259 * 259
    bundle_cols = n * 2 + (-(-n // 8))
    big_down_dev = jax.device_put(
        rng.integers(0, 255, (16, bundle_cols), np.uint8), dev
    )
    big_down_dev.block_until_ready()
    t_d2h = _median_time(lambda: np.asarray(big_down_dev), 4)
    d2h_mb = bundle_cols * 16 / 1e6

    # Concurrency: do H2D and D2H overlap, or does the link serialize?
    def both():
        h = jax.device_put(big_up, dev)
        np.asarray(big_down_dev)
        h.block_until_ready()

    t_both = _median_time(both, 4)

    out = {
        "roundtrip_64B_ms": round(t_rt * 1e3, 2),
        "h2d_64B_ms": round(t_h2d_small * 1e3, 2),
        "h2d_12.9MB_ms": round(t_h2d * 1e3, 1),
        "h2d_MB_s": round(h2d_mb / t_h2d, 1),
        "d2h_2.28MB_ms": round(t_d2h * 1e3, 1),
        "d2h_MB_s": round(d2h_mb / t_d2h, 1),
        "h2d+d2h_overlapped_ms": round(t_both * 1e3, 1),
        "serialized_sum_ms": round((t_h2d + t_d2h) * 1e3, 1),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
