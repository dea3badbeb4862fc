"""Concurrent-client load benchmark for the v1 serving surface.

Measures the full product path (multipart upload → decode → batched
inference/unproject/outlier → export → inline preview) under N
concurrent clients — the configuration where the host core, not the
chip, has historically been the bound (benchmarks/RESULTS.md
"concurrent-8").

Launch the server first (TPU example):

    IPC_TPU_BATCH_WINDOW_MS=300 nohup python -m image_to_pointcloud_tpu.serve \
        --generation v1 --port 8000 --output-dir /tmp/bench_out &

then:

    python benchmarks/serving_bench.py --url http://127.0.0.1:8000 \
        --clients 8 --jobs 40

Prints one JSON line: aggregate img/s, job-latency percentiles, and the
mean per-stage timings from /timings (so host vs chip time is visible).
"""

from __future__ import annotations

import argparse
import io
import json
import threading
import time
from collections import defaultdict

import numpy as np


def _test_image(seed: int, fmt: str) -> tuple[str, bytes, str]:
    """(filename, bytes, media type) for one synthetic upload."""
    from PIL import Image

    rng = np.random.default_rng(seed)
    # Smooth-ish content: realistic compressed size and depth structure.
    x = np.linspace(0, 4, 518)
    base = (np.sin(x)[None, :] + np.cos(x * 1.3)[:, None] + 2) / 4
    img = np.stack(
        [base * 255, base * 200, 255 - base * 255], axis=-1
    ).astype(np.uint8)
    noise = rng.integers(0, 24, img.shape, dtype=np.int16)
    # Saturate — u8 wraparound would speckle the bright bands and
    # inflate the compressed size beyond the intended content.
    img = np.clip(img.astype(np.int16) + noise, 0, 255).astype(np.uint8)
    buf = io.BytesIO()
    if fmt == "jpeg":
        # Quality 88 4:2:0 — the hybrid-ingest product path (launch the
        # server with --jpeg-device-decode to skip the host pixel
        # decode and ship DCT coefficients to the chip instead).
        Image.fromarray(img).save(buf, format="JPEG", quality=88)
        return "bench.jpg", buf.getvalue(), "image/jpeg"
    Image.fromarray(img).save(buf, format="PNG")
    return "bench.png", buf.getvalue(), "image/png"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--url", default="http://127.0.0.1:8000")
    ap.add_argument("--clients", type=int, default=8)
    ap.add_argument("--jobs", type=int, default=40, help="total jobs")
    ap.add_argument("--density", default="medium")
    ap.add_argument("--format", default="ply")
    # The reference frontend polls at 1.5 s (App.jsx:1012); 0.25 s is
    # still 6x that. 0.05 s made the co-located load generator itself a
    # measurable server cost (240 req/s of polling on the shared core).
    ap.add_argument("--input", choices=["png", "jpeg"], default="png",
                    help="upload format; jpeg exercises the hybrid "
                         "DCT ingest when the server enables it")
    ap.add_argument("--poll-s", type=float, default=0.25)
    ap.add_argument("--wait-ms", type=float, default=0.0,
                    help="long-poll /status?wait_ms= instead of sleeping "
                         "poll-s between snapshots (0 = classic polling)")
    ap.add_argument("--warmup", type=int, default=2,
                    help="untimed jobs first (compile + cache warm)")
    args = ap.parse_args()

    import httpx

    uploads = [_test_image(i, args.input) for i in range(args.clients)]
    lock = threading.Lock()
    remaining = [args.jobs]
    latencies: list[float] = []
    stage_sums: dict[str, list[float]] = defaultdict(list)
    errors: list[str] = []

    def one_job(client: httpx.Client, upload, timed: bool) -> None:
        name, data, media = upload
        t0 = time.perf_counter()
        r = client.post(
            f"{args.url}/process",
            params={
                "output_format": args.format,
                "point_density": args.density,
            },
            files={"file": (name, data, media)},
            timeout=120,
        )
        r.raise_for_status()
        job_id = r.json()["job_id"]
        status_url = f"{args.url}/status/{job_id}"
        if args.wait_ms > 0:
            # Long-poll (serve/jobs.py status_for): the server holds the
            # request until the next state change, so job completion is
            # detected with ~0 poll-granularity latency.
            status_url += f"?wait_ms={args.wait_ms:g}"
        while True:
            s = client.get(status_url, timeout=120)
            # The status field sits in the first ~80 bytes; don't
            # json-parse the multi-MB completed body (the full bytes
            # still traverse the socket — only client-side parse cost
            # is skipped, and it would otherwise be charged to the
            # shared core the server runs on).
            head = s.content[:96]
            if b'"status": "completed"' in head:
                break
            if b'"status": "error"' in head:
                raise RuntimeError(s.json()["message"])
            if args.wait_ms <= 0:
                time.sleep(args.poll_s)
        dt = time.perf_counter() - t0
        t = client.get(f"{args.url}/timings/{job_id}", timeout=30)
        if timed:
            with lock:
                latencies.append(dt)
                if t.status_code == 200:
                    for k, v in t.json().get("timings", {}).items():
                        stage_sums[k].append(v)

    def worker(idx: int) -> None:
        with httpx.Client() as client:
            while True:
                with lock:
                    if remaining[0] <= 0:
                        return
                    remaining[0] -= 1
                try:
                    one_job(client, uploads[idx % len(uploads)], timed=True)
                except Exception as e:  # noqa: BLE001
                    with lock:
                        errors.append(str(e))

    # Warmup (serial, untimed): first request compiles the XLA graph.
    with httpx.Client() as client:
        for _ in range(args.warmup):
            one_job(client, uploads[0], timed=False)

    threads = [
        threading.Thread(target=worker, args=(i,)) for i in range(args.clients)
    ]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0

    lat = np.asarray(latencies)
    out = {
        "metric": "serving_concurrent_img_per_sec",
        "value": round(len(lat) / wall, 2) if wall > 0 else 0.0,
        "clients": args.clients,
        "wait_ms": args.wait_ms,
        "input": args.input,
        "jobs_completed": len(lat),
        "errors": len(errors),
        "job_p50_ms": round(float(np.percentile(lat, 50)) * 1000, 1) if len(lat) else None,
        "job_p95_ms": round(float(np.percentile(lat, 95)) * 1000, 1) if len(lat) else None,
        "stage_means_ms": {
            k: round(float(np.mean(v)) * 1000, 1)
            for k, v in sorted(stage_sums.items())
        },
    }
    if errors:
        out["first_error"] = errors[0][:200]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
