"""Benchmark: 518x518 JPEG -> point-cloud conversions/sec on one chip.

The north-star metric (BASELINE.json "single JPEG -> PLY"): full
pipeline per image = JPEG entropy decode (host, native/) -> sparse DCT
coefficient upload -> device dequant+IDCT+color (ops/jpeg.py) ->
Depth-Anything-V2-Small forward (bf16, flash attention) -> depth
normalize -> pinhole unprojection -> outlier removal. The reference
claims 2-3 s per image on its stack (backend/app.py:713); vs_baseline
is the speedup over that claim's 0.4 img/s.

Input mode: quality-88 4:2:0 JPEGs through the sparse hybrid ingest
(the fastest and most product-faithful path; uploads ARE JPEGs).
``IPC_BENCH_INPUT=pixels`` reverts to raw RGB payload rows (the
pre-round-2 configuration; also the automatic fallback when the native
entropy decoder is unavailable or the planner declines the images).
JPEG re-planning (host Huffman decode + sparse pack) runs inside the
timed loop every iteration — the host work is charged, not amortized.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

import numpy as np


def main() -> None:
    # The remote TPU backend on this rig can hang outright — at backend
    # init, at the first compile, or mid-run when the relay flaps. Arm a
    # staged watchdog BEFORE touching jax so the round always records a
    # labeled number inside the driver's 590 s budget. Policy (round 4):
    # **retry TPU attempts for as long as the budget allows** — a relay
    # that flaps back up at ANY point in the window must still produce a
    # TPU number. Each attempt gets a bounded backend-init deadline; a
    # hung attempt re-execs a fresh one (execve replaces the whole
    # process, so hung runtime threads die with it). Only when the
    # remaining time can no longer fit attempt+CPU-fallback does the
    # chain commit to CPU — and the CPU artifact then carries the full
    # timed retry log plus the last recorded TPU measurement as parsed
    # JSON fields.
    warmed = threading.Event()
    backend_up = threading.Event()
    done = threading.Event()
    forced_cpu = os.environ.get("IPC_BENCH_FORCED_CPU") == "1"
    no_fallback = os.environ.get("IPC_BENCH_NO_FALLBACK") == "1"
    attempt = int(os.environ.get("IPC_BENCH_ATTEMPT", "1"))
    # Wall-clock start of the FIRST attempt, carried across re-execs so
    # every stage budgets against the driver's real remaining time.
    start_ts = float(os.environ.get("IPC_BENCH_START_TS", str(time.time())))
    budget = float(os.environ.get("IPC_BENCH_BUDGET_S", "560"))
    cpu_reserve = 170.0  # CPU fallback measures ~80 s; keep 2x margin
    # Timed event log carried across re-execs ("t+NNNs:event" entries):
    # a CPU fallback must be able to PROVE the window was covered by
    # real TPU retries, not just assert it.
    retry_log = [e for e in os.environ.get("IPC_BENCH_RETRY_LOG", "").split(
        ";") if e]

    def remaining() -> float:
        return budget - (time.time() - start_ts)

    def log_event(ev: str) -> None:
        retry_log.append(f"t+{time.time() - start_ts:.0f}s:{ev}")

    # Preflight — exclusive chip access as a MECHANISM (VERDICT r4 item
    # 1): the TPU on this rig is single-holder, and a resident serving
    # process (ours) starved the round-4 driver bench for 378 s on a
    # fully warm cache. Before touching jax, enumerate the framework's
    # own registered TPU holders (utils/chiplock.py pidfile registry —
    # exact pids, never patterns, never the relay) and evict them. The
    # eviction is logged into the retry log the artifact carries.
    if not forced_cpu:
        try:
            from image_to_pointcloud_tpu.utils.chiplock import (
                evict_tpu_holders,
                list_tpu_holders,
            )

            for h in evict_tpu_holders():
                log_event(f"evicted_{h.role}_pid{h.pid}")
        except Exception as e:  # noqa: BLE001 — advisory, never fatal
            sys.stderr.write(f"bench: holder preflight failed: {e!r}\n")

            def list_tpu_holders():  # type: ignore[no-redef]
                return []

            def evict_tpu_holders():  # type: ignore[no-redef]
                return []

    # A warm persistent cache means a healthy warmup takes seconds, so
    # a long warmup stall signals chip contention or a hung helper
    # connection — grounds for an early fresh attempt instead of riding
    # out the full phase-B budget (the round-4 failure mode).
    _cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
    try:
        cache_warm = len(os.listdir(_cache_dir)) >= 4
    except OSError:
        cache_warm = False

    def reexec(to_cpu: bool, why: str) -> None:
        log_event("cpu_fallback" if to_cpu else f"retry{attempt + 1}")
        sys.stderr.write(f"bench: {why}\n")
        sys.stderr.flush()
        env = dict(os.environ)
        env["IPC_BENCH_START_TS"] = str(start_ts)
        env["IPC_BENCH_RETRY_LOG"] = ";".join(retry_log)
        if to_cpu:
            env["JAX_PLATFORMS"] = "cpu"
            env["IPC_BENCH_FORCED_CPU"] = "1"
            # Preserve an explicit batch argument; default to 1 on CPU.
            argv = [sys.executable, __file__, *(sys.argv[1:] or ["1"])]
        else:
            env["IPC_BENCH_ATTEMPT"] = str(attempt + 1)
            argv = [sys.executable, __file__, *sys.argv[1:]]
        os.execve(sys.executable, argv, env)

    if not forced_cpu and not no_fallback:
        warm_deadline = float(
            os.environ.get("IPC_BENCH_COMPILE_DEADLINE_S", "0")
        )

        def watchdog():
            # Phase A — backend init. A dead relay hangs here and shows
            # up fast. Attempt 1 gets 100 s (a merely-degraded relay has
            # measured ~80 s inits on this rig); retries get 60 s each —
            # enough for a healthy init (~5-15 s), short enough that the
            # retry loop keeps polling the relay across the whole window
            # (~6-8 timed attempts when it is down all round).
            init_deadline = 100.0 if attempt == 1 else 60.0
            d1 = max(5.0, min(init_deadline, remaining() - cpu_reserve))
            if not backend_up.wait(d1):
                log_event(f"attempt{attempt}_init_hung_{d1:.0f}s")
                # Keep retrying TPU while a fresh attempt (init deadline
                # + ~15 s interpreter/jax startup) still fits above the
                # CPU reserve; only then commit to the fallback.
                if remaining() > cpu_reserve + 75:
                    reexec(
                        False,
                        f"TPU attempt {attempt}: backend init hung for "
                        f"{d1:.0f}s — re-exec TPU attempt {attempt + 1}",
                    )
                reexec(
                    True,
                    f"TPU attempt {attempt}: backend init hung for "
                    f"{d1:.0f}s and no budget for another attempt — "
                    "re-exec CPU fallback",
                )
            log_event(f"attempt{attempt}_backend_up")
            # Phase B — compile/warmup with a LIVE backend: never
            # restart (that would re-pay init); give it every second
            # above the CPU reserve, floor 60. An explicitly-set
            # IPC_BENCH_COMPILE_DEADLINE_S caps THIS phase (it is the
            # compile phase; the knob must bound compile hangs).
            pb = max(60.0, remaining() - cpu_reserve)
            if warm_deadline:
                pb = min(pb, warm_deadline)
            # Early checkpoint (VERDICT r4 item 1b): with a warm
            # persistent cache, warmup is seconds — a 150 s stall means
            # contention (a holder registered AFTER the preflight) or a
            # hung helper connection. Re-check the registry, evict, and
            # re-exec a fresh TPU attempt instead of burning the whole
            # phase-B budget the way BENCH_r04 did (378 s). Attempts ≥3
            # skip this (a genuinely degraded relay can legitimately
            # warm slowly; endless resets would never finish).
            early = min(pb, 150.0) if (cache_warm and attempt <= 2) else pb
            if early < pb and not warmed.wait(early):
                log_event(f"attempt{attempt}_warmup_slow_{early:.0f}s")
                evicted = []
                try:
                    evicted = evict_tpu_holders()
                    for h in evicted:
                        log_event(f"evicted_late_{h.role}_pid{h.pid}")
                except Exception:  # noqa: BLE001
                    pass
                # Re-exec ONLY when contention is confirmed (a holder
                # registered after the preflight was just evicted):
                # that warmup was starved and a fresh attempt now owns
                # the chip. Without an eviction the stall is relay
                # weather — a degraded window's warmup can legitimately
                # take minutes (2026-08-21 run: both attempts slow with
                # zero holders), and restarting would discard progress
                # and guarantee the CPU fallback.
                if evicted and remaining() > cpu_reserve + 75:
                    reexec(
                        False,
                        f"TPU attempt {attempt}: warmup starved by a "
                        "late-registered chip holder (now evicted) — "
                        "re-exec fresh TPU attempt",
                    )
                pb = max(60.0, remaining() - cpu_reserve)
            if not warmed.wait(pb):
                log_event(f"attempt{attempt}_warmup_stalled_{pb:.0f}s")
                _fallback_or_ride(
                    "TPU warmup stalled after backend init (compile "
                    "helper hung)",
                    warmed,
                )
            # Warmup succeeded on the TPU; if the relay dies mid-run,
            # still fall back while there is headroom to record a number.
            # Floor of 90 s: CLAUDE.md documents routine 2-9 s bursty
            # dispatch stalls — a late warmup must not strangle a
            # healthy run that is making progress between stalls.
            if not done.wait(max(90.0, remaining() - cpu_reserve)):
                log_event(f"attempt{attempt}_midrun_stall")
                _fallback_or_ride(
                    "TPU run stalled after warmup (relay flap mid-run)",
                    done,
                )

        def _fallback_or_ride(why: str, event) -> None:
            # A CPU fallback needs ~100 s (interpreter+jax startup,
            # compile, ~80 s measurement). With less than that left,
            # killing a possibly-progressing TPU run records NOTHING;
            # ride it out to the driver's hard timeout instead.
            if remaining() > 100.0:
                reexec(True, f"{why} — re-exec CPU fallback")
            sys.stderr.write(
                f"bench: {why}, but only {remaining():.0f}s remain "
                "(< CPU fallback cost) — riding out the TPU attempt\n"
            )
            sys.stderr.flush()
            event.wait()

        threading.Thread(target=watchdog, daemon=True).start()

    import jax
    import jax.numpy as jnp

    if forced_cpu:
        # Re-exec'd after a hung TPU attempt: the env var alone does not
        # override the preset axon platform on this rig.
        jax.config.update("jax_platforms", "cpu")

    from image_to_pointcloud_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    from image_to_pointcloud_tpu.models import DepthAnything, preset
    from image_to_pointcloud_tpu.pipeline.graph import DepthPipeline, PipelineOptions

    on_tpu = jax.default_backend() not in ("cpu",)
    backend_up.set()  # device enumeration succeeded — relay is alive
    # 24, not 16: with host planning pipelined, the larger batch both
    # splits the fixed per-batch relay costs (dispatch RPC + transfer
    # latency) over more images AND gives the planner thread a longer
    # link wait to hide under — measured +25% same-window
    # (benchmarks/RESULTS.md 2026-08-19: 89.3 vs 71.3 img/s; batch 32
    # measured no better than 24). Serving keeps its latency-bound
    # micro-batch cap of 16 (IPC_TPU_MAX_BATCH); this constant is the
    # offline-throughput configuration.
    default_tpu_batch = 24
    batch = (
        int(sys.argv[1])
        if len(sys.argv) > 1
        else (default_tpu_batch if on_tpu else 2)
    )

    # Default: the flagship config (DA-V2-Small, BASELINE config 1/2);
    # IPC_BENCH_MODEL=depth-anything-v2-base|large benches the bigger
    # family members (config 2).
    model_name = os.environ.get("IPC_BENCH_MODEL", "depth-anything-v2-small")
    cfg = preset(model_name)
    if on_tpu:
        cfg = cfg.with_dtype(jnp.bfloat16).with_flash_attention(True)
    model = DepthAnything(cfg)
    # Init on the host CPU backend, then ONE bulk transfer: eager Flax
    # init on the relay-tunneled TPU dispatches thousands of small ops
    # at ~25 ms each (measured 104 s; CPU init + device_put is ~21 s).
    init_dev = (
        jax.local_devices(backend="cpu")[0] if on_tpu else jax.devices()[0]
    )
    with jax.default_device(init_dev):
        params = model.init(
            jax.random.PRNGKey(0), np.zeros((1, 28, 28, 3), np.float32)
        )["params"]
    if on_tpu:
        params = jax.device_put(params, jax.devices()[0])
    if os.environ.get("IPC_BENCH_INT8") == "1":
        from image_to_pointcloud_tpu.models.quantize import (
            quantize_encoder_params,
        )

        cfg = cfg.with_quantized(True)  # DepthPipeline rebuilds from cfg
        params = quantize_encoder_params(params, cfg.backbone.num_layers)

    pipe = DepthPipeline(cfg, params)
    opts = PipelineOptions(density="medium", refine=True)

    # Photographic synthetic content (smooth fields + mild texture):
    # required for the JPEG mode to be representative (uniform noise
    # defeats DCT compression), harmless for the pixel mode (transfer
    # and compute cost are content-independent).
    def _photo(w, h, seed):
        g = np.random.default_rng(seed)
        x = np.linspace(0, 4 * np.pi, w)
        y = np.linspace(0, 3 * np.pi, h)
        base = np.stack(
            [
                127 + 110 * np.sin(x)[None, :] * np.cos(y)[:, None],
                127 + 90 * np.cos(2 * x)[None, :] + 0 * y[:, None],
                127 + 70 * np.sin(y)[:, None] + 0 * x[None, :],
            ],
            -1,
        )
        return (base + g.normal(0, 6.0, base.shape)).clip(0, 255).astype(
            np.uint8
        )

    imgs = np.stack([_photo(518, 518, s) for s in range(batch)])

    input_mode = os.environ.get("IPC_BENCH_INPUT", "jpeg")
    jpeg_datas = None
    if input_mode == "jpeg":
        try:
            import io

            from PIL import Image

            from image_to_pointcloud_tpu.pipeline.graph import plan_jpeg_input

            jpeg_datas = []
            for i in range(batch):
                buf = io.BytesIO()
                Image.fromarray(imgs[i]).save(buf, "JPEG", quality=88)
                jpeg_datas.append(buf.getvalue())
            if any(plan_jpeg_input(d) is None for d in jpeg_datas):
                raise RuntimeError("hybrid planner declined a bench JPEG")
        except Exception as e:  # noqa: BLE001
            sys.stderr.write(f"bench: jpeg ingest unavailable ({e!r}); "
                             "falling back to pixel payload\n")
            input_mode, jpeg_datas = "pixels", None

    # Host JPEG planning (Huffman decode + sparse pack, ~40-85 ms/batch)
    # re-runs per iteration inside the timed loop — but on ONE planner
    # thread, one batch ahead, so it overlaps the D2H link wait exactly
    # as the serving path overlaps it (app_v1 plans uploads on its
    # executor while drains are in flight). benchmarks/e2e_breakdown.py
    # showed the relay serializes every device-side phase; the host CPU
    # is idle during those waits, and leaving the planning serial would
    # bill that idle time to the pipeline.
    from concurrent.futures import ThreadPoolExecutor

    plan_pool = ThreadPoolExecutor(1)
    plan_box: list = []

    def _plan():
        from image_to_pointcloud_tpu.ops.unproject import DENSITY_STRIDES

        jps = [plan_jpeg_input(d) for d in jpeg_datas]
        for j in jps:
            # Pre-reconstruct grid colors on this planner thread (cached
            # in the JpegInput) so submit's host-colors bundle diet never
            # pays the ~2 ms/img on the serialized main-thread path.
            j.grid_colors(DENSITY_STRIDES[opts.density])
        return jps

    def _submit():
        if jpeg_datas is None:
            return pipe.submit_batch(imgs, options=opts, want_preview=False)
        jp = plan_box.pop().result() if plan_box else _plan()
        plan_box.append(plan_pool.submit(_plan))
        return pipe.submit_batch_jpeg(jp, options=opts, want_preview=False)

    def _run_once():
        pipe.collect(_submit(), want_preview=False, want_packed=False)

    # Warmup: compile + one steady-state run (disarms the watchdog).
    _run_once()
    warmed.set()
    _run_once()

    # Pipelined steady state: several batches in flight so upload, compute
    # and download overlap across the host link. On a degraded relay
    # that burned most of the budget warming up, shrink the loops — a
    # short TPU measurement beats a CPU fallback.
    depth_q = 3 if on_tpu else 1
    iters = 12 if on_tpu else 3
    short_on_time = on_tpu and not no_fallback and remaining() < 150
    if short_on_time:
        iters = 6
    lat: list[float] = []
    from collections import deque

    pending = deque()
    t0 = time.perf_counter()
    for _ in range(depth_q):
        pending.append(_submit())
    ts = [time.perf_counter()]  # steady state starts: queue is primed
    for _ in range(iters - depth_q):
        s = time.perf_counter()
        pending.append(_submit())
        pipe.collect(pending.popleft(), want_preview=False, want_packed=False)
        lat.append(time.perf_counter() - s)
        ts.append(time.perf_counter())
    while pending:
        # Drain-only collects (no overlapped submit/upload) are a
        # different latency population; they count toward throughput
        # (elapsed) but neither the per-image p50 nor the window search
        # (a window without upload cost would overstate the sustainable
        # rate).
        pipe.collect(pending.popleft(), want_preview=False, want_packed=False)
    elapsed = time.perf_counter() - t0

    mean_throughput = batch * iters / elapsed
    # Headline = best 4-batch contiguous window (same method and
    # rationale as the device probe below, and the RESULTS.md
    # measurement convention for this rig): the relay randomly stalls
    # dispatches 2-9 s — billing an external link outage to the
    # pipeline makes runs incomparable across windows. The full-run
    # mean (stalls included) stays in the unit string.
    # Named e2e_w (not w): emit() closes over this for the unit label,
    # and the device probe below rebinds a local `w` in this same scope
    # before emit() runs.
    e2e_w = min(4, len(ts) - 1)
    throughput = (
        max(
            batch * e2e_w / (ts[i + e2e_w] - ts[i])
            for i in range(len(ts) - e2e_w)
        )
        if e2e_w > 0
        else mean_throughput
    )
    p50_ms = float(np.percentile(lat, 50) * 1000 / batch)
    # The e2e measurement of record exists from this point: disarm the
    # CPU re-exec watchdog NOW. A relay flap during the optional
    # capability probe below must degrade to "no device_graph_peak in
    # the unit string", never discard a finished TPU measurement.
    done.set()

    baseline_img_s = 0.4  # reference's claimed 2-3 s/image
    # Best-of TPU record, two tiers (round-4 advisor): the machine-local
    # file is written by qualifying runs and gitignored (numbers are
    # only meaningful on the rig that measured them); the committed
    # benchmarks/tpu_record.json is updated MANUALLY per the RESULTS.md
    # conventions and is read-only here — bench.py never writes it.
    last_path = os.path.join(os.path.dirname(__file__), ".last_tpu_bench.json")
    committed_record_path = os.path.join(
        os.path.dirname(__file__), "benchmarks", "tpu_record.json"
    )

    def _read_best_record():
        best = None
        for p in (last_path, committed_record_path):
            try:
                with open(p) as f:
                    rec = json.load(f)
            except Exception:  # noqa: BLE001
                continue
            if best is None or float(rec.get("e2e", 0)) > float(
                best.get("e2e", 0)
            ):
                best = rec
        return best

    emitted = threading.Event()

    def emit(dev_tp, dev_tp_px=None) -> None:
        """Write the best-of TPU record and print the ONE JSON line.
        Callable from the main thread (normal path) or the probe-guard
        thread (probe hung on a relay flap); first caller wins."""
        if emitted.is_set():
            return
        emitted.set()
        dev_part = f", device_graph_peak={dev_tp:.1f} img/s" if dev_tp else ""
        if dev_tp_px:
            # The pixel-ingest graph's peak, probed alongside whenever
            # the default JPEG ingest is active: the two graphs share
            # everything after the decode head, so together they bound
            # the on-device JPEG-decode cost — and the artifact of
            # record always carries the number the ≥200 img/s north
            # star is judged against (VERDICT r2 item 1).
            dev_part += f", device_graph_peak_pixels={dev_tp_px:.1f} img/s"
        def _quote_last_good() -> None:
            # Surface the best recorded TPU measurement (clearly labeled
            # as historical) whenever this run can't beat it — a relay
            # flap or a degraded window must not erase the chip's record
            # from the artifact the driver captures (CLAUDE.md: TPU
            # numbers are only comparable within a relay window; the
            # record IS the best labeled window).
            nonlocal dev_part
            try:
                last = _read_best_record()
                if last is None or float(last.get("e2e", 0)) <= throughput:
                    return
                peak = last.get("device_peak")
                peak_part = f"/{peak} device-peak" if peak else ""
                px = last.get("device_peak_pixels")
                peak_part += f"/{px} device-peak-pixels" if px else ""
                dev_part += (
                    f", best_recorded_tpu={last['e2e']} img/s e2e"
                    f"{peak_part} @{last['date']}"
                    f" (batch={last.get('batch', '?')})"
                )
            except Exception:  # noqa: BLE001
                pass

        if forced_cpu:
            # The TPU relay was unreachable when this run started; this
            # is the CPU fallback, not the chip's number (see
            # benchmarks/RESULTS.md for TPU measurements).
            dev_part += ", tpu_relay_unreachable_at_run_time"
            _quote_last_good()
        elif (
            on_tpu
            and not short_on_time
            and batch == default_tpu_batch
            and model_name == "depth-anything-v2-small"
            and os.environ.get("IPC_BENCH_INT8") != "1"
        ):
            # Record only full-window flagship-config runs at the
            # default batch, and keep the BEST one (CLAUDE.md: take the
            # best of several runs) — a degraded window, a batch-1
            # probe, or a different model/quantization must not poison
            # the flagship record that CPU fallbacks later quote.
            try:
                import datetime

                best = None
                try:
                    with open(last_path) as f:
                        best = json.load(f)
                except Exception:  # noqa: BLE001
                    pass
                if best is None or throughput > float(best.get("e2e", 0)):
                    with open(last_path, "w") as f:
                        json.dump(
                            {
                                "e2e": round(throughput, 1),
                                "device_peak": (
                                    round(dev_tp, 1) if dev_tp else None
                                ),
                                "device_peak_pixels": (
                                    round(dev_tp_px, 1) if dev_tp_px else None
                                ),
                                "date": datetime.date.today().isoformat(),
                                "batch": batch,
                                "input": input_mode,
                            },
                            f,
                        )
            except OSError:
                pass
            # A degraded window (best-keeping left the record alone)
            # still quotes the record in the artifact the driver keeps.
            _quote_last_good()
        else:
            # Off-record configurations (short window, non-default
            # batch/model/int8) quote the flagship record too.
            _quote_last_good()
        record = {
            "metric": "img_to_pointcloud_conversions_per_sec_518",
            "value": round(throughput, 2),
            "unit": (
                # Label the window actually searched: short
                # CPU-fallback runs have fewer steady batches
                # than the 4 the TPU method uses, and claiming
                # best-4 for a best-2 peak would make records
                # incomparable.
                f"img/s/chip e2e "
                f"{f'best-{e2e_w}-batch-window' if e2e_w > 0 else 'mean'} "
                f"(batch={batch}, "
                f"full-run mean={mean_throughput:.1f} img/s"
                f"{' incl. relay stalls' if on_tpu else ''}, "
                f"p50={p50_ms:.1f}ms/img"
                f"{dev_part}, input="
                f"{'jpeg-q88-sparse' if jpeg_datas is not None else 'pixels'}"
                f", backend={jax.default_backend()})"
            ),
            "vs_baseline": round(throughput / baseline_img_s, 1),
        }
        # Parsed (machine-readable) companions to the unit-string prose:
        # the best recorded TPU measurement, and — on a fallback — the
        # timed TPU retry log proving the 590 s window was covered.
        try:
            best = _read_best_record()
            if best is not None:
                record["last_tpu"] = best
        except Exception:  # noqa: BLE001
            pass
        if retry_log:
            record["tpu_retry_log"] = ";".join(retry_log)
        print(json.dumps(record), flush=True)

    probe_done = threading.Event()
    if on_tpu and not no_fallback:

        def probe_guard():
            # The capability probe is optional garnish; if the relay
            # flaps under it, emit the finished e2e number without it
            # rather than riding to the driver's hard timeout.
            if not probe_done.wait(max(30.0, min(120.0, remaining() - 20.0))):
                sys.stderr.write(
                    "bench: device_graph probe stalled — emitting the "
                    "e2e measurement without it\n"
                )
                sys.stderr.flush()
                emit(None)
                os._exit(0)

        threading.Thread(target=probe_guard, daemon=True).start()

    # Device-side throughput: the same compiled graph with device-resident
    # inputs and a 1-byte output probe per step (the preview placeholder
    # buffer), 2 batches in flight. This is chip capability — on this rig
    # the e2e number above is bound by the tunneled host link (~42 MB/s
    # H2D, benchmarks/transfer_probe.py), which a directly-attached TPU
    # host does not have. Zero extra compiles: reuses the e2e graph.
    dev_tp = None
    dev_tp_px = None

    def _probe_graph(fn, dev_payload) -> float:
        _, p = fn(pipe.params, dev_payload)
        np.asarray(p)  # warm
        probes: deque = deque()
        dev_iters = 16 if on_tpu else 2
        if short_on_time:
            dev_iters = 8
        stamps = [time.perf_counter()]
        for _ in range(dev_iters):
            _, p = fn(pipe.params, dev_payload)
            probes.append(p)
            if len(probes) > 2:
                np.asarray(probes.popleft())
                stamps.append(time.perf_counter())
        while probes:
            np.asarray(probes.popleft())
            stamps.append(time.perf_counter())
        # Peak sustained rate over a 4-batch window: the probe's 1-byte
        # pulls ride the same tunneled relay as everything else, and a
        # degraded relay's dispatch stalls would otherwise be billed to
        # the chip. The window maxes over stalls while still requiring
        # 4 consecutive real executions.
        w = min(4, len(stamps) - 1)
        return max(
            batch * w / (stamps[i + w] - stamps[i])
            for i in range(len(stamps) - w)
        )

    try:
        scales = np.full((batch,), 10.0, np.float32)
        if jpeg_datas is not None:
            jpegs = [plan_jpeg_input(d) for d in jpeg_datas]
            spec = jpegs[0].spec
            # Match the e2e loop's graph EXACTLY: the ratcheted capacity
            # buckets (select_sparse_caps is the one shared chooser) and
            # the same host-colors bundle layout submit_batch_jpeg
            # selected — so the probe reuses the already-compiled graph
            # (zero extra remote compiles inside the driver's window)
            # and its peak measures the layout the e2e number used.
            caps = pipe.select_sparse_caps(jpegs)
            from image_to_pointcloud_tpu.ops.unproject import (
                DENSITY_STRIDES,
            )

            step = DENSITY_STRIDES[opts.density]
            hc = (
                pipe.quantized_transfer
                and pipe.host_colors_enabled
                and all(j.grid_colors(step) is not None for j in jpegs)
            )
            fn = pipe.compiled_graph_jpeg(
                batch, spec, opts, False, sparse_cap=caps, host_colors=hc
            )
            if caps is not None:
                payload = pipe.pack_jpeg_sparse_payload(jpegs, scales, *caps)
            else:
                payload = pipe.pack_jpeg_payload(jpegs, scales)
        else:
            fn = pipe.compiled_graph(batch, (518, 518), opts, False)
            payload = pipe.pack_payload(imgs, scales)
        dev_tp = _probe_graph(fn, jax.device_put(payload))
        if jpeg_datas is not None and not short_on_time:
            # Second probe: the pixel-ingest graph over the same images
            # (identical post-decode stages) — the dual-reported peak of
            # record (see emit). Persistent-cache-warm from prior rounds;
            # skipped when the window already ran short.
            fn_px = pipe.compiled_graph(batch, (518, 518), opts, False)
            dev_tp_px = _probe_graph(
                fn_px, jax.device_put(pipe.pack_payload(imgs, scales))
            )
    except Exception as e:  # noqa: BLE001
        # Never let the capability probe break the recorded metric — but
        # say why it vanished (the unit string simply omits device_graph).
        sys.stderr.write(f"bench: device_graph probe failed: {e!r}\n")

    probe_done.set()
    emit(dev_tp, dev_tp_px)


if __name__ == "__main__":
    main()
