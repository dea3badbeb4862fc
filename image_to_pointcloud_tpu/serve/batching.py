"""Micro-batching queue: concurrent requests share TPU forward passes.

The reference runs one BackgroundTask per image, serially on the event
loop's thread pool (backend/app.py:662). Here concurrent jobs with the
same graph signature (image size × options) are coalesced into one
batched device dispatch — the DP axis of serving. A tiny window (a few
ms) bounds added latency. One worker task coalesces batches, then hands
each to a drain task; up to ``IPC_TPU_DRAIN_DEPTH`` (default 2) drains
run concurrently — their submit_batch/collect calls execute on
different executor threads, pipelining host collect of batch N against
device dispatch of batch N+1. Per-signature jit builds are serialized
by DepthPipeline's build lock.
"""

from __future__ import annotations

import asyncio
import dataclasses
import logging
import os
import time
from collections import defaultdict
from typing import Any

import numpy as np

from image_to_pointcloud_tpu.pipeline.graph import (
    DepthPipeline,
    PipelineOptions,
    PipelineResult,
)

logger = logging.getLogger(__name__)


def _env_flag(name: str) -> bool:
    return os.environ.get(name, "").lower() in ("1", "true", "yes", "on")


def _env_int(name: str, default: int, lo: int = 1) -> int:
    """Malformed values fall back to the default with a warning — a
    typo'd knob must not kill the drain worker (queued submitters would
    hang at progress 60 forever, not error)."""
    raw = os.environ.get(name)
    if raw is None or not raw.strip():
        return default
    try:
        return max(lo, int(raw))
    except ValueError:
        logger.warning("%s=%r is not an int; using %d", name, raw, default)
        return default


# IPC_TPU_BATCH_DEBUG=1: log per-drain submit/collect timings.
_DEBUG = _env_flag("IPC_TPU_BATCH_DEBUG")

__all__ = ["BatchingQueue", "bucket_sizes"]


def bucket_sizes(max_batch: int) -> list[int]:
    """The compiled batch-size buckets: powers of two plus 3·2^k mid
    steps (12, 24, …), capped at ``max_batch``. The mids exist because
    closed-loop cohorts (N lockstep clients) land *between* powers of
    two — round-5 drain logs showed every 12-client drain padding
    n=12 → bucket 16, +33% device work dropped on the floor. Each
    bucket is one XLA signature; the mids add ~log(max_batch)/2
    compiles, all covered by serving warmup."""
    sizes = {1, max_batch}
    b = 2
    while b <= max_batch:
        sizes.add(b)
        if 3 * b // 2 <= max_batch and b >= 8:
            sizes.add(3 * b // 2)
        b *= 2
    return sorted(sizes)


@dataclasses.dataclass
class _Item:
    # Decoded (H, W, 3) u8 pixels, or a pipeline.graph.JpegInput on the
    # hybrid device-decode ingest (entropy-decoded DCT coefficients).
    image: Any
    depth_scale: float
    options: PipelineOptions
    future: asyncio.Future
    want_packed: bool = True

    @property
    def signature(self) -> Any:
        """Graph-shape part of the grouping key: ndarray shape for pixel
        items, the frozen JpegSpec for hybrid items (same role: items
        with equal signatures share one compiled graph)."""
        if isinstance(self.image, np.ndarray):
            return self.image.shape
        return self.image.spec


class BatchingQueue:
    def __init__(
        self,
        pipeline: DepthPipeline,
        *,
        max_batch: int = 8,
        window_ms: float = 5.0,
    ):
        self.pipeline = pipeline
        self.max_batch = max_batch
        self.window_ms = window_ms
        self._queue: asyncio.Queue[_Item] = asyncio.Queue()
        self._worker: asyncio.Task | None = None

    def _ensure_worker(self) -> None:
        if self._worker is None or self._worker.done():
            self._worker = asyncio.get_running_loop().create_task(self._run())

    async def close(self) -> None:
        """Cancel the drain task (idempotent). Pending submits get
        CancelledError; call at service shutdown so no task outlives the
        event loop."""
        if self._worker is not None and not self._worker.done():
            self._worker.cancel()
            try:
                await self._worker
            except asyncio.CancelledError:
                pass
        self._worker = None
        while not self._queue.empty():
            item = self._queue.get_nowait()
            if not item.future.done():
                item.future.cancel()

    async def submit(
        self,
        image: np.ndarray,
        depth_scale: float,
        options: PipelineOptions,
        *,
        want_packed: bool = True,
    ) -> PipelineResult:
        self._ensure_worker()
        fut = asyncio.get_running_loop().create_future()
        await self._queue.put(
            _Item(image, depth_scale, options, fut, want_packed)
        )
        return await fut

    async def _run(self) -> None:
        loop = asyncio.get_running_loop()
        batch: list[_Item] = []
        # Pipelined drains: one collecting results on the host (D2H +
        # unproject/compact) while the next dispatches on the device —
        # double-buffering host work against device compute
        # (submit_batch/collect split, pipeline/graph.py). Depth 2
        # suffices for a locally-attached chip; on relay-tunneled rigs
        # where the execute+fetch round trip dwarfs device time a
        # deeper queue can hide more latency (IPC_TPU_DRAIN_DEPTH).
        sem = asyncio.Semaphore(_env_int("IPC_TPU_DRAIN_DEPTH", 2))
        pending: set[asyncio.Task] = set()
        try:
            while True:
                batch = []
                first = await self._queue.get()
                batch = [first]
                # Coalesce until FULL or the window expires — checking
                # in small slices so a filling burst dispatches the
                # moment it reaches max_batch. A fixed pre-dispatch
                # sleep idled the TPU once per batch under load; the
                # earlier no-sleep-when-queue-nonempty variant split
                # each burst across two pipelined drains (e.g. 3+5
                # instead of one batch-8: per-image cost nearly doubles
                # when per-dispatch overhead dominates, as on
                # relay-tunneled rigs).
                deadline = (
                    asyncio.get_running_loop().time()
                    + self.window_ms / 1000.0
                )
                # Arrival-gap debounce: closed-loop clients arrive as a
                # burst (they were all released by the previous drain),
                # so "no new arrival for debounce_ms" means the cohort
                # is complete — dispatch NOW instead of sleeping out
                # the full window (round-5 serving logs: window 60 ms
                # split 12-client cohorts 5+7 across drains; window
                # 150 ms coalesced them but billed every job the wait).
                debounce = min(0.025, self.window_ms / 1000.0 / 3.0)
                last_growth = asyncio.get_running_loop().time()
                while True:
                    grew = False
                    while (
                        len(batch) < self.max_batch
                        and not self._queue.empty()
                    ):
                        batch.append(self._queue.get_nowait())
                        grew = True
                    now = asyncio.get_running_loop().time()
                    if grew:
                        last_growth = now
                    if len(batch) >= self.max_batch or self.window_ms <= 0:
                        break
                    if now - last_growth >= debounce and len(batch) > 1:
                        break
                    wait = deadline - now
                    if wait <= 0:
                        break
                    await asyncio.sleep(min(0.005, wait))
                await sem.acquire()
                # Top up after the (possibly long) wait for a drain
                # slot: requests that queued while both slots were busy
                # — e.g. a multi-second relay stall — belong in THIS
                # dispatch, not a stale sub-max bucket.
                while (
                    len(batch) < self.max_batch
                    and not self._queue.empty()
                ):
                    batch.append(self._queue.get_nowait())
                task = loop.create_task(self._drain(batch, loop, sem))
                pending.add(task)
                task.add_done_callback(pending.discard)
        except asyncio.CancelledError:
            # close(): items already dequeued into this batch would
            # otherwise never resolve and their submitters would hang.
            for item in batch:
                if not item.future.done():
                    item.future.cancel()
            for task in pending:
                task.cancel()
            raise

    async def _drain(
        self, batch: "list[_Item]", loop, sem: asyncio.Semaphore
    ) -> None:
        try:
            # Group by graph signature (shape-or-JpegSpec × options).
            groups: dict[Any, list[_Item]] = defaultdict(list)
            for item in batch:
                groups[(item.signature, item.options)].append(item)

            for (_, options), items in groups.items():
                from image_to_pointcloud_tpu.serve.metrics import BATCH_SIZE

                BATCH_SIZE.observe(len(items))
                # Pad to the next bucket (powers of two + 3·2^k mids;
                # see bucket_sizes): every distinct batch size is its
                # own XLA graph signature (minutes per compile on a
                # remote-relay TPU), and arrival timing would otherwise
                # produce an unbounded spread of sizes. Padded rows
                # repeat the last image and their results are dropped.
                n = len(items)
                bucket = next(
                    b for b in bucket_sizes(self.max_batch) if b >= n
                )
                images = [i.image for i in items]
                scales = [i.depth_scale for i in items]
                images += [images[-1]] * (bucket - n)
                scales += [scales[-1]] * (bucket - n)
                # Packed grids (7×N float32 per image) are only
                # assembled on host when someone in the group needs
                # them (mesh output).
                want_packed = any(i.want_packed for i in items)
                from image_to_pointcloud_tpu.serve.metrics import (
                    DRAIN_COLLECT,
                    DRAIN_SUBMIT,
                )

                hybrid = not isinstance(images[0], np.ndarray)
                try:
                    t0 = time.perf_counter()
                    if hybrid:
                        submit = lambda images=images, scales=scales, options=options: (  # noqa: E731
                            self.pipeline.submit_batch_jpeg(
                                images, depth_scales=scales, options=options
                            )
                        )
                    else:
                        submit = lambda images=images, scales=scales, options=options: (  # noqa: E731
                            self.pipeline.submit_batch(
                                images, depth_scales=scales, options=options
                            )
                        )
                    handle = await loop.run_in_executor(None, submit)
                    t1 = time.perf_counter()
                    results = await loop.run_in_executor(
                        None,
                        lambda handle=handle, want_packed=want_packed: (
                            self.pipeline.collect(
                                handle,
                                want_packed=want_packed,
                                # Serving renders paletted PNGs from the
                                # gray channel (app_v1); don't pay the
                                # host LUT for an unused RGB preview.
                                want_preview_rgb=False,
                            )
                        ),
                    )
                    t2 = time.perf_counter()
                    DRAIN_SUBMIT.observe(t1 - t0)
                    DRAIN_COLLECT.observe(t2 - t1)
                    if _DEBUG:
                        logger.info(
                            "drain n=%d bucket=%d packed=%s submit=%.0fms "
                            "collect=%.0fms",
                            n, bucket, want_packed,
                            (t1 - t0) * 1e3, (t2 - t1) * 1e3,
                        )
                    for item, res in zip(items, results):
                        if not item.future.done():
                            item.future.set_result(res)
                except Exception as e:  # noqa: BLE001
                    for item in items:
                        if not item.future.done():
                            item.future.set_exception(e)
        except asyncio.CancelledError:
            # close() cancelled this drain mid-flight; resolve its
            # submitters so they don't hang.
            for item in batch:
                if not item.future.done():
                    item.future.cancel()
            raise
        finally:
            sem.release()
