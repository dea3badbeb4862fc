"""Input pipeline: double-buffered host→HBM staging for training.

SURVEY.md §7 item 4 calls for "double-buffered host→HBM input pipeline"
(the serving layer's analog is DepthPipeline.submit/collect). Training
equivalent: a background thread stages the next batch onto the devices
(sharded over the mesh's data axis) while the current step runs, hiding
the host link behind compute. The reference has no input pipeline at
all — it trains nothing (SURVEY.md §4).
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Callable, Iterable, Iterator

import jax
import numpy as np

__all__ = ["prefetch_to_device", "synthetic_depth_batches"]


def prefetch_to_device(
    batches: Iterable[Any],
    *,
    size: int = 2,
    sharding: Any = None,
) -> Iterator[Any]:
    """Iterate ``batches`` with ``size`` batches staged on device ahead.

    Each batch (a pytree of numpy arrays) is ``jax.device_put`` onto
    ``sharding`` (a Sharding applied to every leaf, or a callable
    ``leaf -> Sharding`` for mixed-rank batches, e.g.
    ``lambda x: batch_sharding(mesh, x.ndim)``; default device) from a
    worker thread, so the H2D transfer of batch k+1 overlaps the compute
    of batch k — classic double buffering with ``size=2``.
    """
    q: queue.Queue = queue.Queue(maxsize=size)
    _END = object()
    err: list[BaseException] = []
    stop = threading.Event()

    def put(batch):
        if callable(sharding):
            return jax.tree_util.tree_map(
                lambda x: jax.device_put(x, sharding(x)), batch
            )
        if sharding is not None:
            return jax.tree_util.tree_map(
                lambda x: jax.device_put(x, sharding), batch
            )
        return jax.tree_util.tree_map(jax.device_put, batch)

    def enqueue(item) -> bool:
        # Bounded put with a stop check: if the consumer abandons the
        # iterator (early break / error), a plain q.put would block this
        # thread forever, pinning `size` device-staged batches for the
        # process lifetime.
        while not stop.is_set():
            try:
                q.put(item, timeout=0.2)
                return True
            except queue.Full:
                continue
        return False

    def worker():
        try:
            for b in batches:
                if not enqueue(put(b)):
                    return
                if stop.is_set():
                    return
        except BaseException as e:  # noqa: BLE001 — surfaced to consumer
            err.append(e)
        finally:
            enqueue(_END)

    threading.Thread(target=worker, daemon=True).start()
    try:
        while True:
            item = q.get()
            if item is _END:
                if err:
                    raise err[0]
                return
            yield item
    finally:
        # Generator close/GC (GeneratorExit lands here): release the
        # worker and drop any staged batches so their HBM frees.
        stop.set()
        while not q.empty():
            try:
                q.get_nowait()
            except queue.Empty:
                break


def synthetic_depth_batches(
    *,
    batch_size: int,
    image_hw: tuple[int, int],
    steps: int,
    seed: int = 0,
    depth_fn: Callable[[np.ndarray], np.ndarray] | None = None,
) -> Iterator[tuple[np.ndarray, np.ndarray]]:
    """(images f32 (B,H,W,3), depth targets f32 (B,H,W)) batches.

    Default targets: smooth radial depth fields — enough signal for the
    fine-tuning loop to descend in tests/smoke runs without real data.
    """
    h, w = image_hw
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    for _ in range(steps):
        imgs = rng.normal(0, 1, (batch_size, h, w, 3)).astype(np.float32)
        if depth_fn is not None:
            depth = depth_fn(imgs)
        else:
            cx = rng.uniform(0.2, 0.8, batch_size) * w
            cy = rng.uniform(0.2, 0.8, batch_size) * h
            r = np.sqrt(
                (xx[None] - cx[:, None, None]) ** 2
                + (yy[None] - cy[:, None, None]) ** 2
            )
            depth = (0.5 + r / r.max()).astype(np.float32)
        yield imgs, depth
