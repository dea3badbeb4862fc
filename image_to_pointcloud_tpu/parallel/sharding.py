"""Device mesh + sharding rules: the framework's parallelism backbone.

The reference is a single-process, single-device app (SURVEY.md §2.2 —
its only concurrency is FastAPI background tasks). The TPU rebuild makes
parallelism first-class:

* **DP** — batch axis sharded over the ``data`` mesh axis; concurrent HTTP
  requests are micro-batched onto chips (parallel/batching in serve/).
* **TP** — megatron-style head/column sharding of the ViT encoder over
  the ``model`` axis: q/k/v and MLP-in kernels column-sharded, attention
  proj and MLP-out row-sharded, everything else replicated. XLA inserts
  the all-reduces over ICI.
* **CP/SP** — sequence sharding for long patch sequences (high-res tiling,
  video): see parallel/context.py.

Collectives ride ICI within a slice; ``jax.distributed.initialize`` (see
``init_distributed``) extends the same mesh across hosts/slices over DCN.
"""

from __future__ import annotations

import re
from typing import Any, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "init_distributed",
    "param_sharding_rules",
    "shard_params",
    "replicated",
    "batch_sharding",
    "broadcast_json_from_host0",
]

DATA_AXIS = "data"
MODEL_AXIS = "model"
SEQ_AXIS = "seq"


def init_distributed(**kwargs) -> None:
    """Multi-host bring-up (DCN): thin wrapper over jax.distributed."""
    jax.distributed.initialize(**kwargs)


def make_mesh(
    data: int | None = None,
    model: int = 1,
    seq: int = 1,
    *,
    devices: Sequence[jax.Device] | None = None,
) -> Mesh:
    """Build a (data, model, seq) mesh; data fills the remaining devices."""
    devs = list(devices if devices is not None else jax.devices())
    n = len(devs)
    if data is None:
        assert n % (model * seq) == 0, (n, model, seq)
        data = n // (model * seq)
    used = data * model * seq
    if used != n:
        # Explicit axis sizes that underuse the rig are almost always a
        # misconfiguration (--mesh data=2 on an 8-chip host quietly
        # idles 6 chips and reads as "the TPU is slow").
        import logging

        logging.getLogger(__name__).warning(
            "mesh (data=%d, model=%d, seq=%d) uses %d of %d devices; "
            "%d idle", data, model, seq, used, n, n - used,
        )
    arr = np.array(devs[:used]).reshape(data, model, seq)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS, SEQ_AXIS))


# (regex over '/'-joined param path) -> PartitionSpec. First match wins.
# kernel_q / kernel_scale are the int8 layout (models/quantize.py) and
# shard exactly like their float counterparts.
_TP_RULES: list[tuple[str, P]] = [
    # Attention q/k/v: column-parallel (shard heads on the output dim).
    (r"block\d+/(q|k|v)/kernel(_q)?$", P(None, MODEL_AXIS)),
    (r"block\d+/(q|k|v)/(bias|kernel_scale)$", P(MODEL_AXIS)),
    # Attention output projection: row-parallel (shard the input dim).
    (r"block\d+/proj/kernel(_q)?$", P(MODEL_AXIS, None)),
    (r"block\d+/proj/(bias|kernel_scale)$", P(None)),
    # MLP: column then row parallel.
    (r"block\d+/mlp/fc1/kernel(_q)?$", P(None, MODEL_AXIS)),
    (r"block\d+/mlp/fc1/(bias|kernel_scale)$", P(MODEL_AXIS)),
    (r"block\d+/mlp/fc2/kernel(_q)?$", P(MODEL_AXIS, None)),
    (r"block\d+/mlp/fc2/(bias|kernel_scale)$", P(None)),
    # BEiT encoder (ZoeDepth backbone, models/beit.py): same megatron
    # split; paths nest attention under /attn/ and put fc1/fc2 at block
    # level. The relative-position bias table is (num_rel, heads) —
    # shard its head dim with the head-sharded q/k/v so the bias add
    # stays local to each model shard.
    (r"block\d+/attn/(q|k|v)/kernel(_q)?$", P(None, MODEL_AXIS)),
    (r"block\d+/attn/(q|k|v)/(bias|kernel_scale)$", P(MODEL_AXIS)),
    (r"block\d+/attn/proj/kernel(_q)?$", P(MODEL_AXIS, None)),
    (r"block\d+/attn/proj/(bias|kernel_scale)$", P(None)),
    (r"block\d+/attn/rel_pos_table$", P(None, MODEL_AXIS)),
    (r"block\d+/fc1/kernel(_q)?$", P(None, MODEL_AXIS)),
    (r"block\d+/fc1/(bias|kernel_scale)$", P(MODEL_AXIS)),
    (r"block\d+/fc2/kernel(_q)?$", P(MODEL_AXIS, None)),
    (r"block\d+/fc2/(bias|kernel_scale)$", P(None)),
]


def param_sharding_rules(path: str) -> P:
    """PartitionSpec for one parameter path ('backbone/block0/q/kernel')."""
    for pattern, spec in _TP_RULES:
        if re.search(pattern, path):
            return spec
    return P()  # replicated


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def shard_params(params: Any, mesh: Mesh) -> Any:
    """Place a param pytree on the mesh according to the TP rules."""

    def place(path, x):
        spec = param_sharding_rules(_path_str(path))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard the leading (batch) dim over 'data', replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def broadcast_json_from_host0(obj: Any = None, *, max_bytes: int = 65536) -> Any:
    """Replicate a JSON-serializable value from process 0 to every host.

    The multi-host serving design (SURVEY.md §5: the reference's
    in-memory job dict is single-process, backend/app.py:40) keeps the
    job registry authoritative on host 0 and broadcasts updates over DCN
    as fixed-size frames: 4-byte LE length header + UTF-8 JSON, padded
    to ``max_bytes`` so every process contributes an identically-shaped
    buffer to the collective. Non-zero processes pass ``obj=None``.

    Validated end-to-end by tests/test_multihost.py with two coordinated
    CPU processes (the standard JAX fake-multihost pattern).
    """
    import json as _json

    from jax.experimental import multihost_utils

    buf = np.zeros((max_bytes,), np.uint8)
    if jax.process_index() == 0:
        raw = _json.dumps(obj).encode()
        if len(raw) > max_bytes - 4:
            raise ValueError(f"payload {len(raw)}B exceeds frame {max_bytes}B")
        buf[:4] = np.frombuffer(
            len(raw).to_bytes(4, "little"), np.uint8
        )
        buf[4 : 4 + len(raw)] = np.frombuffer(raw, np.uint8)
    out = np.asarray(multihost_utils.broadcast_one_to_all(buf))
    n = int.from_bytes(out[:4].tobytes(), "little")
    return _json.loads(out[4 : 4 + n].tobytes().decode())
