"""Checkpoint save/restore via Orbax (aux subsystem: checkpoint/resume).

The reference persists nothing (jobs and models live in process memory,
SURVEY.md §5). The framework checkpoints model params — and, for
fine-tuning, optimizer state — with Orbax. Restore lands on host memory;
pass ``mesh`` to :func:`restore_params` to place the tree straight onto
the trainer's TP/replicated shardings afterwards (host→shard device_put,
never staging the full tree on a single device).
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

__all__ = ["save_checkpoint", "restore_checkpoint", "restore_params"]


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_checkpoint(path: str, params: Any, opt_state: Any = None, step: int = 0):
    """Write {params, opt_state?, step} under ``path`` (atomic Orbax dir)."""
    ckpt = {"params": params, "step": step}
    if opt_state is not None:
        ckpt["opt_state"] = opt_state
    _checkpointer().save(str(Path(path).resolve()), ckpt, force=True)
    return path


def restore_checkpoint(path: str) -> dict:
    """Read a checkpoint dict as saved by :func:`save_checkpoint`."""
    return _checkpointer().restore(str(Path(path).resolve()))


def restore_params(path: str, mesh: Any = None) -> Any:
    """Params from a checkpoint; with ``mesh``, placed per the TP rules
    (parallel.sharding.shard_params) directly from host memory."""
    params = restore_checkpoint(path)["params"]
    if mesh is not None:
        from image_to_pointcloud_tpu.parallel.sharding import shard_params

        params = shard_params(params, mesh)
    return params
