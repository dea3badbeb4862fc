"""Persistent XLA compilation cache.

TPU graph compiles in this environment run through a remote helper and
cost minutes; the persistent cache makes every signature a one-time
cost across processes (server restarts, bench runs, driver checks).
"""

from __future__ import annotations

import os
from pathlib import Path

__all__ = ["enable_persistent_cache"]

_DEFAULT = Path(__file__).resolve().parents[2] / ".jax_cache"


def enable_persistent_cache(path: str | os.PathLike | None = None) -> str:
    import jax

    cache_dir = str(path or os.environ.get("IPC_TPU_JAX_CACHE", _DEFAULT))
    Path(cache_dir).mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return cache_dir
