"""One typed configuration tree for the whole framework.

The reference scatters its configuration across hardcoded constants,
pydantic defaults, FastAPI parameter defaults, compose env vars, and
React state (SURVEY.md §5 "config/flag system") — with at least one
documented mismatch (frontend depthScale 15 vs backend 10.0,
frontend/src/App.jsx:24 vs backend/app.py:54). Here every knob lives in
one dataclass tree with the reference's defaults, loadable from JSON or
environment variables (``IPC_TPU_*``).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any

__all__ = ["ProcessingDefaults", "V2Defaults", "ServiceConfig", "load_config"]


@dataclasses.dataclass(frozen=True)
class ProcessingDefaults:
    """v1 request defaults (reference backend/app.py:47-56, 609-620)."""

    model: str = "depth-anything-v2"
    output_format: str = "las"
    point_density: str = "medium"
    coordinate_system: str = "WGS84"
    invert_depth: bool = True
    depth_scale: float = 10.0
    smooth_depth: bool = False
    smooth_ksize: int = 5
    fov: float = 60.0  # accepted-but-dropped by the reference (quirk 1)


@dataclasses.dataclass(frozen=True)
class V2Defaults:
    """v2 Form defaults + clamp ranges (reference backend/main.py:206-267)."""

    texture_resolution: int = 1024
    texture_resolution_range: tuple[int, int] = (512, 2048)
    guidance_scale: float = 3.0
    guidance_scale_range: tuple[float, float] = (1.0, 10.0)
    foreground_ratio: float = 1.3
    foreground_ratio_range: tuple[float, float] = (1.0, 2.0)
    target_count: int = 2000
    target_count_range: tuple[int, int] = (100, 20000)
    remove_background: bool = True
    remesh_option: str = "none"
    max_pixels: int = 4096 * 4096  # hard reject (backend/main.py:249)


@dataclasses.dataclass(frozen=True)
class ServiceConfig:
    host: str = "0.0.0.0"
    port: int = 8000
    output_dir: str = "outputs"
    checkpoint_dir: str | None = None
    max_image_dim: int = 3072  # backend/app.py:43
    depth_preview_max: int = 2048  # backend/app.py:44
    max_file_size: int = 50 * 1024 * 1024  # backend/app.py:45
    max_preview_points: int = 20000  # backend/app.py:496
    mesh_preview_tris: int = 20000  # backend/app.py:516
    honor_fov: bool = False  # bug-compatible default (SURVEY.md §8 quirk 1)
    # v1 mesh_ply reconstruction: "grid" = exact depth-grid triangulation
    # (default; PARITY.md deviation 2), "poisson" = the reference's
    # actual algorithm (Poisson depth=8 + bbox crop, backend/app.py:
    # 297-301), "bpa" = ball-pivoting (backend/app.py:285-294).
    mesh_method: str = "grid"
    batch_window_ms: float = 5.0
    # Micro-batch cap: batch-16 halves per-image device+transfer cost
    # vs batch-8 on the measured chip (bench.py batch sweep); buckets
    # warmed at startup are the powers of two up to this.
    max_batch: int = 16
    durable_jobs: bool = True  # JSONL job journal (beyond reference)
    max_jobs: int | None = None  # retention cap; None = reference parity
    # (keep every job forever, SURVEY.md §8 quirk 8)
    serve_ui: bool = False  # mount frontend/ at /ui
    mesh: str | None = None  # 'auto' or 'data=N,model=M[,seq=S]'
    warmup: str | None = None  # pre-compile sizes, e.g. '518x518'
    log_json: bool = False  # JSON-lines structured logging
    cors_origin_v1: str = "*"  # backend/app.py:32
    cors_origin_v2: str = "http://localhost:3000"  # backend/main.py:33
    polling_hint_s: float = 1.5  # frontend/src/App.jsx:1014
    defaults: ProcessingDefaults = ProcessingDefaults()
    v2: V2Defaults = V2Defaults()


def _coerce(value: str, target: Any) -> Any:
    t = type(target)
    if t is bool:
        return value.lower() in ("1", "true", "yes", "on")
    if t is int:
        return int(value)
    if t is float:
        return float(value)
    if target is None:
        # Optional fields (max_jobs, mesh, warmup, …): numbers become
        # numbers, everything else stays a string.
        try:
            return int(value)
        except ValueError:
            return value
    return value


def load_config(
    path: str | None = None, env: dict[str, str] | None = None
) -> ServiceConfig:
    """Build a ServiceConfig from defaults ← JSON file ← IPC_TPU_* env."""
    env = dict(os.environ if env is None else env)
    data: dict[str, Any] = {}
    if path and os.path.exists(path):
        data.update(json.loads(open(path).read()))

    cfg = ServiceConfig()
    top: dict[str, Any] = {}
    for f in dataclasses.fields(ServiceConfig):
        if f.name in ("defaults", "v2"):
            continue
        if f.name in data:
            v = data[f.name]
            # JSON values get the same coercion as env strings: a config
            # file {"port": "8000"} must not smuggle a str port that
            # crashes at socket bind instead of here.
            top[f.name] = (
                _coerce(v, getattr(cfg, f.name)) if isinstance(v, str) else v
            )
        env_key = "IPC_TPU_" + f.name.upper()
        if env_key in env:
            top[f.name] = _coerce(env[env_key], getattr(cfg, f.name))

    # Fail fast on misconfigured optional-int fields (a string max_jobs
    # would otherwise surface as a 500 deep inside job creation).
    if "max_jobs" in top and top["max_jobs"] is not None:
        if not isinstance(top["max_jobs"], int):
            raise ValueError(
                f"max_jobs must be an integer, got {top['max_jobs']!r} "
                "(check IPC_TPU_MAX_JOBS / the config file)"
            )

    defaults = ProcessingDefaults(**data.get("defaults", {}))
    v2 = V2Defaults(
        **{
            k: tuple(v) if isinstance(v, list) else v
            for k, v in data.get("v2", {}).items()
        }
    )
    return dataclasses.replace(cfg, defaults=defaults, v2=v2, **top)
