"""Model manager: lazy-load + memoize pipelines per model name.

Mirrors the reference's ``load_model``/``models_cache``
(backend/app.py:39, 65-97): ``depth-anything-v2`` is a real pipeline,
``triposr``/``instantmesh`` are capability stubs served by the dummy
paths. Weights come from a safetensors checkpoint directory when
configured (HF-layout ``model.safetensors``, converted on load by
models.convert); otherwise deterministic random initialization is used
(clearly marked in /health) — this box has no network egress to the hub.
"""

from __future__ import annotations

import logging
import os
import threading
from pathlib import Path
from typing import Any

import jax
import numpy as np

from image_to_pointcloud_tpu.models import (
    build_model,
    convert_checkpoint,
    load_safetensors,
    preset,
)
from image_to_pointcloud_tpu.pipeline.graph import DepthPipeline

__all__ = ["ModelManager", "DUMMY_MODELS"]

logger = logging.getLogger(__name__)

DUMMY_MODELS = {"triposr", "instantmesh"}
CHECKPOINT_ENV = "IPC_TPU_CHECKPOINT_DIR"


class ModelManager:
    def __init__(
        self,
        checkpoint_dir: str | None = None,
        *,
        use_bf16: bool = True,
        use_flash_attention: bool | None = None,
        mesh: Any = None,
        int8: bool | None = None,
        model_target: int | None = None,
    ):
        self._cache: dict[str, DepthPipeline] = {}
        # Per-NAME build locks: a warmup thread and the first HTTP
        # request racing the same cache miss must not both pay the
        # (remote, minutes-long) XLA compile — but model B's first
        # request must not wait behind model A's build either.
        self._locks: dict[str, threading.Lock] = {}
        self._locks_guard = threading.Lock()
        self.checkpoint_dir = checkpoint_dir or os.environ.get(CHECKPOINT_ENV)
        platform = jax.default_backend()
        on_tpu = platform not in ("cpu",)
        self.use_bf16 = use_bf16 and on_tpu
        self.use_flash = (
            use_flash_attention if use_flash_attention is not None else on_tpu
        )
        self.random_weights: dict[str, bool] = {}
        # Multi-chip serving mesh (DP over 'data', megatron TP over
        # 'model'); "auto" = DP over every visible device.
        if mesh == "auto":
            from image_to_pointcloud_tpu.parallel.sharding import make_mesh

            mesh = make_mesh() if len(jax.devices()) > 1 else None
        self.mesh = mesh
        # Int8 W8A8 encoder matmuls (models/quantize.py): ~2× MXU rate,
        # ~1% depth error. Opt-in via flag or IPC_TPU_INT8=1.
        if int8 is None:
            int8 = os.environ.get("IPC_TPU_INT8", "").lower() in (
                "1", "true", "yes",
            )
        self.int8 = int8
        # Model-native inference resolution override (None = the family's
        # native target: 518 for DA per backend/app.py:109 semantics,
        # (384,512) for ZoeDepth); smaller values trade quality for
        # latency and keep tiny-model tests fast.
        self.model_target = model_target

    def loaded(self) -> list[str]:
        return sorted(self._cache)

    def _load_params(self, name: str, cfg) -> Any:
        ckpt = None
        if self.checkpoint_dir:
            # Orbax checkpoint (fine-tuned with train/) takes priority.
            orbax_dir = Path(self.checkpoint_dir) / name / "orbax"
            if orbax_dir.exists():
                from image_to_pointcloud_tpu.train.checkpoint import (
                    restore_params,
                )

                logger.info("Loading %s weights from %s", name, orbax_dir)
                self.random_weights[name] = False
                return restore_params(str(orbax_dir))
            for cand in (
                Path(self.checkpoint_dir) / name / "model.safetensors",
                Path(self.checkpoint_dir) / f"{name}.safetensors",
            ):
                if cand.exists():
                    ckpt = cand
                    break
        if ckpt is not None:
            logger.info("Loading %s weights from %s", name, ckpt)
            sd = load_safetensors(str(ckpt))
            self.random_weights[name] = False
            return convert_checkpoint(cfg, sd)
        logger.warning(
            "No checkpoint for %s (set %s); using deterministic random init",
            name,
            CHECKPOINT_ENV,
        )
        self.random_weights[name] = True
        model = build_model(cfg)
        # Param shapes don't depend on the input size; init with the
        # smallest legal input (2×2 patches) so tracing is instant.
        ps = cfg.backbone.patch_size
        dummy = np.zeros((1, 2 * ps, 2 * ps, 3), np.float32)
        # Init on the host CPU backend, then one bulk device transfer:
        # eager Flax init on a relay-tunneled TPU dispatches thousands
        # of small ops at ~25 ms link latency each (measured 104 s for
        # DA-Small; CPU init + device_put is ~21 s) — pure warmup tax
        # on every server start.
        try:
            init_dev = (
                jax.local_devices(backend="cpu")[0]
                if jax.default_backend() not in ("cpu",)
                else None
            )
        except RuntimeError:
            init_dev = None
        if init_dev is None:
            return model.init(jax.random.PRNGKey(0), dummy)["params"]
        with jax.default_device(init_dev):
            params = model.init(jax.random.PRNGKey(0), dummy)["params"]
        return jax.device_put(params, jax.devices()[0])

    def get(self, name: str) -> DepthPipeline:
        """Load and cache a depth pipeline (raises ValueError on unknown)."""
        if name in self._cache:
            return self._cache[name]
        with self._locks_guard:
            lock = self._locks.setdefault(name, threading.Lock())
        with lock:
            return self._get_locked(name)

    def _get_locked(self, name: str) -> DepthPipeline:
        if name in self._cache:  # built while waiting on the lock
            return self._cache[name]
        if name in DUMMY_MODELS:
            raise ValueError(f"{name} is a dummy model with no pipeline")
        cfg = preset(name)  # raises ValueError for unsupported names
        if self.use_bf16:
            import jax.numpy as jnp

            cfg = cfg.with_dtype(jnp.bfloat16)
        if self.use_flash:
            cfg = cfg.with_flash_attention(True)
        params = self._load_params(name, cfg)
        if self.int8:
            from image_to_pointcloud_tpu.models.quantize import (
                quantize_encoder_params,
            )

            cfg = cfg.with_quantized(True)
            params = quantize_encoder_params(params, cfg.backbone.num_layers)
        pipe = DepthPipeline(
            cfg, params, mesh=self.mesh, model_target=self.model_target
        )
        self._cache[name] = pipe
        return pipe
