"""Sharded fine-tuning: optax train state + a mesh-sharded train step.

One jitted train step over the (data, model, seq) mesh: batch sharded on
``data`` (DP), encoder params sharded per parallel.sharding's TP rules,
gradients reduced by XLA's inserted collectives. The reference has no
training at all — this is net-new framework surface.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh

from image_to_pointcloud_tpu.models.depth_anything import (
    DepthAnythingConfig,
)
from image_to_pointcloud_tpu.parallel.sharding import (
    batch_sharding,
    shard_params,
)
from image_to_pointcloud_tpu.train.losses import (
    affine_invariant_loss,
    gradient_matching_loss,
    silog_loss,
)

__all__ = ["TrainConfig", "Trainer"]


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    learning_rate: float = 5e-6
    weight_decay: float = 1e-2
    grad_clip: float = 1.0
    loss: str = "affine_invariant"  # or "silog"
    gradient_weight: float = 0.5
    remat: bool = True  # checkpoint encoder blocks to trade FLOPs for HBM


def _loss_fn_for(cfg: TrainConfig) -> Callable:
    base = {"affine_invariant": affine_invariant_loss, "silog": silog_loss}[cfg.loss]

    def loss(pred, target, mask):
        l = base(pred, target, mask)
        if cfg.gradient_weight:
            l = l + cfg.gradient_weight * gradient_matching_loss(pred, target, mask)
        return l

    return loss


class Trainer:
    """Owns optimizer state and the compiled sharded train step."""

    def __init__(
        self,
        model_cfg: DepthAnythingConfig,
        params: Any,
        mesh: Mesh,
        cfg: TrainConfig = TrainConfig(),
    ):
        self.mesh = mesh
        self.cfg = cfg
        if cfg.remat and hasattr(model_cfg.backbone, "remat_blocks"):
            # Per-block remat (nn.remat on each encoder block): live
            # activations bound to one block, and only that block is
            # recomputed — not a jax.checkpoint around the whole apply,
            # which would recompute the full encoder+neck as one segment
            # for the worst FLOPs/memory trade. Applies to every family
            # whose backbone config carries the knob (DINOv2 and plain
            # ViT; ZoeDepth's BEiT blocks train un-rematerialized for
            # now — fine at its 577-token sequences).
            model_cfg = dataclasses.replace(
                model_cfg,
                backbone=dataclasses.replace(
                    model_cfg.backbone, remat_blocks=True
                ),
            )
        from image_to_pointcloud_tpu.models import build_model

        self.model = build_model(model_cfg)
        self.tx = optax.chain(
            optax.clip_by_global_norm(cfg.grad_clip),
            optax.adamw(cfg.learning_rate, weight_decay=cfg.weight_decay),
        )
        self.params = shard_params(params, mesh)
        # optax builds moments with zeros_like(params) → they inherit the
        # param shardings; scalar counters replicate.
        self.opt_state = self.tx.init(self.params)
        self._step = self._build_step()

    def _build_step(self):
        loss_fn = _loss_fn_for(self.cfg)
        model = self.model  # remat, if on, lives inside the blocks
        tx = self.tx

        def forward(params, pixels):
            return model.apply({"params": params}, pixels)

        def step(params, opt_state, pixels, target, mask):
            def objective(p):
                pred = forward(p, pixels)
                return loss_fn(pred, target, mask)

            loss, grads = jax.value_and_grad(objective)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        in_batch = batch_sharding(self.mesh, 4)
        in_target = batch_sharding(self.mesh, 3)
        return jax.jit(
            step,
            in_shardings=(None, None, in_batch, in_target, in_target),
            donate_argnums=(0, 1),
        )

    def train_step(self, pixels, target, mask=None):
        """One sharded optimization step; returns the scalar loss."""
        if mask is None:
            mask = jnp.ones(target.shape, bool)
        self.params, self.opt_state, loss = self._step(
            self.params, self.opt_state, pixels, target, mask
        )
        return loss
