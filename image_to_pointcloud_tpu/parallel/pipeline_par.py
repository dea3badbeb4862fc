"""Pipeline parallelism (PP): GPipe-style microbatching over a mesh axis.

The reference has no model parallelism of any kind (SURVEY.md §2.2); its
closest analog to "pipelining" is running the whole pipeline as one
background task per image. Here PP is a first-class mesh axis: the ViT
encoder's blocks are split into S contiguous stages, one per device
along the ``pipe`` axis, and M microbatches stream through the classic
GPipe schedule — tick t has stage s working on microbatch t−s, with
activations handed to the next stage over ICI via ``lax.ppermute``.
Bubble fraction is (S−1)/(M+S−1); choose M ≥ 4·S for >80% utilization.

For Depth-Anything backbones the DPT neck's tap layers are the last
block of each quarter of the encoder (e.g. (2, 5, 8, 11) of 12 — see
models/dinov2.py out_layers), so with S=4 every tap is exactly a stage
boundary: each stage's output *is* one tap, gathered across the pipe
axis at the end at zero extra cost.

All collectives are expressed through shard_map so XLA schedules the
ppermute ring on ICI neighbors.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.lax import ppermute, psum
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax ≥0.8 moves shard_map out of experimental
    from jax import shard_map  # type: ignore[attr-defined]
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

__all__ = [
    "make_pipe_mesh",
    "stack_block_params",
    "make_stage_fn",
    "make_stage_fn_apply",
    "make_tapped_stage_fn",
    "gpipe_apply",
    "pipelined_depth_apply",
    "pipelined_dpt_classic_apply",
    "pipelined_zoedepth_apply",
    "build_beit_stage_params",
    "stage_tap_indices",
]

PIPE_AXIS = "pipe"


def make_pipe_mesh(
    pipe: int,
    data: int | None = None,
    *,
    devices: Sequence[jax.Device] | None = None,
) -> Mesh:
    """(data, pipe) mesh; data fills the remaining devices."""
    devs = list(devices if devices is not None else jax.devices())
    if data is None:
        assert len(devs) % pipe == 0, (len(devs), pipe)
        data = len(devs) // pipe
    arr = np.array(devs[: data * pipe]).reshape(data, pipe)
    return Mesh(arr, ("data", PIPE_AXIS))


def stack_block_params(
    params: Any, num_layers: int, num_stages: int, *, prefix: str = "block"
) -> Any:
    """Stack ``params[f'{prefix}{i}']`` into a (S, L/S, ...) pytree.

    Leading axis S is sharded over the pipe axis (each stage device holds
    only its own L/S blocks); the second axis is scanned inside the stage.
    """
    assert num_layers % num_stages == 0, (num_layers, num_stages)
    blocks = [params[f"{prefix}{i}"] for i in range(num_layers)]
    per = num_layers // num_stages

    def stack(*leaves):
        s = jnp.stack(leaves)
        return s.reshape(num_stages, per, *s.shape[1:])

    return jax.tree_util.tree_map(stack, *blocks)


def make_stage_fn_apply(apply_fn) -> Callable[[Any, jax.Array], tuple]:
    """Stage = scan of ``apply_fn(block_params, h) -> h`` over the
    stacked stage params; returns ``(y, y)`` — the boundary activation
    doubles as the tap (the case where every tap layer IS a stage
    boundary: DA-S/B, and BEiT whose apply closes over the patch grid)."""

    def stage_fn(stage_params, x):
        def body(h, p):
            return apply_fn(p, h), None

        y, _ = jax.lax.scan(body, x, stage_params)
        return y, y

    return stage_fn


def make_stage_fn(block_module) -> Callable[[Any, jax.Array], tuple]:
    """:func:`make_stage_fn_apply` over a plain Flax block module."""
    return make_stage_fn_apply(
        lambda p, h: block_module.apply({"params": p}, h)
    )


def stage_tap_indices(
    num_layers: int, num_stages: int, out_layers: Sequence[int]
) -> list[int]:
    """Block-local tap offset within each equal stage.

    DA-Large's tap layers (4, 11, 17, 23 of 24 — models/depth_anything.py
    PRESETS) are NOT all stage boundaries, so each stage extracts its tap
    mid-scan. Requires exactly one tap layer per stage.
    """
    per = num_layers // num_stages
    assert per * num_stages == num_layers, (num_layers, num_stages)
    assert len(out_layers) == num_stages, (out_layers, num_stages)
    # Stage s emits tap s, so out_layers must already be ascending —
    # sorting here would silently permute the DPT's shallow→deep feature
    # order relative to the sequential DinoV2Backbone.__call__.
    assert tuple(out_layers) == tuple(sorted(out_layers)), (
        f"pipelined taps require ascending out_layers, got {out_layers}"
    )
    locals_ = []
    for s, layer in enumerate(out_layers):
        assert s * per <= layer < (s + 1) * per, (
            f"tap layer {layer} outside stage {s} of {num_stages}"
        )
        locals_.append(layer - s * per)
    return locals_


def make_tapped_stage_fn(block_module) -> Callable[[Any, jax.Array], tuple]:
    """Stage over ``{"blocks": (L/S, ...), "tap": scalar}`` params: scans
    the blocks and captures the activation after block-local index
    ``tap`` as the stage's tap output."""

    def stage_fn(stage_params, x):
        tap_idx = stage_params["tap"]

        def body(carry, p):
            h, i, tap = carry
            h = block_module.apply({"params": p}, h)
            tap = jnp.where(i == tap_idx, h, tap)
            return (h, i + 1, tap), None

        (y, _, tap), _ = jax.lax.scan(
            body,
            (x, jnp.zeros((), jnp.int32), jnp.zeros_like(x)),
            stage_params["blocks"],
        )
        return y, tap

    return stage_fn


def gpipe_apply(
    mesh: Mesh,
    stage_fn: Callable[[Any, jax.Array], jax.Array],
    stacked_params: Any,
    x: jax.Array,
    *,
    num_microbatches: int,
    axis: str = PIPE_AXIS,
) -> tuple[jax.Array, jax.Array]:
    """Run ``x`` through S pipelined stages with M microbatches.

    Args:
      stage_fn: ``(stage_params, (mb, ...)) -> ((mb, ...), (mb, ...))`` —
        returns (boundary activation to hand to the next stage, tap
        activation to surface). ``make_stage_fn`` taps the boundary;
        ``make_tapped_stage_fn`` taps mid-stage (DA-Large).
      stacked_params: leading axis S (one slice per stage).
      x: (B, ...) with B divisible by num_microbatches.

    Returns:
      (y, taps): y is (B, ...) — the final stage's output, replicated;
      taps is (S, B, ...) — every stage's tap activation (the DPT
      feature-map inputs, shallow→deep).
    """
    m = num_microbatches
    b = x.shape[0]
    assert b % m == 0, (b, m)
    xs = x.reshape(m, b // m, *x.shape[1:])
    s_total = mesh.shape[axis]
    # Every stacked leaf must have exactly one slice per pipe device —
    # a mismatch would silently drop stages after the per-device p[0].
    for leaf in jax.tree_util.tree_leaves(stacked_params):
        assert leaf.shape[0] == s_total, (
            f"stage count {leaf.shape[0]} != mesh '{axis}' size {s_total}"
        )

    # Composes with DP: the microbatch rows are sharded over 'data' while
    # stages are sharded over 'pipe' — each data slice runs its own
    # pipeline on its share of every microbatch.
    dp = "data" if "data" in mesh.shape and mesh.shape["data"] > 1 else None

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis), P(None, dp)),
        out_specs=(P(None, dp), P(axis, None, dp)),
        check_vma=False,
    )
    def run(params_sharded, xs_rep):
        params = jax.tree_util.tree_map(lambda p: p[0], params_sharded)
        sid = jax.lax.axis_index(axis)
        mb_shape = xs_rep.shape[1:]
        state = jnp.zeros(mb_shape, xs_rep.dtype)
        taps = jnp.zeros((m,) + mb_shape, xs_rep.dtype)
        outs = jnp.zeros((m,) + mb_shape, xs_rep.dtype)

        def tick(carry, t):
            state, taps, outs = carry
            # Stage 0 ingests microbatch t; later stages consume what the
            # previous stage handed them last tick.
            feed = xs_rep[jnp.clip(t, 0, m - 1)]
            inp = jnp.where(sid == 0, feed, state)
            out, tap = stage_fn(params, inp)
            # Microbatch id at stage `sid` during tick t is t − sid.
            mid = t - sid
            valid = (mid >= 0) & (mid < m)
            mc = jnp.clip(mid, 0, m - 1)
            upd = jnp.where(valid, tap, taps[mc])
            taps = jax.lax.dynamic_update_index_in_dim(taps, upd, mc, 0)
            fin = jnp.where(valid & (sid == s_total - 1), out, outs[mc])
            outs = jax.lax.dynamic_update_index_in_dim(outs, fin, mc, 0)
            state_next = ppermute(
                out, axis, [(i, (i + 1) % s_total) for i in range(s_total)]
            )
            return (state_next, taps, outs), None

        (state, taps, outs), _ = jax.lax.scan(
            tick, (state, taps, outs), jnp.arange(m + s_total - 1)
        )
        # Only the last stage holds real outputs; a masked psum replicates
        # them to every pipe device (satisfying the P() out spec).
        outs = psum(
            jnp.where(sid == s_total - 1, outs, jnp.zeros_like(outs)), axis
        )
        return outs, taps[None]

    outs, taps = run(stacked_params, xs)
    y = outs.reshape(b, *x.shape[1:])
    taps = taps.reshape(taps.shape[0], b, *x.shape[1:])
    return y, taps


# ---------- full-model pipelined forward ----------


def build_stage_params(cfg, params, *, mesh: Mesh | None = None) -> Any:
    """Stack a DepthAnything param tree's encoder blocks into per-stage
    GPipe params ``{"blocks": (S, L/S, ...), "tap": (S,)}``. Do this ONCE
    at pipeline construction (outside jit): restacking per step would
    copy every encoder weight each forward.

    With ``mesh``, stacking happens on host and each leaf is placed
    directly with a P('pipe') sharding, so no chip ever holds more than
    its own stage's blocks (DA-Large's full encoder never materializes
    on one device). Without a mesh the stack stays a plain jnp pytree
    (for jit-closed tests and the dryrun)."""
    s = len(cfg.backbone.out_layers)
    taps = stage_tap_indices(
        cfg.backbone.num_layers, s, cfg.backbone.out_layers
    )
    stacked = _stack_blocks(
        params["backbone"], cfg.backbone.num_layers, s, mesh
    )
    if mesh is None:
        return {"blocks": stacked, "tap": jnp.asarray(taps, jnp.int32)}

    from jax.sharding import NamedSharding, PartitionSpec as P

    tap = jax.device_put(
        np.asarray(taps, np.int32), NamedSharding(mesh, P(PIPE_AXIS))
    )
    return {"blocks": stacked, "tap": tap}


def _stack_blocks(
    backbone_params: Any, num_layers: int, s: int, mesh: Mesh | None
) -> Any:
    """(S, L/S, ...) stacked block pytree. With ``mesh``, stacking
    happens on host and each leaf is placed with a P('pipe') sharding so
    no chip ever holds more than its own stage's blocks (the residency
    PP exists to provide); without one, a plain jnp stack (jit-closed
    tests and the dryrun). Shared by the DA and BEiT builders."""
    if mesh is None:
        return stack_block_params(backbone_params, num_layers, s)

    from jax.sharding import NamedSharding, PartitionSpec as P

    per = num_layers // s
    blocks_host = jax.device_get(
        [backbone_params[f"block{i}"] for i in range(num_layers)]
    )

    def stack(*leaves):
        a = np.stack(leaves)
        return a.reshape(s, per, *a.shape[1:])

    stacked = jax.tree_util.tree_map(stack, *blocks_host)
    sharding = NamedSharding(mesh, P(PIPE_AXIS))
    return jax.tree_util.tree_map(
        lambda a: jax.device_put(a, sharding), stacked
    )


def pipelined_depth_apply(
    cfg,
    params,
    stage_params,
    pixels: jax.Array,
    mesh: Mesh,
    *,
    num_microbatches: int,
) -> jax.Array:
    """DepthAnything forward with the encoder GPipe-pipelined over the
    mesh's ``pipe`` axis: embed and DPT neck/head run data-parallel on
    every device; the S=len(out_layers) encoder stages stream
    microbatches over ICI, each stage emitting its DPT tap.

    The reference has no model parallelism (SURVEY.md §2.2); this is the
    TPU-native path for serving DA-Large when one chip's HBM or latency
    budget doesn't fit the whole encoder.

    Args:
      params: the DepthAnything param tree (block params unused here —
        they may be pruned to save HBM; see build_stage_params).
      stage_params: from :func:`build_stage_params`.
      pixels: (B, H, W, 3) normalized; B divisible by num_microbatches
        (and microbatch rows by the mesh's data axis).
    """
    from image_to_pointcloud_tpu.models.dinov2 import Block, DinoV2Backbone
    from image_to_pointcloud_tpu.models.dpt import DPTNeckHead

    backbone = DinoV2Backbone(cfg.backbone)
    p = cfg.backbone.patch_size
    ph, pw = pixels.shape[1] // p, pixels.shape[2] // p

    tokens = backbone.apply(
        {"params": params["backbone"]}, pixels, method="embed"
    )
    _, taps = gpipe_apply(
        mesh,
        make_tapped_stage_fn(Block(cfg.backbone)),
        stage_params,
        tokens,
        num_microbatches=num_microbatches,
    )
    feats = backbone.apply(
        {"params": params["backbone"]},
        list(taps),
        ph,
        pw,
        method="finalize",
    )
    depth = DPTNeckHead(cfg.neck).apply({"params": params["neck"]}, feats)
    return depth.astype(jnp.float32)


# ---------- classic DPT (plain ViT) pipelined forward ----------


def pipelined_dpt_classic_apply(
    cfg,
    params,
    stage_params,
    pixels: jax.Array,
    mesh: Mesh,
    *,
    num_microbatches: int,
) -> jax.Array:
    """Classic-DPT (= MiDaS 3.0) forward with the ViT encoder
    GPipe-pipelined over the mesh's ``pipe`` axis: patch embed and the
    readout-project neck/head run data-parallel; the S=len(out_layers)
    encoder stages stream microbatches over ICI, each emitting its tap
    (CLS included — the readout projection needs it).

    Args mirror :func:`pipelined_depth_apply`; ``stage_params`` comes
    from the same :func:`build_stage_params` (ViT taps are 0-indexed
    block outputs exactly like DINOv2's)."""
    from image_to_pointcloud_tpu.models.dpt_classic import DPTClassic
    from image_to_pointcloud_tpu.models.vit import ViTBackbone, ViTBlock

    backbone = ViTBackbone(cfg.backbone)
    tokens = backbone.apply(
        {"params": params["backbone"]}, pixels, method="embed"
    )
    _, taps = gpipe_apply(
        mesh,
        make_tapped_stage_fn(ViTBlock(cfg.backbone)),
        stage_params,
        tokens,
        num_microbatches=num_microbatches,
    )
    return DPTClassic(cfg).apply({"params": params}, pixels, taps=list(taps))


# ---------- ZoeDepth (BEiT) pipelined forward ----------


def build_beit_stage_params(cfg, params, *, mesh: Mesh | None = None) -> Any:
    """Stack a ZoeDepth param tree's BEiT blocks into (S, L/S, ...) GPipe
    stage params. BEiT taps are exactly the stage boundaries (out_layers
    (6,12,18,24) of 24 for BEiT-L), so no tap indices are needed —
    boundary activations ARE the DPT inputs. With ``mesh``, each leaf is
    host-stacked and placed with P('pipe') so no chip holds more than
    its own stage (same residency argument as build_stage_params)."""
    s = len(cfg.backbone.out_layers)
    num_layers = cfg.backbone.num_layers
    per = num_layers // s
    assert per * s == num_layers, (num_layers, s)
    expect = tuple((i + 1) * per for i in range(s))
    assert tuple(cfg.backbone.out_layers) == expect, (
        f"BEiT pipelining needs boundary taps {expect}, "
        f"got {tuple(cfg.backbone.out_layers)}"
    )
    return _stack_blocks(params["backbone"], num_layers, s, mesh)


def pipelined_zoedepth_apply(
    cfg,
    params,
    stage_params,
    pixels: jax.Array,
    mesh: Mesh,
    *,
    num_microbatches: int,
) -> jax.Array:
    """ZoeDepth forward with the BEiT encoder GPipe-pipelined over the
    mesh's ``pipe`` axis: patch embed and the DPT neck + relative +
    metric-bins heads run data-parallel on every device; the 4 encoder
    stages stream microbatches over ICI, each stage boundary emitting
    its DPT tap directly.

    Args mirror :func:`pipelined_depth_apply`; ``params`` is the full
    ZoeDepth tree (backbone blocks may be pruned — they live only in
    ``stage_params``)."""
    from image_to_pointcloud_tpu.models.beit import BeitBackbone, BeitBlock
    from image_to_pointcloud_tpu.models.zoedepth import ZoeDepth

    backbone = BeitBackbone(cfg.backbone)
    p = cfg.backbone.patch_size
    grid = (pixels.shape[1] // p, pixels.shape[2] // p)

    tokens = backbone.apply(
        {"params": params["backbone"]}, pixels, method="embed"
    )
    block = BeitBlock(cfg.backbone)
    _, taps = gpipe_apply(
        mesh,
        make_stage_fn_apply(
            lambda bp, h: block.apply({"params": bp}, h, grid)
        ),
        stage_params,
        tokens,
        num_microbatches=num_microbatches,
    )
    taps = [t.astype(jnp.float32) for t in taps]
    return ZoeDepth(cfg).apply({"params": params}, pixels, taps=taps)
