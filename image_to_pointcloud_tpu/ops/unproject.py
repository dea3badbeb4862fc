"""Pinhole depth→point-cloud unprojection as fused TPU kernels.

Replaces the reference's interpreted per-pixel double loop (reference
backend/app.py:231-244, the #2 compute hot spot) with a single fused
graph: strided sampling is an XLA slice, the per-pixel math is elementwise
VPU work, and the result is written as a *packed planar point buffer*
``(8, N)`` rows ``[x, y, z, r, g, b, valid, pad]`` in HBM that the
exporters consume directly.

Exact reference semantics preserved (SURVEY.md §8 quirk 3):

* intrinsics ``cx = w/2``, ``cy = h/2``; focal ``f = (w/2)/tan(fov/2)``
  when a fov is given, else ``max(w, h) * 1.2`` (backend/app.py:218-223),
* density stride {"low": 4, "medium": 2, "high": 1} (backend/app.py:226),
* ``z = d[v,u] * depth_scale``; x and y substitute ``1e-6`` for z when
  ``z == 0`` but z itself stays 0 (backend/app.py:233-235),
* colors are the BGR→RGB image samples kept as float32 (quirk 5).

Two implementations with identical outputs:
  * :func:`unproject` — pure jnp; XLA fuses it into one elementwise kernel.
  * :func:`unproject_pallas` — explicit Pallas kernel tiling the row axis,
    writing the packed buffer directly (used on TPU serving path).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["DENSITY_STRIDES", "focal_length", "unproject", "unproject_pallas", "num_points"]

DENSITY_STRIDES = {"low": 4, "medium": 2, "high": 1}


def focal_length(h: int, w: int, fov_deg: float | None) -> float:
    """Reference intrinsics (backend/app.py:218-223)."""
    if fov_deg and fov_deg > 0:
        return (w / 2.0) / math.tan(math.radians(fov_deg) / 2.0)
    return max(h, w) * 1.2


def num_points(h: int, w: int, step: int) -> int:
    """Point count for a strided (h, w) grid: ceil(h/step)*ceil(w/step)."""
    return -(-h // step) * -(-w // step)


@partial(jax.jit, static_argnames=("step",))
def unproject_intrinsics(
    depth_metric: jax.Array,
    image_rgb: jax.Array,
    *,
    fx: jax.Array | float,
    fy: jax.Array | float,
    cx: jax.Array | float,
    cy: jax.Array | float,
    step: int = 1,
) -> jax.Array:
    """Metric-depth unprojection with a real camera model (ZoeDepth-class
    config, BASELINE.json config 3): ``x=(u-cx)·z/fx, y=(v-cy)·z/fy`` with
    z the metric depth itself (no normalization). Returns the packed
    planar (8, N) buffer; intrinsics may be traced scalars so one compiled
    graph serves any camera."""
    d, rgb = _prepare(depth_metric, image_rgb, step)
    hh, ww = d.shape
    u = jax.lax.broadcasted_iota(jnp.float32, (hh, ww), 1) * step - cx
    v = jax.lax.broadcasted_iota(jnp.float32, (hh, ww), 0) * step - cy
    z = d
    x = u * z / fx
    y = v * z / fy
    n = hh * ww
    return jnp.stack(
        [
            x.reshape(n),
            y.reshape(n),
            z.reshape(n),
            rgb[:, :, 0].reshape(n),
            rgb[:, :, 1].reshape(n),
            rgb[:, :, 2].reshape(n),
            (z.reshape(n) > 0).astype(jnp.float32),
            jnp.zeros((n,), jnp.float32),
        ],
        axis=0,
    )


def _prepare(depth_norm, image_rgb, step):
    """Strided sampling + color cast; shared by both implementations."""
    d = depth_norm[::step, ::step].astype(jnp.float32)
    rgb = image_rgb[::step, ::step, :].astype(jnp.float32)
    return d, rgb


@partial(jax.jit, static_argnames=("step", "h", "w", "fov_deg"))
def unproject(
    depth_norm: jax.Array,
    image_rgb: jax.Array,
    *,
    depth_scale: jax.Array | float,
    step: int,
    h: int,
    w: int,
    fov_deg: float | None = None,
) -> jax.Array:
    """Back-project a normalized depth map into a packed (8, N) point buffer.

    Args:
      depth_norm: (h, w) float map, already normalized (see ops.depthnorm).
      image_rgb: (h, w, 3) RGB image (uint8 or float).
      depth_scale: world-unit scale for z (reference ``depth_scale``).
      step: density stride (see DENSITY_STRIDES).
      h, w: static image dims (define intrinsics).
      fov_deg: optional field of view; None → f = max(h, w)*1.2.

    Returns:
      (8, N) float32: rows [x, y, z, r, g, b, 1.0 (valid), 0.0].
    """
    d, rgb = _prepare(depth_norm, image_rgb, step)
    hh, ww = d.shape
    cx, cy = w / 2.0, h / 2.0
    f = focal_length(h, w, fov_deg)

    u = (jax.lax.broadcasted_iota(jnp.float32, (hh, ww), 1) * step) - cx
    v = (jax.lax.broadcasted_iota(jnp.float32, (hh, ww), 0) * step) - cy
    z = d * jnp.float32(depth_scale)
    zs = jnp.where(z != 0.0, z, jnp.float32(1e-6))
    x = u * zs / f
    y = v * zs / f

    n = hh * ww
    out = jnp.stack(
        [
            x.reshape(n),
            y.reshape(n),
            z.reshape(n),
            rgb[:, :, 0].reshape(n),
            rgb[:, :, 1].reshape(n),
            rgb[:, :, 2].reshape(n),
            jnp.ones((n,), jnp.float32),
            jnp.zeros((n,), jnp.float32),
        ],
        axis=0,
    )
    return out


def _unproject_kernel(scale_ref, d_ref, r_ref, g_ref, b_ref, out_ref, *, step, cx, cy, f, rows, cols):
    """Pallas body: one program handles a (rows, cols) tile of the strided grid."""
    i = pl.program_id(0)
    row0 = i * rows  # first strided-row index of this tile

    d = d_ref[:]
    u = jax.lax.broadcasted_iota(jnp.float32, (rows, cols), 1) * step - cx
    v = (jax.lax.broadcasted_iota(jnp.float32, (rows, cols), 0) + row0) * step - cy
    z = d * scale_ref[0]
    zs = jnp.where(z != 0.0, z, jnp.float32(1e-6))
    inv_f = jnp.float32(1.0 / f)
    n = rows * cols
    out_ref[0, :] = (u * zs * inv_f).reshape(n)
    out_ref[1, :] = (v * zs * inv_f).reshape(n)
    out_ref[2, :] = z.reshape(n)
    out_ref[3, :] = r_ref[:].reshape(n)
    out_ref[4, :] = g_ref[:].reshape(n)
    out_ref[5, :] = b_ref[:].reshape(n)
    out_ref[6, :] = jnp.ones((n,), jnp.float32)
    out_ref[7, :] = jnp.zeros((n,), jnp.float32)


@partial(jax.jit, static_argnames=("step", "h", "w", "fov_deg", "interpret"))
def unproject_pallas(
    depth_norm: jax.Array,
    image_rgb: jax.Array,
    *,
    depth_scale: jax.Array | float,
    step: int,
    h: int,
    w: int,
    fov_deg: float | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Pallas implementation of :func:`unproject` (identical output).

    Tiles the strided row axis; each grid program computes and writes one
    contiguous slab of the packed (8, N) HBM buffer.
    """
    d, rgb = _prepare(depth_norm, image_rgb, step)
    hh, ww = d.shape
    cx, cy = w / 2.0, h / 2.0
    f = focal_length(h, w, fov_deg)

    # Pick a row-tile (a divisor of hh) so each slab stays well inside VMEM.
    target = max(1, 65536 // ww)
    rows = next(r for r in range(min(hh, target), 0, -1) if hh % r == 0)
    grid = hh // rows
    n = hh * ww

    scale = jnp.asarray([depth_scale], jnp.float32)
    kernel = partial(
        _unproject_kernel, step=step, cx=cx, cy=cy, f=f, rows=rows, cols=ww
    )
    plane = lambda: pl.BlockSpec(  # noqa: E731
        (rows, ww), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, n), jnp.float32),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            plane(),
            plane(),
            plane(),
            plane(),
        ],
        out_specs=pl.BlockSpec((8, rows * ww), lambda i: (0, i), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(scale, d, rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2])
