"""Device half of the hybrid JPEG decode: dequant + scaled IDCT +
chroma upsample + YCbCr→RGB as jittable XLA math.

The reference decodes uploads entirely on the host (``cv2.imdecode``,
reference backend/app.py:433) and the pipeline ships raw pixels to the
device. Here the host does only the sequential Huffman entropy decode
(native/src/jpegdec.cpp → ``native.jpeg_coefficients``); everything
after the quantized DCT coefficients is dense block math that belongs
on the MXU:

- dequantization: one elementwise multiply,
- IDCT: two small matmuls per 8×8 block, batched over every block in
  the image (XLA tiles the (blocks·8, 8)×(8, 8) contractions),
- chroma upsampling: libjpeg's "fancy" separable triangular filter
  ((3/4, 1/4) per axis) expressed as shifted blends,
- YCbCr→RGB: the BT.601 affine transform (ITU-T T.871).

**Scaled decode.** Like libjpeg's ``scale_num/8`` modes, decoding can
target k/8 scale (k ∈ {1..8}) by keeping only the top-left k×k of each
coefficient block and applying a k-point inverse DCT scaled by
``sqrt(k/8)`` (which preserves the block mean). The host then ships
``k²/64`` of the coefficient payload — for a 12 MP photo headed to a
518² depth model, k=2 cuts the H2D transfer ~16× vs full-res pixels
and skips the host-side IDCT/upsample/color work entirely.

Fidelity: at k=8 output matches libjpeg (PIL/cv2) within the
integer-IDCT tolerance (±3 levels; tests/test_ops.py). At k<8 the
result approximates full decode + area downscale (DCT truncation is
the ideal low-pass filter); the serving pipeline only selects k<8 for
inputs it would immediately downscale anyway (PARITY.md deviation).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "JpegSpec",
    "decode_jpeg_to_rgb",
    "idct_matrix",
    "plan_scale",
]


@dataclasses.dataclass(frozen=True)
class JpegSpec:
    """Static shape/layout of one entropy-decoded JPEG (hashable: it is
    part of the jit signature and of serving batch-bucket keys)."""

    width: int
    height: int
    ncomp: int  # 1 (grayscale) or 3 (YCbCr)
    h: tuple[int, ...]  # per-component horizontal sampling factors
    v: tuple[int, ...]
    k: int  # scaled-decode factor: output is ~k/8 of full resolution

    @property
    def hmax(self) -> int:
        return max(self.h)

    @property
    def vmax(self) -> int:
        return max(self.v)

    @property
    def out_hw(self) -> tuple[int, int]:
        """Decoded output size at scale k/8 (libjpeg jpeg_calc_output_
        dimensions semantics: ceil(dim·k/8))."""
        return (
            -(-self.height * self.k // 8),
            -(-self.width * self.k // 8),
        )

    def block_grid(self, c: int) -> tuple[int, int]:
        """(rows, cols) of 8×8 blocks for component c, incl. MCU padding."""
        mcus_x = -(-self.width // (8 * self.hmax))
        mcus_y = -(-self.height // (8 * self.vmax))
        return mcus_y * self.v[c], mcus_x * self.h[c]


def plan_scale(width: int, height: int, target_hw: tuple[int, int]) -> int:
    """Smallest k ∈ {1..8} whose k/8-scale decode still covers the
    target processing size on both axes (so the downstream area resize
    only ever shrinks, mirroring the reference's downscale-only path)."""
    th, tw = target_hw
    for k in range(1, 8):
        if -(-height * k // 8) >= th and -(-width * k // 8) >= tw:
            return k
    return 8


def idct_matrix(k: int) -> np.ndarray:
    """M[u, x]: k-point inverse-DCT basis over the first k of 8 DCT-II
    coefficients, scaled by sqrt(k/8) so the block mean is preserved
    (the standard DCT-domain downscaling identity)."""
    u = np.arange(k)[:, None]
    x = np.arange(k)[None, :]
    m = np.cos((2 * x + 1) * u * np.pi / (2 * k))
    a = np.full((k, 1), np.sqrt(2.0 / k))
    a[0, 0] = np.sqrt(1.0 / k)
    return (a * m * np.sqrt(k / 8.0)).astype(np.float32)


def _idct_plane(coeffs_kk: jax.Array, qtable_kk: jax.Array, k: int) -> jax.Array:
    """(BH, BW, k, k) quantized coefficients → (BH·k, BW·k) plane,
    level-shifted to [0, 255]-ish (unclipped)."""
    m = jnp.asarray(idct_matrix(k))
    deq = coeffs_kk.astype(jnp.float32) * qtable_kk.astype(jnp.float32)
    # out[x, y] = Σ_{u,v} M[u,x]·deq[u,v]·M[v,y], batched over blocks.
    px = jnp.einsum("ux,HWuv,vy->HWxy", m, deq, m)
    bh, bw = coeffs_kk.shape[0], coeffs_kk.shape[1]
    return px.transpose(0, 2, 1, 3).reshape(bh * k, bw * k) + 128.0


@functools.lru_cache(maxsize=32)
def _fancy_upsample_matrix(n: int) -> np.ndarray:
    """(n, 2n) matrix form of libjpeg's "fancy" 2× triangular filter:
    out[2i] = (3·c[i] + c[i-1])/4, out[2i+1] = (3·c[i] + c[i+1])/4 with
    edge replication (jdsample.c h2v1/h2v2). Two nonzeros per output —
    as a matmul the whole upsample rides the MXU instead of the
    lane-interleave relayouts an explicit stack/reshape costs
    (benchmarks/jpeg_stage_ablation.py)."""
    m = np.zeros((n, 2 * n), np.float32)
    idx = np.arange(n)
    m[idx, 2 * idx] += 0.75
    m[np.maximum(idx - 1, 0), 2 * idx] += 0.25
    m[idx, 2 * idx + 1] += 0.75
    m[np.minimum(idx + 1, n - 1), 2 * idx + 1] += 0.25
    return m


def _fancy_upsample_axis(p: jax.Array, axis: int) -> jax.Array:
    """libjpeg "fancy" 2× upsampling along one axis, as one small
    constant matmul (see _fancy_upsample_matrix). Exact same two-term
    0.75/0.25 blends as the explicit formulation — each output is one
    dot with two nonzeros, so the float result is identical up to FMA
    contraction (inside the ±3-level decode tolerance, and identical
    between the sparse and dense ingest paths, which share this code)."""
    n = p.shape[axis]
    m = jnp.asarray(_fancy_upsample_matrix(n))
    if axis == 0:
        return jnp.einsum("no,n...->o...", m, p)
    if axis == p.ndim - 1:
        return p @ m
    p = jnp.moveaxis(p, axis, -1)
    return jnp.moveaxis(p @ m, -1, axis)


def _upsample_to(
    plane: jax.Array, out_h: int, out_w: int, ry: int, rx: int
) -> jax.Array:
    """Chroma plane → luma grid. Factors of 2 use the fancy filter;
    anything else (rare 4× sampling layouts) nearest-replicates, which
    is libjpeg's int_upsample fallback for non-2× ratios."""
    # Crop to the component's valid region first so MCU padding blocks
    # (gray 128) never bleed into the filter at the right/bottom edge —
    # libjpeg upsamples rows of the true downsampled width.
    ch = -(-out_h // ry)
    cw = -(-out_w // rx)
    plane = plane[:ch, :cw]
    for axis, r in ((0, ry), (1, rx)):
        if r == 2:
            plane = _fancy_upsample_axis(plane, axis)
        elif r != 1:
            plane = jnp.repeat(plane, r, axis=axis)
    return plane[:out_h, :out_w]


def _decode_planes(
    coeffs: tuple[jax.Array, ...],
    qtables: jax.Array,
    spec: JpegSpec,
) -> jax.Array:
    out_h, out_w = spec.out_hw
    k = spec.k
    planes = []
    for c in range(spec.ncomp):
        q = qtables[c].reshape(8, 8)[:k, :k]
        p = _idct_plane(coeffs[c], q, k)
        ry = spec.vmax // spec.v[c]
        rx = spec.hmax // spec.h[c]
        if ry == 1 and rx == 1:
            p = p[:out_h, :out_w]
        else:
            p = _upsample_to(p, out_h, out_w, ry, rx)
        planes.append(p)
    if spec.ncomp == 1:
        y = planes[0]
        rgb = jnp.stack([y, y, y], -1)
    else:
        y, cb, cr = planes
        cb = cb - 128.0
        cr = cr - 128.0
        # BT.601 full-range (ITU-T T.871), the constants libjpeg bakes
        # into its fixed-point tables.
        rgb = jnp.stack(
            [
                y + 1.402 * cr,
                y - 0.344136286 * cb - 0.714136286 * cr,
                y + 1.772 * cb,
            ],
            -1,
        )
    # libjpeg rounds to uint8; keep f32 so callers fuse the follow-up
    # resize without a quantize-dequantize round trip, but match the
    # rounding grid.
    return jnp.clip(jnp.round(rgb), 0.0, 255.0)


@functools.partial(jax.jit, static_argnames=("spec",))
def decode_jpeg_to_rgb(
    coeffs: tuple[jax.Array, ...], qtables: jax.Array, spec: JpegSpec
) -> jax.Array:
    """(per-component (BH, BW, k, k) int16 coefficient grids, (ncomp, 64)
    natural-order quant tables) → (out_h, out_w, 3) f32 RGB in [0, 255],
    rounded to the uint8 grid. ``spec`` is static; shapes must match
    ``spec.block_grid``/``spec.k``."""
    for c in range(spec.ncomp):
        bh, bw = spec.block_grid(c)
        if coeffs[c].shape != (bh, bw, spec.k, spec.k):
            raise ValueError(
                f"component {c}: expected {(bh, bw, spec.k, spec.k)}, "
                f"got {coeffs[c].shape}"
            )
    return _decode_planes(coeffs, qtables, spec)


def host_truncate_coeffs(
    coeffs_natural: "np.ndarray", k: int
) -> "np.ndarray":
    """(BH, BW, 64) natural-order host coefficients → the (BH, BW, k, k)
    top-left corner actually transferred for a k/8-scale decode."""
    bh, bw, _ = coeffs_natural.shape
    return np.ascontiguousarray(
        coeffs_natural.reshape(bh, bw, 8, 8)[:, :, :k, :k]
    )
