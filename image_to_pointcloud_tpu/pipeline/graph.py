"""The fused image→point-cloud graphs: one jitted program per pipeline.

This is the TPU-native replacement for the reference's
``process_image_pipeline`` compute stages (backend/app.py:419-559): where
the reference chains cv2 → torch → numpy-loop → Open3D through host
memory, here a single jitted XLA program runs

  uint8 RGB → [area-downscale] → bicubic+normalize → ViT-DPT forward →
  depth-preview colorize → linear depth upscale → robust normalize →
  [gaussian blur] → pinhole unprojection → packed point buffer →
  statistical outlier mask

entirely on device, returning the packed planar point buffer, the keep
mask, and the colorized preview in one transfer. Graphs are compiled per
static shape signature and cached.

Dummy-model paths (triposr / instantmesh, backend/app.py:567-607) are
reproduced as their own small jitted graphs.
"""

from __future__ import annotations

import dataclasses
import functools
import threading
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from image_to_pointcloud_tpu.models.depth_anything import (
    DepthAnythingConfig,
)
from image_to_pointcloud_tpu.ops import (
    apply_colormap,
    gaussian_blur,
    normalize_depth,
    statistical_outlier_mask,
    unproject,
)
from image_to_pointcloud_tpu.ops.resize import resize_batched
from image_to_pointcloud_tpu.pipeline.preprocess import (
    model_preprocess_spec,
    preprocess_for_model,
    processor_output_size,
    reflect_pad_margins,
)

__all__ = [
    "PipelineOptions",
    "PipelineResult",
    "DepthPipeline",
    "JpegInput",
    "plan_jpeg_input",
    "dummy_point_cloud_graph",
]

MAX_IMAGE_DIM = 3072  # reference backend/app.py:43
DEPTH_PREVIEW_MAX = 2048  # reference backend/app.py:44


@dataclasses.dataclass(frozen=True)
class PipelineOptions:
    """Static knobs of a compiled pipeline (the ``ProcessingRequest`` fields
    that shape the graph; reference backend/app.py:47-56)."""

    density: str = "medium"
    invert_depth: bool = True
    smooth_depth: bool = False
    smooth_ksize: int = 5
    fov: float | None = None
    refine: bool = True  # statistical outlier removal on/off
    # Exact O(N²) kNN (Open3D-identical) vs windowed grid search (exact on
    # smooth surfaces, ~1000× faster; see ops.outlier.grid_knn_mean_distances).
    exact_outlier: bool = False


@dataclasses.dataclass
class PipelineResult:
    points: np.ndarray  # (M, 3) float32, outliers removed
    colors: np.ndarray  # (M, 3) float32 RGB 0-255
    depth_preview_rgb: np.ndarray | None  # (ph, pw, 3) uint8
    raw_point_count: int
    kept_point_count: int
    packed: np.ndarray | None = None  # (8, N) planar buffer (grid-ordered)
    grid_hw: tuple[int, int] | None = None  # strided grid shape (hh, ww)
    # Pre-LUT normalized depth (u8); lets the server encode the preview
    # as a paletted PNG (~10x cheaper than RGB zlib) that canvas-decodes
    # to exactly PLASMA_RGB[gray].
    depth_preview_gray: np.ndarray | None = None


def default_quantized_transfer() -> bool:
    """Depth16-style transfer default: worth it on accelerators
    (device→host bandwidth bound); on CPU the copy is free and f32
    keeps tests bit-simple. ``IPC_TPU_QUANTIZED=1|0`` overrides either
    way (e.g. exercising the quantized bundle codecs through the live
    service on a CPU box). Shared by DepthPipeline and the advanced
    pipelines."""
    import os as _os

    forced = _os.environ.get("IPC_TPU_QUANTIZED")
    if forced in ("0", "1"):
        return forced == "1"
    return jax.default_backend() != "cpu"


def pack_depth12(dn_s: jax.Array) -> jax.Array:
    """Device half of the 12-bit depth transfer: (B, hh, ww) normalized
    depth in [0, 1] → (B, 3·ceil(n/2)) u8 planar pack
    ``[lo_a | lo_b | hi]`` — the flat grid splits into halves a/b, the
    low bytes ship as two planes and ``hi`` carries both 4-bit high
    nibbles (a in bits 0-3, b in bits 4-7). Planar (not interleaved)
    so the pack is three contiguous elementwise stores on TPU — no
    minor-dim-2 relayouts (same lesson as the sparse JPEG payload).
    1.5 bytes/point instead of 2; quantization RMSE depth_scale/4095/√12
    ≈ 7·10⁻⁴·(scale/10), inside the <1e-3 parity budget (PARITY.md
    deviation 12). ``IPC_TPU_DEPTH16=1`` restores the u16 contract."""
    bq = dn_s.shape[0]
    d12 = jnp.round(dn_s * 4095.0).astype(jnp.uint16).reshape(bq, -1)
    n = d12.shape[1]
    half = -(-n // 2)
    d12 = jnp.pad(d12, ((0, 0), (0, 2 * half - n)))
    da, db = d12[:, :half], d12[:, half:]
    return jnp.concatenate(
        [
            (da & 0xFF).astype(jnp.uint8),
            (db & 0xFF).astype(jnp.uint8),
            ((da >> 8) | ((db >> 8) << 4)).astype(jnp.uint8),
        ],
        axis=1,
    )


def unpack_depth12(sec: np.ndarray, n: int) -> np.ndarray:
    """Host half of :func:`pack_depth12`: (B, 3·ceil(n/2)) u8 → (B, n)
    u16 with values in [0, 4095] (dequantize with denom=4095)."""
    b = sec.shape[0]
    half = -(-n // 2)
    lo_a = sec[:, :half].astype(np.uint16)
    lo_b = sec[:, half : 2 * half].astype(np.uint16)
    hi = sec[:, 2 * half : 3 * half].astype(np.uint16)
    da = lo_a | ((hi & 0xF) << 8)
    db = lo_b | ((hi >> 4) << 8)
    return np.concatenate([da, db], axis=1)[:, :n]


_D8T_SIDE_FRAC = 8  # 12-bit side-list capacity = ceil(tiles / 8)


def _d8t_geometry(hh: int, ww: int) -> tuple[int, int, int, int]:
    """(tiles_h, tiles_w, tile_count, side_capacity) for an (hh, ww)
    strided depth grid under the 8×8-tile sub-byte codec."""
    th, tw = -(-hh // 8), -(-ww // 8)
    t = th * tw
    return th, tw, t, -(-t // _D8T_SIDE_FRAC)


def depth8t_section_len(hh: int, ww: int) -> int:
    """Bundle-section bytes for :func:`pack_depth8t` on an (hh, ww)
    grid: 4 B/tile headers + 1 B/pt codes + (2 + 96) B per side-list
    slot. ≈ 1.25 B/pt vs the flat 12-bit pack's 1.5 — but only on
    large, roughly 8-aligned grids: codes are billed per edge-padded
    point (64 B/tile regardless of occupancy), so small or ragged
    strided grids pay much more (a 9×9 grid costs ~316 B ≈ 3.9 B/pt).
    ``DepthPipeline._depth_codec_bits`` therefore falls back to
    :func:`pack_depth12` whenever this length would not beat the flat
    pack's ``3·ceil(n/2)``."""
    _, _, t, k = _d8t_geometry(hh, ww)
    return 4 * t + 64 * t + 2 * k + 96 * k


def pack_depth8t(dn_s: jax.Array) -> jax.Array:
    """Sub-byte tiled depth transfer (the quantized-transfer default
    since round 5): (B, hh, ww) normalized depth in [0, 1] → one u8 row
    per image.

    Depth surfaces are smooth, so a flat 12-bit code spends bits
    uniformly where a local code would not have to: quantize to the
    12-bit grid (d12 = round(dn·4095)), split into 8×8 spatial tiles
    (edge-replicated padding), and ship per-tile u16 ``min``/``range``
    headers plus one u8 code per point
    (``code = round((d12 − min)·255/max(range, 1))``). Reconstruction
    error is ≤ range/510 + 0.5 d12 steps (two roundings), so a tile
    whose range ≤ 255 lands within 1 d12 step — in z, ≤ 1.5·scale/4095
    including the base quantization, vs the flat 12-bit pack's
    0.5·scale/4095. The <1e-3 *absolute* z budget caps at scale ≈ 2.7
    for coded tiles (1.5·scale/4095 ≤ 1e-3) vs scale ≈ 8.2 for the
    flat pack; at the default scale 10 the worst case is ≈ 3.7e-3 in z
    — but the north-star budget is per-point **RMSE**, and that
    measures 8.1e-4 at scale 10 even on adversarial random-init depth
    (PARITY.md deviation 12; smooth real content lands within 1 d12
    step). ``IPC_TPU_DEPTH12=1``/``IPC_TPU_DEPTH16=1`` are the
    precision escape hatches. Wide tiles (depth
    edges) are
    patched from a fixed-capacity 12-bit side list: the top
    ``ceil(T/8)`` tiles by range ship their exact d12 values
    (:func:`pack_depth12`-style 1.5 B/pt nibble pack) plus u16 tile
    indices — static shapes, chosen on device with ``lax.top_k``;
    beyond capacity the codec degrades gracefully (those tiles keep
    their u8 codes; error ≤ range/510 d12 steps). Row layout (planar,
    contiguous elementwise stores — no minor-dim relayouts):
    ``[min_lo | min_hi | range_lo | range_hi | codes(tile-major) |
    side_idx_lo | side_idx_hi | side_12bit]``. Host half:
    :func:`unpack_depth8t` (dequantize with denom=4095)."""
    bq, hh, ww = dn_s.shape
    th, tw, t, k = _d8t_geometry(hh, ww)
    d12 = jnp.round(jnp.clip(dn_s, 0.0, 1.0) * 4095.0).astype(jnp.uint16)
    d12 = jnp.pad(
        d12, ((0, 0), (0, th * 8 - hh), (0, tw * 8 - ww)), mode="edge"
    )
    tiles = (
        d12.reshape(bq, th, 8, tw, 8)
        .transpose(0, 1, 3, 2, 4)
        .reshape(bq, t, 64)
    )
    mn = tiles.min(axis=-1)
    rng = tiles.max(axis=-1) - mn
    denom = jnp.maximum(rng, 1).astype(jnp.float32)
    codes = jnp.round(
        (tiles - mn[..., None]).astype(jnp.float32)
        * (255.0 / denom[..., None])
    ).astype(jnp.uint8)
    _, idx = jax.lax.top_k(rng.astype(jnp.int32), k)
    side = jnp.take_along_axis(tiles, idx.astype(jnp.int32)[..., None], 1)
    sa, sb = side[..., :32], side[..., 32:]
    side_pack = jnp.concatenate(
        [
            (sa & 0xFF).astype(jnp.uint8),
            (sb & 0xFF).astype(jnp.uint8),
            ((sa >> 8) | ((sb >> 8) << 4)).astype(jnp.uint8),
        ],
        axis=-1,
    ).reshape(bq, 96 * k)
    idx16 = idx.astype(jnp.uint16)
    return jnp.concatenate(
        [
            (mn & 0xFF).astype(jnp.uint8),
            (mn >> 8).astype(jnp.uint8),
            (rng & 0xFF).astype(jnp.uint8),
            (rng >> 8).astype(jnp.uint8),
            codes.reshape(bq, 64 * t),
            (idx16 & 0xFF).astype(jnp.uint8),
            (idx16 >> 8).astype(jnp.uint8),
            side_pack,
        ],
        axis=1,
    )


def unpack_depth8t(sec: np.ndarray, hh: int, ww: int) -> np.ndarray:
    """Host half of :func:`pack_depth8t`: (B, depth8t_section_len) u8 →
    (B, hh, ww) u16 with values in [0, 4095] (dequantize with
    denom=4095)."""
    th, tw, t, k = _d8t_geometry(hh, ww)
    b = sec.shape[0]
    u16 = lambda lo, hi: lo.astype(np.uint16) | (  # noqa: E731
        hi.astype(np.uint16) << 8
    )
    mn = u16(sec[:, 0:t], sec[:, t : 2 * t])
    rng = u16(sec[:, 2 * t : 3 * t], sec[:, 3 * t : 4 * t])
    o = 4 * t
    codes = sec[:, o : o + 64 * t].reshape(b, t, 64).astype(np.float32)
    o += 64 * t
    idx = u16(sec[:, o : o + k], sec[:, o + k : o + 2 * k]).astype(np.int64)
    o += 2 * k
    sp = sec[:, o : o + 96 * k].reshape(b, k, 96)
    lo_a = sp[..., :32].astype(np.uint16)
    lo_b = sp[..., 32:64].astype(np.uint16)
    hi = sp[..., 64:].astype(np.uint16)
    side = np.concatenate(
        [lo_a | ((hi & 0xF) << 8), lo_b | ((hi >> 4) << 8)], axis=-1
    )
    denom = np.maximum(rng, 1).astype(np.float32)
    tiles = (
        mn.astype(np.float32)[..., None]
        + np.round(codes * (denom[..., None] / 255.0))
    ).astype(np.uint16)
    np.put_along_axis(tiles, idx[..., None], side, axis=1)
    d = (
        tiles.reshape(b, th, tw, 8, 8)
        .transpose(0, 1, 3, 2, 4)
        .reshape(b, th * 8, tw * 8)
    )
    return np.ascontiguousarray(d[:, :hh, :ww])


def pack_keep_bits(mask: jax.Array) -> jax.Array:
    """Bit-pack a boolean keep mask along its last axis (8 points/byte,
    little-endian bit order — ``np.unpackbits(..., bitorder="little")``
    on the host). Device half of the depth16 transfer contract; shared
    by DepthPipeline's bundle and MetricPipeline's metric bundle."""
    n = mask.shape[-1]
    kb = jnp.pad(mask, [(0, 0)] * (mask.ndim - 1) + [(0, (-n) % 8)])
    kb = kb.reshape(*mask.shape[:-1], -1, 8).astype(jnp.int32)
    weights = jnp.asarray([1, 2, 4, 8, 16, 32, 64, 128], jnp.int32)
    return jnp.sum(kb * weights, axis=-1).astype(jnp.uint8)


def depth16_to_xyz(
    d16: np.ndarray,
    depth_scales: np.ndarray,
    *,
    step: int,
    f: float,
    cx: float,
    cy: float,
    denom: float = 65535.0,
) -> np.ndarray:
    """Host half of the depth16 contract: (B, hh, ww) u16 quantized
    normalized depth → (B, 3, hh·ww) f32 XYZ, exact reference math
    (backend/app.py:218-244 incl. the z==0 epsilon asymmetry). ONE
    implementation — DepthPipeline.collect and VideoPipeline both call
    this; keep it bit-identical to ops.unproject's device math.
    ``denom`` is the quantization denominator (65535 for the u16
    contract; the 12-bit packed transfer passes 4095)."""
    b, hh, ww = d16.shape
    n = hh * ww
    dn = d16.astype(np.float32) * np.float32(1.0 / denom)
    z = dn * np.asarray(depth_scales, np.float32).reshape(b, 1, 1)
    zs = np.where(z != 0.0, z, np.float32(1e-6))
    u = (np.arange(ww, dtype=np.float32) * step - np.float32(cx))[None, None, :]
    v = (np.arange(hh, dtype=np.float32) * step - np.float32(cy))[None, :, None]
    return np.stack(
        [
            (u * zs / np.float32(f)).reshape(b, n),
            (v * zs / np.float32(f)).reshape(b, n),
            z.reshape(b, n),
        ],
        axis=1,
    )


def ycc420_to_rgb_f32(
    y: np.ndarray, cb: np.ndarray, cr: np.ndarray
) -> np.ndarray:
    """Host half of the hybrid-JPEG 4:2:0 color ride-along: (B, hh, ww)
    u8 luma + (B, ceil(hh/2), ceil(ww/2)) u8 chroma → (B, hh, ww, 3)
    f32 RGB (integer-valued, BT.601 full-range inverse, ties-to-even).
    Bit-identical to native.reconstruct_points_ycc420's per-point math
    (same f32 op order; g++ targets baseline x86-64, no FMA
    contraction) — the ONE-host-implementation contract of the depth16
    transfer applies to colors too."""
    hh, ww = y.shape[1], y.shape[2]
    yf = y.astype(np.float32)
    up = lambda p: np.repeat(  # noqa: E731
        np.repeat(p, 2, axis=1), 2, axis=2
    )[:, :hh, :ww].astype(np.float32)
    cbf = up(cb) - np.float32(128.0)
    crf = up(cr) - np.float32(128.0)
    rgb = np.stack(
        [
            yf + np.float32(1.402) * crf,
            yf
            - np.float32(0.344136286) * cbf
            - np.float32(0.714136286) * crf,
            yf + np.float32(1.772) * cbf,
        ],
        axis=-1,
    )
    return np.clip(np.rint(rgb), 0.0, 255.0)


def _preview_hw(h: int, w: int) -> tuple[int, int]:
    m = max(h, w)
    if m <= DEPTH_PREVIEW_MAX:
        return h, w
    s = DEPTH_PREVIEW_MAX / float(m)
    return int(round(h * s)), int(round(w * s))


def _proc_hw(h: int, w: int) -> tuple[int, int]:
    """Post-downscale working size (reference backend/app.py:438-445)."""
    m = max(h, w)
    if m <= MAX_IMAGE_DIM:
        return h, w
    s = MAX_IMAGE_DIM / float(m)
    return int(round(h * s)), int(round(w * s))


def _smooth_ksize(ksize: int) -> int:
    """Reference odd-kernel clamp (backend/app.py:210-212) — ONE place;
    both depth_to_packed_points and the batched serving graph use it."""
    return max(3, int(ksize) // 2 * 2 + 1)


def _unpack_jpeg_batch(payload_u8: jax.Array, spec) -> tuple[jax.Array, jax.Array]:
    """Hybrid-ingest payload rows → ((B, oh, ow, 3) f32 RGB in [0,255],
    (B,) f32 depth scales). Row layout (all little-endian, matching
    ``DepthPipeline.pack_jpeg_payload``):
    [per-component (BH·BW·k·k) int16 coeffs | (ncomp·64) f32 qtables |
    f32 depth_scale]."""
    from image_to_pointcloud_tpu.ops.jpeg import _decode_planes

    b = payload_u8.shape[0]
    k = spec.k
    off = 0
    coeffs = []
    for c in range(spec.ncomp):
        bh, bw = spec.block_grid(c)
        n = bh * bw * k * k * 2
        raw = payload_u8[:, off : off + n].reshape(b, bh, bw, k, k, 2)
        coeffs.append(jax.lax.bitcast_convert_type(raw, jnp.int16))
        off += n
    nq = spec.ncomp * 64 * 4
    qt = jax.lax.bitcast_convert_type(
        payload_u8[:, off : off + nq].reshape(b, spec.ncomp, 64, 4),
        jnp.float32,
    )
    off += nq
    scales = jax.lax.bitcast_convert_type(
        payload_u8[:, off : off + 4], jnp.float32
    ).reshape(-1)
    img = jax.vmap(
        lambda *args: _decode_planes(args[:-1], args[-1], spec)
    )(*coeffs, qt)
    return img, scales


def _unpack_jpeg_sparse_fields(
    payload_u8: jax.Array, spec, cap: int, exc_cap: int
) -> tuple[jax.Array, ...]:
    """Slice one batch of split-sparse payload rows into its typed
    fields: (counts i32, dc i32, pos i32, val i8, exc_idx i32,
    exc_val i16, qtables f32, scales f32). Layout comes from
    ``ops.jpeg_sparse.sparse_row_sections`` (the one shared
    definition with the host packer). Big fields avoid minor-dim
    reshape+bitcast relayouts entirely: section starts are
    lane-aligned, DC widens from two byte planes with elementwise
    ops, and the i8 value stream is a same-width (free) bitcast."""
    from image_to_pointcloud_tpu.ops.jpeg_sparse import sparse_row_sections

    sections, _ = sparse_row_sections(spec, cap, exc_cap)
    b = payload_u8.shape[0]

    def sl(name):
        off, size = sections[name]
        return payload_u8[:, off : off + size]

    counts = sl("counts").astype(jnp.int32)
    # Signed i16 DC from planar bytes: signed high byte · 256 + low.
    dc = (
        jax.lax.bitcast_convert_type(sl("dc_hi"), jnp.int8).astype(jnp.int32)
        * 256
        + sl("dc_lo").astype(jnp.int32)
    )
    pos = sl("pos").astype(jnp.int32)
    val = jax.lax.bitcast_convert_type(sl("val"), jnp.int8)
    exc_idx = jax.lax.bitcast_convert_type(
        sl("exc_idx").reshape(b, exc_cap, 4), jnp.int32
    )
    exc_val = jax.lax.bitcast_convert_type(
        sl("exc_val").reshape(b, exc_cap, 2), jnp.int16
    )
    qt = jax.lax.bitcast_convert_type(
        sl("qt").reshape(b, spec.ncomp, 64, 4), jnp.float32
    )
    scales = jax.lax.bitcast_convert_type(sl("scale"), jnp.float32).reshape(
        -1
    )
    return counts, dc, pos, val, exc_idx, exc_val, qt, scales


def _unpack_jpeg_sparse_batch(
    payload_u8: jax.Array, spec, cap: int, exc_cap: int
) -> tuple[jax.Array, jax.Array]:
    """Sparse hybrid-ingest payload rows → ((B, oh, ow, 3) f32 RGB,
    (B,) f32 depth scales); see ``_unpack_jpeg_sparse_fields`` for the
    row layout contract."""
    from image_to_pointcloud_tpu.ops.jpeg import _decode_planes
    from image_to_pointcloud_tpu.ops.jpeg_sparse import (
        gather_from_blocks,
        scatter_from_blocks,
    )

    # A/B knob (VERDICT r4 item 2): the gather/MXU densify variant vs
    # the 1-D scatter. Bit-identical outputs (tests/test_jpeg_sparse);
    # the winner on this rig is recorded in benchmarks/RESULTS.md.
    import os as _os

    densify = (
        gather_from_blocks
        if _os.environ.get("IPC_TPU_JPEG_GATHER") == "1"
        else scatter_from_blocks
    )

    counts, dc, pos, val, exc_idx, exc_val, qt, scales = (
        _unpack_jpeg_sparse_fields(payload_u8, spec, cap, exc_cap)
    )

    def one(c, d, p, v, ei, ev, q):
        return _decode_planes(
            densify(c, d, p, v, ei, ev, spec), q, spec
        )

    return jax.vmap(one)(counts, dc, pos, val, exc_idx, exc_val, qt), scales


@dataclasses.dataclass
class JpegInput:
    """Host-side product of :func:`plan_jpeg_input`: one JPEG
    entropy-decoded and truncated for a k/8-scale device decode. Stands
    in for the decoded RGB array on the hybrid ingest path (serving
    groups these by ``spec`` the way pixel items group by shape)."""

    spec: Any  # ops.jpeg.JpegSpec
    coeffs: list  # per-component (BH, BW, k, k) int16, natural order
    qtables: np.ndarray  # (ncomp, 64) float32, natural order
    # Split sparse blocked encoding (ops/jpeg_sparse.py), lazy:
    counts: "np.ndarray | None" = None  # (nblocks,) u8 AC counts
    dc: "np.ndarray | None" = None  # (nblocks,) i16
    pos: "np.ndarray | None" = None  # (nnz_ac,) u8
    val: "np.ndarray | None" = None  # (nnz_ac,) i8
    exc_idx: "np.ndarray | None" = None  # (nexc,) i32 slots into pos/val
    exc_val: "np.ndarray | None" = None  # (nexc,) i16
    # Host-reconstructed grid colors per stride (lazy, see grid_colors).
    _gc_cache: dict = dataclasses.field(default_factory=dict)

    @property
    def orig_hw(self) -> tuple[int, int]:
        return self.spec.height, self.spec.width

    def grid_colors(self, step: int) -> "np.ndarray | None":
        """(ceil(h/step), ceil(w/step), 3) u8 RGB at the strided grid,
        reconstructed on the host straight from the coefficients
        (native/src/colorgrid.cpp) — replaces the D2H 4:2:0 color
        ride-along, the largest item of the device→host bundle
        (benchmarks/e2e_breakdown.py). None when the layout is
        unsupported (k<8, pending device resize, exotic sampling
        factors, no native lib) — the graph then keeps the ride-along.

        Cached per step; call from the planner/executor thread
        (serving's upload handler, bench's planner) so the ~1-3 ms/img
        hides under the serialized link waits."""
        if step not in self._gc_cache:
            from image_to_pointcloud_tpu import native

            colors = None
            # The device path samples colors AFTER its area resize to
            # the working size; host reconstruction only matches when
            # no resize happens (ordinary ≤3072 px uploads at k=8).
            if self.spec.out_hw == _proc_hw(self.spec.height,
                                            self.spec.width):
                colors = native.jpeg_grid_colors(
                    self.coeffs, self.qtables, self.spec, step
                )
            self._gc_cache[step] = colors
        return self._gc_cache[step]

    def sparse(
        self,
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray,
               np.ndarray]:
        """(counts, dc, pos, val, exc_idx, exc_val) of the split sparse
        encoding, packed on first use and cached (plan_jpeg_input
        pre-packs on its worker thread so the serving drain never pays
        this)."""
        if self.counts is None:
            from image_to_pointcloud_tpu.ops.jpeg_sparse import block_pack

            (
                self.counts, self.dc, self.pos, self.val,
                self.exc_idx, self.exc_val,
            ) = block_pack(self.coeffs)
        return (
            self.counts, self.dc, self.pos, self.val,
            self.exc_idx, self.exc_val,
        )

    @property
    def dense_bytes(self) -> int:
        return sum(c.nbytes for c in self.coeffs)


def plan_jpeg_input(data: bytes) -> "JpegInput | None":
    """Entropy-decode ``data`` for the hybrid device-decode ingest, or
    None when the path does not apply: not a supported JPEG
    (sequential and progressive Huffman streams both qualify), the
    native module is missing, or the sparse coefficient payload would
    not ship meaningfully fewer bytes than the pixels it replaces
    (pathologically dense coefficients — e.g. quality-100 noise — keep
    the classic host decode).

    Scale: k<8 engages exactly for images the reference would
    immediately area-downscale (>~3510 px max dim), where DCT-domain
    truncation replaces an already-lossy resize (PARITY.md). At k=8 the
    device decode is full-resolution and matches libjpeg within ±3 gray
    levels (ops/jpeg.py), and the sparse blocked payload
    (ops/jpeg_sparse.py) ships ~2.5-6x fewer H2D bytes than pixels for
    photographic content — so ordinary uploads engage too. The 0.75
    margin charges the hybrid path for its strided-RGB D2H ride-along
    (colors must come back from the device; D2H is ~2x slower than H2D
    on this rig's link)."""
    from image_to_pointcloud_tpu import native
    from image_to_pointcloud_tpu.ops.jpeg import (
        JpegSpec,
        host_truncate_coeffs,
        plan_scale,
    )
    from image_to_pointcloud_tpu.ops.jpeg_sparse import (
        block_pack,
        coeff_layout,
        sparse_payload_bytes,
    )

    r = native.jpeg_coefficients(data)
    if r is None:
        return None
    h, w = _proc_hw(r["height"], r["width"])
    k = plan_scale(r["width"], r["height"], (h, w))
    spec = JpegSpec(
        r["width"], r["height"], r["ncomp"], tuple(r["h"]), tuple(r["v"]), k
    )
    coeffs = [host_truncate_coeffs(c, k) for c in r["coeffs"]]
    # Gate on cheap full-array counts BEFORE building the pos/val
    # arrays: a declined JPEG (dense coefficients) falls back to the
    # full host decode, so any pack work done here is pure waste on
    # exactly the most expensive uploads.
    if k >= 8:
        _, total = coeff_layout(spec)
        nnz_ac = 0
        nexc = 0
        for c in coeffs:
            nnz_ac += int(np.count_nonzero(c)) - int(
                np.count_nonzero(c[:, :, 0, 0])
            )
            wide = (c < -128) | (c > 127)
            wide[:, :, 0, 0] = False  # DC ships dense i16 regardless
            nexc += int(np.count_nonzero(wide))
        if sparse_payload_bytes(nnz_ac, nexc, total) >= 0.75 * h * w * 3:
            return None
    counts, dc, pos, val, exc_idx, exc_val = block_pack(coeffs)
    return JpegInput(
        spec=spec,
        coeffs=coeffs,
        qtables=r["qtables"].astype(np.float32),
        counts=counts,
        dc=dc,
        pos=pos,
        val=val,
        exc_idx=exc_idx,
        exc_val=exc_val,
    )


def plan_sparse_batch(jpegs: "list[JpegInput]") -> "tuple[int, int] | None":
    """(AC capacity, exception capacity) buckets for one hybrid batch,
    or None when the dense int16 payload ships fewer bytes (so the
    batch should take the dense graph). ONE chooser — serving
    (``submit_batch_jpeg``) and the benches share it, so measured
    payloads are the product's payloads."""
    from image_to_pointcloud_tpu.ops.jpeg_sparse import (
        capacity_bucket,
        coeff_layout,
        exception_bucket,
    )

    spec = jpegs[0].spec
    _, total = coeff_layout(spec)
    nblocks = total // (spec.k * spec.k)
    cap = capacity_bucket(max(len(j.sparse()[2]) for j in jpegs), total)
    exc_cap = exception_bucket(max(len(j.sparse()[4]) for j in jpegs))
    if 3 * nblocks + 2 * cap + 6 * exc_cap < 2 * total:
        return cap, exc_cap
    return None


def _outlier_mask_from_means(means: jax.Array) -> jax.Array:
    """Batched Open3D threshold rule on (B, N) mean kNN distances."""
    from image_to_pointcloud_tpu.ops.outlier import outlier_keep_from_means

    return outlier_keep_from_means(means, means > 0.0, 2.0, axis=-1)


def depth_to_packed_points(
    depth: jax.Array,
    image_rgb: jax.Array,
    depth_scale: jax.Array | float,
    *,
    opts: PipelineOptions,
    h: int,
    w: int,
    step: int,
):
    """Model-resolution depth + working-size RGB → packed (8, N) points.

    The jitted equivalent of the reference's resize → normalize → blur →
    per-pixel loop → outlier removal chain (backend/app.py:174-269).
    """
    if depth.shape != (h, w):
        d_img = resize_batched(depth[None, :, :, None], (h, w), "linear")[0, :, :, 0]
    else:
        d_img = depth
    dn = normalize_depth(d_img, opts.invert_depth)
    if opts.smooth_depth:
        dn = gaussian_blur(dn, _smooth_ksize(opts.smooth_ksize))
    packed = unproject(
        dn,
        image_rgb,
        depth_scale=depth_scale,
        step=step,
        h=h,
        w=w,
        fov_deg=opts.fov,
    )
    if opts.refine:
        if opts.exact_outlier:
            keep = statistical_outlier_mask(packed[:3].T)
        else:
            hh, ww = -(-h // step), -(-w // step)
            from image_to_pointcloud_tpu.ops.outlier import (
                grid_statistical_outlier_mask,
            )

            keep = grid_statistical_outlier_mask(
                packed[:3].T.reshape(hh, ww, 3)
            )
        packed = packed.at[6].set(keep.astype(jnp.float32))
    return packed


class DepthPipeline:
    """Compiled depth→point-cloud pipelines over one model + params."""

    def __init__(
        self,
        cfg: DepthAnythingConfig,
        params: Any,
        *,
        model_target: int | tuple[int, int] | None = None,
        quantized_transfer: bool | None = None,
        mesh: Any = None,
        pipe_microbatches: int = 4,
    ):
        from image_to_pointcloud_tpu.models import build_model

        self.cfg = cfg
        self.model = build_model(cfg)
        (
            self.model_target,
            self.size_multiple,
            self.pixel_mean,
            self.pixel_std,
            self.resize_method,
            self.keep_aspect,
        ) = model_preprocess_spec(cfg, model_target)
        if quantized_transfer is None:
            quantized_transfer = default_quantized_transfer()
        self.quantized_transfer = quantized_transfer
        # Quantized-transfer depth precision: the sub-byte tiled codec
        # (~1.25 B/pt) is the default since the round-5 on-chip A/B
        # (benchmarks/RESULTS.md 2026-08-21: e2e 118.6 vs 77.5 same
        # battery, strictly fewer D2H bytes on the serialized link;
        # measured per-point RMSE 8.1e-4 at scale 10 on adversarial
        # random-init content — inside the <1e-3 budget, PARITY.md
        # deviation 12). IPC_TPU_DEPTH12=1 restores the flat 12-bit
        # pack, IPC_TPU_DEPTH16=1 the full u16 contract; small/ragged
        # grids auto-fall-back to 12-bit (_depth_codec_bits).
        import os as _os

        self.depth_bits = (
            16
            if _os.environ.get("IPC_TPU_DEPTH16") == "1"
            else (12 if _os.environ.get("IPC_TPU_DEPTH12") == "1" else 8)
        )
        # Hybrid-JPEG color policy: reconstruct grid colors on the host
        # from the coefficients (drops the largest D2H bundle item)
        # whenever every item in a batch supports it; IPC_TPU_HOST_COLORS=0
        # restores the device 4:2:0 ride-along unconditionally.
        self.host_colors_enabled = (
            _os.environ.get("IPC_TPU_HOST_COLORS", "1") != "0"
        )
        self._compiled: dict[tuple, Callable] = {}
        self._build_lock = threading.Lock()
        # Per-spec sparse-capacity floor (hysteresis): a batch never
        # selects a smaller (cap, exc_cap) than this spec has already
        # used. Without it, mixed-content traffic through the serving
        # batcher makes every (batch bucket × capacity bucket)
        # combination its own minutes-long remote XLA compile — the
        # observed long-poll serving collapse (benchmarks/RESULTS.md
        # round 3). With it, capacities only ratchet up (O(log) growth
        # steps per spec) and the serving warmup's capacity covers all
        # less-dense uploads. Cost: some batches pad to a larger cap
        # than their own max nnz (bytes the 8192-granular buckets just
        # saved several times over).
        self._sparse_caps: dict[Any, tuple[int, int]] = {}
        # Multi-chip serving: place params per the megatron TP rules over
        # the 'model' axis (replicated elsewhere) and shard request
        # batches over 'data' — XLA propagates the shardings through the
        # fused graph and inserts the ICI collectives. A mesh with a
        # 'pipe' axis instead GPipe-pipelines the encoder stages
        # (parallel/pipeline_par.pipelined_depth_apply): encoder blocks
        # are pre-stacked per stage and sharded over 'pipe'; everything
        # else (embed, DPT neck/head, post-model ops) stays data-parallel.
        self.mesh = mesh
        self.pipe_microbatches = int(pipe_microbatches)
        self._pipelined = (
            mesh is not None
            and "pipe" in mesh.shape
            and mesh.shape["pipe"] > 1
        )
        if self._pipelined:
            import re as _re

            from jax.sharding import NamedSharding, PartitionSpec as P

            from image_to_pointcloud_tpu.models.dpt_classic import (
                DPTClassicConfig,
            )
            from image_to_pointcloud_tpu.models.zoedepth import ZoeDepthConfig
            from image_to_pointcloud_tpu.parallel.pipeline_par import (
                build_beit_stage_params,
                build_stage_params,
                pipelined_depth_apply,
                pipelined_dpt_classic_apply,
                pipelined_zoedepth_apply,
            )

            n_stages = len(cfg.backbone.out_layers)
            if mesh.shape["pipe"] != n_stages:
                raise ValueError(
                    f"pipe axis ({mesh.shape['pipe']}) must equal the "
                    f"model's stage count ({n_stages} DPT tap layers)"
                )
            # Stage params go straight from host to their pipe slice
            # (mesh=...) — never materializing the whole stacked encoder
            # on one chip, which is the residency PP exists to avoid.
            # One family dispatch covers both the stage-param layout and
            # the pipelined apply (_build closes over self._pp_apply).
            if isinstance(cfg, ZoeDepthConfig):
                stages = build_beit_stage_params(cfg, params, mesh=mesh)
                self._pp_apply = pipelined_zoedepth_apply
            elif isinstance(cfg, DPTClassicConfig):
                stages = build_stage_params(cfg, params, mesh=mesh)
                self._pp_apply = pipelined_dpt_classic_apply
            else:
                stages = build_stage_params(cfg, params, mesh=mesh)
                self._pp_apply = pipelined_depth_apply
            # Blocks live only in the stacked stage params; prune them
            # from the replicated tree so Large's encoder isn't resident
            # twice per device.
            tree = dict(params)
            tree["backbone"] = {
                k: v
                for k, v in params["backbone"].items()
                if not _re.fullmatch(r"block\d+", k)
            }
            params = {
                "tree": jax.device_put(tree, NamedSharding(mesh, P())),
                "stages": stages,
            }
        elif mesh is not None and "model" in mesh.shape:
            from image_to_pointcloud_tpu.parallel.sharding import shard_params

            params = shard_params(params, mesh)
        elif mesh is not None:
            # A mesh without a 'model' axis (e.g. --mesh pipe=1,data=N,
            # a degenerate pipe spec) serves plain DP: replicate params.
            from jax.sharding import NamedSharding, PartitionSpec as P

            params = jax.device_put(params, NamedSharding(mesh, P()))
        self.params = params

    def _depth_codec_bits(self, hh: int, ww: int) -> int:
        """Effective quantized-transfer depth codec for an (hh, ww)
        strided grid. The sub-byte tiled codec (``depth_bits == 8``)
        only wins on large, roughly 8-aligned grids — its per-tile
        headers, edge padding and fixed side-list slots make small or
        ragged grids MORE expensive than the flat 12-bit nibble pack
        (see :func:`depth8t_section_len`) — so fall back to 12-bit
        whenever the tiled section would not be strictly smaller.
        Deterministic in (hh, ww): the device pack and the host unpack
        call this with the same grid and always agree."""
        if self.depth_bits == 8 and depth8t_section_len(hh, ww) >= 3 * (
            -(-(hh * ww) // 2)
        ):
            return 12
        return self.depth_bits

    def _place_batch(self, arr: jax.Array) -> jax.Array:
        if self.mesh is None:
            return arr
        from image_to_pointcloud_tpu.parallel.sharding import batch_sharding

        return jax.device_put(arr, batch_sharding(self.mesh, arr.ndim))

    def _data_pad(self, b: int) -> int:
        """Rows of padding so the batch divides the mesh data axis (a
        lone request on an 8-chip mesh must still shard)."""
        if self.mesh is None or "data" not in self.mesh.shape:
            return 0
        return (-b) % self.mesh.shape["data"]

    # ---------- graph builders ----------

    def _build(
        self,
        in_hw: tuple[int, int],
        opts: PipelineOptions,
        batch: int,
        preview: bool = True,
        jpeg_spec=None,
        jpeg_sparse_cap: "tuple[int, int] | None" = None,
        jpeg_host_colors: bool = False,
    ):
        """Compile the full fused graph for one (input size, batch) signature.

        ``jpeg_spec`` (ops.jpeg.JpegSpec) switches the graph head to the
        hybrid JPEG ingest: the payload carries entropy-decoded DCT
        coefficients instead of pixels and the image materializes on
        device at ``spec.out_hw`` (k/8 scale) before the usual area
        resize to the working size. ``in_hw`` stays the ORIGINAL image
        dims so the working size matches the reference's downscale rule.
        ``jpeg_host_colors`` drops the 4:2:0 color ride-along from the
        D2H bundle — the host reconstructs grid colors from its own
        coefficients (JpegInput.grid_colors); submit_batch_jpeg selects
        it per batch.
        """
        h0, w0 = in_hw
        h, w = _proc_hw(h0, w0)
        # Where the graph's pixels come from: decoded-on-device JPEG
        # planes (at k/8 scale) or the host's raw pixel rows.
        src_hw = jpeg_spec.out_hw if jpeg_spec is not None else (h0, w0)
        # ZoeDepth reflect-pads before resize and crops the prediction
        # back (reflect_pad_margins; (0,0) for the DA family).
        pad_h, pad_w = reflect_pad_margins(self.cfg, h, w)
        hp, wp = h + 2 * pad_h, w + 2 * pad_w
        mh, mw = processor_output_size(
            hp, wp, self.model_target, multiple=self.size_multiple,
            keep_aspect_ratio=self.keep_aspect,
        )
        # Depth-grid dims seen by everything after the model: the model
        # resolution, or the unpadded image size once the pad is cropped.
        dmh, dmw = (h, w) if (pad_h or pad_w) else (mh, mw)
        from image_to_pointcloud_tpu.ops.unproject import DENSITY_STRIDES

        step = DENSITY_STRIDES[opts.density]
        pv_h, pv_w = _preview_hw(dmh, dmw)

        def graph(params, payload_u8):
            # One fused H2D buffer per batch: [u8 RGB pixels | f32 LE
            # depth_scale bytes] per row — the relay charges ~27 ms
            # latency per serialized transfer, so the per-image scale
            # rides inside the image upload instead of its own put.
            # (JPEG mode: [coeff int16 LE bytes per comp | qtables f32 |
            # depth_scale f32] per row, ~k²/64·1.5·2 bytes/pixel; sparse
            # JPEG mode ships dense i16 DC per block plus ~2 bytes per
            # AC nonzero.)
            if jpeg_spec is not None and jpeg_sparse_cap is not None:
                img, depth_scales = _unpack_jpeg_sparse_batch(
                    payload_u8, jpeg_spec, *jpeg_sparse_cap
                )
            elif jpeg_spec is not None:
                img, depth_scales = _unpack_jpeg_batch(payload_u8, jpeg_spec)
            else:
                images_u8 = payload_u8[:, : h0 * w0 * 3].reshape(
                    -1, h0, w0, 3
                )
                depth_scales = jax.lax.bitcast_convert_type(
                    payload_u8[:, h0 * w0 * 3 :], jnp.float32
                ).reshape(-1)
                img = images_u8.astype(jnp.float32)  # (B, h0, w0, 3)
            if (h, w) != src_hw:
                # cv2 resizes the uint8 image (rounding); match it.
                img = jnp.clip(
                    jnp.round(resize_batched(img, (h, w), "area")), 0, 255
                )
            img_in = img
            if pad_h or pad_w:
                img_in = jnp.pad(
                    img,
                    ((0, 0), (pad_h, pad_h), (pad_w, pad_w), (0, 0)),
                    mode="reflect",
                )
            x = preprocess_for_model(
                img_in, (mh, mw), mean=self.pixel_mean, std=self.pixel_std,
                method=self.resize_method,
            )
            if self._pipelined:
                # Microbatches must divide the batch, and each
                # microbatch's rows must still shard over the data axis.
                dp = self.mesh.shape.get("data", 1)
                if batch % dp:
                    raise ValueError(
                        f"batch {batch} must divide the mesh data axis "
                        f"({dp}); submit_batch pads for this"
                    )
                m = max(1, min(self.pipe_microbatches, batch))
                while m > 1 and (batch % m or (batch // m) % dp):
                    m -= 1
                depth = self._pp_apply(
                    self.cfg,
                    params["tree"],
                    params["stages"],
                    x,
                    self.mesh,
                    num_microbatches=m,
                )
            else:
                depth = self.model.apply({"params": params}, x)  # (B, mh, mw)

            if pad_h or pad_w:
                # ZoeDepth post-process: bicubic (align_corners=False)
                # back to padded image size, then crop the pad margins
                # (image_processing_zoedepth.post_process_depth_estimation).
                d4 = resize_batched(depth[..., None], (hp, wp), "bicubic_torch")
                depth = d4[
                    :, pad_h : hp - pad_h, pad_w : wp - pad_w, 0
                ]  # (B, h, w)

            # Point-cloud path: upscale depth to working size, re-normalize,
            # unproject. Refine runs batched AFTER the vmap: the Pallas
            # grid-kNN kernel is natively batched (vmapping a manual-grid
            # pallas_call would shift its program_id axes).
            def normalize_one(d):
                if (dmh, dmw) != (h, w):
                    d = resize_batched(d[None, :, :, None], (h, w), "linear")[
                        0, :, :, 0
                    ]
                dn = normalize_depth(d, opts.invert_depth)
                if opts.smooth_depth:
                    dn = gaussian_blur(dn, _smooth_ksize(opts.smooth_ksize))
                return dn

            dn_all = jax.vmap(normalize_one)(depth)  # (B, h, w)

            # Depth preview: normalize at model resolution (shared with the
            # point path when the sizes coincide), quantize to gray u8;
            # the PLASMA LUT is applied host-side from the 256x3 constant
            # (a 268k-element gather per image is wasted TPU time, and gray
            # transfers 3x less). Oversized previews (never hit by the
            # depth model's <=~700 px outputs) colorize+resize on device to
            # preserve the reference's colorize-then-area-resize order.
            if not preview:
                prev_out = jnp.zeros((1,), jnp.uint8)
            elif (pv_h, pv_w) != (dmh, dmw):
                dn_prev = (
                    dn_all
                    if (dmh, dmw) == (h, w) and not opts.smooth_depth
                    else jax.vmap(
                        lambda d: normalize_depth(d, opts.invert_depth)
                    )(depth)
                )
                prev_rgb = jax.vmap(apply_colormap)(
                    (dn_prev * 255.0).astype(jnp.uint8)
                )
                prev_out = jnp.clip(
                    jnp.round(
                        resize_batched(
                            prev_rgb.astype(jnp.float32), (pv_h, pv_w), "area"
                        )
                    ),
                    0,
                    255,
                ).astype(jnp.uint8)
            else:
                dn_prev = (
                    dn_all
                    if (dmh, dmw) == (h, w) and not opts.smooth_depth
                    else jax.vmap(
                        lambda d: normalize_depth(d, opts.invert_depth)
                    )(depth)
                )
                prev_out = (dn_prev * 255.0).astype(jnp.uint8)  # gray (B,dmh,dmw)
            packed = jax.vmap(
                lambda dn, im, s: unproject(
                    dn, im, depth_scale=s, step=step, h=h, w=w, fov_deg=opts.fov
                )
            )(dn_all, img, depth_scales)
            if opts.refine:
                hh, ww = -(-h // step), -(-w // step)
                if opts.exact_outlier:
                    keep = jax.vmap(
                        lambda pk: statistical_outlier_mask(pk[:3].T)
                    )(packed)
                else:
                    from image_to_pointcloud_tpu.ops.outlier import (
                        grid_knn_mean_distances,
                    )
                    from image_to_pointcloud_tpu.ops.outlier_pallas import (
                        grid_knn_mean_distances_pallas,
                    )

                    grids = packed[:, :3, :].transpose(0, 2, 1).reshape(
                        -1, hh, ww, 3
                    )
                    if jax.default_backend() == "cpu":
                        means = jax.vmap(grid_knn_mean_distances)(grids)
                    else:
                        means = grid_knn_mean_distances_pallas(grids)
                    keep = _outlier_mask_from_means(means)
                packed = jnp.concatenate(
                    [
                        packed[:, :6, :],
                        keep.astype(jnp.float32)[:, None, :],
                        packed[:, 7:, :],
                    ],
                    axis=1,
                )
            if not self.quantized_transfer:
                return packed, prev_out

            # depth16 transfer: the unprojection is a deterministic function
            # of (normalized depth, intrinsics), so only the u16-quantized
            # strided depth and the keep mask cross the (slow) device→host
            # link (~140 KB/image instead of ~2 MB); the host reconstructs
            # points exactly (z error ≤ depth_scale/2¹⁶) and takes colors
            # from its own copy of the input image. When the working image
            # was downscaled on device, the strided RGB rides along too.
            # The keep mask is bit-packed on device (8 points/byte,
            # little-endian bit order — np.unpackbits on the host side):
            # at the relay's ~20-50 MB/s D2H link the bool mask would
            # otherwise cost more transfer time than the depth itself.
            # Everything is then flattened into ONE uint8 row per image
            # [d16 LE bytes | keep bits | optional strided RGB] so collect
            # makes a single device→host transfer — the relay serializes
            # transfers and charges ~25 ms latency per round-trip.
            dn_s = dn_all[:, ::step, ::step]
            bq = dn_s.shape[0]
            keep_mask = packed[:, 6, :] > 0.5
            keep_bits = pack_keep_bits(keep_mask)
            eff_bits = self._depth_codec_bits(dn_s.shape[1], dn_s.shape[2])
            if eff_bits == 8:
                depth_sec = pack_depth8t(dn_s)
            elif eff_bits == 12:
                depth_sec = pack_depth12(dn_s)
            else:
                d16 = jnp.round(dn_s * 65535.0).astype(jnp.uint16)
                depth_sec = jax.lax.bitcast_convert_type(
                    d16, jnp.uint8
                ).reshape(bq, -1)
            payload = [depth_sec, keep_bits]
            if jpeg_spec is not None and jpeg_host_colors:
                # Colors reconstructed host-side from the coefficients
                # (JpegInput.grid_colors): nothing rides along — the
                # bundle is depth + keep bits only (~1/2 the D2H bytes
                # of the ride-along layout at stride 2).
                pass
            elif jpeg_spec is not None:
                # The host never had pixels (hybrid-JPEG mode), so point
                # colors ride back — as 4:2:0 YCbCr, not RGB: the JPEG
                # source stored chroma at half resolution to begin with,
                # and 1.5 bytes/point instead of 3 cuts the largest D2H
                # item ~2x on this rig's serialized link. BT.601
                # full-range forward (exact inverse pair of the host's
                # per-point reconstruction, ties-to-even rounding both
                # sides); chroma takes the top-left sample of each 2x2
                # strided cell, the same cell the host's >>1 gather
                # reads. PARITY.md hybrid-decode deviation covers the
                # +-1-2 level roundtrip + subsample error.
                pix = img[:, ::step, ::step, :]
                r_, g_, b_ = pix[..., 0], pix[..., 1], pix[..., 2]
                yy = 0.299 * r_ + 0.587 * g_ + 0.114 * b_
                cb = (b_ - yy) * jnp.float32(1.0 / 1.772) + 128.0
                cr = (r_ - yy) * jnp.float32(1.0 / 1.402) + 128.0
                to_u8 = lambda p: jnp.clip(  # noqa: E731
                    jnp.round(p), 0, 255
                ).astype(jnp.uint8)
                payload.append(to_u8(yy).reshape(bq, -1))
                payload.append(to_u8(cb[:, ::2, ::2]).reshape(bq, -1))
                payload.append(to_u8(cr[:, ::2, ::2]).reshape(bq, -1))
            elif (h, w) != (h0, w0):
                # Downscaled-on-device pixel mode: the host's copy is
                # the ORIGINAL size, so the working-size colors ride
                # back exactly (u8 RGB).
                rgb_dev = img[:, ::step, ::step, :].astype(jnp.uint8)
                payload.append(rgb_dev.reshape(bq, -1))
            return jnp.concatenate(payload, axis=1), prev_out

        return jax.jit(graph)

    def _get(self, key, builder):
        fn = self._compiled.get(key)
        if fn is None:
            # Serialize builds: concurrent submitters (the pipelined
            # batching queue overlaps dispatch with collect) must share
            # one jitted callable per signature, or each would trigger
            # its own minutes-long remote XLA compile.
            with self._build_lock:
                fn = self._compiled.get(key)
                if fn is None:
                    fn = builder()
                    self._compiled[key] = fn
        return fn

    # ---------- host-facing API ----------

    @staticmethod
    def pack_payload(
        imgs: np.ndarray, depth_scales: np.ndarray
    ) -> np.ndarray:
        """Fuse (B, H, W, 3) u8 images + (B,) f32 scales into the single
        (B, H·W·3+4) u8 H2D buffer the compiled graph consumes (one
        serialized transfer instead of two; ~27 ms relay latency each)."""
        return np.concatenate(
            [
                imgs.reshape(len(imgs), -1),
                np.ascontiguousarray(depth_scales, np.float32)
                .view(np.uint8)
                .reshape(len(imgs), 4),
            ],
            axis=1,
        )

    def compiled_graph(
        self,
        batch: int,
        in_hw: tuple[int, int],
        options: PipelineOptions,
        want_preview: bool,
    ):
        """The compiled callable for one signature (compiling if needed):
        ``fn(params, payload_u8) -> (out, preview)``. Public so benches
        probe the exact serving graph without duplicating the cache key."""
        key = ("depth", batch, in_hw[0], in_hw[1], options, want_preview)
        return self._get(
            key,
            lambda: self._build(in_hw, options, batch, preview=want_preview),
        )

    def compiled_graph_jpeg(
        self,
        batch: int,
        spec,
        options: PipelineOptions,
        want_preview: bool,
        sparse_cap: "tuple[int, int] | None" = None,
        host_colors: bool = False,
    ):
        """Hybrid-ingest variant of :meth:`compiled_graph`; the JpegSpec
        (frozen dataclass) is the shape part of the signature, plus the
        (AC capacity, exception capacity) buckets when the payload is
        nonzero-packed (see :func:`plan_sparse_batch`) and the
        host-colors bundle layout flag."""
        key = ("depth-jpeg", batch, spec, options, want_preview, sparse_cap,
               host_colors)
        return self._get(
            key,
            lambda: self._build(
                (spec.height, spec.width),
                options,
                batch,
                preview=want_preview,
                jpeg_spec=spec,
                jpeg_sparse_cap=sparse_cap,
                jpeg_host_colors=host_colors,
            ),
        )

    @staticmethod
    def pack_jpeg_payload(
        jpegs: "list[JpegInput]", depth_scales: np.ndarray
    ) -> np.ndarray:
        """Fuse entropy-decoded JPEGs + f32 scales into the single
        (B, nbytes) u8 H2D buffer the hybrid graph consumes — same
        one-transfer-per-batch contract as :meth:`pack_payload`."""
        rows = []
        scales = np.ascontiguousarray(depth_scales, np.float32)
        for j, s in zip(jpegs, scales):
            parts = [
                np.ascontiguousarray(c, np.int16).view(np.uint8).ravel()
                for c in j.coeffs
            ]
            parts.append(
                np.ascontiguousarray(j.qtables, np.float32)
                .view(np.uint8)
                .ravel()
            )
            parts.append(s.reshape(1).view(np.uint8))
            rows.append(np.concatenate(parts))
        return np.stack(rows)

    @staticmethod
    def pack_jpeg_sparse_payload(
        jpegs: "list[JpegInput]",
        depth_scales: np.ndarray,
        cap: int,
        exc_cap: int,
    ) -> np.ndarray:
        """Sparse variant of :meth:`pack_jpeg_payload`: one (B, nbytes)
        u8 H2D buffer of blocked split-sparse coefficients
        (ops/jpeg_sparse.py). Section layout (offsets, alignment) comes
        from ``ops.jpeg_sparse.sparse_row_sections`` — the one shared
        definition with the device reader
        (``_unpack_jpeg_sparse_fields``). DC ships as planar lo/hi
        bytes; padding exception slots point at index ``cap`` (the
        device's sacrificial tail entry)."""
        from image_to_pointcloud_tpu.ops.jpeg_sparse import (
            sparse_row_sections,
        )

        sections, rowbytes = sparse_row_sections(jpegs[0].spec, cap, exc_cap)
        out = np.zeros((len(jpegs), rowbytes), np.uint8)
        scales = np.ascontiguousarray(depth_scales, np.float32)

        def put(row, name, data_u8):
            off, size = sections[name]
            # Bounds check BEFORE the write: an oversized field (e.g. a
            # counts/dc/qt length drift vs sparse_row_sections) must not
            # corrupt the next aligned section — and a plain assert would
            # vanish under `python -O`.
            if len(data_u8) > size:
                raise ValueError(
                    f"sparse payload field {name!r}: {len(data_u8)} bytes "
                    f"exceeds its {size}-byte section"
                )
            row[off : off + len(data_u8)] = data_u8

        for row, j, s in zip(out, jpegs, scales):
            counts, dc, pos, val, exc_idx, exc_val = j.sparse()
            if len(pos) > cap:
                raise ValueError(
                    f"nnz {len(pos)} exceeds capacity bucket {cap}"
                )
            if len(exc_idx) > exc_cap:
                raise ValueError(
                    f"nexc {len(exc_idx)} exceeds exception bucket {exc_cap}"
                )
            dcu = np.ascontiguousarray(dc, np.int16).view(np.uint16)
            put(row, "counts", np.ascontiguousarray(counts, np.uint8))
            put(row, "dc_lo", (dcu & 0xFF).astype(np.uint8))
            put(row, "dc_hi", (dcu >> 8).astype(np.uint8))
            put(row, "pos", pos)  # zero-padded to cap by the zeros row
            put(row, "val", val.view(np.uint8))
            pei = np.full(exc_cap, cap, np.int32)
            pei[: len(exc_idx)] = exc_idx
            put(row, "exc_idx", pei.view(np.uint8))
            put(row, "exc_val", np.ascontiguousarray(
                exc_val, np.int16).view(np.uint8))
            put(row, "qt", np.ascontiguousarray(j.qtables, np.float32)
                .view(np.uint8).ravel())
            put(row, "scale", s.reshape(1).view(np.uint8))
        return out

    def select_sparse_caps(self, jpegs: "list[JpegInput]"):
        """(AC, exception) capacity buckets for one hybrid batch with
        the per-spec hysteresis floor applied (and ratcheted up), or
        None when the dense payload wins. The ONE cap chooser — serving
        and the bench probes share it, so a probed graph is always the
        already-compiled product graph, never a duplicate remote
        compile. The read-modify-write of the floor is atomic: with
        pipelined drains (IPC_TPU_DRAIN_DEPTH>1) two concurrent submits
        for one spec could otherwise each read a stale floor, pick
        different caps, and trigger exactly the duplicate minutes-long
        compiles the ratchet exists to prevent."""
        caps = plan_sparse_batch(jpegs)
        if caps is None:
            return None
        spec = jpegs[0].spec
        with self._build_lock:
            floor = self._sparse_caps.get(spec)
            if floor is not None:
                caps = (max(caps[0], floor[0]), max(caps[1], floor[1]))
            self._sparse_caps[spec] = caps
        return caps

    def submit_batch(
        self,
        images_rgb_u8: "np.ndarray | list[np.ndarray]",
        *,
        depth_scales: "np.ndarray | list[float] | float" = 10.0,
        options: PipelineOptions = PipelineOptions(),
        want_preview: bool = True,
    ):
        """Asynchronously dispatch one batch; returns a handle for
        :meth:`collect`. Submitting batch k+1 before collecting batch k
        double-buffers compute against the device→host transfer."""
        imgs = np.stack(images_rgb_u8)
        b, h0, w0 = imgs.shape[:3]
        if np.ndim(depth_scales) == 0:
            # np.ndim, not np.isscalar: a 0-d ndarray must broadcast
            # too, or pack_payload's per-row f32 view fails for b>1.
            depth_scales = np.full((b,), float(depth_scales), np.float32)
        depth_scales = np.asarray(depth_scales, np.float32)
        pad = self._data_pad(b)
        if pad:
            imgs = np.concatenate([imgs, imgs[-1:].repeat(pad, 0)])
            depth_scales = np.concatenate(
                [depth_scales, depth_scales[-1:].repeat(pad)]
            )
        fn = self.compiled_graph(b + pad, (h0, w0), options, want_preview)
        payload = self.pack_payload(imgs, depth_scales)
        out, prev = fn(self.params, self._place_batch(jnp.asarray(payload)))
        h, w = _proc_hw(h0, w0)
        from image_to_pointcloud_tpu.ops.unproject import DENSITY_STRIDES

        step = DENSITY_STRIDES[options.density]
        grid_hw = (-(-h // step), -(-w // step))
        return (
            out, prev, b, grid_hw, imgs, np.asarray(depth_scales),
            options, (h, w), step, want_preview, None,
        )

    def submit_batch_jpeg(
        self,
        jpegs: "list[JpegInput]",
        *,
        depth_scales: "np.ndarray | list[float] | float" = 10.0,
        options: PipelineOptions = PipelineOptions(),
        want_preview: bool = True,
    ):
        """Hybrid-ingest :meth:`submit_batch`: every item must share one
        JpegSpec (serving buckets by spec exactly as pixel items bucket
        by shape). Returns the same handle contract for :meth:`collect`;
        colors always come back from the device (the host never had
        pixels), so the strided-RGB ride-along is guaranteed on."""
        b = len(jpegs)
        if b == 0:
            raise ValueError("empty batch")
        spec = jpegs[0].spec
        if any(j.spec != spec for j in jpegs):
            raise ValueError("submit_batch_jpeg requires one shared JpegSpec")
        if np.ndim(depth_scales) == 0:
            depth_scales = np.full((b,), float(depth_scales), np.float32)
        depth_scales = np.asarray(depth_scales, np.float32)
        pad = self._data_pad(b)
        if pad:
            jpegs = jpegs + [jpegs[-1]] * pad
            depth_scales = np.concatenate(
                [depth_scales, depth_scales[-1:].repeat(pad)]
            )
        h, w = _proc_hw(spec.height, spec.width)
        from image_to_pointcloud_tpu.ops.unproject import DENSITY_STRIDES

        step = DENSITY_STRIDES[options.density]
        # Host-colors mode: every item must reconstruct (one unsupported
        # layout falls the whole batch back to the device ride-along —
        # mixing bundle layouts within a batch would need two graphs).
        # grid_colors is cached: serving/bench planner threads precompute
        # it, so this is a dict hit on the submit path.
        host_rgb = None
        if self.quantized_transfer and self.host_colors_enabled:
            cols = [j.grid_colors(step) for j in jpegs]
            if all(c is not None for c in cols):
                host_rgb = np.stack(cols)
        # Encoding choice: blocked split-sparse wins whenever the
        # batch's capacity buckets ship fewer bytes than the dense
        # int16 grids (photographic content: always; q-100 noise:
        # dense).
        caps = self.select_sparse_caps(jpegs)
        if caps is not None:
            fn = self.compiled_graph_jpeg(
                b + pad, spec, options, want_preview, sparse_cap=caps,
                host_colors=host_rgb is not None,
            )
            payload = self.pack_jpeg_sparse_payload(
                jpegs, depth_scales, *caps
            )
        else:
            fn = self.compiled_graph_jpeg(
                b + pad, spec, options, want_preview,
                host_colors=host_rgb is not None,
            )
            payload = self.pack_jpeg_payload(jpegs, depth_scales)
        out, prev = fn(self.params, self._place_batch(jnp.asarray(payload)))
        grid_hw = (-(-h // step), -(-w // step))
        return (
            out, prev, b, grid_hw, None, np.asarray(depth_scales),
            options, (h, w), step, want_preview, host_rgb,
        )

    def collect(
        self,
        handle,
        *,
        want_preview: bool = True,
        want_packed: bool = True,
        want_preview_rgb: bool = True,
    ) -> list[PipelineResult]:
        """Pull a submitted batch to host and assemble results.

        ``want_preview_rgb=False`` skips the host-side PLASMA LUT over
        the gray preview (a b×518² gather, tens of ms per batch) for
        callers that consume the gray channel directly — the serving
        path renders paletted PNGs from gray (app_v1.py), so the RGB
        materialization there is pure waste."""
        (out, prev, b, grid_hw, imgs, depth_scales, options, (h, w), step,
         had_preview, host_rgb) = handle
        # The graph only computed a preview if submit_batch asked for
        # one; a collect-side want_preview=True against a previewless
        # handle would misread the (1,) placeholder (IndexError for
        # b>1). The handle is authoritative.
        want_preview = want_preview and had_preview
        # Drop mesh data-axis padding rows everywhere (submit_batch may
        # have padded imgs/depth_scales/device outputs to b+pad).
        # imgs is None for hybrid-JPEG handles: the host never decoded
        # pixels, and the graph guarantees has_rgb in that mode.
        if imgs is not None:
            imgs = imgs[:b]
        depth_scales = depth_scales[:b]
        out = jax.tree_util.tree_map(lambda x: x[:b], out)
        prev_np = None
        prev_gray = None
        if want_preview:
            prev_np = np.asarray(prev)[:b]
            if prev_np.ndim == 3:  # gray u8 → PLASMA LUT on host
                prev_gray = prev_np
                if want_preview_rgb:
                    from image_to_pointcloud_tpu.ops.colormap import PLASMA_RGB

                    prev_np = PLASMA_RGB[prev_np]
                else:
                    prev_np = None
        results = []
        if self.quantized_transfer:
            bundle = np.asarray(out)  # one transfer: [depth | keep bits | rgb?]
            hh, ww = grid_hw
            n = hh * ww
            nb = -(-n // 8)
            eff_bits = self._depth_codec_bits(hh, ww)
            if eff_bits == 8:
                dsec = depth8t_section_len(hh, ww)
                denom = 4095.0
                d16 = unpack_depth8t(bundle[:, :dsec], hh, ww)
            elif eff_bits == 12:
                dsec = 3 * (-(-n // 2))
                denom = 4095.0
                d16 = unpack_depth12(bundle[:, :dsec], n).reshape(b, hh, ww)
            else:
                dsec = n * 2
                denom = 65535.0
                d16 = (
                    np.ascontiguousarray(bundle[:, :dsec])
                    .view(np.uint16)
                    .reshape(b, hh, ww)
                )
            keep_all = np.unpackbits(
                np.ascontiguousarray(bundle[:, dsec : dsec + nb]),
                axis=-1,
                bitorder="little",
            )[:, :n].astype(bool)
            has_rgb = bundle.shape[1] > dsec + nb
            # Hybrid-JPEG handles (imgs is None) ride colors back as
            # 4:2:0 YCbCr: [y (n) | cb | cr], chroma at ceil(hh/2) x
            # ceil(ww/2) — unless the host reconstructed them from the
            # coefficients (host_rgb; nothing rides along). Pixel
            # handles ride exact u8 RGB.
            ycc = has_rgb and imgs is None and host_rgb is None
            ch, cw = -(-hh // 2), -(-ww // 2)
            nc = ch * cw
            from image_to_pointcloud_tpu.ops.unproject import focal_length

            f = focal_length(h, w, options.fov)
            cx, cy = w / 2.0, h / 2.0

            if not want_packed:
                # Fast path: fused native dequant+unproject+compact.
                from image_to_pointcloud_tpu import native

                if native.available():
                    if ycc:
                        o = dsec + nb
                        y_pl = bundle[:, o : o + n].reshape(b, hh, ww)
                        cb_pl = bundle[:, o + n : o + n + nc].reshape(
                            b, ch, cw
                        )
                        cr_pl = bundle[:, o + n + nc :].reshape(b, ch, cw)
                        rgb_views = None
                    elif has_rgb:
                        rgb_views = bundle[:, dsec + nb :].reshape(
                            b, hh, ww, 3
                        )
                    elif host_rgb is not None:
                        rgb_views = host_rgb[:b]
                    else:
                        rgb_views = imgs[:, ::step, ::step, :]
                    for i in range(b):
                        if ycc:
                            pts, cols = native.reconstruct_points_ycc420(
                                d16[i],
                                keep_all[i].reshape(hh, ww),
                                y_pl[i],
                                cb_pl[i],
                                cr_pl[i],
                                step=step,
                                depth_scale=float(depth_scales[i]),
                                f=f,
                                cx=cx,
                                cy=cy,
                                denom=denom,
                            )
                        else:
                            pts, cols = native.reconstruct_points(
                                d16[i],
                                keep_all[i].reshape(hh, ww),
                                rgb_views[i],
                                step=step,
                                depth_scale=float(depth_scales[i]),
                                f=f,
                                cx=cx,
                                cy=cy,
                                denom=denom,
                            )
                        results.append(
                            PipelineResult(
                                points=pts,
                                colors=cols,
                                depth_preview_rgb=(
                                    prev_np[i] if prev_np is not None else None
                                ),
                                depth_preview_gray=(
                                    prev_gray[i] if prev_gray is not None else None
                                ),
                                raw_point_count=n,
                                kept_point_count=len(pts),
                                packed=None,
                                grid_hw=grid_hw,
                            )
                        )
                    return results

            if ycc:
                o = dsec + nb
                rgb = ycc420_to_rgb_f32(
                    bundle[:, o : o + n].reshape(b, hh, ww),
                    bundle[:, o + n : o + n + nc].reshape(b, ch, cw),
                    bundle[:, o + n + nc :].reshape(b, ch, cw),
                ).reshape(b, n, 3)
            elif has_rgb:
                rgb = bundle[:, dsec + nb :].reshape(b, n, 3).astype(np.float32)
            elif host_rgb is not None:
                rgb = host_rgb[:b].reshape(b, n, 3).astype(np.float32)
            else:
                rgb = (
                    imgs[:, ::step, ::step, :]
                    .reshape(b, n, 3)
                    .astype(np.float32)
                )

            xyz = depth16_to_xyz(
                d16, depth_scales, step=step, f=f, cx=cx, cy=cy, denom=denom
            )
            for i in range(b):
                keep = keep_all[i]
                packed = None
                if want_packed:
                    packed = np.concatenate(
                        [
                            xyz[i],
                            rgb[i].T,
                            keep[None].astype(np.float32),
                            np.zeros((1, n), np.float32),
                        ],
                        axis=0,
                    )
                results.append(
                    PipelineResult(
                        points=np.ascontiguousarray(xyz[i].T[keep]),
                        colors=np.ascontiguousarray(rgb[i][keep]),
                        depth_preview_rgb=prev_np[i] if prev_np is not None else None,
                        depth_preview_gray=(
                            prev_gray[i] if prev_gray is not None else None
                        ),
                        raw_point_count=n,
                        kept_point_count=int(keep.sum()),
                        packed=packed,
                        grid_hw=grid_hw,
                    )
                )
            return results

        packed_all = np.asarray(out)
        for i in range(b):
            keep = packed_all[i, 6] > 0.5
            results.append(
                PipelineResult(
                    points=np.ascontiguousarray(packed_all[i, :3].T[keep]),
                    colors=np.ascontiguousarray(packed_all[i, 3:6].T[keep]),
                    depth_preview_rgb=prev_np[i] if prev_np is not None else None,
                    depth_preview_gray=(
                        prev_gray[i] if prev_gray is not None else None
                    ),
                    raw_point_count=packed_all.shape[2],
                    kept_point_count=int(keep.sum()),
                    packed=packed_all[i] if want_packed else None,
                    grid_hw=grid_hw,
                )
            )
        return results

    def run_batch(
        self,
        images_rgb_u8: "np.ndarray | list[np.ndarray]",
        *,
        depth_scales: "np.ndarray | list[float] | float" = 10.0,
        options: PipelineOptions = PipelineOptions(),
        want_preview: bool = True,
        want_packed: bool = True,
    ) -> list[PipelineResult]:
        """Run the fused pipeline on a batch of same-size RGB uint8 images."""
        handle = self.submit_batch(
            images_rgb_u8,
            depth_scales=depth_scales,
            options=options,
            want_preview=want_preview,
        )
        return self.collect(
            handle, want_preview=want_preview, want_packed=want_packed
        )

    def run(
        self,
        image_rgb_u8: np.ndarray,
        *,
        depth_scale: float = 10.0,
        options: PipelineOptions = PipelineOptions(),
        want_preview: bool = True,
    ) -> PipelineResult:
        """Run the fused pipeline on one decoded RGB uint8 image."""
        return self.run_batch(
            image_rgb_u8[None],
            depth_scales=depth_scale,
            options=options,
            want_preview=want_preview,
        )[0]

    def run_jpeg(
        self,
        jpeg: "JpegInput",
        *,
        depth_scale: float = 10.0,
        options: PipelineOptions = PipelineOptions(),
        want_preview: bool = True,
        want_packed: bool = True,
    ) -> PipelineResult:
        """Run the fused pipeline on one entropy-decoded JPEG (hybrid
        device-decode ingest; see :func:`plan_jpeg_input`)."""
        handle = self.submit_batch_jpeg(
            [jpeg],
            depth_scales=depth_scale,
            options=options,
            want_preview=want_preview,
        )
        return self.collect(
            handle, want_preview=want_preview, want_packed=want_packed
        )[0]


# ---------- dummy-model graphs (reference backend/app.py:567-607) ----------

_DUMMY_STRIDES = {"low": 8, "medium": 4, "high": 2}

# cv2 BGR→GRAY weights (reference backend/app.py:578 uses cvtColor).
_GRAY_W = (0.299, 0.587, 0.114)  # R, G, B


@functools.partial(jax.jit, static_argnames=("step", "h", "w"))
def _dummy_graph(image_u8_rgb, *, step: int, h: int, w: int):
    img = image_u8_rgb.astype(jnp.float32)
    sub = img[::step, ::step, :]
    # cv2 BGR2GRAY on uint8 rounds to the nearest integer.
    gray = jnp.round(
        sub[:, :, 0] * _GRAY_W[0] + sub[:, :, 1] * _GRAY_W[1] + sub[:, :, 2] * _GRAY_W[2]
    )
    z = (255.0 - gray) / 255.0 * 5.0
    u = jax.lax.broadcasted_iota(jnp.float32, z.shape, 1) * step
    v = jax.lax.broadcasted_iota(jnp.float32, z.shape, 0) * step
    x = (u - w / 2.0) / 100.0
    y = (v - h / 2.0) / 100.0
    n = z.shape[0] * z.shape[1]
    pts = jnp.stack([x.reshape(n), y.reshape(n), z.reshape(n)], axis=1)
    cols = sub.reshape(n, 3)
    return pts, cols


def dummy_point_cloud_graph(
    image_rgb_u8: np.ndarray, density: str
) -> tuple[np.ndarray, np.ndarray]:
    """Intensity-as-depth fallback for unsupported models
    (reference backend/app.py:567-587)."""
    h, w = image_rgb_u8.shape[:2]
    step = _DUMMY_STRIDES[density]
    pts, cols = _dummy_graph(jnp.asarray(image_rgb_u8), step=step, h=h, w=w)
    return np.asarray(pts), np.asarray(cols)


@functools.partial(jax.jit, static_argnames=())
def demo_depth_map_graph(image_u8_rgb):
    """Fake depth-map preview for unsupported models
    (reference backend/app.py:589-607): gray → 15×15 blur → inverted PLASMA."""
    img = image_u8_rgb.astype(jnp.float32)
    gray = jnp.round(
        img[:, :, 0] * _GRAY_W[0] + img[:, :, 1] * _GRAY_W[1] + img[:, :, 2] * _GRAY_W[2]
    )
    blurred = jnp.round(gaussian_blur(gray, 15))
    inv = (255.0 - blurred).astype(jnp.uint8)
    return apply_colormap(inv)
