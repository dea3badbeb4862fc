"""Sparse packing of entropy-decoded JPEG coefficients for the hybrid
ingest H2D payload.

Quantized DCT coefficients are mostly zero (that is why JPEG works:
typically 80-95% of the post-quantization values in a photographic
image are 0). The dense hybrid payload (ops/jpeg.py) ships every
coefficient as int16, which only beats raw pixels for scaled decodes
(k<8). This module ships only the nonzeros, blocked, with the value
stream split by coefficient class (the "DC/AC split"):

- one uint8 **count** per 8x8 block (AC nonzeros in that block),
- one int16 **DC** per block, dense (DC is the block mean: it is
  nearly always nonzero, and after Huffman DIFF undoing its magnitude
  routinely exceeds int8 — so it ships dense and wide),
- one uint8 **position** (row-major index within the k x k truncated
  block, 1..k^2-1) per AC nonzero,
- one int8 **value** per AC nonzero — quantized AC magnitudes are
  small by construction (the quantization table's whole job), so int8
  covers photographic content outright,
- a tiny **exception** side channel ((int32 slot, int16 value) pairs)
  for the rare AC values outside int8 range, e.g. low-frequency
  coefficients of synthetic high-contrast content at high quality.

That is 2 bytes per AC nonzero + 3 bytes per block + padding buckets —
~3.5-8x fewer H2D bytes than the raw pixels the payload replaces (and
~28% fewer than the previous 3-bytes-per-nonzero layout), *at every
scale k including k=8 full resolution*. On this rig the serialized
~100 MB/s H2D link is the end-to-end bottleneck
(benchmarks/RESULTS.md), so payload bytes convert directly into
throughput.

Device side, block ids rematerialize from the counts with a sorted
scatter-add of block starts into a slot indicator plus one cumsum
(XLA-friendly: no dynamic shapes, no binary search — ``searchsorted``
lowers to a gather cascade that measured ~90% of the decode subgraph
on TPU), the flat index is ``block * k^2 + position``, a single sorted
1-D scatter rebuilds the AC slots of the dense coefficient grids, and
one column write drops the dense DC stream into position 0 of every
block — bit-identical to the dense payload's grids
(tests/test_jpeg_sparse.py), feeding the exact same dequant +
scaled-IDCT + color path (ops/jpeg.py `_decode_planes`).

Reference behavior replaced: the host-side ``cv2.imdecode`` of uploads
(reference backend/app.py:433); the fidelity notes in ops/jpeg.py
apply unchanged.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "block_pack",
    "capacity_bucket",
    "coeff_layout",
    "exception_bucket",
    "gather_from_blocks",
    "scatter_from_blocks",
    "sparse_payload_bytes",
    "sparse_row_sections",
]

_MIN_CAPACITY = 1024
_MIN_EXC_CAPACITY = 16

# Section alignment of the sparse H2D row (bytes). 512 = 4·128 lanes:
# every section slice starts on a TPU lane-tile boundary (no lane
# rotation when XLA slices the row) and every multi-byte bitcast is
# width-aligned. Costs ≤ 8·511 B padding per ~200 KB row (~2%);
# unaligned slice starts measured as the single largest stage of the
# device decode subgraph (benchmarks/jpeg_stage_ablation.py).
_ROW_ALIGN = 512


def sparse_row_sections(
    spec, cap: int, exc_cap: int
) -> tuple[dict[str, tuple[int, int]], int]:
    """Byte layout of one split-sparse H2D payload row: name →
    (offset, size), plus the total row size. ONE definition —
    ``DepthPipeline.pack_jpeg_sparse_payload`` (host writer) and
    ``pipeline.graph._unpack_jpeg_sparse_batch`` (device reader) both
    consume this, so they cannot drift.

    Wide fields ship as separate byte planes (``dc_lo``/``dc_hi``)
    rather than interleaved LE pairs: a (B, n, 2)→int16 bitcast forces
    XLA to relayout the slice into a 2-lane minor dim first, which is
    the worst possible TPU tiling; two planar slices widen with pure
    elementwise ops instead."""
    k2 = spec.k * spec.k
    sizes, total = coeff_layout(spec)
    nblocks = total // k2
    order = [
        ("counts", nblocks),  # u8 AC count per block
        ("dc_lo", nblocks),  # low byte of the dense i16 DC plane
        ("dc_hi", nblocks),  # high (signed) byte of the DC plane
        ("pos", cap),  # u8 in-block AC position per slot
        ("val", cap),  # i8 AC value per slot
        ("exc_idx", 4 * exc_cap),  # i32 LE exception slots
        ("exc_val", 2 * exc_cap),  # i16 LE exception values
        ("qt", spec.ncomp * 64 * 4),  # f32 natural-order quant tables
        ("scale", 4),  # f32 per-image depth scale
    ]
    sections: dict[str, tuple[int, int]] = {}
    off = 0
    for name, size in order:
        off = -(-off // _ROW_ALIGN) * _ROW_ALIGN
        sections[name] = (off, size)
        off += size
    return sections, off


def coeff_layout(spec) -> tuple[tuple[int, ...], int]:
    """Per-component flattened coefficient counts (BH*BW*k*k) and their
    sum — the shared flat index space of the sparse encoding. Every
    component contributes ``blocks * k^2`` slots in pack order."""
    k = spec.k
    sizes = []
    for c in range(spec.ncomp):
        bh, bw = spec.block_grid(c)
        sizes.append(bh * bw * k * k)
    return tuple(sizes), int(sum(sizes))


def block_pack(
    coeffs: "list[np.ndarray]",
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray,
           np.ndarray]:
    """Truncated host coefficients (per-component (BH, BW, k, k) int16,
    the same arrays the dense payload ships) -> (counts u8, dc i16,
    pos u8, val i8, exc_idx i32, exc_val i16).

    Blocks number consecutively across components in pack order; DC
    (in-block position 0) ships dense in ``dc``; AC positions are
    row-major within each k x k block (1..k^2-1); AC nonzeros appear in
    flat-index order (sorted), which the device scatter exploits.
    ``val`` holds the wrapped int8 image of each AC value; entries
    outside int8 range are listed in (exc_idx, exc_val) — indices into
    the ``val``/``pos`` streams, ascending — and overwrite the wrapped
    byte device-side.

    The hot loop lives in C++ (native.jpeg_sparse_pack, one pass over
    the blocks) — on the 1-core host the numpy pack below was ~37% of
    per-image JPEG planning time. The numpy implementation remains as
    the no-toolchain fallback and as the oracle the native pack is
    tested against (tests/test_jpeg_sparse.py)."""
    from image_to_pointcloud_tpu import native

    packed = native.jpeg_sparse_pack(coeffs)
    if packed is not None:
        return packed
    return _block_pack_numpy(coeffs)


def _block_pack_numpy(
    coeffs: "list[np.ndarray]",
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray,
           np.ndarray]:
    """Pure-numpy reference implementation of :func:`block_pack`."""
    counts = []
    dcs = []
    poss = []
    vals = []
    for c in coeffs:
        k2 = c.shape[2] * c.shape[3]
        flat = np.ascontiguousarray(c, np.int16).reshape(-1, k2)
        dcs.append(flat[:, 0])
        if k2 == 1:  # k=1 blocks are DC-only
            counts.append(np.zeros(flat.shape[0], np.uint8))
            continue
        ac = flat[:, 1:]
        nz = np.flatnonzero(ac)
        counts.append(np.count_nonzero(ac, axis=1).astype(np.uint8))
        poss.append((nz % (k2 - 1) + 1).astype(np.uint8))
        vals.append(ac.reshape(-1)[nz])
    val = (
        np.concatenate(vals) if vals else np.zeros(0, np.int16)
    ).astype(np.int16, copy=False)
    wide = np.flatnonzero((val < -128) | (val > 127))
    return (
        np.concatenate(counts),
        np.concatenate(dcs).astype(np.int16, copy=False),
        (np.concatenate(poss) if poss else np.zeros(0, np.uint8)),
        val.astype(np.int8),  # wraps wide entries; exceptions overwrite
        wide.astype(np.int32),
        val[wide],
    )


def capacity_bucket(nnz: int, total: int) -> int:
    """Padding bucket for an AC nonzero count. Every distinct capacity
    is a distinct compile (like the serving batcher's batch-size
    buckets), so small counts use coarse powers-of-two-plus-midpoint
    steps; above 16384 the bucket is the next multiple of 8192 —
    bounding padding to 8191 slots (≤16 KB of H2D bytes) where the
    x1.5 scheme wasted up to a third of the payload (measured 50 KB/img
    on q88 518² photos: nnz ~73k padded to 98304). Capped at the dense
    size."""
    if nnz > 16384:
        return min(-(-nnz // 8192) * 8192, total)
    cap = _MIN_CAPACITY
    while cap < nnz:
        if cap + cap // 2 >= nnz:
            cap += cap // 2
            break
        cap *= 2
    return min(cap, total)


def exception_bucket(nexc: int) -> int:
    """Padding bucket for the exception side channel: x4 steps from a
    16-entry floor. Photographic content has zero exceptions, so the
    floor (96 payload bytes) keeps one compiled signature for the
    common case; coarse steps bound the signature count for synthetic
    content without letting 6-byte entries balloon the row."""
    cap = _MIN_EXC_CAPACITY
    while cap < nexc:
        cap *= 4
    return cap


def sparse_payload_bytes(
    nnz_ac: int, nexc: int, total: int, block: int = 64
) -> int:
    """H2D bytes per image for a split sparse row at the given buckets:
    u8 position + i8 value per AC slot, u8 count + i16 DC per block,
    6 bytes per exception slot (qtables/scale overhead excluded; it is
    shared with the dense layout). ``block`` is the per-block slot
    count k*k — the default 64 is the full-scale k=8 layout; pass k*k
    for scaled-decode (k<8) specs or the per-block bytes are
    understated."""
    return (
        2 * capacity_bucket(nnz_ac, total)
        + 3 * (total // block)
        + 6 * exception_bucket(nexc)
        # Worst-case section-alignment padding (sparse_row_sections).
        + 8 * _ROW_ALIGN
    )


def scatter_from_blocks(counts, dc, pos, val, exc_idx, exc_val, spec):
    """Device half: ((nblocks,) int32 AC counts, (nblocks,) int16 DC,
    (cap,) int32 in-block positions, (cap,) int8 AC values,
    (ecap,) int32 exception slots, (ecap,) int16 exception values) ->
    per-component (BH, BW, k, k) int16 grids, bit-identical to the
    dense payload's.

    Slot -> block recovery: block starts (exclusive cumsum of counts)
    scatter-add +1 into a per-slot indicator, whose inclusive cumsum at
    slot ``s`` counts the blocks starting at or before ``s``; minus one
    that is exactly the block owning ``s`` (empty blocks share their
    successor's start and therefore never capture a slot; block 0
    always starts at 0, so the id is never negative). Both the scatter
    and the cumsum are O(cap) with tiny constants — replacing
    ``searchsorted``, whose gather cascade dominated the whole decode
    subgraph on TPU (benchmarks/RESULTS.md).

    The int8 AC stream widens to int16 and the exception pairs
    overwrite their wrapped slots through a sacrificial tail entry
    (pad exceptions point at index ``cap``). Padding AC slots (beyond
    the nonzero total) route to a sacrificial dense slot that the
    per-component slices never read; all pads write the same slot so
    scatter order cannot matter. DC lands last via one column write on
    the (nblocks, k^2) view — position 0 of every block."""
    sizes, total = coeff_layout(spec)
    k2 = spec.k * spec.k
    counts = counts.astype(jnp.int32)
    nnz = jnp.sum(counts)
    starts = jnp.cumsum(counts) - counts
    slot = jnp.arange(pos.shape[0], dtype=jnp.int32)
    indicator = (
        jnp.zeros(pos.shape[0], jnp.int32)
        .at[starts]
        .add(1, indices_are_sorted=True, mode="drop")
    )
    block = jnp.cumsum(indicator) - 1
    flat = block * k2 + pos
    flat = jnp.where(slot < nnz, flat, total)
    val16 = jnp.concatenate(
        [val.astype(jnp.int16), jnp.zeros((1,), jnp.int16)]
    )
    val16 = val16.at[exc_idx].set(
        exc_val, indices_are_sorted=True, mode="drop"
    )[:-1]
    dense = (
        jnp.zeros(total + 1, jnp.int16)
        .at[flat]
        .set(val16, indices_are_sorted=True, mode="drop")
    )
    grids = (
        dense[:total]
        .reshape(total // k2, k2)
        .at[:, 0]
        .set(dc.astype(jnp.int16))
        .reshape(-1)
    )
    out = []
    off = 0
    for c in range(spec.ncomp):
        bh, bw = spec.block_grid(c)
        n = sizes[c]
        out.append(grids[off : off + n].reshape(bh, bw, spec.k, spec.k))
        off += n
    return tuple(out)


def gather_from_blocks(counts, dc, pos, val, exc_idx, exc_val, spec):
    """Gather/MXU formulation of :func:`scatter_from_blocks` — same
    inputs, bit-identical per-component grids (oracle-tested; the A/B
    knob ``IPC_TPU_JPEG_GATHER=1`` selects it in the pipeline graph).

    Large scatters are the TPU's weakest memory op (serialized updates
    through the scalar path); this variant replaces the 1-D scatter
    over the full ~``total``-slot coefficient space with regular
    reads + one matmul. Per block, the AC slots live at
    ``[starts[b], starts[b]+counts[b])`` with strictly ascending
    in-block positions, so a fixed ``(nblocks, k²-1)`` window gather
    pulls each block's positions/values (pads clamped to a sacrificial
    tail slot carrying pos=0/val=0), and the dense grid is one one-hot
    contraction ``dense[b, p] = Σ_w val[b, w]·[pos[b, w] == p]`` —
    ``nblocks·(k²-1)·k²`` MACs (~26 M for a 518² 4:2:0 image, noise
    for the MXU), exact in f32 (int16 values; one-hot rows sum ≤1
    term per output). The wide-value exceptions still use the stream
    overwrite (a ≤``ecap``-element scatter — noise next to the
    ~``total``-element one this removes), and DC joins by column
    concatenation, not an update."""
    sizes, total = coeff_layout(spec)
    k2 = spec.k * spec.k
    counts = counts.astype(jnp.int32)
    if k2 == 1:  # k=1: DC-only blocks, nothing sparse to place.
        grids = dc.astype(jnp.int16)
    else:
        starts = jnp.cumsum(counts) - counts  # (nblocks,)
        cap = pos.shape[0]
        w = jnp.arange(k2 - 1, dtype=jnp.int32)[None, :]
        valid = w < counts[:, None]  # (nblocks, k2-1)
        win = jnp.where(valid, starts[:, None] + w, cap)
        # Streams padded with one sacrificial tail slot; exceptions
        # overwrite their wrapped int8 image exactly as in the scatter
        # variant (pad exceptions point at index cap → the tail).
        posp = jnp.concatenate(
            [pos.astype(jnp.int32), jnp.zeros((1,), jnp.int32)]
        )
        valp = jnp.concatenate(
            [val.astype(jnp.int16), jnp.zeros((1,), jnp.int16)]
        )
        valp = valp.at[exc_idx].set(
            exc_val, indices_are_sorted=True, mode="drop"
        )
        pw = posp[win]  # (nblocks, k2-1) gathers
        vw = jnp.where(valid, valp[win], 0)
        onehot = (
            pw[:, :, None] == jnp.arange(1, k2)[None, None, :]
        ).astype(jnp.float32)  # (nblocks, k2-1, k2-1) — AC columns only
        ac = jax.lax.dot_general(
            vw.astype(jnp.float32)[:, None, :],  # (nb, 1, W)
            onehot,
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )[:, 0, :]
        grids = jnp.concatenate(
            [dc.astype(jnp.int16)[:, None], ac.astype(jnp.int16)], axis=1
        ).reshape(-1)
    out = []
    off = 0
    for c in range(spec.ncomp):
        bh, bw = spec.block_grid(c)
        n = sizes[c]
        out.append(grids[off : off + n].reshape(bh, bw, spec.k, spec.k))
        off += n
    return tuple(out)
