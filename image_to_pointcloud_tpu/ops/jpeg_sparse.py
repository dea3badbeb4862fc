"""Sparse packing of entropy-decoded JPEG coefficients for the hybrid
ingest H2D payload.

Quantized DCT coefficients are mostly zero (that is why JPEG works:
typically 80-95% of the post-quantization values in a photographic
image are 0). The dense hybrid payload (ops/jpeg.py) ships every
coefficient as int16, which only beats raw pixels for scaled decodes
(k<8). This module ships only the nonzeros, blocked:

- one uint8 **count** per 8x8 block (nonzeros in that block),
- one uint8 **position** (row-major index within the k x k truncated
  block, < 64) per nonzero,
- one int16 **value** per nonzero,

i.e. 3 bytes per nonzero + 1 byte per block + a padding bucket. For a
quality-85 photo that is ~2.5-6x fewer H2D bytes than the raw pixels
the payload replaces, *at every scale k including k=8 full
resolution* — which extends the hybrid ingest from "only images the
reference would downscale" (ops/jpeg.py `plan_scale`) to every JPEG
upload. On this rig the serialized ~100 MB/s H2D link is the
end-to-end bottleneck (benchmarks/RESULTS.md), so payload bytes
convert directly into throughput.

Device side, block ids rematerialize from the counts with a sorted
scatter-add of block starts into a slot indicator plus one cumsum
(XLA-friendly: no dynamic shapes, no binary search — ``searchsorted``
lowers to a gather cascade that measured ~90% of the decode subgraph
on TPU), the flat index is ``block * k^2 + position``, and a single
sorted 1-D scatter rebuilds the dense coefficient grids —
bit-identical to the dense payload's (tests/test_jpeg_sparse.py),
feeding the exact same dequant + scaled-IDCT + color path
(ops/jpeg.py `_decode_planes`).

Reference behavior replaced: the host-side ``cv2.imdecode`` of uploads
(reference backend/app.py:433); the fidelity notes in ops/jpeg.py
apply unchanged.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = [
    "block_pack",
    "capacity_bucket",
    "coeff_layout",
    "scatter_from_blocks",
    "sparse_payload_bytes",
]

_MIN_CAPACITY = 1024


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
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Truncated host coefficients (per-component (BH, BW, k, k) int16,
    the same arrays the dense payload ships) -> (counts u8, pos u8,
    val i16). Blocks number consecutively across components in pack
    order; positions are row-major within each k x k block; nonzeros
    appear in flat-index order (sorted), which the device scatter
    exploits."""
    counts = []
    poss = []
    vals = []
    for c in coeffs:
        k2 = c.shape[2] * c.shape[3]
        flat = np.ascontiguousarray(c, np.int16).reshape(-1, k2)
        nz = np.flatnonzero(flat)
        counts.append(
            np.count_nonzero(flat, axis=1).astype(np.uint8)
        )
        poss.append((nz % k2).astype(np.uint8))
        vals.append(flat.reshape(-1)[nz])
    return np.concatenate(counts), np.concatenate(poss), np.concatenate(vals)


def capacity_bucket(nnz: int, total: int) -> int:
    """Padding bucket for a nonzero count: powers of two plus one
    midpoint step (x1.5), so padding waste stays under ~33% while the
    number of distinct compiled signatures stays small (every distinct
    capacity is a distinct compile, exactly like the serving batcher's
    batch-size buckets). Capped at the dense size."""
    cap = _MIN_CAPACITY
    while cap < nnz:
        if cap + cap // 2 >= nnz:
            cap += cap // 2
            break
        cap *= 2
    return min(cap, total)


def sparse_payload_bytes(nnz: int, total: int, block: int = 64) -> int:
    """H2D bytes per image for a sparse row at ``nnz``'s bucket: u8
    position + i16 value per slot, u8 count per block (qtables/scale
    overhead excluded; it is shared with the dense layout). ``block``
    is the per-block slot count k*k — the default 64 is the full-scale
    k=8 layout; pass k*k for scaled-decode (k<8) specs or the count
    bytes are understated."""
    return 3 * capacity_bucket(nnz, total) + total // block


def scatter_from_blocks(counts, pos, val, spec):
    """Device half: ((nblocks,) int32 counts, (cap,) int32 in-block
    positions, (cap,) int16 values) -> per-component (BH, BW, k, k)
    int16 grids, bit-identical to the dense payload's.

    Slot -> block recovery: block starts (exclusive cumsum of counts)
    scatter-add +1 into a per-slot indicator, whose inclusive cumsum at
    slot ``s`` counts the blocks starting at or before ``s``; minus one
    that is exactly the block owning ``s`` (empty blocks share their
    successor's start and therefore never capture a slot; block 0
    always starts at 0, so the id is never negative). Both the scatter
    and the cumsum are O(cap) with tiny constants — replacing
    ``searchsorted``, whose gather cascade dominated the whole decode
    subgraph on TPU (benchmarks/RESULTS.md). Padding slots (beyond the
    nonzero total) route to a sacrificial tail slot that the
    per-component slices never read; all pads write the same slot so
    scatter order cannot matter."""
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
    dense = (
        jnp.zeros(total + 1, jnp.int16)
        .at[flat]
        .set(val, indices_are_sorted=True, mode="drop")
    )
    out = []
    off = 0
    for c in range(spec.ncomp):
        bh, bw = spec.block_grid(c)
        n = sizes[c]
        out.append(dense[off : off + n].reshape(bh, bw, spec.k, spec.k))
        off += n
    return tuple(out)
