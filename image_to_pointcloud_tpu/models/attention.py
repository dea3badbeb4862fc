"""Attention: Pallas flash-attention TPU kernel with a fused XLA fallback.

The ViT encoder's attention is the dominant HBM-traffic term of the depth
network at 518² (sequence length 1370 → a materialized (B·H, N, N) score
tensor is hundreds of MB). The Pallas kernel streams K/V blocks through
VMEM with an online-softmax accumulator so scores never touch HBM —
standard flash-attention, shaped for the MXU (128-aligned tiles, bf16
inputs, f32 accumulation).

The reference has no analogue (its torch ViT materializes attention on
CPU, backend/app.py:111-113); this kernel is where the TPU rebuild buys
its throughput headroom.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["multi_head_attention", "flash_attention"]


def _attention_xla(q, k, v, scale):
    """Plain fused-by-XLA attention; reference implementation and fallback.

    The (B, H, N, N) score tensor is the depth net's dominant HBM term at
    518² (N=1370: 721 MB/layer in f32 at batch 16, written once and read
    twice by XLA's two-pass softmax fusions — profiled memory-bound at
    ~730 GB/s, benchmarks/mfu_profile.py). Scores are therefore STORED at
    the input precision (bf16 on TPU — halves that traffic; f32 inputs
    are unchanged, so the CPU parity suite sees identical math) while the
    softmax statistics and normalization still accumulate in f32.
    """
    logits = (
        jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
        * scale
    ).astype(q.dtype)
    m = jnp.max(logits.astype(jnp.float32), axis=-1, keepdims=True)
    p = jnp.exp(logits.astype(jnp.float32) - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    probs = (p / l).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v, preferred_element_type=jnp.float32)


def _flash_kernel_packed(
    q_ref, k_ref, v_ref, len_ref, o_ref, *, scale, block_k, kv_len, pack
):
    """One program: ``pack`` heads' (block_q, d) query tiles vs their
    K/V streams.

    Why pack heads: at d_head=64 each dot uses half the 128-wide MXU
    contraction/output lanes, and the serial path measured ~15% MXU —
    the array idles through every VPU softmax phase (exp/max/sum over
    the (block_q, block_k) tile). The ``pack`` heads are fully
    independent, so Mosaic can issue head B's dots while head A's
    softmax runs on the VPU — instruction-level parallelism that fills
    the MXU without changing any per-head math (outputs are
    bit-identical to the unpacked kernel; the loop-carried state is
    simply ``pack`` copies).

    MXU dtype discipline (round-4 lesson): both dots run in the INPUT
    dtype (bf16 on TPU, 4× the f32 MXU rate) with f32 accumulation via
    ``preferred_element_type`` — upcasting q/k/v to f32 before the dots
    quartered the matmul rate and lost the A/B vs XLA's (HBM-bound)
    materialized path. The scale, softmax and online-softmax state all
    stay f32."""
    n_valid = len_ref[0]
    qs = [q_ref[p] for p in range(pack)]  # each (block_q, d)
    block_q, d = qs[0].shape
    ms = [jnp.full((block_q, 1), -jnp.inf, jnp.float32) for _ in range(pack)]
    ls = [jnp.zeros((block_q, 1), jnp.float32) for _ in range(pack)]
    accs = [jnp.zeros((block_q, d), jnp.float32) for _ in range(pack)]

    def body(i, carry):
        ms, ls, accs = carry
        col = None
        out_m, out_l, out_a = [], [], []
        for p in range(pack):
            k = k_ref[p, pl.ds(i * block_k, block_k), :]
            v = v_ref[p, pl.ds(i * block_k, block_k), :]
            s = jnp.dot(qs[p], k.T, preferred_element_type=jnp.float32) * scale
            if col is None:
                col = (
                    jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
                    + i * block_k
                )
            s = jnp.where(col < n_valid, s, -jnp.inf)
            m_new = jnp.maximum(ms[p], jnp.max(s, axis=1, keepdims=True))
            pr = jnp.exp(s - m_new)
            correction = jnp.exp(ms[p] - m_new)
            out_m.append(m_new)
            out_l.append(
                ls[p] * correction + jnp.sum(pr, axis=1, keepdims=True)
            )
            out_a.append(
                accs[p] * correction
                + jnp.dot(
                    pr.astype(v.dtype), v, preferred_element_type=jnp.float32
                )
            )
        return out_m, out_l, out_a

    ms, ls, accs = jax.lax.fori_loop(
        0, kv_len // block_k, body, (ms, ls, accs)
    )
    for p in range(pack):
        o_ref[p] = (accs[p] / ls[p]).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("block_q", "block_k", "interpret", "head_pack")
)
def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    block_q: "int | None" = None,
    block_k: "int | None" = None,
    interpret: bool = False,
    head_pack: int = 2,
) -> jax.Array:
    """Flash attention over (B, H, N, D) tensors (full bidirectional).

    N is padded to the tile size internally; padded keys are masked out of
    the softmax, padded queries are discarded on return. ``head_pack``
    processes that many (batch·head) slices per program — independent
    work that lets Mosaic fill the MXU during VPU softmax phases (see
    ``_flash_kernel_packed``); it must divide B·H and is math-identical
    at any value.

    Default blocks come from the round-5 on-chip sweep at the flagship
    shape (B·H=96, N=1370→1536, D=64; benchmarks/RESULTS.md
    2026-08-21): (512, 1536) with head_pack=2 ran 1.35 ms vs 2.53 ms
    for the round-4 (256, 256) default and 2.03 ms for XLA's fused
    path — streaming the whole padded K/V as ONE k-block removes every
    online-softmax correction pass, and the wide q-tile amortizes the
    d=64 half-width dots. Shorter admitted sequences (N < 1200) keep
    512-wide k-blocks so the lcm padding never inflates their K/V
    stream by more than a tile.
    """
    b, h, n, d = q.shape
    if block_q is None:
        block_q = 512
    if block_k is None:
        block_k = 1536 if n >= 1200 else 512
    scale = 1.0 / math.sqrt(d)
    # Pad to a multiple of BOTH tile sizes: the query grid divides by
    # block_q and the K/V stream by block_k — max() alone silently
    # dropped tail query tiles whenever block_q didn't divide the
    # padded length (e.g. block_q=96, block_k=128, n=500).
    tile = math.lcm(block_q, block_k)
    n_pad = -(-n // tile) * tile

    def pad(x):
        if n_pad == n:
            return x
        return jnp.pad(x, ((0, 0), (0, 0), (0, n_pad - n), (0, 0)))

    qp, kp, vp = pad(q), pad(k), pad(v)
    bh = b * h
    if bh % head_pack != 0:
        head_pack = 1
    qp = qp.reshape(bh, n_pad, d)
    kp = kp.reshape(bh, n_pad, d)
    vp = vp.reshape(bh, n_pad, d)
    lens = jnp.full((1,), n, jnp.int32)

    grid = (bh // head_pack, n_pad // block_q)
    out = pl.pallas_call(
        functools.partial(
            _flash_kernel_packed,
            scale=scale,
            block_k=block_k,
            kv_len=n_pad,
            pack=head_pack,
        ),
        out_shape=jax.ShapeDtypeStruct((bh, n_pad, d), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (head_pack, block_q, d),
                lambda i, j: (i, j, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (head_pack, n_pad, d),
                lambda i, j: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (head_pack, n_pad, d),
                lambda i, j: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (head_pack, block_q, d),
            lambda i, j: (i, j, 0),
            memory_space=pltpu.VMEM,
        ),
        interpret=interpret,
    )(qp, kp, vp, lens)
    return out.reshape(b, h, n_pad, d)[:, :, :n, :]


def multi_head_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    num_heads: int,
    use_flash: bool = False,
    interpret: bool = False,
) -> jax.Array:
    """(B, N, D) projected q/k/v → attention output (B, N, D)."""
    b, n, dm = q.shape
    dh = dm // num_heads

    def split(x):
        return x.reshape(b, n, num_heads, dh).transpose(0, 2, 1, 3)

    qh, kh, vh = split(q), split(k), split(v)
    if use_flash:
        # Head packing (IPC_TPU_FLASH_PACK; default 2 per the round-5
        # on-chip sweep, benchmarks/RESULTS.md 2026-08-21): independent
        # per-program head slices that fill the MXU during VPU softmax
        # phases. Math-identical at any setting; non-divisible B·H
        # falls back to 1 inside flash_attention.
        import os as _os

        pack = int(_os.environ.get("IPC_TPU_FLASH_PACK", "2") or 2)
        o = flash_attention(qh, kh, vh, interpret=interpret, head_pack=pack)
    else:
        o = _attention_xla(qh, kh, vh, 1.0 / math.sqrt(dh))
    return o.transpose(0, 2, 1, 3).reshape(b, n, dm).astype(q.dtype)
