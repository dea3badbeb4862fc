"""Sequence/context parallelism for long ViT patch sequences.

The reference's only "scale the input" mechanism is a 3072-px downscale
(backend/app.py:438-445). TPU-native high-res (1024² tiles → 5k+ patch
tokens) and video configs instead shard the *sequence* axis across chips:

* :func:`sequence_sharded_attention` — queries stay sharded over the
  ``seq`` mesh axis; K/V are all-gathered over ICI and each chip computes
  attention for its query shard (megatron-SP style — exact, simple,
  memory ∝ full KV but compute/activations ∝ 1/seq).
* :func:`ring_attention` — flash-style online-softmax accumulation while
  K/V blocks rotate around the ring via ``ppermute``; memory AND traffic
  per step ∝ 1/seq, overlapping compute with neighbor exchange.

Both are drop-in replacements for the attention inner call under
``shard_map`` over the mesh from parallel.sharding.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax ≥0.8 moves shard_map out of experimental
    from jax import shard_map  # type: ignore[attr-defined]
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from image_to_pointcloud_tpu.parallel.sharding import SEQ_AXIS

__all__ = ["sequence_sharded_attention", "ring_attention"]


def _local_attention(q, k, v, scale):
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(logits * scale, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v, preferred_element_type=jnp.float32)


def sequence_sharded_attention(q, k, v, mesh: Mesh, axis: str = SEQ_AXIS):
    """(B, H, N, D) with N sharded over ``axis`` → same sharding out."""
    scale = 1.0 / math.sqrt(q.shape[-1])

    def inner(ql, kl, vl):
        kg = jax.lax.all_gather(kl, axis, axis=2, tiled=True)
        vg = jax.lax.all_gather(vl, axis, axis=2, tiled=True)
        return _local_attention(ql, kg, vg, scale).astype(ql.dtype)

    spec = P(None, None, axis, None)
    return shard_map(
        inner, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec
    )(q, k, v)


def ring_attention(q, k, v, mesh: Mesh, axis: str = SEQ_AXIS):
    """Ring-rotated exact attention with online softmax accumulation.

    Each step computes attention of the local query shard against the
    currently-held K/V shard, then rotates K/V to the next ring neighbor
    with ``ppermute`` — the collective overlaps the next step's compute
    under XLA's latency-hiding scheduler.
    """
    scale = 1.0 / math.sqrt(q.shape[-1])

    def inner(ql, kl, vl):
        n_dev = jax.lax.axis_size(axis)
        qf = ql.astype(jnp.float32) * scale

        def step(carry, _):
            m, l, acc, kc, vc = carry
            s = jnp.einsum(
                "bhqd,bhkd->bhqk", qf, kc.astype(jnp.float32),
                preferred_element_type=jnp.float32,
            )
            m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
            p = jnp.exp(s - m_new)
            corr = jnp.exp(m - m_new)
            l_new = l * corr + jnp.sum(p, axis=-1, keepdims=True)
            acc_new = acc * corr + jnp.einsum(
                "bhqk,bhkd->bhqd", p, vc.astype(jnp.float32),
                preferred_element_type=jnp.float32,
            )
            perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]
            kc = jax.lax.ppermute(kc, axis, perm)
            vc = jax.lax.ppermute(vc, axis, perm)
            return (m_new, l_new, acc_new, kc, vc), None

        b, h, nq, d = qf.shape
        # Mark fresh carries as device-varying over the ring axis so the
        # scan carry types line up under shard_map's vma tracking
        # (jax.lax.pcast(..., to='varying'); pvary fallback pre-0.9).
        def _vary(x):
            try:
                return jax.lax.pcast(x, axis, to="varying")
            except (AttributeError, TypeError):
                return jax.lax.pvary(x, axis)

        init = (
            _vary(jnp.full((b, h, nq, 1), -jnp.inf, jnp.float32)),
            _vary(jnp.zeros((b, h, nq, 1), jnp.float32)),
            _vary(jnp.zeros((b, h, nq, d), jnp.float32)),
            kl,
            vl,
        )
        (m, l, acc, _, _), _ = jax.lax.scan(step, init, None, length=n_dev)
        return (acc / l).astype(ql.dtype)

    spec = P(None, None, axis, None)
    return shard_map(
        inner, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec
    )(q, k, v)
