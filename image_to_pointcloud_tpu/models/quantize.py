"""Int8 (W8A8) quantized inference for the ViT encoder.

TPU MXUs run int8 matmuls at twice the bf16 rate (e.g. v5e: ~394 TOPS
int8 vs ~197 TFLOPS bf16), and int8 weights halve the HBM traffic of
the weight stream. This module provides post-training quantization for
the encoder blocks — where the depth network's FLOPs live:

* **Weights**: symmetric per-output-channel int8
  (``w_q = round(w / scale)``, ``scale = max|w| / 127`` per column).
* **Activations**: dynamic symmetric per-token int8, computed on the fly
  (no calibration set needed — the reference ships none; SURVEY.md §4).
* The int8×int8 ``dot_general`` accumulates in int32 on the MXU, then
  dequantizes with the product of the two scales.

Opt-in (``DinoV2Config.quantized`` / ``ModelManager(int8=True)`` /
``IPC_TPU_INT8=1``); layernorms, patch embedding, the DPT neck/head and
all residual arithmetic stay in the float compute dtype, which keeps
end-to-end depth error at the ~1% level (see tests/test_model_parity.py
TestQuantized).

Quantization survey context: arXiv 2405.00314 (PAPERS.md).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ["QuantDense", "quantize_dense_params", "quantize_encoder_params"]

# Dense submodules of each encoder block that carry the matmul FLOPs:
# DINOv2 layout first (DA family), then BEiT's (ZoeDepth backbone —
# attention nested under /attn/, MLP at block level). Missing paths are
# skipped, so one list serves both families.
QUANT_TARGETS = (
    "q", "k", "v", "proj", "mlp/fc1", "mlp/fc2",
    "attn/q", "attn/k", "attn/v", "attn/proj", "fc1", "fc2",
)


def block_dense(
    quantized: bool, features: int, *, dtype, name: str, use_bias: bool = True
):
    """Encoder-block matmul factory: f32/bf16 ``nn.Dense``, or int8
    :class:`QuantDense` when quantized — ONE dispatch shared by every
    backbone (dinov2/vit/beit) so quantization wiring changes land in
    one place. Param names/layouts are unchanged either way."""
    if quantized:
        return QuantDense(features, dtype=dtype, use_bias=use_bias, name=name)
    return nn.Dense(features, use_bias=use_bias, dtype=dtype, name=name)


class QuantDense(nn.Module):
    """Drop-in Dense with int8 weights and dynamic int8 activations.

    Parameters: ``kernel_q`` int8 (in, out), ``kernel_scale`` f32 (out,),
    ``bias`` f32 (out,). Use :func:`quantize_dense_params` to convert a
    trained ``nn.Dense`` param dict.
    """

    features: int
    dtype: Any = jnp.float32
    use_bias: bool = True  # BEiT's key projection is bias-free

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_features = x.shape[-1]
        kernel_q = self.param(
            "kernel_q",
            nn.initializers.zeros,
            (in_features, self.features),
            jnp.int8,
        )
        kernel_scale = self.param(
            "kernel_scale", nn.initializers.ones, (self.features,), jnp.float32
        )
        bias = (
            self.param(
                "bias", nn.initializers.zeros, (self.features,), jnp.float32
            )
            if self.use_bias
            else None
        )
        # Dynamic per-token activation quantization.
        xf = x.astype(jnp.float32)
        a_max = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
        a_scale = jnp.maximum(a_max, 1e-8) / 127.0
        x_q = jnp.clip(jnp.round(xf / a_scale), -127, 127).astype(jnp.int8)
        # int8 × int8 → int32 on the MXU.
        acc = jax.lax.dot_general(
            x_q,
            kernel_q,
            (((x_q.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        out = acc.astype(jnp.float32) * a_scale * kernel_scale
        if bias is not None:
            out = out + bias
        return out.astype(self.dtype)


def quantize_dense_params(dense: dict) -> dict:
    """{'kernel','bias'} (f32) → {'kernel_q','kernel_scale','bias'}."""
    w = jnp.asarray(dense["kernel"], jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(w), axis=0), 1e-8) / 127.0
    w_q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    out = {"kernel_q": w_q, "kernel_scale": scale}
    if "bias" in dense:
        out["bias"] = jnp.asarray(dense["bias"], jnp.float32)
    return out


def _get_path(tree: dict, path: str):
    node = tree
    for part in path.split("/"):
        if part not in node:
            return None
        node = node[part]
    return node


def _set_path(tree: dict, path: str, value) -> None:
    parts = path.split("/")
    node = tree
    for part in parts[:-1]:
        node = node[part]
    node[parts[-1]] = value


def quantize_encoder_params(params: Any, num_layers: int) -> Any:
    """Quantize every encoder block's Dense layers in a param pytree.

    Accepts the full DepthAnything tree ({'backbone': ..., 'neck': ...})
    or a bare backbone tree; everything outside the block matmuls is
    untouched.
    """
    params = jax.tree_util.tree_map(lambda x: x, params)  # shallow copy tree
    root = params.get("backbone", params)
    for i in range(num_layers):
        block = root.get(f"block{i}")
        if block is None:
            continue
        for target in QUANT_TARGETS:
            dense = _get_path(block, target)
            if dense is not None and "kernel" in dense:
                _set_path(block, target, quantize_dense_params(dense))
    return params
