"""Torch/safetensors → JAX pytree checkpoint converter.

The reference pulls ``depth-anything/Depth-Anything-V2-Small-hf`` weights
from the HF hub into a torch model (backend/app.py:80-81). This converter
maps that checkpoint's state dict onto the Flax parameter tree of
:class:`image_to_pointcloud_tpu.models.depth_anything.DepthAnything`,
with the layout changes the TPU design implies:

* Dense: torch ``(out, in)`` → kernel ``(in, out)``,
* Conv: torch OIHW → flax HWIO,
* ConvTranspose(k=s): torch ``(in, out, k, k)`` → matmul kernel ``(k, k, in, out)``,
* 14×14 patch conv → flattened patchify matmul weight ``(p·p·3, D)`` with
  (row, col, channel) patch-vector ordering.

Accepts either a live ``state_dict()`` (torch tensors) or a mapping of
numpy arrays (e.g. loaded via ``safetensors.numpy.load_file``).
"""

from __future__ import annotations

from typing import Mapping

import numpy as np

__all__ = [
    "convert_depth_anything",
    "convert_dpt_classic",
    "convert_zoedepth",
    "convert_segformer",
    "load_safetensors",
]


def _np(x) -> np.ndarray:
    if isinstance(x, np.ndarray):
        return x
    # torch tensor without importing torch at module scope
    return x.detach().cpu().numpy()


def _dense(sd, name):
    return {"kernel": _np(sd[f"{name}.weight"]).T, "bias": _np(sd[f"{name}.bias"])}


def _conv(sd, name, bias=True):
    out = {"kernel": _np(sd[f"{name}.weight"]).transpose(2, 3, 1, 0)}
    if bias:
        out["bias"] = _np(sd[f"{name}.bias"])
    return out


def _convtrans(sd, name):
    return {
        "kernel": _np(sd[f"{name}.weight"]).transpose(2, 3, 0, 1),
        "bias": _np(sd[f"{name}.bias"]),
    }


def _ln(sd, name):
    return {"scale": _np(sd[f"{name}.weight"]), "bias": _np(sd[f"{name}.bias"])}


def convert_depth_anything(
    state_dict: Mapping[str, object], num_layers: int
) -> dict:
    """Build the Flax ``params`` tree from an HF DepthAnything state dict."""
    sd = state_dict
    patch_w = _np(sd["backbone.embeddings.patch_embeddings.projection.weight"])
    p = patch_w.shape[-1]
    d = patch_w.shape[0]

    backbone: dict = {
        "cls_token": _np(sd["backbone.embeddings.cls_token"]),
        "pos_embed": _np(sd["backbone.embeddings.position_embeddings"]),
        "patch_embed": patch_w.transpose(2, 3, 1, 0).reshape(p * p * 3, d),
        "patch_bias": _np(sd["backbone.embeddings.patch_embeddings.projection.bias"]),
        "norm": _ln(sd, "backbone.layernorm"),
    }
    for i in range(num_layers):
        pre = f"backbone.encoder.layer.{i}"
        backbone[f"block{i}"] = {
            "norm1": _ln(sd, f"{pre}.norm1"),
            "q": _dense(sd, f"{pre}.attention.attention.query"),
            "k": _dense(sd, f"{pre}.attention.attention.key"),
            "v": _dense(sd, f"{pre}.attention.attention.value"),
            "proj": _dense(sd, f"{pre}.attention.output.dense"),
            "ls1": _np(sd[f"{pre}.layer_scale1.lambda1"]),
            "norm2": _ln(sd, f"{pre}.norm2"),
            "mlp": {
                "fc1": _dense(sd, f"{pre}.mlp.fc1"),
                "fc2": _dense(sd, f"{pre}.mlp.fc2"),
            },
            "ls2": _np(sd[f"{pre}.layer_scale2.lambda1"]),
        }

    neck: dict = {}
    for i in range(4):
        pre = f"neck.reassemble_stage.layers.{i}"
        neck[f"proj{i}"] = _conv(sd, f"{pre}.projection")
        if i == 0:
            neck["up0"] = _convtrans(sd, f"{pre}.resize")
        elif i == 1:
            neck["up1"] = _convtrans(sd, f"{pre}.resize")
        elif i == 3:
            neck["down3"] = _conv(sd, f"{pre}.resize")
        neck[f"conv{i}"] = _conv(sd, f"neck.convs.{i}", bias=False)

    for j in range(4):
        pre = f"neck.fusion_stage.layers.{j}"
        neck[f"fusion{j}"] = {
            "projection": _conv(sd, f"{pre}.projection"),
            "res2": {
                "conv1": _conv(sd, f"{pre}.residual_layer2.convolution1"),
                "conv2": _conv(sd, f"{pre}.residual_layer2.convolution2"),
            },
        }
        if j > 0:
            # HF DPT's first fusion layer carries residual_layer1 weights
            # in the checkpoint but never applies them (no residual input
            # at the deepest stage); the Flax tree rightly omits them.
            neck[f"fusion{j}"]["res1"] = {
                "conv1": _conv(sd, f"{pre}.residual_layer1.convolution1"),
                "conv2": _conv(sd, f"{pre}.residual_layer1.convolution2"),
            }

    neck["head_conv1"] = _conv(sd, "head.conv1")
    neck["head_conv2"] = _conv(sd, "head.conv2")
    neck["head_conv3"] = _conv(sd, "head.conv3")

    return {"backbone": backbone, "neck": neck}


def convert_dpt_classic(
    state_dict: Mapping[str, object], num_layers: int
) -> dict:
    """Flax ``params`` tree for models.dpt_classic.DPTClassic from an HF
    ``DPTForDepthEstimation`` state dict (non-hybrid; e.g. the released
    ``Intel/dpt-large`` = MiDaS 3.0 checkpoint, modeling_dpt.py)."""
    sd = state_dict
    patch_w = _np(sd["dpt.embeddings.patch_embeddings.projection.weight"])
    p = patch_w.shape[-1]
    d = patch_w.shape[0]

    backbone: dict = {
        "cls_token": _np(sd["dpt.embeddings.cls_token"]),
        "pos_embed": _np(sd["dpt.embeddings.position_embeddings"]),
        "patch_embed": patch_w.transpose(2, 3, 1, 0).reshape(p * p * 3, d),
        "patch_bias": _np(sd["dpt.embeddings.patch_embeddings.projection.bias"]),
    }
    for i in range(num_layers):
        pre = f"dpt.encoder.layer.{i}"
        backbone[f"block{i}"] = {
            "norm1": _ln(sd, f"{pre}.layernorm_before"),
            "q": _dense(sd, f"{pre}.attention.attention.query"),
            "k": _dense(sd, f"{pre}.attention.attention.key"),
            "v": _dense(sd, f"{pre}.attention.attention.value"),
            "proj": _dense(sd, f"{pre}.attention.output.dense"),
            "norm2": _ln(sd, f"{pre}.layernorm_after"),
            "mlp": {
                "fc1": _dense(sd, f"{pre}.intermediate.dense"),
                "fc2": _dense(sd, f"{pre}.output.dense"),
            },
        }

    neck: dict = {}
    for i in range(4):
        neck[f"readout{i}"] = _dense(
            sd, f"neck.reassemble_stage.readout_projects.{i}.0"
        )
        pre = f"neck.reassemble_stage.layers.{i}"
        neck[f"proj{i}"] = _conv(sd, f"{pre}.projection")
        if i == 0:
            neck["up0"] = _convtrans(sd, f"{pre}.resize")
        elif i == 1:
            neck["up1"] = _convtrans(sd, f"{pre}.resize")
        elif i == 3:
            neck["down3"] = _conv(sd, f"{pre}.resize")
        neck[f"conv{i}"] = _conv(sd, f"neck.convs.{i}", bias=False)

    for j in range(4):
        pre = f"neck.fusion_stage.layers.{j}"
        neck[f"fusion{j}"] = {
            "projection": _conv(sd, f"{pre}.projection"),
            "res2": {
                "conv1": _conv(sd, f"{pre}.residual_layer2.convolution1"),
                "conv2": _conv(sd, f"{pre}.residual_layer2.convolution2"),
            },
        }
        if j > 0:
            # layers.0's residual_layer1 is checkpoint dead weight (no
            # residual input at the deepest fusion stage) — as in the DA
            # and ZoeDepth converters above.
            neck[f"fusion{j}"]["res1"] = {
                "conv1": _conv(sd, f"{pre}.residual_layer1.convolution1"),
                "conv2": _conv(sd, f"{pre}.residual_layer1.convolution2"),
            }

    neck["head_conv1"] = _conv(sd, "head.head.0")
    neck["head_conv2"] = _conv(sd, "head.head.2")
    neck["head_conv3"] = _conv(sd, "head.head.4")

    return {"backbone": backbone, "neck": neck}


def convert_zoedepth(state_dict: Mapping[str, object], num_layers: int) -> dict:
    """Flax ``params`` tree from an HF ZoeDepth state dict
    (``Intel/zoedepth-nyu-kitti``-layout; modeling_zoedepth.py)."""
    sd = state_dict
    patch_w = _np(sd["backbone.embeddings.patch_embeddings.projection.weight"])
    p = patch_w.shape[-1]
    d = patch_w.shape[0]

    backbone: dict = {
        "cls_token": _np(sd["backbone.embeddings.cls_token"]),
        "patch_embed": patch_w.transpose(2, 3, 1, 0).reshape(p * p * 3, d),
        "patch_bias": _np(sd["backbone.embeddings.patch_embeddings.projection.bias"]),
    }
    for i in range(num_layers):
        pre = f"backbone.encoder.layer.{i}"
        backbone[f"block{i}"] = {
            "norm1": _ln(sd, f"{pre}.layernorm_before"),
            "attn": {
                "q": _dense(sd, f"{pre}.attention.attention.query"),
                "k": {
                    "kernel": _np(
                        sd[f"{pre}.attention.attention.key.weight"]
                    ).T
                },
                "v": _dense(sd, f"{pre}.attention.attention.value"),
                "proj": _dense(sd, f"{pre}.attention.output.dense"),
                "rel_pos_table": _np(
                    sd[
                        f"{pre}.attention.attention.relative_position_bias"
                        ".relative_position_bias_table"
                    ]
                ),
            },
            "ls1": _np(sd[f"{pre}.lambda_1"]),
            "ls2": _np(sd[f"{pre}.lambda_2"]),
            "norm2": _ln(sd, f"{pre}.layernorm_after"),
            "fc1": _dense(sd, f"{pre}.intermediate.dense"),
            "fc2": _dense(sd, f"{pre}.output.dense"),
        }

    reassemble: dict = {}
    for i in range(4):
        reassemble[f"readout{i}"] = _dense(
            sd, f"neck.reassemble_stage.readout_projects.{i}.0"
        )
        pre = f"neck.reassemble_stage.layers.{i}"
        reassemble[f"proj{i}"] = _conv(sd, f"{pre}.projection")
        if i in (0, 1):
            reassemble[f"up{i}"] = _convtrans(sd, f"{pre}.resize")
        elif i == 3:
            reassemble[f"down{i}"] = _conv(sd, f"{pre}.resize")

    params: dict = {"backbone": backbone, "reassemble": reassemble}
    for i in range(4):
        params[f"conv{i}"] = _conv(sd, f"neck.convs.{i}", bias=False)
    for j in range(4):
        pre = f"neck.fusion_stage.layers.{j}"
        fusion = {
            "projection": _conv(sd, f"{pre}.projection"),
            "res2": {
                "conv1": _conv(sd, f"{pre}.residual_layer2.convolution1"),
                "conv2": _conv(sd, f"{pre}.residual_layer2.convolution2"),
            },
        }
        if j > 0:
            # layers.0's residual_layer1 is checkpoint dead weight, as in
            # the DA converter above (no residual input at the deepest
            # fusion stage).
            fusion["res1"] = {
                "conv1": _conv(sd, f"{pre}.residual_layer1.convolution1"),
                "conv2": _conv(sd, f"{pre}.residual_layer1.convolution2"),
            }
        params[f"fusion{j}"] = fusion

    params["rel_conv1"] = _conv(sd, "relative_head.conv1")
    params["rel_conv2"] = _conv(sd, "relative_head.conv2")
    params["rel_conv3"] = _conv(sd, "relative_head.conv3")

    params["mh_conv2"] = _conv(sd, "metric_head.conv2")
    params["seed_conv1"] = _conv(sd, "metric_head.seed_bin_regressor.conv1")
    params["seed_conv2"] = _conv(sd, "metric_head.seed_bin_regressor.conv2")
    params["seed_projector"] = {
        "conv1": _conv(sd, "metric_head.seed_projector.conv1"),
        "conv2": _conv(sd, "metric_head.seed_projector.conv2"),
    }
    for i in range(4):
        params[f"projector{i}"] = {
            "conv1": _conv(sd, f"metric_head.projectors.{i}.conv1"),
            "conv2": _conv(sd, f"metric_head.projectors.{i}.conv2"),
        }
        params[f"attractor{i}"] = {
            "conv1": _conv(sd, f"metric_head.attractors.{i}.conv1"),
            "conv2": _conv(sd, f"metric_head.attractors.{i}.conv2"),
        }
    params["cond_log_binomial"] = {
        "mlp1": _conv(sd, "metric_head.conditional_log_binomial.mlp.0"),
        "mlp2": _conv(sd, "metric_head.conditional_log_binomial.mlp.2"),
    }
    return params


def convert_segformer(state_dict: Mapping[str, object]) -> dict:
    """Flax params for models.segformer.SegformerMatte from an HF
    SegformerForSemanticSegmentation state dict (modeling_segformer.py;
    e.g. a matte-head fine-tune of nvidia/mit-b0)."""
    sd = state_dict
    params: dict = {}
    enc = "segformer.encoder"
    stage = 0
    while f"{enc}.patch_embeddings.{stage}.proj.weight" in sd:
        params[f"embed{stage}"] = _conv(sd, f"{enc}.patch_embeddings.{stage}.proj")
        params[f"embed_norm{stage}"] = _ln(
            sd, f"{enc}.patch_embeddings.{stage}.layer_norm"
        )
        params[f"stage_norm{stage}"] = _ln(sd, f"{enc}.layer_norm.{stage}")
        j = 0
        while f"{enc}.block.{stage}.{j}.layer_norm_1.weight" in sd:
            pre = f"{enc}.block.{stage}.{j}"
            attn = {
                "q": _dense(sd, f"{pre}.attention.self.query"),
                "k": _dense(sd, f"{pre}.attention.self.key"),
                "v": _dense(sd, f"{pre}.attention.self.value"),
                "proj": _dense(sd, f"{pre}.attention.output.dense"),
            }
            if f"{pre}.attention.self.sr.weight" in sd:
                attn["sr"] = _conv(sd, f"{pre}.attention.self.sr")
                attn["sr_norm"] = _ln(sd, f"{pre}.attention.self.layer_norm")
            params[f"stage{stage}_block{j}"] = {
                "norm1": _ln(sd, f"{pre}.layer_norm_1"),
                "attn": attn,
                "norm2": _ln(sd, f"{pre}.layer_norm_2"),
                "mlp": {
                    "fc1": _dense(sd, f"{pre}.mlp.dense1"),
                    "dwconv": _conv(sd, f"{pre}.mlp.dwconv.dwconv"),
                    "fc2": _dense(sd, f"{pre}.mlp.dense2"),
                },
            }
            j += 1
        stage += 1

    for i in range(stage):
        params[f"linear_c{i}"] = _dense(sd, f"decode_head.linear_c.{i}.proj")
    params["linear_fuse"] = _conv(sd, "decode_head.linear_fuse", bias=False)
    params["bn"] = {
        "scale": _np(sd["decode_head.batch_norm.weight"]),
        "bias": _np(sd["decode_head.batch_norm.bias"]),
        "mean": _np(sd["decode_head.batch_norm.running_mean"]),
        "var": _np(sd["decode_head.batch_norm.running_var"]),
    }
    params["classifier"] = _conv(sd, "decode_head.classifier")
    return params


def load_safetensors(path: str) -> dict[str, np.ndarray]:
    """Load a .safetensors checkpoint into numpy arrays (no torch needed)."""
    from safetensors import safe_open

    out = {}
    with safe_open(path, framework="np") as f:
        for key in f.keys():
            out[key] = f.get_tensor(key)
    return out
