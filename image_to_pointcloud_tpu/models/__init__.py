"""Flax depth-model family (DINOv2/BEiT backbones + DPT necks + metric
bins) with torch-checkpoint converters."""

from image_to_pointcloud_tpu.models.attention import flash_attention, multi_head_attention
from image_to_pointcloud_tpu.models.beit import BeitBackbone, BeitConfig
from image_to_pointcloud_tpu.models.convert import (
    convert_depth_anything,
    convert_dpt_classic,
    convert_segformer,
    convert_zoedepth,
    load_safetensors,
)
from image_to_pointcloud_tpu.models.dpt_classic import (
    DPTClassic,
    DPTClassicConfig,
)
from image_to_pointcloud_tpu.models.vit import ViTBackbone, ViTConfig
from image_to_pointcloud_tpu.models.segformer import (
    SegformerConfig,
    SegformerMatte,
    segformer_b0,
)
from image_to_pointcloud_tpu.models.zoedepth import ZoeDepth, ZoeDepthConfig
from image_to_pointcloud_tpu.models.depth_anything import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    PRESETS,
    DepthAnything,
    DepthAnythingConfig,
    normalize_pixels,
    preset,
)
from image_to_pointcloud_tpu.models.dinov2 import DinoV2Backbone, DinoV2Config
from image_to_pointcloud_tpu.models.dpt import DPTConfig, DPTNeckHead

__all__ = [
    "flash_attention",
    "multi_head_attention",
    "convert_depth_anything",
    "load_safetensors",
    "IMAGENET_MEAN",
    "IMAGENET_STD",
    "PRESETS",
    "DepthAnything",
    "DepthAnythingConfig",
    "normalize_pixels",
    "preset",
    "DinoV2Backbone",
    "DinoV2Config",
    "DPTConfig",
    "DPTNeckHead",
    "BeitBackbone",
    "BeitConfig",
    "ZoeDepth",
    "ZoeDepthConfig",
    "convert_zoedepth",
    "SegformerConfig",
    "SegformerMatte",
    "segformer_b0",
    "convert_segformer",
    "DPTClassic",
    "DPTClassicConfig",
    "convert_dpt_classic",
    "ViTBackbone",
    "ViTConfig",
    "build_model",
    "convert_checkpoint",
]


def build_model(cfg):
    """Model module for a preset config (family dispatch by config type)."""
    if isinstance(cfg, ZoeDepthConfig):
        return ZoeDepth(cfg)
    if isinstance(cfg, DPTClassicConfig):
        return DPTClassic(cfg)
    return DepthAnything(cfg)


def convert_checkpoint(cfg, state_dict):
    """Torch/HF state dict → Flax params for the family ``cfg`` selects."""
    if isinstance(cfg, ZoeDepthConfig):
        return convert_zoedepth(state_dict, num_layers=cfg.backbone.num_layers)
    if isinstance(cfg, DPTClassicConfig):
        return convert_dpt_classic(
            state_dict, num_layers=cfg.backbone.num_layers
        )
    return convert_depth_anything(
        state_dict, num_layers=cfg.backbone.num_layers
    )
