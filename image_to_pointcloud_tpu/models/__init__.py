"""Flax depth-model family (DINOv2 backbones + DPT necks) with converters."""

from image_to_pointcloud_tpu.models.attention import flash_attention, multi_head_attention
from image_to_pointcloud_tpu.models.convert import (
    convert_depth_anything,
    load_safetensors,
)
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
]
