#!/usr/bin/env python3
"""Validate converted weights against the HF torch reference model.

Given a HuggingFace Depth-Anything checkpoint directory (the model the
reference serves, backend/app.py:80-81), this tool loads the same
weights into both the torch `AutoModelForDepthEstimation` and this
framework's Flax model (via models/convert.py) and reports the output
deviation on random and/or user images — the acceptance gate for weight
conversions before serving them.

Usage:
    python tools/compare_with_torch.py /path/to/hf_checkpoint \
        [--image photo.jpg] [--size 518] [--preset depth-anything-v2-small]

Requires torch + transformers (present in dev environments; not needed
at serving time).
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("checkpoint", help="HF checkpoint dir (model.safetensors + config)")
    ap.add_argument("--image", default=None)
    ap.add_argument("--size", type=int, default=518)
    ap.add_argument("--preset", default="depth-anything-v2-small")
    ap.add_argument("--tolerance", type=float, default=5e-4,
                    help="max-normalized mean abs deviation gate")
    args = ap.parse_args()

    import torch
    from transformers import AutoModelForDepthEstimation

    from image_to_pointcloud_tpu.models import (
        DepthAnything,
        convert_depth_anything,
        load_safetensors,
        normalize_pixels,
        preset,
    )

    cfg = preset(args.preset)
    tmodel = AutoModelForDepthEstimation.from_pretrained(args.checkpoint)
    tmodel.eval()

    sd = load_safetensors(f"{args.checkpoint}/model.safetensors")
    params = convert_depth_anything(sd, num_layers=cfg.backbone.num_layers)
    jmodel = DepthAnything(cfg)

    s = args.size
    if args.image:
        from image_to_pointcloud_tpu.io import decode_image_rgb
        from PIL import Image

        img = decode_image_rgb(open(args.image, "rb").read())
        img = np.asarray(
            Image.fromarray(img).resize((s, s), Image.BICUBIC), np.float32
        ) / 255.0
    else:
        rng = np.random.default_rng(0)
        img = rng.random((s, s, 3)).astype(np.float32)

    x = np.asarray(normalize_pixels(img[None]))  # (1, s, s, 3)
    with torch.no_grad():
        t_out = tmodel(
            pixel_values=torch.from_numpy(x.transpose(0, 3, 1, 2))
        ).predicted_depth.numpy()
    j_out = np.asarray(jmodel.apply({"params": params}, x))

    if t_out.shape != j_out.shape:  # HF may emit (1, h, w) at model res
        t_out = t_out.reshape(j_out.shape)
    scale = np.abs(t_out).max() + 1e-12
    mad = np.abs(t_out - j_out).mean() / scale
    mx = np.abs(t_out - j_out).max() / scale
    print(f"max-normalized deviation: mean={mad:.2e} max={mx:.2e} "
          f"(gate {args.tolerance:.0e})")
    if mad > args.tolerance:
        print("FAIL: conversion deviates beyond tolerance")
        return 1
    print("OK: converted weights match the torch reference")
    return 0


if __name__ == "__main__":
    sys.exit(main())
