"""Generate committed torch-oracle golden fixtures (VERDICT r4 item 4).

torch 2.x + transformers 4.x are installed on this rig TODAY, and every
HF-parity claim (tests/test_model_parity.py and siblings) is recomputed
live against them — evidence that evaporates if a future image drops
the libraries. This tool freezes the oracle while it exists: for each
model family's seeded tiny-config HF torch model it saves

    tests/fixtures/golden_<family>.npz
        input            seeded forward input (B, H, W, 3) f32
        output           the torch forward's output (predicted_depth /
                         logits), full precision
        sd/<key>         every state_dict tensor as numpy (so the
                         torch→JAX converter is exercised offline too)
        meta             JSON: family, builder kwargs, shapes, date

tests/test_golden_fixtures.py then replays the comparison with NO torch
or transformers import (and proves it under a simulated uninstall).

The HF models are built by the SAME ``_build_pair`` helpers the live
parity tests use (tests/test_model_parity.py etc.), so fixture and live
test validate the identical architecture pairing. Reference semantics
frozen here: the depth forward of ``backend/app.py:99-122`` (HF
AutoModelForDepthEstimation → predicted_depth) at tiny config scale.

Run: ``python tools/make_golden_fixtures.py`` (idempotent — seeds fix
every tensor; reruns produce byte-identical content arrays).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

FIXDIR = REPO / "tests" / "fixtures"


def _state_dict_numpy(hf) -> dict[str, np.ndarray]:
    return {k: v.detach().cpu().numpy() for k, v in hf.state_dict().items()}


def _save(family: str, hf_forward, hf, input_shape, meta_kwargs) -> None:
    import torch

    rng = np.random.default_rng(1234)
    x = rng.normal(0, 1, input_shape).astype(np.float32)
    with torch.no_grad():
        out = hf_forward(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    out = out.numpy()
    payload = {
        "input": x,
        "output": out,
        "meta": np.frombuffer(
            json.dumps(
                {
                    "family": family,
                    "builder_kwargs": meta_kwargs,
                    "input_shape": list(input_shape),
                    "output_shape": list(out.shape),
                    "generated": time.strftime("%Y-%m-%d"),
                }
            ).encode(),
            dtype=np.uint8,
        ),
    }
    for k, v in _state_dict_numpy(hf).items():
        payload[f"sd/{k}"] = v
    FIXDIR.mkdir(parents=True, exist_ok=True)
    path = FIXDIR / f"golden_{family}.npz"
    np.savez_compressed(path, **payload)
    print(f"{path.name}: output {out.shape}, {path.stat().st_size/1024:.0f} KiB")


def main() -> None:
    import torch

    from test_dpt_classic_parity import _build_pair as build_dpt
    from test_model_parity import _build_pair as build_da
    from test_segformer_matte import _build_pair as build_seg
    from test_zoedepth_parity import _build_pair as build_zoe

    hf, _, _ = build_da(image_size=56)
    _save(
        "depth_anything",
        lambda t: hf(t).predicted_depth,
        hf,
        (2, 56, 56, 3),
        {"hidden": 32, "layers": 4, "heads": 2, "image_size": 56,
         "out_idx": [1, 2, 3, 4]},
    )

    hf, _, _ = build_dpt(image_size=64)
    _save(
        "dpt_classic",
        lambda t: hf(t).predicted_depth,
        hf,
        # 96² on a 64²-native model: freezes the position-embedding
        # interpolation path too (the hardest converter semantics).
        (1, 96, 96, 3),
        {"hidden": 32, "layers": 4, "heads": 2, "image_size": 64,
         "out_idx": [0, 1, 2, 3]},
    )

    hf, _, _ = build_zoe(image_size=64)
    _save(
        "zoedepth",
        lambda t: hf(t).predicted_depth,
        hf,
        (1, 64, 64, 3),
        {"hidden": 32, "layers": 4, "heads": 2, "image_size": 64, "seed": 0},
    )

    hf, _, _ = build_seg()
    _save(
        "segformer",
        lambda t: hf(t).logits,
        hf,
        (2, 64, 64, 3),
        {"num_labels": 1, "image_size": 64, "seed": 0},
    )


if __name__ == "__main__":
    main()
