"""Benchmark comparability contract.

bench.py (the driver's artifact of record) keeps an inline copy of the
synthetic photographic generator so it stays import-free and
self-contained; benchmarks/synth.py is the canonical definition the
A/B probes import. The pixel-vs-JPEG probe's ratios only explain the
bench headline if both measure the same content (JPEG payload size is
content-dependent on this rig's serialized H2D link), so these tests
pin the two definitions to each other.
"""

from __future__ import annotations

import ast
import importlib.util
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent


def _load_synth():
    spec = importlib.util.spec_from_file_location(
        "bench_synth", REPO / "benchmarks" / "synth.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _extract_bench_photo():
    """Compile bench.py's nested ``_photo`` without importing bench.py
    (whose import path re-execs into TPU probing)."""
    tree = ast.parse((REPO / "bench.py").read_text())
    for node in ast.walk(tree):
        if isinstance(node, ast.FunctionDef) and node.name == "_photo":
            fn_module = ast.Module(body=[node], type_ignores=[])
            ast.fix_missing_locations(fn_module)
            ns = {"np": np}
            exec(compile(fn_module, "<bench.py:_photo>", "exec"), ns)
            return ns["_photo"]
    raise AssertionError("bench.py no longer defines _photo")


def test_bench_photo_matches_canonical_synth():
    synth = _load_synth()
    bench_photo = _extract_bench_photo()
    for w, h, seed in [(518, 518, 0), (518, 518, 7), (64, 48, 3)]:
        a = bench_photo(w, h, seed)
        b = synth.photo(w, h, seed)
        assert a.shape == (h, w, 3) == b.shape
        assert a.dtype == np.uint8 == b.dtype
        np.testing.assert_array_equal(a, b)


def test_bench_and_synth_agree_on_jpeg_quality():
    """Both encode at quality 88 — the payload-size A/B hinges on it."""
    synth_src = (REPO / "benchmarks" / "synth.py").read_text()
    bench_src = (REPO / "bench.py").read_text()
    assert "quality: int = 88" in synth_src
    assert 'quality=88' in bench_src


def test_probe_imports_canonical_generator():
    probe_src = (REPO / "benchmarks" / "jpeg_ingest_probe.py").read_text()
    assert "from synth import" in probe_src
    assert "def _photo" not in probe_src
