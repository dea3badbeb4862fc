"""Native host-side components (C++ via ctypes).

The reference leans on native libraries for host geometry (Open3D's C++
decimation/meshing, backend/app.py:516) and formatting hot loops; this
package holds the framework's own C++ equivalents, built on demand with
g++ and bound through ctypes (no pybind11 in this toolchain).

Public functions degrade gracefully: if the toolchain is unavailable the
callers fall back to the pure-Python/numpy paths.
"""

from __future__ import annotations

import ctypes
import logging
import subprocess
from pathlib import Path

import numpy as np

logger = logging.getLogger(__name__)

_SRC = Path(__file__).parent / "src"
_BUILD = Path(__file__).parent / "build"
_LIB: ctypes.CDLL | None | bool = None  # None = untried, False = unavailable


def _load() -> ctypes.CDLL | None:
    global _LIB
    if _LIB is False:
        return None
    if _LIB is not None:
        return _LIB
    so = _BUILD / "libipc_native.so"
    src = _SRC / "decimate.cpp"
    try:
        if not so.exists() or so.stat().st_mtime < src.stat().st_mtime:
            _BUILD.mkdir(exist_ok=True)
            subprocess.run(
                [
                    "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                    str(src), "-o", str(so),
                ],
                check=True,
                capture_output=True,
            )
        lib = ctypes.CDLL(str(so))
        lib.ipc_decimate.restype = ctypes.c_int32
        lib.ipc_decimate.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int32,
            ctypes.c_void_p, ctypes.c_int32, ctypes.c_int32, ctypes.c_void_p,
        ]
        lib.ipc_format_xyz.restype = ctypes.c_int64
        lib.ipc_format_xyz.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int32,
            ctypes.c_void_p, ctypes.c_int64,
        ]
        lib.ipc_reconstruct.restype = ctypes.c_int64
        lib.ipc_reconstruct.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_float,
            ctypes.c_float, ctypes.c_float, ctypes.c_float,
            ctypes.c_void_p, ctypes.c_void_p,
        ]
        _LIB = lib
        return lib
    except Exception as e:  # noqa: BLE001
        logger.warning("native module unavailable (%s); using Python fallbacks", e)
        _LIB = False
        return None


def available() -> bool:
    return _load() is not None


def decimate_mesh(
    verts: np.ndarray,
    colors: np.ndarray,
    faces: np.ndarray,
    target_faces: int,
) -> tuple[np.ndarray, np.ndarray, np.ndarray] | None:
    """Quadric edge-collapse decimation; None if native lib unavailable."""
    lib = _load()
    if lib is None:
        return None
    v = np.ascontiguousarray(verts, np.float64).copy()
    c = np.ascontiguousarray(colors, np.float64).copy()
    f = np.ascontiguousarray(faces, np.int32).copy()
    new_nv = ctypes.c_int32(0)
    nf = lib.ipc_decimate(
        v.ctypes.data, c.ctypes.data, len(v),
        f.ctypes.data, len(f), int(target_faces),
        ctypes.byref(new_nv),
    )
    return (
        v[: new_nv.value].astype(np.float32),
        c[: new_nv.value].astype(np.float32),
        f[:nf].copy(),
    )


def reconstruct_points(
    d16: np.ndarray,
    keep: np.ndarray,
    rgb: np.ndarray,
    *,
    step: int,
    depth_scale: float,
    f: float,
    cx: float,
    cy: float,
) -> tuple[np.ndarray, np.ndarray] | None:
    """Fused dequantize+unproject+color-gather+compact; None if unavailable.

    Args:
      d16: (hh, ww) uint16 quantized normalized depth.
      keep: (hh, ww) bool/uint8 keep mask.
      rgb: (hh, ww, 3) uint8 color source — may be a strided view.
    """
    lib = _load()
    if lib is None:
        return None
    hh, ww = d16.shape
    d16 = np.ascontiguousarray(d16, np.uint16)
    keep_u8 = np.ascontiguousarray(keep, np.uint8)
    assert rgb.dtype == np.uint8 and rgb.strides[2] == 1
    out_xyz = np.empty((hh * ww, 3), np.float32)
    out_rgb = np.empty((hh * ww, 3), np.float32)
    m = lib.ipc_reconstruct(
        d16.ctypes.data, keep_u8.ctypes.data, rgb.ctypes.data,
        rgb.strides[0], rgb.strides[1],
        hh, ww, step, float(depth_scale), float(f), float(cx), float(cy),
        out_xyz.ctypes.data, out_rgb.ctypes.data,
    )
    return out_xyz[:m], out_rgb[:m]


def format_xyz(points: np.ndarray, colors: np.ndarray) -> bytes | None:
    """Native XYZ ASCII formatting; None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    p = np.ascontiguousarray(points, np.float64)
    c = np.ascontiguousarray(colors, np.int32)
    n = len(p)
    cap = 128 * max(n, 1)
    buf = ctypes.create_string_buffer(cap)
    written = lib.ipc_format_xyz(p.ctypes.data, c.ctypes.data, n, buf, cap)
    if written < 0:
        return None
    return buf.raw[:written]
