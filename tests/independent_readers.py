"""Independent, spec-derived readers for LAS 1.2 / PLY / GLB / XYZ.

Purpose (VERDICT r3 item 7): the exporters in ``image_to_pointcloud_tpu.io``
claim byte-compatibility with the reference stack's output formats
(laspy LAS at backend/app.py:343-377, Open3D binary PLY at
backend/app.py:329-341, trimesh GLB at spar3d_processor.py:248-253).
Those claims were previously checked only against readers that live
NEXT TO the writers and share their constants/dtypes — a writer bug
mirrored into its reader would round-trip cleanly. This module is a
deliberately independent implementation:

* it imports NOTHING from ``image_to_pointcloud_tpu`` (stdlib + numpy
  only),
* every field offset / enum value below is written out from the
  published spec text (ASPRS LAS 1.2 R1, the PLY format description,
  glTF 2.0 §Binary glTF container + JSON schema), cited inline — not
  from the writer source,
* it VALIDATES (raises ``FormatError``) rather than assuming: header
  invariants, index bounds, alignment and size arithmetic are all
  checked, so a malformed file fails loudly instead of decoding into
  garbage that happens to compare equal.

Field decoding uses per-field strided views at explicit byte offsets —
not a shared numpy record dtype — so even the decode path cannot
accidentally mirror a writer layout mistake.
"""

from __future__ import annotations

import json
import struct

import numpy as np


class FormatError(AssertionError):
    """A file violates its format specification."""


def _req(cond: bool, msg: str) -> None:
    if not cond:
        raise FormatError(msg)


# ---------------------------------------------------------------------------
# LAS 1.2 (ASPRS "LAS Specification Version 1.2", April 2008)
# ---------------------------------------------------------------------------

# Public header block field offsets, transcribed from the spec's header
# table (every row: name, format, size). The header is little-endian.
_LAS_HDR = {
    "signature": (0, "4s"),          # "LASF"
    "file_source_id": (4, "<H"),
    "global_encoding": (6, "<H"),
    "guid1": (8, "<L"),
    "guid2": (12, "<H"),
    "guid3": (14, "<H"),
    "guid4": (16, "8s"),
    "version_major": (24, "B"),
    "version_minor": (25, "B"),
    "system_identifier": (26, "32s"),
    "generating_software": (58, "32s"),
    "creation_day": (90, "<H"),
    "creation_year": (92, "<H"),
    "header_size": (94, "<H"),
    "offset_to_points": (96, "<L"),
    "num_vlrs": (100, "<L"),
    "point_format": (104, "B"),
    "point_record_len": (105, "<H"),
    "num_points": (107, "<L"),
    "points_by_return": (111, "<5L"),
    "x_scale": (131, "<d"),
    "y_scale": (139, "<d"),
    "z_scale": (147, "<d"),
    "x_offset": (155, "<d"),
    "y_offset": (163, "<d"),
    "z_offset": (171, "<d"),
    "max_x": (179, "<d"),
    "min_x": (187, "<d"),
    "max_y": (195, "<d"),
    "min_y": (203, "<d"),
    "max_z": (211, "<d"),
    "min_z": (219, "<d"),
}
_LAS12_HEADER_SIZE = 227  # spec: 1.2 public header block is 227 bytes

# Point Data Record Format 2 field offsets (spec Table 4.6.2): format 0
# core 20 bytes (X,Y,Z i32; intensity u16; bitfield u8; classification
# u8; scan angle rank i8; user data u8; point source id u16) + Red,
# Green, Blue u16 → 26 bytes.
_LAS_PF2_LEN = 26


def _las_field(data: bytes, base: int, n: int, off: int, dt: str, reclen: int):
    """One point-record field as a strided view (no record dtype)."""
    itemsize = np.dtype(dt).itemsize
    _req(base + (n - 1) * reclen + off + itemsize <= len(data),
         "point records run past end of file")
    return np.ndarray(
        shape=(n,), dtype=dt, buffer=data,
        offset=base + off, strides=(reclen,),
    ).copy()


def read_las12_pf2(data: bytes) -> dict:
    """Parse + validate a LAS 1.2 point-format-2 file per the spec."""
    _req(len(data) >= _LAS12_HEADER_SIZE, "file shorter than a LAS header")
    h = {}
    for name, (off, fmt) in _LAS_HDR.items():
        v = struct.unpack_from(fmt, data, off)
        h[name] = v if len(v) > 1 else v[0]

    _req(h["signature"] == b"LASF", "bad file signature")
    _req((h["version_major"], h["version_minor"]) == (1, 2),
         f"not LAS 1.2: {h['version_major']}.{h['version_minor']}")
    _req(h["header_size"] == _LAS12_HEADER_SIZE,
         f"LAS 1.2 header must be {_LAS12_HEADER_SIZE} bytes, "
         f"got {h['header_size']}")
    _req(h["offset_to_points"] >= h["header_size"],
         "point data offset inside the header")
    _req(h["point_format"] == 2, f"expected format 2, got {h['point_format']}")
    _req(h["point_record_len"] >= _LAS_PF2_LEN,
         f"format-2 record length {h['point_record_len']} < {_LAS_PF2_LEN}")
    n = h["num_points"]
    reclen = h["point_record_len"]
    _req(h["offset_to_points"] + n * reclen <= len(data),
         "declared point count exceeds file size")
    # Spec: "number of points by return" must sum to the point count for
    # single-return data it is customary to place all in return 1; we
    # only require the sum does not exceed the total when nonzero.
    _req(sum(h["points_by_return"]) in (0, n),
         "points-by-return inconsistent with point count")
    for ax in "xyz":
        _req(h[f"{ax}_scale"] > 0, f"{ax} scale factor must be positive")

    base = h["offset_to_points"]
    xi = _las_field(data, base, n, 0, "<i4", reclen)
    yi = _las_field(data, base, n, 4, "<i4", reclen)
    zi = _las_field(data, base, n, 8, "<i4", reclen)
    intensity = _las_field(data, base, n, 12, "<u2", reclen)
    bitfield = _las_field(data, base, n, 14, "u1", reclen)
    classification = _las_field(data, base, n, 15, "u1", reclen)
    scan_angle = _las_field(data, base, n, 16, "i1", reclen)
    user_data = _las_field(data, base, n, 17, "u1", reclen)
    point_src = _las_field(data, base, n, 18, "<u2", reclen)
    red = _las_field(data, base, n, 20, "<u2", reclen)
    green = _las_field(data, base, n, 22, "<u2", reclen)
    blue = _las_field(data, base, n, 24, "<u2", reclen)

    # Spec: X = (X_record * x_scale) + x_offset (and likewise y/z).
    x = xi * h["x_scale"] + h["x_offset"]
    y = yi * h["y_scale"] + h["y_offset"]
    z = zi * h["z_scale"] + h["z_offset"]

    if n:
        # Header min/max are in the scaled coordinate system; they must
        # bound the decoded points (within one quantization step).
        for name, arr in (("x", x), ("y", y), ("z", z)):
            step = h[f"{name}_scale"]
            _req(arr.min() >= h[f"min_{name}"] - step
                 and arr.max() <= h[f"max_{name}"] + step,
                 f"{name} extent outside header bounds")

    return {
        "header": h,
        "points": np.stack([x, y, z], axis=1),
        "intensity": intensity,
        "bitfield": bitfield,
        "classification": classification,
        "scan_angle": scan_angle,
        "user_data": user_data,
        "point_source_id": point_src,
        "rgb16": np.stack([red, green, blue], axis=1),
    }


# ---------------------------------------------------------------------------
# PLY (Greg Turk's PLY format description)
# ---------------------------------------------------------------------------

# Scalar type names and sizes from the format description ("name of a
# data type" table) — both the classic and the sized aliases.
_PLY_TYPES = {
    "char": ("i1", 1), "uchar": ("u1", 1),
    "short": ("i2", 2), "ushort": ("u2", 2),
    "int": ("i4", 4), "uint": ("u4", 4),
    "float": ("f4", 4), "double": ("f8", 8),
    "int8": ("i1", 1), "uint8": ("u1", 1),
    "int16": ("i2", 2), "uint16": ("u2", 2),
    "int32": ("i4", 4), "uint32": ("u4", 4),
    "float32": ("f4", 4), "float64": ("f8", 8),
}


def read_ply(data: bytes) -> dict:
    """Parse + validate a binary_little_endian 1.0 PLY file.

    Returns {element_name: {prop: array}} with list properties as
    (count-validated) 2-D arrays when rectangular.
    """
    # Header: ASCII lines terminated by '\n' (the description uses
    # carriage-return-free line endings), ending with "end_header".
    end = data.find(b"end_header\n")
    _req(end >= 0, "no end_header")
    header_lines = data[:end].decode("ascii").split("\n")
    body = memoryview(data)[end + len(b"end_header\n"):]

    _req(header_lines[0] == "ply", 'first line must be exactly "ply"')
    _req(len(header_lines) > 1 and header_lines[1].startswith("format "),
         "second line must declare the format")
    fmt_tokens = header_lines[1].split()
    _req(fmt_tokens == ["format", "binary_little_endian", "1.0"],
         f"unsupported format line: {header_lines[1]!r}")

    elements: list[dict] = []
    for line in header_lines[2:]:
        tok = line.split()
        if not tok or tok[0] == "comment" or tok[0] == "obj_info":
            continue
        if tok[0] == "element":
            _req(len(tok) == 3, f"malformed element line: {line!r}")
            elements.append({"name": tok[1], "count": int(tok[2]),
                             "props": []})
        elif tok[0] == "property":
            _req(elements, "property before any element")
            if tok[1] == "list":
                _req(len(tok) == 5, f"malformed list property: {line!r}")
                _req(tok[2] in _PLY_TYPES and tok[3] in _PLY_TYPES,
                     f"unknown list types in {line!r}")
                elements[-1]["props"].append(
                    ("list", tok[2], tok[3], tok[4]))
            else:
                _req(len(tok) == 3, f"malformed property line: {line!r}")
                _req(tok[1] in _PLY_TYPES, f"unknown type {tok[1]!r}")
                elements[-1]["props"].append(("scalar", tok[1], tok[2]))
        else:
            raise FormatError(f"unknown header keyword: {tok[0]!r}")

    out: dict = {}
    cursor = 0
    for el in elements:
        has_list = any(p[0] == "list" for p in el["props"])
        if not has_list:
            # Fixed-size records: decode each property with its own
            # strided view at its in-record offset.
            rec_size = sum(_PLY_TYPES[p[1]][1] for p in el["props"])
            need = rec_size * el["count"]
            _req(cursor + need <= len(body),
                 f"element {el['name']!r} runs past end of file")
            props = {}
            off = 0
            for _, tname, pname in el["props"]:
                dt, size = _PLY_TYPES[tname]
                props[pname] = np.ndarray(
                    shape=(el["count"],), dtype="<" + dt, buffer=body,
                    offset=cursor + off, strides=(rec_size,),
                ).copy()
                off += size
            out[el["name"]] = props
            cursor += need
        else:
            _req(len(el["props"]) == 1,
                 "mixed scalar+list elements not supported by this reader")
            _, cnt_t, idx_t, pname = el["props"][0]
            cnt_dt, cnt_sz = _PLY_TYPES[cnt_t]
            idx_dt, idx_sz = _PLY_TYPES[idx_t]
            rows = []
            for _ in range(el["count"]):
                _req(cursor + cnt_sz <= len(body), "truncated list count")
                k = int(np.frombuffer(body, "<" + cnt_dt, 1, cursor)[0])
                cursor += cnt_sz
                _req(cursor + k * idx_sz <= len(body), "truncated list data")
                rows.append(np.frombuffer(body, "<" + idx_dt, k, cursor))
                cursor += k * idx_sz
            lens = {len(r) for r in rows}
            out[el["name"]] = {
                pname: (np.stack(rows) if len(lens) == 1 and rows
                        else rows)
            }
    _req(cursor == len(body),
         f"{len(body) - cursor} trailing bytes after the last element")
    return out


# ---------------------------------------------------------------------------
# GLB / glTF 2.0 (Khronos glTF 2.0 spec, "Binary glTF" + JSON schema)
# ---------------------------------------------------------------------------

# componentType enum → (numpy dtype, size) per the Accessor schema.
_GLTF_COMPONENT = {
    5120: ("i1", 1), 5121: ("u1", 1),
    5122: ("<i2", 2), 5123: ("<u2", 2),
    5125: ("<u4", 4), 5126: ("<f4", 4),
}
_GLTF_TYPE_COUNT = {
    "SCALAR": 1, "VEC2": 2, "VEC3": 3, "VEC4": 4,
    "MAT2": 4, "MAT3": 9, "MAT4": 16,
}
_GLB_MAGIC = 0x46546C67       # "glTF"
_CHUNK_JSON = 0x4E4F534A      # "JSON"
_CHUNK_BIN = 0x004E4942       # "BIN\0"


def read_glb(data: bytes) -> dict:
    """Parse + validate a GLB container and its glTF 2.0 JSON.

    Returns {"gltf": dict, "bin": bytes, "accessors": [ndarray, ...]}
    with every accessor decoded and bounds-checked.
    """
    _req(len(data) >= 12, "shorter than a GLB header")
    magic, version, length = struct.unpack_from("<III", data, 0)
    _req(magic == _GLB_MAGIC, f"bad magic 0x{magic:08x}")
    _req(version == 2, f"unsupported container version {version}")
    _req(length == len(data), "header length != file size")

    # Chunk walk: u32 length + u32 type + payload; each chunk must be
    # 4-byte aligned and padded to 4 (spec: JSON with 0x20, BIN with 0).
    chunks = []
    off = 12
    while off < len(data):
        _req(off + 8 <= len(data), "truncated chunk header")
        clen, ctype = struct.unpack_from("<II", data, off)
        _req(clen % 4 == 0, "chunk length not 4-byte aligned")
        _req(off + 8 + clen <= len(data), "chunk runs past end of file")
        chunks.append((ctype, data[off + 8: off + 8 + clen]))
        off += 8 + clen
    _req(off == len(data), "trailing bytes after the last chunk")
    _req(len(chunks) >= 1 and chunks[0][0] == _CHUNK_JSON,
         "first chunk must be JSON")
    _req(len(chunks) <= 2, "at most one BIN chunk may follow the JSON chunk")
    gltf = json.loads(chunks[0][1].decode("utf-8"))
    binchunk = b""
    if len(chunks) == 2:
        _req(chunks[1][0] == _CHUNK_BIN, "second chunk must be BIN")
        binchunk = chunks[1][1]

    # --- JSON schema requirements (subset relevant to geometry) ---
    _req(isinstance(gltf.get("asset"), dict)
         and gltf["asset"].get("version") == "2.0",
         "asset.version 2.0 is required")
    buffers = gltf.get("buffers", [])
    views = gltf.get("bufferViews", [])
    accessors = gltf.get("accessors", [])
    if binchunk:
        _req(buffers and "uri" not in buffers[0],
             "GLB BIN chunk must be buffer 0 with no uri")
        # Spec: buffer.byteLength may be up to 3 smaller than the padded
        # BIN chunk, never larger.
        _req(binchunk[:buffers[0]["byteLength"]] is not None
             and buffers[0]["byteLength"] <= len(binchunk)
             and len(binchunk) - buffers[0]["byteLength"] < 4,
             "buffer 0 byteLength inconsistent with BIN chunk")

    for i, v in enumerate(views):
        _req(0 <= v.get("buffer", -1) < len(buffers),
             f"bufferViews[{i}].buffer out of range")
        bl = buffers[v["buffer"]]["byteLength"]
        _req(v.get("byteOffset", 0) + v["byteLength"] <= bl,
             f"bufferViews[{i}] exceeds its buffer")
        if "target" in v:
            _req(v["target"] in (34962, 34963),
                 f"bufferViews[{i}].target invalid")

    decoded = []
    for i, a in enumerate(accessors):
        _req(a["componentType"] in _GLTF_COMPONENT,
             f"accessors[{i}].componentType invalid")
        _req(a["type"] in _GLTF_TYPE_COUNT, f"accessors[{i}].type invalid")
        _req(a.get("count", 0) >= 1, f"accessors[{i}].count must be >= 1")
        dt, csize = _GLTF_COMPONENT[a["componentType"]]
        ncomp = _GLTF_TYPE_COUNT[a["type"]]
        vi = a.get("bufferView")
        if vi is None:
            decoded.append(None)
            continue
        _req(0 <= vi < len(views), f"accessors[{i}].bufferView out of range")
        view = views[vi]
        aoff = a.get("byteOffset", 0)
        voff = view.get("byteOffset", 0)
        # Spec: accessor offset within the view must align to the
        # component size, and so must the absolute offset.
        _req((voff + aoff) % csize == 0,
             f"accessors[{i}] offset not aligned to component size")
        stride = view.get("byteStride", csize * ncomp)
        need = aoff + stride * (a["count"] - 1) + csize * ncomp
        _req(need <= view["byteLength"],
             f"accessors[{i}] overruns bufferViews[{vi}]")
        flat = np.ndarray(
            shape=(a["count"], ncomp), dtype=dt, buffer=binchunk,
            offset=voff + aoff, strides=(stride, csize),
        ).copy()
        arr = flat[:, 0] if a["type"] == "SCALAR" else flat
        if "min" in a or "max" in a:
            _req("min" in a and "max" in a and
                 len(a["min"]) == ncomp and len(a["max"]) == ncomp,
                 f"accessors[{i}] min/max malformed")
            _req(np.allclose(flat.min(axis=0), a["min"]) and
                 np.allclose(flat.max(axis=0), a["max"]),
                 f"accessors[{i}] min/max do not match the data")
        decoded.append(arr)

    # Scene graph indices.
    if "scene" in gltf:
        _req(0 <= gltf["scene"] < len(gltf.get("scenes", [])),
             "scene index out of range")
    for s in gltf.get("scenes", []):
        for nd in s.get("nodes", []):
            _req(0 <= nd < len(gltf.get("nodes", [])),
                 "scenes[].nodes out of range")
    for nd in gltf.get("nodes", []):
        if "mesh" in nd:
            _req(0 <= nd["mesh"] < len(gltf.get("meshes", [])),
                 "node.mesh out of range")
    for m in gltf.get("meshes", []):
        _req(m.get("primitives"), "mesh must have at least one primitive")
        for p in m["primitives"]:
            _req("POSITION" in p.get("attributes", {}),
                 "primitive must have a POSITION attribute")
            for attr, ai in p["attributes"].items():
                _req(0 <= ai < len(accessors),
                     f"attribute {attr} accessor out of range")
            pos = accessors[p["attributes"]["POSITION"]]
            # Spec: POSITION accessor MUST be float VEC3 with min/max.
            _req(pos["componentType"] == 5126 and pos["type"] == "VEC3",
                 "POSITION must be float VEC3")
            _req("min" in pos and "max" in pos,
                 "POSITION accessor must declare min and max")
            if "indices" in p:
                _req(0 <= p["indices"] < len(accessors),
                     "primitive.indices out of range")
                ia = accessors[p["indices"]]
                _req(ia["type"] == "SCALAR" and
                     ia["componentType"] in (5121, 5123, 5125),
                     "indices must be unsigned scalar")
                idx = decoded[p["indices"]]
                nverts = pos["count"]
                _req(idx is not None and int(idx.max(initial=0)) < nverts,
                     "index out of vertex range")
            _req(p.get("mode", 4) in range(7), "primitive.mode invalid")
            if "material" in p:
                _req(0 <= p["material"] < len(gltf.get("materials", [])),
                     "primitive.material out of range")
    for t in gltf.get("textures", []):
        if "source" in t:
            _req(0 <= t["source"] < len(gltf.get("images", [])),
                 "texture.source out of range")
        if "sampler" in t:
            _req(0 <= t["sampler"] < len(gltf.get("samplers", [])),
                 "texture.sampler out of range")
    for im in gltf.get("images", []):
        if "bufferView" in im:
            _req(0 <= im["bufferView"] < len(views),
                 "image.bufferView out of range")
            _req(im.get("mimeType") in ("image/png", "image/jpeg"),
                 "embedded image must declare a png/jpeg mimeType")

    return {"gltf": gltf, "bin": binchunk, "accessors": decoded}


# ---------------------------------------------------------------------------
# XYZ ASCII (the reference's format string: "%.6f %.6f %.6f %d %d %d",
# backend/app.py:379-389)
# ---------------------------------------------------------------------------

def read_xyz(data: bytes) -> dict:
    pts, cols = [], []
    for ln, line in enumerate(data.decode("ascii").splitlines()):
        tok = line.split(" ")
        _req(len(tok) == 6, f"line {ln}: expected 6 space-separated fields")
        for t in tok[:3]:
            _req("." in t and len(t.split(".")[1]) == 6,
                 f"line {ln}: coordinates must be %.6f formatted")
        for t in tok[3:]:
            _req(t.lstrip("-").isdigit(), f"line {ln}: colors must be ints")
        pts.append([float(t) for t in tok[:3]])
        cols.append([int(t) for t in tok[3:]])
    return {"points": np.array(pts, np.float64).reshape(-1, 3),
            "colors": np.array(cols, np.int64).reshape(-1, 3)}
