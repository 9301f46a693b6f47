"""PLY point-cloud IO.

The reference parses PLY text line-by-line in Python with a hardcoded
10-line header (`ndnet/datasets/CARLA_Seg.py:97-137`) and writes nothing
(viz uses an Open3D window). Here:
- reading parses the header properly (until ``end_header``), loads the body
  with a single vectorized np.loadtxt pass, and transparently uses the
  native C++ reader (ndtpu.native) when its library is built;
- writing emits text PLY with optional per-point RGB colors so the viz
  tools work headless (SURVEY.md §7 step 9).
"""
from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np


def _parse_header(f) -> Tuple[int, int]:
    """Returns (num_header_bytes, num_vertices)."""
    n_vertices = -1
    offset = 0
    line = f.readline()
    offset += len(line)
    if not line.startswith(b"ply"):
        raise ValueError("not a PLY file")
    while True:
        line = f.readline()
        if not line:
            raise ValueError("unterminated PLY header")
        offset += len(line)
        if line.startswith(b"element vertex"):
            n_vertices = int(line.split()[-1])
        if line.strip() == b"end_header":
            return offset, n_vertices


def read_ply(path: str, use_native: bool = True):
    """Read a text PLY. Returns (points [N, 3] float64, classes [N] uint16)
    where classes is the LAST column of each vertex row (CARLA convention,
    CARLA_Seg.py:126). A file without extra columns yields zeros."""
    if use_native:
        try:
            from ndtpu.native.io import native_read_ply

            out = native_read_ply(path)
            if out is not None:
                return out
        except Exception:
            pass

    with open(path, "rb") as f:
        header_bytes, n_vertices = _parse_header(f)
        data = np.loadtxt(f, dtype=np.float64, ndmin=2)
    if n_vertices >= 0:
        data = data[:n_vertices]
    points = data[:, :3]
    if data.shape[1] > 3:
        classes = data[:, -1].astype(np.uint16)
    else:
        classes = np.zeros((data.shape[0],), np.uint16)
    return points, classes


def write_ply(path: str, points, colors=None, classes=None):
    """Write a text PLY with optional uchar RGB colors (in [0,1] floats or
    [0,255] ints) and an optional trailing class column."""
    points = np.asarray(points, np.float64)
    n = points.shape[0]
    props = ["property double x", "property double y", "property double z"]
    cols = [points]
    if colors is not None:
        colors = np.asarray(colors)
        if colors.dtype.kind == "f":
            colors = np.clip(colors * 255.0, 0, 255)
        colors = colors.astype(np.uint16)
        props += [
            "property uchar red", "property uchar green", "property uchar blue"
        ]
        cols.append(colors)
    if classes is not None:
        props.append("property ushort class")
        cols.append(np.asarray(classes, np.uint16)[:, None])

    header = "\n".join(
        ["ply", "format ascii 1.0", f"element vertex {n}", *props,
         "end_header", ""]
    )
    body = np.concatenate([np.asarray(c, np.float64) for c in cols], axis=1)
    fmt = ["%.8g"] * 3
    if colors is not None:
        fmt += ["%d"] * 3
    if classes is not None:
        fmt += ["%d"]
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "w") as f:
        f.write(header)
        np.savetxt(f, body, fmt=" ".join(fmt))
    return path


def count_ply_points(path: str) -> int:
    """Vertex count from the header (the reference's point_histogram.py:19-43
    counts body lines; the header count is authoritative and O(1))."""
    with open(path, "rb") as f:
        _, n = _parse_header(f)
    if n >= 0:
        return n
    # header lacked element vertex; fall back to counting lines
    with open(path, "rb") as f:
        header_bytes, _ = _parse_header(f)
        f.seek(header_bytes)
        return sum(1 for _ in f)
