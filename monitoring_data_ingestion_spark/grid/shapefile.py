"""Minimal ESRI shapefile reader for polygon cutlines.

The reference's clip geometry is a shapefile consumed by ``gdalwarp
-cutline`` (/root/reference/src/file-conversions.js:174-195, geometry at
src/shp/africa.shp). The engine's clip operator
(:func:`..grid.ops.clip_polygon`) takes a plain vertex list, so this module
closes the gap: parse the shapefile main file (.shp) directly — no GDAL —
and hand its rings to the native ray-cast clip.

Implements exactly the subset the cutline path needs, from the public ESRI
Shapefile Technical Description (July 1998): the 100-byte main-file header
(file code 9994, bounding box) and shape type 5 (Polygon: bbox, part
index array, (x, y) point array). Null shapes (type 0) are skipped; any
other shape type is an explicit error, not a silent drop.

Coordinates come back as (lon, lat) = (x, y) tuples — the same orientation
``point_in_polygon`` expects. WGS-84 is assumed (the reference ships a
.prj with GCS_WGS_1984; projection handling is out of scope for a
cutline whose grid is already lat/lon).
"""

from __future__ import annotations

import struct
from typing import Sequence

SHAPE_NULL = 0
SHAPE_POLYGON = 5

_FILE_CODE = 9994


def read_polygon_rings(path: str) -> list[list[tuple[float, float]]]:
    """Parse a .shp main file into a list of rings (one per polygon part).

    Each ring is a closed list of (lon, lat) vertices as stored (ESRI
    rings repeat the first vertex at the end; callers that need an open
    ring drop the duplicate). Record order and part order are preserved.
    """
    with open(path, "rb") as f:
        data = f.read()
    if len(data) < 100:
        raise ValueError(f"{path}: truncated shapefile header ({len(data)} bytes)")
    (file_code,) = struct.unpack(">i", data[0:4])
    if file_code != _FILE_CODE:
        raise ValueError(f"{path}: bad file code {file_code} (want {_FILE_CODE})")
    # Header file length is in 16-bit words, big-endian (spec p.3).
    (file_len_words,) = struct.unpack(">i", data[24:28])
    end = min(len(data), file_len_words * 2)

    rings: list[list[tuple[float, float]]] = []
    off = 100
    while off + 8 <= end:
        # Record header: number + content length, both big-endian words.
        _, content_words = struct.unpack(">ii", data[off : off + 8])
        off += 8
        content = data[off : off + content_words * 2]
        off += content_words * 2
        (shape_type,) = struct.unpack("<i", content[0:4])
        if shape_type == SHAPE_NULL:
            continue
        if shape_type != SHAPE_POLYGON:
            raise ValueError(f"{path}: unsupported shape type {shape_type}")
        num_parts, num_points = struct.unpack("<ii", content[36:44])
        parts = struct.unpack(f"<{num_parts}i", content[44 : 44 + 4 * num_parts])
        pts_off = 44 + 4 * num_parts
        flat = struct.unpack(
            f"<{2 * num_points}d", content[pts_off : pts_off + 16 * num_points]
        )
        points = [(flat[2 * i], flat[2 * i + 1]) for i in range(num_points)]
        bounds = list(parts) + [num_points]
        for i in range(num_parts):
            rings.append(points[bounds[i] : bounds[i + 1]])
    return rings


def bounding_box(path: str) -> tuple[float, float, float, float]:
    """(xmin, ymin, xmax, ymax) from the main-file header."""
    with open(path, "rb") as f:
        header = f.read(100)
    return struct.unpack("<4d", header[36:68])


def main_ring(path: str) -> list[tuple[float, float]]:
    """The largest ring (most vertices) with its closing duplicate vertex
    dropped — ready for :func:`..grid.ops.point_in_polygon`, which closes
    the ring itself. For the reference's africa.shp this is the mainland
    outline (islands are smaller parts)."""
    rings = read_polygon_rings(path)
    if not rings:
        raise ValueError(f"{path}: no polygon rings")
    ring = max(rings, key=len)
    if len(ring) > 1 and ring[0] == ring[-1]:
        ring = ring[:-1]
    return ring


def decimate(ring: Sequence[tuple[float, float]], step: int) -> list[tuple[float, float]]:
    """Every ``step``-th vertex (always keeping the first). The cutline
    rides the query plan as a literal edge array, so a 7,000-vertex
    coastline would bloat codegen; a decimated outline keeps the plan
    small while preserving the clip's shape for coarse grids."""
    if step <= 1:
        return list(ring)
    out = list(ring[::step])
    return out


def write_polygon_shp(path: str, rings: Sequence[Sequence[tuple[float, float]]]) -> None:
    """Write one polygon record (all ``rings`` as its parts) as a .shp
    main file — the inverse of :func:`read_polygon_rings`, used for
    round-trip tests and as a standalone clip-geometry fixture. Rings are
    closed on write (first vertex repeated) per the spec."""
    closed = [list(r) + ([r[0]] if r and r[0] != r[-1] else []) for r in rings]
    num_points = sum(len(r) for r in closed)
    num_parts = len(closed)
    xs = [x for r in closed for x, _ in r]
    ys = [y for r in closed for _, y in r]
    bbox = (min(xs), min(ys), max(xs), max(ys))

    content = bytearray()
    content += struct.pack("<i", SHAPE_POLYGON)
    content += struct.pack("<4d", *bbox)
    content += struct.pack("<ii", num_parts, num_points)
    start = 0
    for r in closed:
        content += struct.pack("<i", start)
        start += len(r)
    for r in closed:
        for x, y in r:
            content += struct.pack("<2d", x, y)

    record = struct.pack(">ii", 1, len(content) // 2) + bytes(content)
    file_len_words = (100 + len(record)) // 2
    header = bytearray(100)
    header[0:4] = struct.pack(">i", _FILE_CODE)
    header[24:28] = struct.pack(">i", file_len_words)
    header[28:32] = struct.pack("<i", 1000)
    header[32:36] = struct.pack("<i", SHAPE_POLYGON)
    header[36:68] = struct.pack("<4d", *bbox)
    with open(path, "wb") as f:
        f.write(bytes(header) + record)
