"""GeoTIFF encode/decode for grid sinks (SURVEY.md §2.1 S6).

The reference emits Float32 GeoTIFF via ``gdal_translate -co COMPRESS=LZW
-ot Float32`` (/root/reference/src/file-conversions.js:57-74). The engine's
native sink is partitioned parquet; this module covers the interchange
format: rasterio (LZW, predictor=3 — the reference's exact creation
options) when the library is installed, otherwise a self-contained
uncompressed Float32 GeoTIFF writer/reader built from the public TIFF 6.0
and GeoTIFF 1.1 specifications, so the round-trip works (and is tested)
with zero native dependencies.

Layout written by the fallback: little-endian classic TIFF, one strip,
one Float32 sample per pixel, north-up affine georeferencing via
ModelPixelScale + ModelTiepoint, WGS-84 geographic CRS keys, and the
GDAL_NODATA ASCII tag — the same raster model GDAL produces for the
reference's outputs.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np

try:  # pragma: no cover - not present in this environment
    import rasterio
    from rasterio.transform import from_origin

    HAVE_RASTERIO = True
except ImportError:
    HAVE_RASTERIO = False

# TIFF 6.0 tag ids.
_IMAGE_WIDTH = 256
_IMAGE_LENGTH = 257
_BITS_PER_SAMPLE = 258
_COMPRESSION = 259
_PHOTOMETRIC = 262
_STRIP_OFFSETS = 273
_SAMPLES_PER_PIXEL = 277
_ROWS_PER_STRIP = 278
_STRIP_BYTE_COUNTS = 279
_PLANAR_CONFIG = 284
_SAMPLE_FORMAT = 339
# GeoTIFF 1.1 tag ids.
_MODEL_PIXEL_SCALE = 33550
_MODEL_TIEPOINT = 33922
_GEO_KEY_DIRECTORY = 34735
# GDAL extension.
_GDAL_NODATA = 42113

_TYPE_SHORT = 3  # uint16
_TYPE_LONG = 4  # uint32
_TYPE_ASCII = 2
_TYPE_DOUBLE = 12

_TYPE_SIZES = {_TYPE_SHORT: 2, _TYPE_LONG: 4, _TYPE_ASCII: 1, _TYPE_DOUBLE: 8}

# GeoKey directory: version 1.1.0; GTModelType=2 (geographic),
# GTRasterType=1 (PixelIsArea), GeographicType=4326 (WGS-84).
_GEO_KEYS = (1, 1, 0, 3, 1024, 0, 1, 2, 1025, 0, 1, 1, 2048, 0, 1, 4326)


@dataclass(frozen=True)
class GeoRaster:
    """A decoded north-up raster: values[row, col], row 0 at ``north``."""

    values: np.ndarray  # 2-D float32
    west: float
    north: float
    xres: float
    yres: float  # positive; rows advance southward
    nodata: float | None = None


def encode_geotiff(raster: GeoRaster) -> bytes:
    """Encode a north-up Float32 raster as GeoTIFF bytes (pure Python)."""
    values = np.ascontiguousarray(raster.values, dtype="<f4")
    if values.ndim != 2:
        raise ValueError(f"raster must be 2-D, got shape {values.shape}")
    height, width = values.shape
    pixel_data = values.tobytes()

    entries: list[tuple[int, int, int, bytes]] = []  # (tag, type, count, packed)

    def entry(tag: int, typ: int, vals) -> None:
        if typ == _TYPE_ASCII:
            packed = vals.encode("ascii") + b"\x00"
            entries.append((tag, typ, len(packed), packed))
            return
        fmt = {_TYPE_SHORT: "H", _TYPE_LONG: "I", _TYPE_DOUBLE: "d"}[typ]
        packed = struct.pack(f"<{len(vals)}{fmt}", *vals)
        entries.append((tag, typ, len(vals), packed))

    entry(_IMAGE_WIDTH, _TYPE_LONG, [width])
    entry(_IMAGE_LENGTH, _TYPE_LONG, [height])
    entry(_BITS_PER_SAMPLE, _TYPE_SHORT, [32])
    entry(_COMPRESSION, _TYPE_SHORT, [1])  # none (LZW needs a codec lib)
    entry(_PHOTOMETRIC, _TYPE_SHORT, [1])  # BlackIsZero
    entry(_STRIP_OFFSETS, _TYPE_LONG, [0])  # patched below
    entry(_SAMPLES_PER_PIXEL, _TYPE_SHORT, [1])
    entry(_ROWS_PER_STRIP, _TYPE_LONG, [height])
    entry(_STRIP_BYTE_COUNTS, _TYPE_LONG, [len(pixel_data)])
    entry(_PLANAR_CONFIG, _TYPE_SHORT, [1])
    entry(_SAMPLE_FORMAT, _TYPE_SHORT, [3])  # IEEE float
    entry(_MODEL_PIXEL_SCALE, _TYPE_DOUBLE, [raster.xres, raster.yres, 0.0])
    # Tiepoint: raster (0,0,0) ↔ model (west, north, 0).
    entry(_MODEL_TIEPOINT, _TYPE_DOUBLE, [0.0, 0.0, 0.0, raster.west, raster.north, 0.0])
    entry(_GEO_KEY_DIRECTORY, _TYPE_SHORT, list(_GEO_KEYS))
    if raster.nodata is not None:
        entry(_GDAL_NODATA, _TYPE_ASCII, repr(raster.nodata))

    entries.sort(key=lambda e: e[0])  # IFD entries must be tag-ascending

    # Layout: header (8) | IFD | overflow values | pixel strip.
    ifd_offset = 8
    ifd_size = 2 + 12 * len(entries) + 4
    overflow_offset = ifd_offset + ifd_size
    overflow: list[bytes] = []
    cursor = overflow_offset
    fields: list[bytes] = []
    patched: dict[int, int] = {}
    for tag, typ, count, packed in entries:
        if len(packed) <= 4:
            value_bytes = packed.ljust(4, b"\x00")
        else:
            overflow.append(packed)
            value_bytes = struct.pack("<I", cursor)
            cursor += len(packed)
        fields.append(struct.pack("<HHI", tag, typ, count) + value_bytes)
        patched[tag] = len(fields) - 1
    strip_offset = cursor
    # Patch StripOffsets now that the data position is known.
    idx = patched[_STRIP_OFFSETS]
    fields[idx] = fields[idx][:8] + struct.pack("<I", strip_offset)

    out = bytearray()
    out += struct.pack("<2sHI", b"II", 42, ifd_offset)
    out += struct.pack("<H", len(entries))
    out += b"".join(fields)
    out += struct.pack("<I", 0)  # no next IFD
    out += b"".join(overflow)
    out += pixel_data
    return bytes(out)


def decode_geotiff(data: bytes) -> GeoRaster:
    """Decode a single-strip Float32 GeoTIFF produced by this module (or
    any uncompressed little-endian equivalent)."""
    byte_order, magic, ifd_offset = struct.unpack_from("<2sHI", data, 0)
    if byte_order != b"II" or magic != 42:
        raise ValueError("not a little-endian classic TIFF")
    (n_entries,) = struct.unpack_from("<H", data, ifd_offset)
    tags: dict[int, list] = {}
    for i in range(n_entries):
        tag, typ, count = struct.unpack_from("<HHI", data, ifd_offset + 2 + 12 * i)
        value_field = ifd_offset + 2 + 12 * i + 8
        size = _TYPE_SIZES[typ] * count
        if size <= 4:
            off = value_field
        else:
            (off,) = struct.unpack_from("<I", data, value_field)
        if typ == _TYPE_ASCII:
            tags[tag] = [data[off : off + count - 1].decode("ascii")]
        else:
            fmt = {_TYPE_SHORT: "H", _TYPE_LONG: "I", _TYPE_DOUBLE: "d"}[typ]
            tags[tag] = list(struct.unpack_from(f"<{count}{fmt}", data, off))
    if tags.get(_COMPRESSION, [1])[0] != 1:
        raise ValueError("compressed TIFF needs rasterio")
    width = tags[_IMAGE_WIDTH][0]
    height = tags[_IMAGE_LENGTH][0]
    strip_off = tags[_STRIP_OFFSETS][0]
    strip_len = tags[_STRIP_BYTE_COUNTS][0]
    values = np.frombuffer(data[strip_off : strip_off + strip_len], dtype="<f4").reshape(
        height, width
    )
    xres, yres, _ = tags[_MODEL_PIXEL_SCALE]
    tie = tags[_MODEL_TIEPOINT]
    nodata = float(tags[_GDAL_NODATA][0]) if _GDAL_NODATA in tags else None
    return GeoRaster(
        values=values.copy(), west=tie[3], north=tie[4], xres=xres, yres=yres, nodata=nodata
    )


def write_geotiff(raster: GeoRaster, path: str) -> None:
    """Write one raster file; rasterio (LZW predictor=3, the reference's
    creation options) when available, else the pure-Python encoder."""
    if HAVE_RASTERIO:  # pragma: no cover - not present in this environment
        transform = from_origin(raster.west, raster.north, raster.xres, raster.yres)
        with rasterio.open(
            path,
            "w",
            driver="GTiff",
            height=raster.values.shape[0],
            width=raster.values.shape[1],
            count=1,
            dtype="float32",
            crs="EPSG:4326",
            transform=transform,
            compress="lzw",
            predictor=3,
            nodata=raster.nodata,
        ) as dst:
            dst.write(raster.values.astype("float32"), 1)
        return
    with open(path, "wb") as f:
        f.write(encode_geotiff(raster))


def read_geotiff(path: str) -> GeoRaster:
    with open(path, "rb") as f:
        return decode_geotiff(f.read())
