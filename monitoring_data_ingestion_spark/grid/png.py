"""Minimal pure-Python PNG codec for GRIB2 template 5.41 (PNG packing).

GRIB2's PNG data representation stores the scaled integer field as one
PNG image (section 7.41 is literally a PNG file): grayscale 8/16-bit for
nbits ≤ 16, RGB for 24, RGBA for 32, each pixel's bytes big-endian —
the convention NCEP's public g2clib (pngpack/pngunpack) and wgrib2
follow, and what operational products like MRMS ship. The engine needs
only that subset, implemented here on the stdlib:

* zlib for the IDAT deflate stream and the per-chunk CRC-32;
* the PNG container (signature, IHDR/IDAT/IEND chunks, big-endian
  lengths) hand-rolled — ~40 lines;
* all five scanline filters (None/Sub/Up/Average/Paeth) implemented on
  DECODE for robustness against foreign encoders; our own encoder emits
  filter 0 (None) — the field is already a quantized integer raster, so
  deflate does the compressing and filter prediction buys little.

Interlacing (Adam7), palettes, and ancillary chunks are rejected loudly
— no GRIB encoder emits them.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIGNATURE = b"\x89PNG\r\n\x1a\n"

# (bit depth, colour type, bytes per pixel) per GRIB sample width.
_MODES = {8: (8, 0, 1), 16: (16, 0, 2), 24: (8, 2, 3), 32: (8, 6, 4)}


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def png_encode(samples: np.ndarray, sample_bits: int) -> bytes:
    """Encode a (height, width) array of unsigned ints as a PNG whose
    pixels carry ``sample_bits`` (8/16/24/32) big-endian bits each."""
    if sample_bits not in _MODES:
        raise ValueError(f"unsupported PNG sample width {sample_bits}")
    depth, colour, bpp = _MODES[sample_bits]
    s = np.asarray(samples, dtype=np.uint64)
    if s.ndim != 2:
        raise ValueError("samples must be (height, width)")
    if len(s) and int(s.max()) >= 1 << sample_bits:
        raise ValueError(f"sample overflows {sample_bits} bits")
    h, w = s.shape
    raw = np.zeros((h, w, bpp), dtype=np.uint8)
    for k in range(bpp):  # big-endian byte split across channels
        raw[:, :, bpp - 1 - k] = (s >> np.uint64(8 * k)) & np.uint64(0xFF)
    scanlines = b"".join(
        b"\x00" + raw[y].tobytes() for y in range(h)
    )  # filter 0 per row
    ihdr = struct.pack(">IIBBBBB", w, h, depth, colour, 0, 0, 0)
    return (
        _SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(scanlines, 9))
        + _chunk(b"IEND", b"")
    )


def _unfilter(data: bytes, h: int, w: int, bpp: int) -> np.ndarray:
    """Reverse PNG scanline filtering → (h, w*bpp) uint8 raster.

    Sub/Average/Paeth reverse with a per-byte Python loop (the
    recurrence is inherently sequential along a row).  The engine's
    own 5.41 output always uses filter 0 (vectorized path), so this
    loop only runs on FOREIGN-encoded PNG-packed records.  If such
    archives become a hot input at landing scale, this function — like
    the whole mapInPandas decode stage it runs in (see grid/jpeg2000.py
    module docstring) — is the swap-in point for a native PNG decoder;
    its contract is just bytes → (h, w*bpp) uint8."""
    stride = w * bpp
    out = np.zeros((h, stride), dtype=np.uint8)
    pos = 0
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        ftype = data[pos]
        line = np.frombuffer(data, dtype=np.uint8, count=stride, offset=pos + 1)
        pos += 1 + stride
        cur = line.astype(np.int32)
        if ftype == 0:  # None
            pass
        elif ftype == 2:  # Up
            cur = (cur + prev) & 0xFF
        elif ftype in (1, 3, 4):  # Sub / Average / Paeth need a left scan
            rec = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                a = rec[x - bpp] if x >= bpp else 0
                b = prev[x]
                if ftype == 1:
                    rec[x] = (cur[x] + a) & 0xFF
                elif ftype == 3:
                    rec[x] = (cur[x] + (a + b) // 2) & 0xFF
                else:
                    c = prev[x - bpp] if x >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    rec[x] = (cur[x] + pred) & 0xFF
            cur = rec
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out


def png_decode(buf: bytes) -> tuple[np.ndarray, int]:
    """Decode a PNG produced by :func:`png_encode` (or any non-interlaced
    grayscale/RGB/RGBA PNG) → ((height, width) uint64 samples, sample
    bits)."""
    if buf[:8] != _SIGNATURE:
        raise ValueError("not a PNG stream")
    pos = 8
    ihdr = None
    idat = b""
    while pos < len(buf):
        (length,) = struct.unpack_from(">I", buf, pos)
        tag = buf[pos + 4 : pos + 8]
        body = buf[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack_from(">I", buf, pos + 8 + length)
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + length
    if ihdr is None:
        raise ValueError("missing IHDR")
    w, h, depth, colour, comp, filt, interlace = ihdr
    if interlace:
        raise ValueError("interlaced PNG is not supported")
    if comp or filt:
        raise ValueError("unknown PNG compression/filter method")
    for bits, (d, c, bpp) in _MODES.items():
        if (d, c) == (depth, colour):
            sample_bits = bits
            break
    else:
        raise ValueError(f"unsupported PNG mode depth={depth} colour={colour}")
    bpp = _MODES[sample_bits][2]
    raw = _unfilter(zlib.decompress(idat), h, w, bpp)
    channels = raw.reshape(h, w, bpp).astype(np.uint64)
    samples = np.zeros((h, w), dtype=np.uint64)
    for k in range(bpp):
        samples |= channels[:, :, bpp - 1 - k] << np.uint64(8 * k)
    return samples, sample_bits
