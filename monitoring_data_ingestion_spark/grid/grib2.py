"""Pure-Python GRIB edition-2 codec: sectioned messages, simple packing,
regex record matching — the reference's ``wgrib2`` input path.

The reference extracts GRIB2 records by inventory-string regex and count
limit (/root/reference/src/file-conversions.js:75-99: ``wgrib2 input
-match <regex> -limit <n> -grib out``). This module implements the
format surface that path needs, the same way ``grid/grib1.py`` covers
the ``wgrib`` edition-1 path:

* Section 0 (Indicator): "GRIB", discipline, edition 2, 64-bit length.
* Section 1 (Identification): centre, reference time (full 16-bit year).
* Section 3 (Grid definition, template 3.0): regular lat/lon grid,
  Ni×Nj, first-point lat/lon and increments in MICROdegrees (GRIB2's
  10^-6 resolution vs GRIB1's millidegrees), scanning mode 0.
* Section 4 (Product definition, template 4.0): parameter category +
  number, the pair wgrib2 inventory strings name.
* Section 5 (Data representation, template 5.0): simple packing with an
  IEEE 754 binary32 reference value (GRIB2 dropped GRIB1's IBM float),
  signed-magnitude binary/decimal scale factors, nbits.
* Section 6 (Bitmap): indicator 255 = none, 0 = bitmap present.
* Section 7 (Data): big-endian bit-packed increments,
  Y = (R + X·2^E) / 10^D — the same simple-packing formula as GRIB1.
* Section 8: "7777".

Record matching parity: :func:`inventory_line` renders a wgrib2-style
``d{discipline}:c{category},n{number}:{YYYYMMDDHH}`` string per record
and :func:`match_records` selects by regex with an optional count limit
— ``wgrib2 -match -limit`` as a pure function over the scanned file.

All encode/decode arithmetic is stated closed-form (see grib1.py's
module docstring); integer-valued grids with E=0, D=0 and an
integer-exact float32 reference decode BIT-EXACTLY.
"""

from __future__ import annotations

import re
import struct
from dataclasses import dataclass

import numpy as np

# GRIB2 shares GRIB1's bit packing and signed-magnitude 16-bit encoding
# (both big-endian, top bit = sign) — one implementation, two editions.
from .grib1 import _pack_bits, _rs16 as _rs16be, _s16 as _s16be, _unpack_bits
from .grib1 import quantize_simple_packing

MAGIC = b"GRIB"
TERMINATOR = b"7777"
EDITION = 2


def _f32_encode(x: float) -> bytes:
    return struct.pack(">f", float(np.float32(x)))


def _f32_encode_floor(x: float) -> bytes:
    """Largest float32 ≤ x (see grib1.ibm32_encode_floor for why the
    reference value must round toward −∞)."""
    f = np.float32(x)
    if float(f) > x:
        f = np.nextafter(f, np.float32(-np.inf))
    return struct.pack(">f", float(f))


def _f32_decode(b: bytes) -> float:
    return struct.unpack(">f", b)[0]


def _s32be(n: int) -> bytes:
    """Signed-magnitude 32-bit (GRIB2 lat/lon in microdegrees)."""
    mag = abs(int(n))
    if mag >= 1 << 31:
        raise ValueError("signed-magnitude 32-bit overflow")
    return bytes(
        [
            (0x80 if n < 0 else 0) | (mag >> 24),
            (mag >> 16) & 0xFF,
            (mag >> 8) & 0xFF,
            mag & 0xFF,
        ]
    )


def _rs32be(b: bytes, off: int) -> int:
    mag = ((b[off] & 0x7F) << 24) | (b[off + 1] << 16) | (b[off + 2] << 8) | b[off + 3]
    return -mag if b[off] & 0x80 else mag


@dataclass
class Grib2Record:
    """One decoded GRIB2 message."""

    discipline: int
    category: int
    number: int
    reftime: tuple[int, int, int, int, int]  # (year, month, day, hour, minute)
    ni: int
    nj: int
    lat_first_udeg: int
    lon_first_udeg: int
    dlat_udeg: int
    dlon_udeg: int
    decimal_scale: int
    binary_scale: int
    reference_value: float
    nbits: int
    values: np.ndarray  # (nj, ni) float64, NaN where the bitmap masks


def encode_grib2_message(
    values: np.ndarray,
    *,
    discipline: int = 0,  # meteorological
    category: int = 0,  # temperature
    number: int = 0,  # TMP
    reftime: tuple[int, int, int, int, int] = (2020, 1, 1, 0, 0),
    lat_first_udeg: int = 90_000_000,
    lon_first_udeg: int = 0,
    dlat_udeg: int = 1_000_000,
    dlon_udeg: int = 1_000_000,
    decimal_scale: int = 0,
    binary_scale: int = 0,
    nbits: int = 16,
    bitmap: np.ndarray | None = None,
    reference_value: float | None = None,
) -> bytes:
    """Encode a (nj, ni) grid as one GRIB2 message (templates 3.0/4.0/5.0)."""
    vals = np.asarray(values, dtype=np.float64)
    if vals.ndim != 2:
        raise ValueError("values must be (nj, ni)")
    nj, ni = vals.shape
    present = vals.reshape(-1)
    if bitmap is not None:
        bm = np.asarray(bitmap, dtype=bool)
        if bm.shape != vals.shape:
            raise ValueError("bitmap shape must match values")
        present = present[bm.reshape(-1)]
    r_bytes, r, x = quantize_simple_packing(
        present,
        decimal_scale,
        binary_scale,
        nbits,
        reference_value,
        _f32_encode,
        _f32_encode_floor,
        _f32_decode,
    )
    packed = _pack_bits(x, nbits)

    def section(number_: int, body: bytes) -> bytes:
        return struct.pack(">IB", 4 + 1 + len(body), number_) + body

    s1 = section(
        1,
        struct.pack(">HHBBB", 74, 0, 2, 1, 1)  # centre, subcentre, tables, local, sig
        + struct.pack(">HBBBBB", reftime[0], reftime[1], reftime[2], reftime[3], reftime[4], 0)
        + bytes([0, 1]),  # production status, data type
    )
    tmpl30 = (
        bytes([6, 0xFF])  # shape of earth: spherical r=6371229 m, no scale
        + b"\xff\xff\xff\xff"  # scaled radius (missing)
        + bytes([0xFF]) + b"\xff\xff\xff\xff"  # major axis sf + value (missing)
        + bytes([0xFF]) + b"\xff\xff\xff\xff"  # minor axis sf + value (missing)
        + struct.pack(">I", ni)
        + struct.pack(">I", nj)
        + struct.pack(">I", 0)  # basic angle
        + b"\xff\xff\xff\xff"  # subdivisions (missing)
        + _s32be(lat_first_udeg)
        + _s32be(lon_first_udeg)
        + bytes([0x30])  # resolution/component flags: increments given
        + _s32be(lat_first_udeg - (nj - 1) * dlat_udeg)
        + _s32be(lon_first_udeg + (ni - 1) * dlon_udeg)
        + struct.pack(">I", dlon_udeg)
        + struct.pack(">I", dlat_udeg)
        + bytes([0x00])  # scanning mode: +i, −j, row major
    )
    s3 = section(3, bytes([0]) + struct.pack(">I", ni * nj) + bytes([0, 0]) + struct.pack(">H", 0) + tmpl30)
    s4 = section(
        4,
        struct.pack(">H", 0)  # number of coordinate values
        + struct.pack(">H", 0)  # product definition template 4.0
        + bytes([category, number, 2, 0, 0])  # cat, num, process type, ids
        + b"\x00\x00"  # hours of cutoff
        + bytes([0])  # minutes
        + bytes([1])  # time unit: hour
        + struct.pack(">I", 0)  # forecast time
        + bytes([1, 0]) + struct.pack(">I", 0)  # fixed surface 1
        + bytes([0xFF, 0xFF]) + b"\xff\xff\xff\xff",  # fixed surface 2 (missing)
    )
    s5 = section(
        5,
        struct.pack(">I", len(present))
        + struct.pack(">H", 0)  # data representation template 5.0
        + r_bytes
        + _s16be(binary_scale)
        + _s16be(decimal_scale)
        + bytes([nbits])
        + bytes([0]),  # original field type: float
    )
    if bitmap is not None:
        bm_bits = np.packbits(bm.reshape(-1).astype(np.uint8)).tobytes()
        s6 = section(6, bytes([0]) + bm_bits)
    else:
        s6 = section(6, bytes([255]))
    s7 = section(7, packed)
    body = s1 + s3 + s4 + s5 + s6 + s7
    total = 16 + len(body) + 4
    s0 = MAGIC + bytes([0, 0, discipline, EDITION]) + struct.pack(">Q", total)
    return s0 + body + TERMINATOR


def iter_messages2(buf: bytes):
    """Scan a multi-record GRIB2 file: yield each message's exact bytes."""
    buf = bytes(buf)
    pos = 0
    n = len(buf)
    while pos < n:
        idx = buf.find(MAGIC, pos)
        if idx < 0:
            return
        if idx + 16 > n:
            raise ValueError("truncated GRIB2 indicator section")
        if buf[idx + 7] != EDITION:
            raise ValueError(f"unsupported GRIB edition {buf[idx + 7]}")
        (total,) = struct.unpack_from(">Q", buf, idx + 8)
        end = idx + total
        if end > n:
            raise ValueError("truncated GRIB2 message")
        if buf[end - 4 : end] != TERMINATOR:
            raise ValueError("missing 7777 terminator")
        yield buf[idx:end]
        pos = end


def _sections(msg: bytes) -> dict[int, bytes]:
    """Split one message into its numbered sections (body bytes include
    the 5-byte section header for offset-stable indexing).

    Repeated sections — GRIB2 legally repeats 4-7 for multi-field
    messages — are REJECTED loudly: collapsing them to the last
    occurrence would silently decode (and inventory) only the final
    field. Zero/short section lengths are rejected rather than spun on."""
    out = {0: msg[:16]}
    pos = 16
    while pos < len(msg) - 4:
        length, number = struct.unpack_from(">IB", msg, pos)
        if length < 5:
            raise ValueError(f"malformed section header (length {length})")
        if number in out:
            raise ValueError(
                f"repeated section {number}: multi-field GRIB2 messages are "
                "not supported (split fields into separate messages)"
            )
        out[number] = msg[pos : pos + length]
        pos += length
    return out


def decode_grib2(msg: bytes) -> Grib2Record:
    """Decode one GRIB2 message (templates 3.0 / 4.0 / 5.0)."""
    msg = bytes(msg)
    if msg[:4] != MAGIC or msg[7] != EDITION:
        raise ValueError("not a GRIB edition-2 message")
    discipline = msg[6]
    s = _sections(msg)

    s1 = s[1]
    year, = struct.unpack_from(">H", s1, 12)
    reftime = (year, s1[14], s1[15], s1[16], s1[17])

    s3 = s[3]
    (tmpl_no,) = struct.unpack_from(">H", s3, 12)
    if tmpl_no != 0:
        raise ValueError(f"unsupported grid definition template {tmpl_no}")
    g = s3[14:]  # template 3.0 body
    (ni,) = struct.unpack_from(">I", g, 16)
    (nj,) = struct.unpack_from(">I", g, 20)
    lat_first = _rs32be(g, 32)
    lon_first = _rs32be(g, 36)
    # Same loud-stop policy as grib1: a non-zero scanning mode reorders
    # cells — decoding it as row-major +i,−j is silent geography
    # corruption. Flag bit 0x20 of the resolution/component octet means
    # the i/j increments are given; without it the Di/Dj fields are
    # missing values.
    if g[57] != 0:
        raise ValueError(
            f"unsupported scanning mode 0x{g[57]:02x} (only +i,-j row-major)"
        )
    if not g[40] & 0x30:
        raise ValueError("direction increments not given (resolution flags)")
    (dlon,) = struct.unpack_from(">I", g, 49)
    (dlat,) = struct.unpack_from(">I", g, 53)

    s4 = s[4]
    category, number = s4[9], s4[10]

    s5 = s[5]
    (tmpl5,) = struct.unpack_from(">H", s5, 9)
    if tmpl5 != 0:
        raise ValueError(f"unsupported data representation template {tmpl5}")
    (n_present,) = struct.unpack_from(">I", s5, 5)
    (r,) = struct.unpack_from(">f", s5, 11)
    binary_scale = _rs16be(s5, 15)
    decimal_scale = _rs16be(s5, 17)
    nbits = s5[19]

    s6 = s[6]
    bitmap = None
    if s6[5] == 0:
        bits = np.unpackbits(np.frombuffer(s6[6:], dtype=np.uint8))[: ni * nj]
        bitmap = bits.astype(bool)
    elif s6[5] != 255:
        raise ValueError(f"unsupported bitmap indicator {s6[5]}")

    s7 = s[7]
    if nbits:
        x = _unpack_bits(s7[5:], n_present, nbits)
        present_vals = (float(r) + x.astype(np.float64) * (2.0 ** binary_scale)) / (
            10.0 ** decimal_scale
        )
    else:
        present_vals = np.full(n_present, float(r) / (10.0 ** decimal_scale))

    if bitmap is not None:
        values = np.full(ni * nj, np.nan)
        values[bitmap] = present_vals
    else:
        values = present_vals
    return Grib2Record(
        discipline=discipline,
        category=category,
        number=number,
        reftime=reftime,
        ni=ni,
        nj=nj,
        lat_first_udeg=lat_first,
        lon_first_udeg=lon_first,
        dlat_udeg=dlat,
        dlon_udeg=dlon,
        decimal_scale=decimal_scale,
        binary_scale=binary_scale,
        reference_value=float(r),
        nbits=nbits,
        values=values.reshape(nj, ni),
    )


def inventory_line(msg: bytes) -> str:
    """wgrib2-style inventory string for one message:
    ``d{discipline}:c{category},n{number}:{YYYYMMDDHH}`` — the text
    ``-match`` regexes run against (a stable engine-defined rendering of
    the same fields wgrib2 prints)."""
    if msg[:4] != MAGIC or msg[7] != EDITION:
        raise ValueError("not a GRIB edition-2 message")
    s = _sections(msg)
    s1, s4 = s[1], s[4]
    (year,) = struct.unpack_from(">H", s1, 12)
    return (
        f"d{msg[6]}:c{s4[9]},n{s4[10]}:"
        f"{year:04d}{s1[14]:02d}{s1[15]:02d}{s1[16]:02d}"
    )


def match_records(buf: bytes, pattern: str, limit: int | None = None) -> list[bytes]:
    """``wgrib2 input -match <regex> [-limit n]`` parity
    (/root/reference/src/file-conversions.js:75-99): every message whose
    inventory line matches ``pattern`` (regex search), in file order,
    capped at ``limit`` when given."""
    rx = re.compile(pattern)
    out: list[bytes] = []
    for msg in iter_messages2(buf):
        if rx.search(inventory_line(msg)):
            out.append(msg)
            if limit is not None and len(out) >= limit:
                break
    return out
