"""Independent GeoTIFF writer for the vendored interop golden.

This is a SECOND implementation of classic-TIFF + LZW + TTN3
floating-point predictor, written directly from the TIFF 6.0 spec /
Technical Note 3 text, sharing no code or structure with
``grid/geotiff.py`` (string-keyed dict LZW vs the engine's incremental
table; strips-before-IFD file layout vs the engine's IFD-first; fixed
RowsPerStrip=7 vs the engine's 64 KB convention; an extra Software tag).
It exists to produce ``fixtures/golden_lzw_predictor3.tif`` ONCE —
committed to the repo — so the engine's decoder is always tested against
bytes it did not write, standing in for a GDAL-produced artifact in this
dependency-free container (this container ships no GDAL/PIL/tifffile;
the env-gated third-party test in test_geotiff.py still runs wherever
one of those is installed).

Run ``python -m tests.golden_tiff_gen`` to (re)write the fixture; the
interop test re-generates the bytes in-process and asserts byte-identity
with the committed file, so fixture and generator cannot drift apart.
"""

from __future__ import annotations

import struct

import numpy as np

GOLDEN_HEIGHT = 90
GOLDEN_WIDTH = 200
GOLDEN_ROWS_PER_STRIP = 7
GOLDEN_WEST = -20.0
GOLDEN_NORTH = 40.0
GOLDEN_RES = 0.5
GOLDEN_NODATA = -9999.0


def golden_values() -> np.ndarray:
    """Closed-form golden grid — the test's expectation comes from THIS
    formula, not from either encoder: v(i,j) = ((i·37 + j·101) mod 1000)
    − 500 + 0.25, float32."""
    i = np.arange(GOLDEN_HEIGHT, dtype=np.int64)[:, None]
    j = np.arange(GOLDEN_WIDTH, dtype=np.int64)[None, :]
    return (((i * 37 + j * 101) % 1000) - 500 + 0.25).astype("<f4")


def lzw_compress(data: bytes) -> bytes:
    """TIFF-flavor LZW (spec section 13): MSB-first bit packing, codes
    256=Clear / 257=EOI, 9-bit start, width bump at next_code 511/1023/
    2047 (early change), table reset via Clear at 4094."""
    out_bits: list[int] = []  # (value, width) pairs flattened lazily
    codes: list[tuple[int, int]] = []

    def emit(code: int, width: int) -> None:
        codes.append((code, width))

    CLEAR, EOI = 256, 257
    table: dict[bytes, int] = {bytes([b]): b for b in range(256)}
    next_code = 258
    width = 9
    emit(CLEAR, width)
    run = b""
    for byte in data:
        candidate = run + bytes([byte])
        if candidate in table:
            run = candidate
            continue
        emit(table[run], width)
        table[candidate] = next_code
        next_code += 1
        if next_code in (511, 1023, 2047):
            width += 1
        elif next_code == 4094:
            emit(CLEAR, width)
            table = {bytes([b]): b for b in range(256)}
            next_code = 258
            width = 9
        run = bytes([byte])
    if run:
        emit(table[run], width)
    emit(EOI, width)

    # MSB-first bit packing.
    acc = 0
    nbits = 0
    out = bytearray()
    for code, w in codes:
        acc = (acc << w) | code
        nbits += w
        while nbits >= 8:
            nbits -= 8
            out.append((acc >> nbits) & 0xFF)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def fp_predict(rows: np.ndarray) -> bytes:
    """TTN3: per row, split float32 bytes into big-endian byte planes,
    then horizontal byte differencing mod 256 — stated here as an
    explicit per-row Python rearrangement, not the engine's vectorized
    transpose."""
    h, w = rows.shape
    out = bytearray()
    for r in range(h):
        raw = rows[r].astype(">f4").tobytes()
        planes = bytearray(4 * w)
        for plane in range(4):
            for col in range(w):
                planes[plane * w + col] = raw[col * 4 + plane]
        diff = bytearray(planes)
        for k in range(4 * w - 1, 0, -1):
            diff[k] = (planes[k] - planes[k - 1]) & 0xFF
        out += diff
    return bytes(out)


def encode_golden_tiff() -> bytes:
    """Classic little-endian TIFF, strips laid out BEFORE the IFD (the
    header's IFD pointer aims past the pixel data — legal per spec, and
    a layout the engine's own writer never produces)."""
    vals = golden_values()
    h, w = vals.shape
    rps = GOLDEN_ROWS_PER_STRIP
    strips = [
        lzw_compress(fp_predict(vals[r0 : r0 + rps]))
        for r0 in range(0, h, rps)
    ]

    SHORT, LONG, ASCII, DOUBLE = 3, 4, 2, 12
    software = b"independent-golden-writer\x00"
    nodata_ascii = repr(GOLDEN_NODATA).encode() + b"\x00"
    pixel_scale = struct.pack("<3d", GOLDEN_RES, GOLDEN_RES, 0.0)
    tiepoint = struct.pack("<6d", 0.0, 0.0, 0.0, GOLDEN_WEST, GOLDEN_NORTH, 0.0)
    geokeys = struct.pack(
        "<16H",
        1, 1, 0, 3,          # directory header: version 1.1.0, 3 keys
        1024, 0, 1, 2,       # GTModelTypeGeoKey = geographic
        1025, 0, 1, 1,       # GTRasterTypeGeoKey = PixelIsArea
        2048, 0, 1, 4326,    # GeographicTypeGeoKey = WGS84
    )

    strip_data_offset = 8
    offs = []
    pos = strip_data_offset
    for s in strips:
        offs.append(pos)
        pos += len(s)
    ifd_offset = pos + (pos % 2)  # word-align the IFD

    # (tag, type, count, payload)
    fields = [
        (256, LONG, 1, struct.pack("<I", w)),
        (257, LONG, 1, struct.pack("<I", h)),
        (258, SHORT, 1, struct.pack("<H", 32)),
        (259, SHORT, 1, struct.pack("<H", 5)),            # LZW
        (262, SHORT, 1, struct.pack("<H", 1)),
        (273, LONG, len(strips), struct.pack(f"<{len(strips)}I", *offs)),
        (277, SHORT, 1, struct.pack("<H", 1)),
        (278, LONG, 1, struct.pack("<I", rps)),
        (279, LONG, len(strips), struct.pack(f"<{len(strips)}I", *(len(s) for s in strips))),
        (284, SHORT, 1, struct.pack("<H", 1)),
        (305, ASCII, len(software), software),
        (317, SHORT, 1, struct.pack("<H", 3)),            # predictor 3
        (339, SHORT, 1, struct.pack("<H", 3)),            # IEEE float
        (33550, DOUBLE, 3, pixel_scale),
        (33922, DOUBLE, 6, tiepoint),
        (34735, SHORT, 16, geokeys),
        (42113, ASCII, len(nodata_ascii), nodata_ascii),
    ]
    fields.sort(key=lambda f: f[0])
    overflow_start = ifd_offset + 2 + 12 * len(fields) + 4
    ifd = bytearray(struct.pack("<H", len(fields)))
    overflow = bytearray()
    for tag, typ, count, payload in fields:
        if len(payload) <= 4:
            value = payload.ljust(4, b"\x00")
        else:
            value = struct.pack("<I", overflow_start + len(overflow))
            overflow += payload
        ifd += struct.pack("<HHI", tag, typ, count) + value
    ifd += struct.pack("<I", 0)

    out = bytearray(struct.pack("<2sHI", b"II", 42, ifd_offset))
    for s in strips:
        out += s
    out += b"\x00" * (ifd_offset - len(out))  # alignment pad
    out += ifd + overflow
    return bytes(out)


def main() -> None:
    import os

    path = os.path.join(os.path.dirname(__file__), "..", "fixtures",
                        "golden_lzw_predictor3.tif")
    data = encode_golden_tiff()
    with open(path, "wb") as f:
        f.write(data)
    print(f"wrote {path} ({len(data)} bytes, "
          f"{-(-GOLDEN_HEIGHT // GOLDEN_ROWS_PER_STRIP)} strips)")


if __name__ == "__main__":
    main()
