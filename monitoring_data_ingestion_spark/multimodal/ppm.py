"""Pure-Python PPM (P6) image codec — the dependency-free decode path.

The reference ships raster payloads as opaque byte buffers and shells out
to codec binaries (/root/reference/src/download.js:101-105); this engine's
equivalent gate was "decode requires PIL". Like the GeoTIFF encoder
(grid/geotiff.py), the gate closes with a pure-Python implementation of an
uncompressed format: binary PPM (P6) — 15-byte header + raw RGB — is
enough to make decode → transform → re-encode a REAL executor-side path
with zero native dependencies. PIL remains the fast path for compressed
formats where it exists.

All functions are deterministic and defined so an oracle can reproduce
results closed-form:

* grayscale is ITU-R 601-2 integer luma: (299·R + 587·G + 114·B) // 1000
  (identical to PIL's ``convert("L")`` coefficients);
* nearest-neighbor resize maps output pixel x to source floor(x·w / w')
  (top-left anchored — the form a SQL oracle states as FLOOR(x*w/w')).

numpy is used internally for vectorization (Arrow batches arrive as
columnar buffers; per-pixel Python loops would dominate the batch time).
"""

from __future__ import annotations

import numpy as np

MAGIC = b"P6"
MAXVAL = 255


def encode_ppm(width: int, height: int, rgb: bytes) -> bytes:
    """Binary PPM: ``P6\\n{w} {h}\\n255\\n`` + width*height RGB triplets."""
    if len(rgb) != width * height * 3:
        raise ValueError(
            f"rgb payload is {len(rgb)} bytes, expected {width * height * 3}"
        )
    return f"P6\n{width} {height}\n{MAXVAL}\n".encode("ascii") + bytes(rgb)


def is_ppm(payload: bytes) -> bool:
    return bytes(payload[:2]) == MAGIC


def _next_token(buf: bytes, pos: int) -> tuple[int, int]:
    """Parse the next ASCII integer token, skipping whitespace and
    ``#``-comments (the PPM header grammar)."""
    n = len(buf)
    while pos < n:
        c = buf[pos]
        if c == 0x23:  # '#'
            while pos < n and buf[pos] != 0x0A:
                pos += 1
        elif chr(c).isspace():
            pos += 1
        else:
            break
    start = pos
    while pos < n and not chr(buf[pos]).isspace():
        pos += 1
    if start == pos:
        raise ValueError("truncated PPM header")
    return int(buf[start:pos]), pos


def decode_ppm(payload: bytes) -> tuple[int, int, bytes]:
    """(width, height, rgb bytes) of a binary P6 payload."""
    payload = bytes(payload)
    if not is_ppm(payload):
        raise ValueError("not a P6 PPM payload")
    width, pos = _next_token(payload, 2)
    height, pos = _next_token(payload, pos)
    maxval, pos = _next_token(payload, pos)
    if maxval != MAXVAL:
        raise ValueError(f"only maxval={MAXVAL} supported, got {maxval}")
    pos += 1  # exactly one whitespace byte separates header from raster
    rgb = payload[pos : pos + width * height * 3]
    if len(rgb) != width * height * 3:
        raise ValueError("truncated PPM raster")
    return width, height, rgb


def gray_pixels(rgb: bytes, width: int, height: int) -> list[int]:
    """Row-major ITU-R 601-2 integer luma of an RGB buffer."""
    a = np.frombuffer(rgb, dtype=np.uint8).astype(np.int64).reshape(-1, 3)
    luma = (a[:, 0] * 299 + a[:, 1] * 587 + a[:, 2] * 114) // 1000
    return luma.astype(int).tolist()


def resize_nearest(
    rgb: bytes, width: int, height: int, new_width: int, new_height: int
) -> bytes:
    """Nearest-neighbor resample: output (x, y) reads source
    (floor(x·w/w'), floor(y·h/h')) — deterministic, oracle-reproducible."""
    a = np.frombuffer(rgb, dtype=np.uint8).reshape(height, width, 3)
    xs = (np.arange(new_width, dtype=np.int64) * width) // new_width
    ys = (np.arange(new_height, dtype=np.int64) * height) // new_height
    return a[ys][:, xs].tobytes()


def synthetic_ppm(doc_id: int, width: int, height: int) -> bytes:
    """Deterministic test image: every channel of pixel (x, y) is
    ``(doc_id + x + y) % 256`` — a gradient whose luma equals the channel
    value (299+587+114 = 1000), so any pixel statistic after decode /
    resize has a closed-form the oracle can state in SQL."""
    y, x = np.mgrid[0:height, 0:width]
    v = ((doc_id + x + y) % 256).astype(np.uint8)
    return encode_ppm(width, height, np.stack([v, v, v], axis=-1).tobytes())
