"""Property tests for the pure-Python PPM codec (multimodal/ppm.py),
cross-checked against PIL where it is installed (PIL-gated skips — the
build container has no PIL; these arm automatically on hosts that do).

Cross-check contracts, derived from the two libraries' published
semantics rather than wishful equality:

* decode: P6 is lossless — PIL.Image.open of our encoding must yield the
  exact pixel matrix, and our decoder must read PIL's P6 output exactly;
* resize NEAREST: PIL samples the pixel center (src = floor((x+0.5)·w/w'))
  while ours is top-left anchored (src = floor(x·w/w')); for INTEGER
  upscale factors the two mappings are provably identical (no integer m
  falls in [x/k, (x+0.5)/k)), so equality is asserted there and only
  there;
* luma: PIL's convert("L") uses the same ITU-R 601-2 coefficients but
  rounds ((r·19595 + g·38470 + b·7471 + 0x8000) >> 16) where ours
  truncates ((299r + 587g + 114b) // 1000) — so agreement is asserted
  to within 1 level.
"""

from __future__ import annotations

import io

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from monitoring_data_ingestion_spark.multimodal.ppm import (
    decode_ppm,
    encode_ppm,
    gray_pixels,
    resize_nearest,
    synthetic_ppm,
)

try:
    from PIL import Image

    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False

needs_pil = pytest.mark.skipif(not HAVE_PIL, reason="PIL not installed")


def _random_rgb(seed: int, w: int, h: int) -> bytes:
    return np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8).tobytes()


@settings(max_examples=50, deadline=None)
@given(w=st.integers(1, 32), h=st.integers(1, 32), seed=st.integers(0, 2**31 - 1))
def test_encode_decode_identity(w, h, seed):
    rgb = _random_rgb(seed, w, h)
    assert decode_ppm(encode_ppm(w, h, rgb)) == (w, h, rgb)


@settings(max_examples=50, deadline=None)
@given(
    w=st.integers(1, 24),
    h=st.integers(1, 24),
    seed=st.integers(0, 2**31 - 1),
)
def test_resize_identity_and_single_pixel(w, h, seed):
    rgb = _random_rgb(seed, w, h)
    # Same-size resize is the identity; 1x1 picks the top-left source pixel.
    assert resize_nearest(rgb, w, h, w, h) == rgb
    assert resize_nearest(rgb, w, h, 1, 1) == rgb[:3]


@settings(max_examples=30, deadline=None)
@given(
    w=st.integers(1, 12),
    h=st.integers(1, 12),
    kx=st.integers(1, 4),
    ky=st.integers(1, 4),
    seed=st.integers(0, 2**31 - 1),
)
def test_resize_integer_upscale_is_pixel_replication(w, h, kx, ky, seed):
    """floor(x·w/(k·w)) = floor(x/k): integer upscale replicates each
    source pixel into a k×k block — checkable without PIL."""
    rgb = _random_rgb(seed, w, h)
    up = np.frombuffer(resize_nearest(rgb, w, h, w * kx, h * ky), dtype=np.uint8)
    up = up.reshape(h * ky, w * kx, 3)
    src = np.frombuffer(rgb, dtype=np.uint8).reshape(h, w, 3)
    np.testing.assert_array_equal(up, np.repeat(np.repeat(src, ky, 0), kx, 1))


@needs_pil
@settings(max_examples=40, deadline=None)
@given(w=st.integers(1, 32), h=st.integers(1, 32), seed=st.integers(0, 2**31 - 1))
def test_pil_reads_our_ppm_exactly(w, h, seed):
    rgb = _random_rgb(seed, w, h)
    img = Image.open(io.BytesIO(encode_ppm(w, h, rgb)))
    assert img.size == (w, h) and img.mode == "RGB"
    assert img.tobytes() == rgb


@needs_pil
@settings(max_examples=40, deadline=None)
@given(w=st.integers(1, 32), h=st.integers(1, 32), seed=st.integers(0, 2**31 - 1))
def test_we_read_pil_ppm_exactly(w, h, seed):
    rgb = _random_rgb(seed, w, h)
    buf = io.BytesIO()
    Image.frombytes("RGB", (w, h), rgb).save(buf, format="PPM")
    assert decode_ppm(buf.getvalue()) == (w, h, rgb)


@needs_pil
@settings(max_examples=30, deadline=None)
@given(
    w=st.integers(1, 16),
    h=st.integers(1, 16),
    kx=st.integers(1, 4),
    ky=st.integers(1, 4),
    seed=st.integers(0, 2**31 - 1),
)
def test_resize_matches_pil_nearest_on_integer_upscale(w, h, kx, ky, seed):
    rgb = _random_rgb(seed, w, h)
    ours = resize_nearest(rgb, w, h, w * kx, h * ky)
    pil = (
        Image.frombytes("RGB", (w, h), rgb)
        .resize((w * kx, h * ky), Image.NEAREST)
        .tobytes()
    )
    assert ours == pil


@needs_pil
@settings(max_examples=40, deadline=None)
@given(w=st.integers(1, 32), h=st.integers(1, 32), seed=st.integers(0, 2**31 - 1))
def test_luma_matches_pil_within_one_level(w, h, seed):
    rgb = _random_rgb(seed, w, h)
    ours = np.array(gray_pixels(rgb, w, h))
    pil = np.frombuffer(
        Image.frombytes("RGB", (w, h), rgb).convert("L").tobytes(), dtype=np.uint8
    ).astype(int)
    assert np.abs(ours - pil).max() <= 1


@needs_pil
def test_luma_exact_on_gray_pixels():
    """On r=g=b images both formulas collapse to the channel value —
    exact agreement (the synthetic fixture is exactly this shape)."""
    blob = synthetic_ppm(7, 16, 9)
    w, h, rgb = decode_ppm(blob)
    ours = np.array(gray_pixels(rgb, w, h), dtype=np.uint8)
    pil = np.frombuffer(
        Image.open(io.BytesIO(blob)).convert("L").tobytes(), dtype=np.uint8
    )
    np.testing.assert_array_equal(ours, pil)
