"""GeoTIFF sink (S6): pure-Python encoder/decoder round-trips and the
distributed applyInPandas sink (one raster per group, manifest-only on the
driver). Mirrors /root/reference/src/file-conversions.js:57-74 (Float32
GeoTIFF output) without the GDAL dependency.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from monitoring_data_ingestion_spark.grid.geotiff import (
    GeoRaster,
    decode_geotiff,
    encode_geotiff,
    read_geotiff,
    write_geotiff,
)
from monitoring_data_ingestion_spark.grid.ops import grid_to_raster, to_geotiff


def _raster():
    rng = np.random.default_rng(7)
    return GeoRaster(
        values=rng.normal(280, 15, (18, 36)).astype("float32"),
        west=-180.0,
        north=90.0,
        xres=10.0,
        yres=10.0,
        nodata=-9999.0,
    )


def test_encode_decode_round_trip():
    r = _raster()
    back = decode_geotiff(encode_geotiff(r))
    np.testing.assert_array_equal(back.values, r.values)
    assert (back.west, back.north, back.xres, back.yres) == (-180.0, 90.0, 10.0, 10.0)
    assert back.nodata == -9999.0


def test_write_read_file(tmp_path):
    path = str(tmp_path / "grid.tif")
    r = _raster()
    write_geotiff(r, path)
    back = read_geotiff(path)
    np.testing.assert_array_equal(back.values, r.values)


def test_tiff_structure_is_valid():
    """Byte-level sanity: header magic, ascending IFD tags, float32
    sample format — what any external TIFF reader checks first."""
    import struct

    data = encode_geotiff(_raster())
    assert data[:4] == b"II\x2a\x00"
    (ifd_off,) = struct.unpack_from("<I", data, 4)
    (n,) = struct.unpack_from("<H", data, ifd_off)
    tags = [struct.unpack_from("<H", data, ifd_off + 2 + 12 * i)[0] for i in range(n)]
    assert tags == sorted(tags)
    assert 339 in tags  # SampleFormat present (IEEE float)
    assert 33550 in tags and 33922 in tags and 34735 in tags  # geo tags


def test_grid_to_raster_orientation_and_nodata():
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "lat": [10.0, 10.0, 0.0, 0.0],
            "lon": [0.0, 10.0, 0.0, 10.0],
            "value": [1.0, 2.0, 3.0, None],
        }
    )
    r = grid_to_raster(pdf)
    assert r.values.shape == (2, 2)
    # Row 0 is the northern row; NULL became the nodata sentinel.
    np.testing.assert_array_equal(r.values[0], [1.0, 2.0])
    assert r.values[1, 1] == pytest.approx(-9999.0)
    # Pixel-is-area registration: edges are half a cell beyond centers.
    assert r.west == -5.0 and r.north == 15.0


def test_to_geotiff_sink_writes_per_group(spark, tmp_path):
    rows = []
    for var in ("t2m", "tp"):
        for lat in (20.0, 10.0, 0.0):
            for lon in (0.0, 10.0):
                rows.append((var, lat, lon, float(hash((var, lat, lon)) % 1000)))
    df = spark.createDataFrame(rows, "variable string, lat double, lon double, value double")
    out = str(tmp_path / "tifs")
    manifest = to_geotiff(df, out, group_cols=("variable",)).orderBy("variable")
    got = manifest.collect()
    assert [r["variable"] for r in got] == ["t2m", "tp"]
    assert all(r["width"] == 2 and r["height"] == 3 for r in got)
    for r in got:
        back = read_geotiff(r["path"])
        assert back.values.shape == (3, 2)
        assert back.nodata == -9999.0

    expected = {
        (row["variable"], row["lat"], row["lon"]): row["value"]
        for row in df.collect()
    }
    back = read_geotiff(got[0]["path"])  # t2m
    # Center of pixel (0,0) is (lat=20, lon=0) → value must match the row.
    assert back.values[0, 0] == pytest.approx(expected[("t2m", 20.0, 0.0)])


def test_encode_decode_property():
    """Property: any finite float32 raster round-trips bit-exactly with
    its georeferencing."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=20, deadline=None)
    @given(
        h=st.integers(1, 12),
        w=st.integers(1, 12),
        seed=st.integers(0, 2**31 - 1),
        west=st.floats(-180, 180, allow_nan=False),
        north=st.floats(-90, 90, allow_nan=False),
    )
    def check(h, w, seed, west, north):
        rng = np.random.default_rng(seed)
        r = GeoRaster(
            values=rng.normal(0, 1e6, (h, w)).astype("float32"),
            west=west, north=north, xres=0.25, yres=0.25, nodata=-9999.0,
        )
        back = decode_geotiff(encode_geotiff(r))
        np.testing.assert_array_equal(back.values, r.values)
        assert back.west == west and back.north == north

    check()


# ---------------------------------------------------------------------------
# LZW + floating-point predictor (the reference's COMPRESS=LZW PREDICTOR=3
# creation options, /root/reference/src/file-conversions.js:60-66), pure
# Python from the TIFF 6.0 spec + Technical Note 3.
# ---------------------------------------------------------------------------


def test_lzw_spec_bitstream_vector():
    """Hand-computed TIFF 6.0 §13 vector: encoding b'\\x00\\x00' emits codes
    [Clear=256, 0, 0, EOI=257] at 9 bits, MSB-first → 80 00 00 10 10."""
    from monitoring_data_ingestion_spark.grid.geotiff import _lzw_decode, _lzw_encode

    assert _lzw_encode(b"\x00\x00") == bytes([0x80, 0x00, 0x00, 0x10, 0x10])
    assert _lzw_decode(bytes([0x80, 0x00, 0x00, 0x10, 0x10])) == b"\x00\x00"


def test_lzw_round_trip_exercises_width_bumps_and_reset():
    """Low-entropy long input drives the code table through every width
    bump (9→10→11→12 bits) and past the 12-bit reset; random input fills
    the table fastest. Both must round-trip bit-exactly."""
    import os
    import random

    from monitoring_data_ingestion_spark.grid.geotiff import _lzw_decode, _lzw_encode

    structured = bytes((i * i) % 7 for i in range(300_000))
    assert _lzw_decode(_lzw_encode(structured)) == structured
    rnd = random.Random(11)
    noisy = bytes(rnd.randrange(256) for _ in range(60_000))
    assert _lzw_decode(_lzw_encode(noisy)) == noisy
    for n in (0, 1, 2, 17):
        d = os.urandom(n)
        assert _lzw_decode(_lzw_encode(d)) == d


def test_float_predictor_round_trip():
    from monitoring_data_ingestion_spark.grid.geotiff import (
        _fp_predict_rows,
        _fp_unpredict_rows,
    )

    v = np.random.default_rng(5).normal(280, 30, (21, 47)).astype("<f4")
    assert np.array_equal(_fp_unpredict_rows(_fp_predict_rows(v), 21, 47), v)


def test_compressed_is_default_and_smaller_on_smooth_rasters():
    """Smooth climate-like fields (the reference's actual payload) must
    compress well; raw mode stays available and both decode identically."""
    sm = np.outer(np.linspace(200, 300, 100), np.ones(200)).astype("float32")
    r = GeoRaster(values=sm, west=0.0, north=50.0, xres=0.5, yres=0.5, nodata=-9999.0)
    lzw = encode_geotiff(r)
    raw = encode_geotiff(r, compress=False)
    assert len(lzw) < len(raw) / 10
    for blob in (lzw, raw):
        back = decode_geotiff(blob)
        np.testing.assert_array_equal(back.values, sm)
        assert back.nodata == -9999.0


def test_compressed_tiff_declares_lzw_and_predictor_tags():
    import struct

    data = encode_geotiff(_raster())
    (ifd_off,) = struct.unpack_from("<I", data, 4)
    (n,) = struct.unpack_from("<H", data, ifd_off)
    tags = {}
    for i in range(n):
        tag, typ, cnt, val = struct.unpack_from("<HHII", data, ifd_off + 2 + 12 * i)
        tags[tag] = val & 0xFFFF
    assert tags[259] == 5  # Compression = LZW
    assert tags[317] == 3  # Predictor = floating-point horizontal differencing
