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
