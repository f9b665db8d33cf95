"""grid/shapefile.py: the ESRI polygon reader against the reference's real
cutline geometry (src/shp/africa.shp) plus writer round-trips.

The parser is the engine's replacement for the GDAL dependency in the
reference's clip path (gdalwarp -cutline, src/file-conversions.js:174-195).
"""

from __future__ import annotations

import os

import pytest

from monitoring_data_ingestion_spark.grid.shapefile import (
    bounding_box,
    decimate,
    main_ring,
    read_polygon_rings,
    write_polygon_shp,
)
from monitoring_data_ingestion_spark.plans.grid_geom_q import CLIP_POLYGON

AFRICA = "/root/reference/src/shp/africa.shp"

needs_africa = pytest.mark.skipif(
    not os.path.exists(AFRICA), reason="reference checkout not present"
)


def _inside(pt, ring):
    """Pure-Python even-odd ray cast (same arithmetic as grid.ops)."""
    x, y = pt
    n = len(ring)
    c = False
    for i in range(n):
        x1, y1 = ring[i]
        x2, y2 = ring[(i + 1) % n]
        if (y1 > y) != (y2 > y) and x < (x2 - x1) * (y - y1) / (y2 - y1) + x1:
            c = not c
    return c


@needs_africa
def test_africa_header_bbox_is_african():
    xmin, ymin, xmax, ymax = bounding_box(AFRICA)
    assert -26 < xmin < -25 and 63 < xmax < 64
    assert -35 < ymin < -34 and 37 < ymax < 38


@needs_africa
def test_africa_rings_parse():
    rings = read_polygon_rings(AFRICA)
    assert len(rings) == 55  # mainland + islands
    for r in rings:
        assert r[0] == r[-1]  # ESRI rings are stored closed
    mainland = max(rings, key=len)
    assert len(mainland) == 4988


@needs_africa
def test_africa_main_ring_membership():
    ring = main_ring(AFRICA)
    assert ring[0] != ring[-1]  # closing duplicate dropped
    # Sahara / Congo basin inside; Atlantic / Indian ocean outside.
    assert _inside((20.0, 5.0), ring)
    assert _inside((15.0, 20.0), ring)
    assert not _inside((-30.0, 0.0), ring)
    assert not _inside((45.0, -30.0), ring)


@needs_africa
def test_decimated_ring_preserves_coarse_membership():
    ring = decimate(main_ring(AFRICA), 40)
    assert len(ring) < 150
    assert _inside((20.0, 5.0), ring)
    assert not _inside((-30.0, 0.0), ring)


def test_writer_reader_round_trip(tmp_path):
    island = [(200.0, 10.0), (201.0, 10.0), (200.5, 11.0)]
    path = str(tmp_path / "poly.shp")
    write_polygon_shp(path, [CLIP_POLYGON, island])
    rings = read_polygon_rings(path)
    assert len(rings) == 2
    assert rings[0][:-1] == [tuple(v) for v in CLIP_POLYGON]
    assert rings[0][0] == rings[0][-1]
    assert rings[1][:-1] == island
    assert bounding_box(path) == (-130.8, -60.1, 201.0, 70.2)


def test_main_ring_picks_largest_part(tmp_path):
    island = [(0.0, 0.0), (1.0, 0.0), (0.5, 1.0)]
    path = str(tmp_path / "poly.shp")
    write_polygon_shp(path, [island, CLIP_POLYGON])
    assert main_ring(path) == [tuple(v) for v in CLIP_POLYGON]


def test_round_trip_property(tmp_path):
    """Property: any finite polygon survives write→read exactly (the
    coordinates are raw IEEE doubles in both directions)."""
    from hypothesis import given, settings, strategies as st

    coord = st.floats(
        min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
    )
    ring = st.lists(st.tuples(coord, coord), min_size=3, max_size=40)

    @settings(max_examples=25, deadline=None)
    @given(rings=st.lists(ring, min_size=1, max_size=4))
    def check(rings):
        path = str(tmp_path / "prop.shp")
        write_polygon_shp(path, rings)
        back = read_polygon_rings(path)
        assert len(back) == len(rings)
        for orig, got in zip(rings, back):
            expect = list(orig) + ([orig[0]] if orig[0] != orig[-1] else [])
            assert got == expect

    check()
