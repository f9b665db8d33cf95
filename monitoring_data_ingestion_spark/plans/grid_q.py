"""Grid/spatial catalog queries (SURVEY.md §2.2 P4, §1 data model).

The polygon-clip operator over a synthetic lat/lon grid derived
deterministically from the customer table (the fixtures carry no
coordinates). The oracle's ray-cast SQL is GENERATED from the same vertex
list as the Spark expression — one geometry definition, two renderings —
so the hash gate checks the actual clip arithmetic edge by edge.
"""

from __future__ import annotations

import os
from functools import lru_cache
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window
from pyspark.sql import functions as F

from ..grid.ops import point_in_polygon
from ..grid.shapefile import main_ring
from ..sources.readers import table
from .catalog import query

# A non-degenerate pentagon (lon, lat); no fixture point falls exactly on
# an edge (vertices use .x decimals, points land on .5 offsets).
CLIP_POLYGON = [
    (-100.2, -50.3),
    (80.7, -60.1),
    (120.4, 20.9),
    (10.3, 70.2),
    (-130.8, 40.6),
]

# The cutline geometry is VENDORED: fixtures/africa_outline.shp is the
# reference's mainland outline (gdalwarp -cutline input,
# /root/reference/src/file-conversions.js:174-195) decimated to 125
# vertices and written once by the engine's own .shp writer — checked into
# the repo so the catalog's declared semantics are identical on every
# install, with no dependency on a reference checkout or a shared tempdir.
# ``SPARK_MDI_CLIP_SHP`` overrides the path for clipping against a
# different cutline.
VENDORED_SHP = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "..", "fixtures",
    "africa_outline.shp",
)


def _is_present(x):
    """Cell carries a value: the missing sentinel lands as NULL or NaN
    depending on the Arrow list transfer, so every per-cell aggregate
    must treat both — ONE spelling, shared by all the grid queries."""
    return x.isNotNull() & ~F.isnan(x)


@lru_cache(maxsize=1)
def shapefile_cutline() -> tuple[tuple[float, float], ...]:
    """(lon, lat) cutline vertices parsed from the vendored shapefile.

    The outline is pre-decimated to 125 vertices: the geometry rides the
    query plan as a literal edge array (zero shuffle, zero broadcast),
    and a 4,987-vertex coastline would bloat codegen for no accuracy gain
    on the fixture's 1°-offset synthetic grid.
    """
    path = os.environ.get("SPARK_MDI_CLIP_SHP", VENDORED_SHP)
    return tuple(main_ring(path))

# Deterministic synthetic coordinates: integer-derived with .5 offsets,
# identical double arithmetic in both engines.
_LON_SQL = "CAST(c_custkey * 7 % 360 AS DOUBLE) - 180.0 + 0.5"
_LAT_SQL = "CAST(c_custkey * 13 % 180 AS DOUBLE) - 90.0 + 0.5"


def _raycast_sql(lon: str, lat: str, polygon: Sequence[tuple[float, float]] = None) -> str:
    """Render the exact per-edge crossing test of grid.ops.point_in_polygon
    for the given polygon (default: the fixed pentagon). Float literals use
    repr round-tripping, so both engines fold identical doubles."""
    poly = list(polygon) if polygon is not None else CLIP_POLYGON
    terms = []
    n = len(poly)
    for i in range(n):
        x1, y1 = poly[i]
        x2, y2 = poly[(i + 1) % n]
        terms.append(
            f"(CASE WHEN (({y1} > {lat}) <> ({y2} > {lat}))"
            f" AND ({lon} < ({x2} - {x1}) * ({lat} - {y1}) / ({y2} - {y1}) + {x1})"
            f" THEN 1 ELSE 0 END)"
        )
    return f"(({' + '.join(terms)}) % 2 = 1)"


@query(
    "grid_polygon_clip",
    tags=("grid", "spatial", "filter"),
    oracle=f"""
WITH pts AS (
  SELECT c_custkey, {_LAT_SQL} AS lat, {_LON_SQL} AS lon, c_acctbal AS value
  FROM customer WHERE c_custkey <= 2000
)
SELECT c_custkey, lat, lon,
       {_raycast_sql('lon', 'lat')} AS inside,
       CASE WHEN {_raycast_sql('lon', 'lat')} THEN value END AS value
FROM pts ORDER BY c_custkey
""",
)
def grid_polygon_clip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polygon clip with nodata semantics (P4: gdalwarp -cutline,
    /root/reference/src/file-conversions.js:174-195): points outside the
    clip outline keep their row but lose their value to NULL — exactly the
    −9999-nodata convention mapped to SQL NULL at the scan edge.

    The ray-cast runs as a folded literal edge array, fully inside
    whole-stage codegen (no UDF, no broadcast, geometry embedded in the
    plan) — for the reference's single clip outline this is the fastest
    possible form at any scale (map-side, zero shuffle).
    """
    c = table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 2000)
    pts = c.select(
        "c_custkey",
        ((F.col("c_custkey") * 13 % 180).cast("double") - 90.0 + 0.5).alias("lat"),
        ((F.col("c_custkey") * 7 % 360).cast("double") - 180.0 + 0.5).alias("lon"),
        F.col("c_acctbal").alias("value"),
    )
    inside = point_in_polygon(F.col("lat"), F.col("lon"), CLIP_POLYGON)
    return pts.select(
        "c_custkey",
        "lat",
        "lon",
        inside.alias("inside"),
        F.when(inside, F.col("value")).alias("value"),
    ).orderBy("c_custkey")


def _edges_values_sql(polygon: Sequence[tuple[float, float]]) -> str:
    """The polygon's edge list as a SQL VALUES table. A 125-edge ray cast
    rendered as one `+`-chained expression exceeds DuckDB's binder
    recursion limit; an edge relation + aggregate crossing count computes
    the identical arithmetic without a deep expression tree."""
    rows = []
    n = len(polygon)
    for i in range(n):
        x1, y1 = polygon[i]
        x2, y2 = polygon[(i + 1) % n]
        rows.append(f"({x1}, {y1}, {x2}, {y2})")
    return ",\n       ".join(rows)


@query(
    "grid_shapefile_clip",
    tags=("grid", "spatial", "filter"),
    oracle=f"""
WITH pts AS (
  SELECT c_custkey, {_LAT_SQL} AS lat, {_LON_SQL} AS lon, c_acctbal AS value
  FROM customer WHERE c_custkey <= 2000
),
edges(x1, y1, x2, y2) AS (
  VALUES {_edges_values_sql(shapefile_cutline())}
),
crossed AS (
  SELECT p.c_custkey, p.lat, p.lon, p.value,
         (SUM(CASE WHEN ((e.y1 > p.lat) <> (e.y2 > p.lat))
                    AND (p.lon < (e.x2 - e.x1) * (p.lat - e.y1) / (e.y2 - e.y1) + e.x1)
              THEN 1 ELSE 0 END) % 2 = 1) AS inside
  FROM pts p CROSS JOIN edges e
  GROUP BY p.c_custkey, p.lat, p.lon, p.value
)
SELECT c_custkey, lat, lon, inside,
       CASE WHEN inside THEN value END AS value
FROM crossed ORDER BY c_custkey
""",
)
def grid_shapefile_clip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polygon clip whose cutline comes from a parsed ESRI shapefile —
    the reference's exact geometry path (gdalwarp -cutline africa.shp,
    /root/reference/src/file-conversions.js:174-195) with the engine's
    own .shp reader (grid/shapefile.py) replacing GDAL.

    Same plan shape as grid_polygon_clip: the parsed outline folds into a
    literal edge array, the ray-cast whole-stage-codegens, zero shuffle —
    the cutline never becomes a join side, so at 100 TB the clip stays a
    free rider on the scan.
    """
    poly = shapefile_cutline()
    c = table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 2000)
    pts = c.select(
        "c_custkey",
        ((F.col("c_custkey") * 13 % 180).cast("double") - 90.0 + 0.5).alias("lat"),
        ((F.col("c_custkey") * 7 % 360).cast("double") - 180.0 + 0.5).alias("lon"),
        F.col("c_acctbal").alias("value"),
    )
    inside = point_in_polygon(F.col("lat"), F.col("lon"), poly)
    return pts.select(
        "c_custkey",
        "lat",
        "lon",
        inside.alias("inside"),
        F.when(inside, F.col("value")).alias("value"),
    ).orderBy("c_custkey")


@query(
    "grid_regrid_coarsen",
    tags=("grid", "spatial", "agg"),
    oracle=f"""
WITH pts AS (
  SELECT c_custkey, {_LAT_SQL} AS lat, {_LON_SQL} AS lon, c_acctbal AS value
  FROM customer WHERE c_custkey <= 2000
)
SELECT CAST(FLOOR(lat / 10) * 10 AS DOUBLE) AS cell_lat,
       CAST(FLOOR(lon / 10) * 10 AS DOUBLE) AS cell_lon,
       CAST(COUNT(*) AS BIGINT) AS n_points,
       CAST(SUM(CAST(value AS DECIMAL(30,2))) AS DOUBLE) / COUNT(value) AS mean_value
FROM pts
GROUP BY 1, 2
ORDER BY cell_lat, cell_lon
""",
)
def grid_regrid_coarsen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conservative regrid to a coarser resolution: fine-grid points
    aggregate into 10°×10° cells by exact-decimal mean — the ERA5
    0.25°→1° downsample the reference's AOI workflows imply
    (/root/reference/src/sources/era5monthly.js:28-34 fixes the fine
    grid; coarsening is the standard product derived from it).

    Scale: cell assignment is pure arithmetic (floor division, map-side);
    one partial+final hash aggregate whose exchange carries |cells| rows —
    for the global 1° grid that is 64 800 rows regardless of input size.
    """
    c = table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 2000)
    pts = c.select(
        ((F.col("c_custkey") * 13 % 180).cast("double") - 90.0 + 0.5).alias("lat"),
        ((F.col("c_custkey") * 7 % 360).cast("double") - 180.0 + 0.5).alias("lon"),
        F.col("c_acctbal").alias("value"),
    )
    return (
        pts.groupBy(
            (F.floor(F.col("lat") / 10) * 10).cast("double").alias("cell_lat"),
            (F.floor(F.col("lon") / 10) * 10).cast("double").alias("cell_lon"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            (F.sum(F.col("value").cast("decimal(30,2)")).cast("double") / F.count("value")).alias(
                "mean_value"
            ),
        )
        .orderBy("cell_lat", "cell_lon")
    )


# Bilinear regrid lattice bounds: coarse 1-degree corners on
# lat [-20, 20] x lon [0, 40]; fine 0.5-degree targets stop half a cell
# short of the top edge so every target has all four corners.
_BL_LAT0, _BL_LATN = -20, 20
_BL_LON0, _BL_LONN = 0, 40

# Closed-form corner value: small integer hash plus a quarter-degree ramp.
# Every term is an exact multiple of 0.25, so all bilinear weights (0,
# 0.25, 0.5, 1) and products stay exactly representable in binary floats —
# the interpolation is bit-exact in ANY engine with no decimal plumbing.
_BL_VALUE_SQL = (
    "CAST(((lat + 90) * 31 + (lon + 180) * 7) % 17 AS DOUBLE) + (lat + 90) * 0.25"
)


@query(
    "grid_bilinear_regrid",
    tags=("grid", "spatial", "join"),
    oracle=f"""
WITH corners AS (
  SELECT lat, lon, {_BL_VALUE_SQL} AS value
  FROM (SELECT unnest(generate_series({_BL_LAT0}, {_BL_LATN})) AS lat) la,
       (SELECT unnest(generate_series({_BL_LON0}, {_BL_LONN})) AS lon) lo
), fine AS (
  SELECT {_BL_LAT0} + i * 0.5 AS flat, {_BL_LON0} + j * 0.5 AS flon
  FROM (SELECT unnest(generate_series(0, {(_BL_LATN - _BL_LAT0) * 2 - 1})) AS i) a,
       (SELECT unnest(generate_series(0, {(_BL_LONN - _BL_LON0) * 2 - 1})) AS j) b
), anchored AS (
  SELECT flat, flon,
         CAST(floor(flat) AS BIGINT) AS lat0, CAST(floor(flon) AS BIGINT) AS lon0,
         flat - floor(flat) AS fy, flon - floor(flon) AS fx
  FROM fine
)
SELECT a.flat AS lat, a.flon AS lon,
       (1 - a.fy) * (1 - a.fx) * c00.value
     + (1 - a.fy) * a.fx       * c01.value
     + a.fy       * (1 - a.fx) * c10.value
     + a.fy       * a.fx       * c11.value AS value
FROM anchored a
JOIN corners c00 ON c00.lat = a.lat0     AND c00.lon = a.lon0
JOIN corners c01 ON c01.lat = a.lat0     AND c01.lon = a.lon0 + 1
JOIN corners c10 ON c10.lat = a.lat0 + 1 AND c10.lon = a.lon0
JOIN corners c11 ON c11.lat = a.lat0 + 1 AND c11.lon = a.lon0 + 1
ORDER BY lat, lon
""",
)
def grid_bilinear_regrid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bilinear regrid to a 2x finer grid — the reference's
    ``gdal_translate``/``gdalwarp`` resampling path
    (/root/reference/src/file-conversions.js:58-72) re-expressed as
    relational algebra: each fine point is the corner-weighted mean of its
    four enclosing coarse-cell corners.

    Spark-first: instead of the oracle's four corner joins, the fine side
    EXPLODES its four (corner-key, weight) contributions and makes ONE
    equi-join against the corner table, then regroups per fine point —
    at planetary grid sizes that is a single shuffle on corner key (AQE
    broadcasts the corner side when it fits), and the contribution sum is
    exact because every weight and corner value is a multiple of 1/4
    (see _BL_VALUE_SQL). No UDF, no cartesian, no window.
    """
    la = spark.range(_BL_LAT0, _BL_LATN + 1).select(F.col("id").alias("lat"))
    lo = spark.range(_BL_LON0, _BL_LONN + 1).select(F.col("id").alias("lon"))
    corners = la.crossJoin(lo).select(
        "lat",
        "lon",
        (
            (((F.col("lat") + 90) * 31 + (F.col("lon") + 180) * 7) % 17).cast("double")
            + (F.col("lat") + 90) * F.lit(0.25)
        ).alias("value"),
    )
    fi = spark.range(0, (_BL_LATN - _BL_LAT0) * 2).select(F.col("id").alias("i"))
    fj = spark.range(0, (_BL_LONN - _BL_LON0) * 2).select(F.col("id").alias("j"))
    fine = fi.crossJoin(fj).select(
        (F.lit(_BL_LAT0) + F.col("i") * F.lit(0.5)).alias("flat"),
        (F.lit(_BL_LON0) + F.col("j") * F.lit(0.5)).alias("flon"),
    )
    anchored = fine.select(
        "flat",
        "flon",
        F.floor("flat").alias("lat0"),
        F.floor("flon").alias("lon0"),
        (F.col("flat") - F.floor("flat")).alias("fy"),
        (F.col("flon") - F.floor("flon")).alias("fx"),
    )
    wy = [F.lit(1) - F.col("fy"), F.col("fy")]
    wx = [F.lit(1) - F.col("fx"), F.col("fx")]
    contributions = F.array(
        *[
            F.struct(
                (F.col("lat0") + dy).alias("clat"),
                (F.col("lon0") + dx).alias("clon"),
                (wy[dy] * wx[dx]).alias("w"),
            )
            for dy in (0, 1)
            for dx in (0, 1)
        ]
    )
    exploded = anchored.select(
        "flat", "flon", F.explode(contributions).alias("c")
    ).select(
        "flat",
        "flon",
        F.col("c.clat").alias("clat"),
        F.col("c.clon").alias("clon"),
        F.col("c.w").alias("w"),
    )
    joined = exploded.join(
        corners,
        (F.col("clat") == F.col("lat")) & (F.col("clon") == F.col("lon")),
    )
    return (
        joined.groupBy("flat", "flon")
        .agg(F.sum(F.col("w") * F.col("value")).alias("value"))
        .select(F.col("flat").alias("lat"), F.col("flon").alias("lon"), "value")
        .orderBy("lat", "lon")
    )


# Three disjoint zone quads (lon, lat) — vertices off the fixture's .5
# lattice so no point sits exactly on an edge. Zone assignment is
# first-match (they are disjoint, so order is cosmetic).
ZONES = [
    [(-150.2, -60.3), (-30.4, -60.3), (-30.4, 10.6), (-150.2, 10.6)],
    [(-20.8, -70.1), (60.7, -70.1), (60.7, 30.2), (-20.8, 30.2)],
    [(70.3, -10.4), (150.9, -10.4), (150.9, 70.8), (70.3, 70.8)],
]

_ZONE_CASE_SQL = (
    "CASE "
    + " ".join(
        f"WHEN {_raycast_sql('lon', 'lat', z)} THEN {k}" for k, z in enumerate(ZONES)
    )
    + " END"
)


@query(
    "grid_zonal_stats",
    tags=("grid", "spatial", "agg"),
    oracle=f"""
WITH pts AS (
  SELECT c_custkey, {_LAT_SQL} AS lat, {_LON_SQL} AS lon, c_acctbal AS value
  FROM customer WHERE c_custkey <= 5000
), zoned AS (
  SELECT c_custkey, value, {_ZONE_CASE_SQL} AS zone FROM pts
)
SELECT zone, COUNT(*) AS n_points,
       CAST(SUM(CAST(value AS DECIMAL(30,2))) AS DOUBLE) / COUNT(value) AS mean_value,
       MIN(value) AS min_value, MAX(value) AS max_value
FROM zoned WHERE zone IS NOT NULL
GROUP BY zone ORDER BY zone
""",
)
def grid_zonal_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zonal statistics — per-polygon-zone aggregates over a point grid
    (the raster 'zonal stats' the reference's AOI clips feed into:
    clip-by-cutline then summarize, /root/reference/src/file-conversions.js
    :174-195 composed with the cdo means at :203-211).

    Zone assignment is the same codegen'd literal ray-cast as
    grid_polygon_clip, chained into a CASE across the zone list — a pure
    map stage with the geometry folded into the plan; the per-zone rollup
    is one partial+final hash aggregate whose exchange carries |zones|
    rows. At planetary point counts nothing but the fixed-size zone table
    ever crosses the wire; for thousands of zones the CASE chain would
    become a broadcast polygon join on an r-tree bucket key (same pattern,
    table-driven).
    """
    c = table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 5000)
    pts = c.select(
        "c_custkey",
        ((F.col("c_custkey") * 13 % 180).cast("double") - 90.0 + 0.5).alias("lat"),
        ((F.col("c_custkey") * 7 % 360).cast("double") - 180.0 + 0.5).alias("lon"),
        F.col("c_acctbal").alias("value"),
    )
    zone = F.lit(None).cast("int")
    for k in reversed(range(len(ZONES))):
        zone = F.when(
            point_in_polygon(F.col("lat"), F.col("lon"), ZONES[k]), F.lit(k)
        ).otherwise(zone)
    return (
        pts.select("value", zone.alias("zone"))
        .filter(F.col("zone").isNotNull())
        .groupBy("zone")
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            (
                F.sum(F.col("value").cast("decimal(30,2)")).cast("double")
                / F.count("value")
            ).alias("mean_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
        .orderBy("zone")
    )


@query(
    "grid_gradient_slope",
    tags=("grid", "spatial", "window"),
    oracle=f"""
WITH corners AS (
  SELECT lat, lon, {_BL_VALUE_SQL} AS value
  FROM (SELECT unnest(generate_series({_BL_LAT0}, {_BL_LATN})) AS lat) la,
       (SELECT unnest(generate_series({_BL_LON0}, {_BL_LONN})) AS lon) lo
), gx AS (
  SELECT lat, lon, value,
         (lead(value) OVER wlon - lag(value) OVER wlon) / 2 AS gx
  FROM corners WINDOW wlon AS (PARTITION BY lat ORDER BY lon)
), gxy AS (
  SELECT lat, lon, gx,
         (lead(value) OVER wlat - lag(value) OVER wlat) / 2 AS gy
  FROM gx WINDOW wlat AS (PARTITION BY lon ORDER BY lat)
)
SELECT lat, lon, gx, gy, ROUND(sqrt(gx * gx + gy * gy), 6) AS slope
FROM gxy
WHERE gx IS NOT NULL AND gy IS NOT NULL
ORDER BY lat, lon
""",
)
def grid_gradient_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raster gradient by central differences: ∂z/∂x along each latitude
    row, ∂z/∂y along each longitude column, slope = |∇z| — the terrain
    slope/aspect primitive (gdaldem slope) over the same closed-form
    lattice as grid_bilinear_regrid; edges (missing a neighbor) are
    excluded.

    Spark-first: two window passes with orthogonal partitionings — the
    row pass shuffles on lat, the column pass on lon. Two exchanges are
    inherent to touching both axes of a row-stored raster; at planetary
    scale the production layout is 2-D tiles (each tile holds a halo of
    neighbors, one mapPartitions pass) — the window form is the exact
    declarative semantics that tiling must reproduce. All differences are
    multiples of 1/8 (see _BL_VALUE_SQL), so gx/gy are float-exact; the
    one rounding is the final sqrt.
    """
    la = spark.range(_BL_LAT0, _BL_LATN + 1).select(F.col("id").alias("lat"))
    lo = spark.range(_BL_LON0, _BL_LONN + 1).select(F.col("id").alias("lon"))
    corners = la.crossJoin(lo).select(
        "lat",
        "lon",
        (
            (((F.col("lat") + 90) * 31 + (F.col("lon") + 180) * 7) % 17).cast("double")
            + (F.col("lat") + 90) * F.lit(0.25)
        ).alias("value"),
    )
    wlon = Window.partitionBy("lat").orderBy("lon")
    wlat = Window.partitionBy("lon").orderBy("lat")
    gx = corners.withColumn(
        "gx", (F.lead("value").over(wlon) - F.lag("value").over(wlon)) / 2
    )
    gxy = gx.withColumn(
        "gy", (F.lead("value").over(wlat) - F.lag("value").over(wlat)) / 2
    )
    return (
        gxy.filter(F.col("gx").isNotNull() & F.col("gy").isNotNull())
        .select(
            "lat",
            "lon",
            "gx",
            "gy",
            F.round(
                F.sqrt(F.col("gx") * F.col("gx") + F.col("gy") * F.col("gy")), 6
            ).alias("slope"),
        )
        .orderBy("lat", "lon")
    )


# Geo near-join parameters: 5-degree blocking cells, pairs kept when the
# squared degree distance is within NEAR_DEG² (an equirectangular
# small-window metric — exact double arithmetic, no transcendentals, so
# the hash gate stays engine-portable; production swaps in haversine at
# the refine step without touching the blocking).
NEAR_DEG = 3.0
_CELL_DEG = 5


@query(
    "geo_near_join",
    tags=("grid", "spatial", "join"),
    oracle=f"""
WITH pts AS (
  SELECT c_custkey AS id, {_LAT_SQL} AS lat, {_LON_SQL} AS lon
  FROM customer WHERE c_custkey <= 2000
)
SELECT a.id AS id_a, b.id AS id_b,
       (a.lat - b.lat) * (a.lat - b.lat)
     + (a.lon - b.lon) * (a.lon - b.lon) AS dist2
FROM pts a JOIN pts b ON a.id < b.id
WHERE (a.lat - b.lat) * (a.lat - b.lat)
    + (a.lon - b.lon) * (a.lon - b.lon) <= {NEAR_DEG * NEAR_DEG}
ORDER BY id_a, id_b
""",
)
def geo_near_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial near-join: all point pairs within NEAR_DEG (3°) of each other
    — the proximity join behind station-matching / observation-conflation
    in a monitoring network (and every geospatial dedup).

    Spark-first: the oracle's all-pairs theta-join NEVER reaches the
    planner — one side explodes into its 3×3 neighborhood of 5° blocking
    cells, the other side keys by its own cell, and the join is an
    equi-join on the cell id; the exact distance predicate refines the
    candidates. Cell width ≥ search radius guarantees no missed pair;
    fan-out is a constant 9. The same blocking carries haversine or any
    refine metric at production scale — the pattern is the point.
    """
    c = table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 2000)
    pts = c.select(
        F.col("c_custkey").alias("id"),
        ((F.col("c_custkey") * 13 % 180).cast("double") - 90.0 + 0.5).alias("lat"),
        ((F.col("c_custkey") * 7 % 360).cast("double") - 180.0 + 0.5).alias("lon"),
    )
    cell_i = F.floor(F.col("lat") / _CELL_DEG).cast("int")
    cell_j = F.floor(F.col("lon") / _CELL_DEG).cast("int")
    neighborhood = F.array(
        *[
            F.struct((cell_i + di).alias("ci"), (cell_j + dj).alias("cj"))
            for di in (-1, 0, 1)
            for dj in (-1, 0, 1)
        ]
    )
    a = pts.select(
        F.col("id").alias("id_a"),
        F.col("lat").alias("lat_a"),
        F.col("lon").alias("lon_a"),
        F.explode(neighborhood).alias("c"),
    ).select("id_a", "lat_a", "lon_a", F.col("c.ci").alias("ci"), F.col("c.cj").alias("cj"))
    b = pts.select(
        F.col("id").alias("id_b"),
        F.col("lat").alias("lat_b"),
        F.col("lon").alias("lon_b"),
        cell_i.alias("ci"),
        cell_j.alias("cj"),
    )
    dist2 = (F.col("lat_a") - F.col("lat_b")) * (F.col("lat_a") - F.col("lat_b")) + (
        F.col("lon_a") - F.col("lon_b")
    ) * (F.col("lon_a") - F.col("lon_b"))
    return (
        a.join(b, ["ci", "cj"])
        .filter((F.col("id_a") < F.col("id_b")) & (dist2 <= NEAR_DEG * NEAR_DEG))
        .select("id_a", "id_b", dist2.alias("dist2"))
        .orderBy("id_a", "id_b")
    )


@query(
    "grid_area_weighted_mean",
    tags=("grid", "spatial", "agg"),
    oracle=f"""
WITH corners AS (
  SELECT lat, lon, {_BL_VALUE_SQL} AS value
  FROM (SELECT unnest(generate_series({_BL_LAT0}, {_BL_LATN})) AS lat) la,
       (SELECT unnest(generate_series({_BL_LON0}, {_BL_LONN})) AS lon) lo
), weighted AS (
  SELECT CAST(floor(lat / 10.0) * 10 AS INTEGER) AS band,
         CAST(cos(lat * pi() / 180.0) * value AS DECIMAL(30,12)) AS wv,
         CAST(cos(lat * pi() / 180.0) AS DECIMAL(30,12)) AS w,
         CAST(value AS DECIMAL(30,6)) AS v
  FROM corners
)
SELECT band,
       CAST(COUNT(*) AS BIGINT) AS n_cells,
       ROUND(CAST(SUM(wv) AS DOUBLE) / CAST(SUM(w) AS DOUBLE), 6) AS weighted_mean,
       ROUND(CAST(SUM(v) AS DOUBLE) / COUNT(*), 6) AS simple_mean
FROM weighted GROUP BY band ORDER BY band
""",
)
def grid_area_weighted_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Area-weighted spatial mean — the cos(latitude) weighting every
    global statistic over a regular lat/lon grid needs (CDO ``fldmean``
    semantics, the spatial-mean counterpart of the reference's temporal
    ``timmean``, /root/reference/src/sources/era5monthly.js:126-155):
    equal-angle cells shrink as cos(lat) toward the poles, so the naive
    mean over-weights high latitudes. Returns both means per 10° band so
    the correction itself is part of the checked result.

    Spark-first: weights are a map-side expression on the closed-form
    lattice (no weight table, no join); the rollup is one partial+final
    hash aggregate carrying |bands| rows. Weighted terms are summed as
    decimal(30,12) — cos() may differ from the oracle's libm in the last
    ulp, but 1 ulp ≈ 1e-17 sits 5 orders below the decimal quantum, and
    decimal sums are ordering-independent (the double Σ would round
    differently per partition schedule). At planetary density nothing
    but the fixed band table crosses the exchange.
    """
    la = spark.range(_BL_LAT0, _BL_LATN + 1).select(F.col("id").alias("lat"))
    lo = spark.range(_BL_LON0, _BL_LONN + 1).select(F.col("id").alias("lon"))
    value = (((F.col("lat") + 90) * 31 + (F.col("lon") + 180) * 7) % 17).cast(
        "double"
    ) + (F.col("lat") + 90) * 0.25
    corners = la.crossJoin(lo).select("lat", "lon", value.alias("value"))
    w = F.cos(F.col("lat") * F.lit(3.141592653589793) / 180.0)
    return (
        corners.select(
            (F.floor(F.col("lat") / 10.0) * 10).cast("int").alias("band"),
            (w * F.col("value")).cast("decimal(30,12)").alias("wv"),
            w.cast("decimal(30,12)").alias("w"),
            F.col("value").cast("decimal(30,6)").alias("v"),
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_cells"),
            F.round(F.sum("wv").cast("double") / F.sum("w").cast("double"), 6).alias(
                "weighted_mean"
            ),
            F.round(F.sum("v").cast("double") / F.count(F.lit(1)), 6).alias("simple_mean"),
        )
        .orderBy("band")
    )


CONTOUR_LEVEL = 30.0  # iso-level inside the lattice's value range (17.5 .. 43.5)


@query(
    "grid_contour_cells",
    tags=("grid", "spatial", "window"),
    oracle=f"""
WITH corners AS (
  SELECT lat, lon, {_BL_VALUE_SQL} AS value
  FROM (SELECT unnest(generate_series({_BL_LAT0}, {_BL_LATN})) AS lat) la,
       (SELECT unnest(generate_series({_BL_LON0}, {_BL_LONN})) AS lon) lo
), row_shift AS (
  SELECT lat, lon, value,
         lead(value) OVER (PARTITION BY lat ORDER BY lon) AS v_right
  FROM corners
), cells AS (
  SELECT lat, lon, value AS v00, v_right AS v10,
         lead(value) OVER wlat AS v01,
         lead(v_right) OVER wlat AS v11
  FROM row_shift
  WINDOW wlat AS (PARTITION BY lon ORDER BY lat)
), cases AS (
  SELECT (CASE WHEN v00 > {CONTOUR_LEVEL} THEN 1 ELSE 0 END)
       + (CASE WHEN v10 > {CONTOUR_LEVEL} THEN 2 ELSE 0 END)
       + (CASE WHEN v11 > {CONTOUR_LEVEL} THEN 4 ELSE 0 END)
       + (CASE WHEN v01 > {CONTOUR_LEVEL} THEN 8 ELSE 0 END) AS case_index
  FROM cells
  WHERE v10 IS NOT NULL AND v01 IS NOT NULL AND v11 IS NOT NULL
)
SELECT CAST(case_index AS INTEGER) AS case_index,
       CAST(COUNT(*) AS BIGINT) AS n_cells,
       (case_index NOT IN (0, 15)) AS crossed
FROM cases GROUP BY case_index ORDER BY case_index
""",
)
def grid_contour_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marching-squares cell classification at an iso-level: each 2×2
    cell of the lattice gets its 4-bit corner-above-level case index
    (the lookup key contouring algorithms dispatch on; cases 0 and 15
    are interior, everything else carries a contour segment) — censused
    per case. The raster primitive under every isoline/contour product
    built from the reference's grids (gdal_contour over the same data).

    Spark-first: corner access is the gradient query's two-orthogonal-
    window shape — a per-lat lead gives the right neighbor, a per-lon
    lead lifts both one row north, so the diagonal costs no third pass —
    then a 16-row census. Two exchanges are inherent to touching both
    axes of a row-stored raster (see grid_gradient_slope's tiling note
    for the production layout). Strict `>` on exact lattice values:
    no boundary ulp ambiguity in either engine.
    """
    la = spark.range(_BL_LAT0, _BL_LATN + 1).select(F.col("id").alias("lat"))
    lo = spark.range(_BL_LON0, _BL_LONN + 1).select(F.col("id").alias("lon"))
    value = (((F.col("lat") + 90) * 31 + (F.col("lon") + 180) * 7) % 17).cast(
        "double"
    ) + (F.col("lat") + 90) * 0.25
    corners = la.crossJoin(lo).select("lat", "lon", value.alias("value"))
    w_lon = Window.partitionBy("lat").orderBy("lon")
    row_shift = corners.select(
        "lat", "lon", "value", F.lead("value").over(w_lon).alias("v_right")
    )
    w_lat = Window.partitionBy("lon").orderBy("lat")
    cells = row_shift.select(
        F.col("value").alias("v00"),
        F.col("v_right").alias("v10"),
        F.lead("value").over(w_lat).alias("v01"),
        F.lead("v_right").over(w_lat).alias("v11"),
    )
    bit = lambda c, k: F.when(F.col(c) > CONTOUR_LEVEL, k).otherwise(0)
    case_index = bit("v00", 1) + bit("v10", 2) + bit("v11", 4) + bit("v01", 8)
    return (
        cells.filter(
            F.col("v10").isNotNull()
            & F.col("v01").isNotNull()
            & F.col("v11").isNotNull()
        )
        .select(case_index.cast("int").alias("case_index"))
        .groupBy("case_index")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_cells"))
        .select(
            "case_index",
            "n_cells",
            (~F.col("case_index").isin(0, 15)).alias("crossed"),
        )
        .orderBy("case_index")
    )


# Sun-angle constants for hillshade (azimuth 315°, altitude 45° — the
# gdaldem defaults). The per-cell trig folds into these literals, so the
# data path is pure arithmetic + one sqrt: shade =
# 255·(sin_alt + (−p·cos_az_x + q·cos_az_y)·cos_alt) / sqrt(1+p²+q²).
_HS_SIN_ALT = 0.7071067811865476  # sin 45°
_HS_COS_ALT = 0.7071067811865476  # cos 45°
_HS_AZ_X = -0.7071067811865476  # cos(315° math-convention light vector), x
_HS_AZ_Y = 0.7071067811865476  # y component


@query(
    "grid_hillshade",
    tags=("grid", "spatial", "window"),
    oracle=f"""
WITH corners AS (
  SELECT lat, lon, {_BL_VALUE_SQL} AS value
  FROM (SELECT unnest(generate_series({_BL_LAT0}, {_BL_LATN})) AS lat) la,
       (SELECT unnest(generate_series({_BL_LON0}, {_BL_LONN})) AS lon) lo
), row_pass AS (
  SELECT lat, lon, value,
         lag(value)  OVER wlon AS zw,
         lead(value) OVER wlon AS ze
  FROM corners WINDOW wlon AS (PARTITION BY lat ORDER BY lon)
), grid9 AS (
  SELECT lat, lon, value, zw, ze,
         lag(value)  OVER wlat AS zs,  lead(value) OVER wlat AS zn,
         lag(zw)     OVER wlat AS zsw, lead(zw)    OVER wlat AS znw,
         lag(ze)     OVER wlat AS zse, lead(ze)    OVER wlat AS zne
  FROM row_pass WINDOW wlat AS (PARTITION BY lon ORDER BY lat)
), horn AS (
  SELECT lat, lon,
         ((zne + 2 * ze + zse) - (znw + 2 * zw + zsw)) / 8.0 AS p,
         ((zsw + 2 * zs + zse) - (znw + 2 * zn + zne)) / 8.0 AS q
  FROM grid9
  WHERE zw IS NOT NULL AND ze IS NOT NULL AND zn IS NOT NULL
    AND zs IS NOT NULL AND znw IS NOT NULL AND zne IS NOT NULL
    AND zsw IS NOT NULL AND zse IS NOT NULL
)
SELECT lat, lon, ROUND(p, 6) AS p, ROUND(q, 6) AS q,
       ROUND(GREATEST(0.0,
         255.0 * ({_HS_SIN_ALT} + (-p * {_HS_AZ_X} + q * {_HS_AZ_Y}) * {_HS_COS_ALT})
           / sqrt(1.0 + p * p + q * q)), 2) AS shade
FROM horn ORDER BY lat, lon
""",
)
def grid_hillshade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hillshade (gdaldem hillshade, Horn's method, azimuth 315° /
    altitude 45°) over the closed-form lattice — the shaded-relief
    rendering primitive of the reference's GDAL output ecosystem
    (/root/reference/src/file-conversions.js drives gdal tooling).
    The 3×3 Horn kernel's p/q come from the contour-census neighbor
    lift: one window pass per latitude row carries (W, E), the
    orthogonal pass lifts all three columns to the 9-cell stencil —
    two exchanges total, the inherent cost of touching both axes of a
    row-stored raster (the same tiling note as grid_gradient_slope).

    Determinism: the sun-angle trig is constant-folded into literals,
    so the data path is exact lattice arithmetic (p/q are multiples of
    1/64), one sqrt, and a final 2 dp round — engine-portable with no
    transcendentals over data.
    """
    la = spark.range(_BL_LAT0, _BL_LATN + 1).select(F.col("id").alias("lat"))
    lo = spark.range(_BL_LON0, _BL_LONN + 1).select(F.col("id").alias("lon"))
    corners = la.crossJoin(lo).select(
        "lat",
        "lon",
        (
            (((F.col("lat") + 90) * 31 + (F.col("lon") + 180) * 7) % 17).cast("double")
            + (F.col("lat") + 90) * F.lit(0.25)
        ).alias("value"),
    )
    wlon = Window.partitionBy("lat").orderBy("lon")
    wlat = Window.partitionBy("lon").orderBy("lat")
    row_pass = corners.select(
        "lat",
        "lon",
        "value",
        F.lag("value").over(wlon).alias("zw"),
        F.lead("value").over(wlon).alias("ze"),
    )
    grid9 = row_pass.select(
        "lat",
        "lon",
        "value",
        "zw",
        "ze",
        F.lag("value").over(wlat).alias("zs"),
        F.lead("value").over(wlat).alias("zn"),
        F.lag("zw").over(wlat).alias("zsw"),
        F.lead("zw").over(wlat).alias("znw"),
        F.lag("ze").over(wlat).alias("zse"),
        F.lead("ze").over(wlat).alias("zne"),
    )
    full = (
        F.col("zw").isNotNull()
        & F.col("ze").isNotNull()
        & F.col("zn").isNotNull()
        & F.col("zs").isNotNull()
        & F.col("znw").isNotNull()
        & F.col("zne").isNotNull()
        & F.col("zsw").isNotNull()
        & F.col("zse").isNotNull()
    )
    horn = grid9.filter(full).select(
        "lat",
        "lon",
        (
            ((F.col("zne") + 2 * F.col("ze") + F.col("zse"))
             - (F.col("znw") + 2 * F.col("zw") + F.col("zsw"))) / 8.0
        ).alias("p"),
        (
            ((F.col("zsw") + 2 * F.col("zs") + F.col("zse"))
             - (F.col("znw") + 2 * F.col("zn") + F.col("zne"))) / 8.0
        ).alias("q"),
    )
    shade = F.greatest(
        F.lit(0.0),
        255.0
        * (
            _HS_SIN_ALT
            + (-F.col("p") * _HS_AZ_X + F.col("q") * _HS_AZ_Y) * _HS_COS_ALT
        )
        / F.sqrt(1.0 + F.col("p") * F.col("p") + F.col("q") * F.col("q")),
    )
    return horn.select(
        "lat",
        "lon",
        F.round("p", 6).alias("p"),
        F.round("q", 6).alias("q"),
        F.round(shade, 2).alias("shade"),
    ).orderBy("lat", "lon")


def _synth_grib1_file(d: int) -> bytes:
    """The shared 3-record GRIB1 fixture file for document ``d`` (used by
    grid_grib1_decode AND grid_grib1_inventory — one definition, so the
    two queries' oracles can never desynchronize from each other):
    grid (8 + d%5) × (4 + d%4), record r has parameter 11+r and cell
    value 100 + 2·((d·7 + r·13 + i·3 + j·5) % 100); record 2 carries a
    bitmap masking (i + j) % 7 == 0."""
    import numpy as np

    from ..grid.grib1 import encode_grib1_message

    ni, nj = 8 + d % 5, 4 + d % 4
    i = np.arange(ni)[None, :]
    j = np.arange(nj)[:, None]
    msgs = []
    for r in range(3):
        v = 100 + 2 * ((d * 7 + r * 13 + i * 3 + j * 5) % 100)
        bitmap = ((i + j) % 7 != 0) | np.zeros_like(v, bool) if r == 1 else None
        msgs.append(
            encode_grib1_message(
                v.astype(np.float64),
                parameter=11 + r,
                reference_value=100.0,
                binary_scale=1,
                nbits=8,
                bitmap=bitmap,
            )
        )
    return b"".join(msgs)


# --- GRIB1 record decode ---------------------------------------------------

# Synthetic GRIB1 value field: cell (i, j) of record r (0-based) in doc
# d's file is 100 + 2*((d*7 + r*13 + i*3 + j*5) % 100) — integers with
# step 2 so the simple-packing encode (R=100, E=1, D=0, 8-bit
# increments) round-trips BIT-EXACTLY: X = (v-100)/2 <= 99 < 2^8.
# Record 2 carries a bitmap masking cells where (i+j) % 7 == 0.


@query(
    "grid_grib1_decode",
    tags=("grid", "codec", "python", "ingest"),
    oracle="""
WITH g AS (
  SELECT doc_id,
         8 + doc_id % 5 AS ni,
         4 + doc_id % 4 AS nj,
         1 + (doc_id // 3) % 3 AS rn
  FROM documents WHERE doc_id % 3 = 2 AND doc_id < 300
),
cells AS (
  SELECT doc_id, ni, nj, rn,
         CASE WHEN rn = 2 AND (i.i + j.j) % 7 = 0 THEN NULL
              ELSE 100 + 2 * ((doc_id * 7 + (rn - 1) * 13 + i.i * 3 + j.j * 5) % 100)
         END AS v
  FROM g,
       LATERAL (SELECT unnest(generate_series(0, ni - 1)) AS i) i,
       LATERAL (SELECT unnest(generate_series(0, nj - 1)) AS j) j
)
SELECT doc_id,
       CAST(rn AS INTEGER) AS record_number,
       CAST(ni AS INTEGER) AS ni,
       CAST(nj AS INTEGER) AS nj,
       CAST(90000 AS INTEGER) AS lat_first_mdeg,
       CAST(COUNT(v) AS BIGINT) AS n_present,
       CAST(COUNT(*) - COUNT(v) AS BIGINT) AS n_missing,
       ROUND(CAST(SUM(v) AS DOUBLE) / COUNT(v), 6) AS mean_val,
       CAST(MIN(v) AS BIGINT) AS min_val,
       CAST(MAX(v) AS BIGINT) AS max_val
FROM cells
GROUP BY doc_id, rn, ni, nj
ORDER BY doc_id
""",
)
def grid_grib1_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The GRIB1 ingest path end-to-end — the reference's actual input
    format, decoded by the engine's pure-Python codec instead of wgrib
    (/root/reference/src/file-conversions.js:114-127: ``wgrib input -d
    record_number -grib`` extracts one record; downstream cdo/gdal read
    it). Per selected document a 3-record GRIB1 FILE is synthesized
    executor-side (real Section 0/1/2/3/4 bytes: IBM-float reference
    value, signed-magnitude scale factors, bit-packed increments, record
    2 bitmap-masked), then the REAL ``select_record`` (wgrib -d parity,
    1-based scan of concatenated messages) and ``decode_grib1`` run
    through Arrow/mapInPandas plumbing, and per-record statistics
    aggregate JVM-side from the decoded value array.

    The oracle never sees a byte of GRIB: it restates the synthetic
    field + bitmap closed-form, so the hash gate proves bytes → record
    scan → section parse → bitmap mask → unpack → Y=(R+X·2^E)/10^D is
    exactly the declared arithmetic (E=1 and a nonzero R are chosen so a
    codec that ignored either would fail the hash, and the witnessed
    ``lat_first_mdeg`` pins GDS header parsing).

    Scale: GRIB payload bytes stay executor-side in Arrow batches — the
    shuffle after decode carries only per-record statistic rows, never
    rasters; files decode independently (embarrassingly parallel scan,
    the 100 TB archive shape). Python is sanctioned here: this IS the
    byte-codec boundary, like the PPM/PCM queries.
    """
    from typing import Iterator

    import pandas as pd

    from ..grid.grib1 import decode_grib1, select_record

    ids = (
        table(spark, sf_dir, "documents")
        .filter((F.col("doc_id") % 3 == 2) & (F.col("doc_id") < 300))
        .select("doc_id")
    )

    def synth(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            yield pd.DataFrame(
                [{"doc_id": int(d), "grib": _synth_grib1_file(int(d))} for d in pdf["doc_id"]]
            )

    def decode(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            rows = []
            for doc_id, buf in zip(pdf["doc_id"], pdf["grib"]):
                d = int(doc_id)
                rn = 1 + (d // 3) % 3
                rec = decode_grib1(select_record(bytes(buf), rn))
                rows.append(
                    {
                        "doc_id": d,
                        "record_number": rn,
                        "ni": rec.ni,
                        "nj": rec.nj,
                        "lat_first_mdeg": rec.lat_first_mdeg,
                        "values": rec.values.reshape(-1).tolist(),
                    }
                )
            yield pd.DataFrame(rows)

    files = ids.mapInPandas(synth, schema="doc_id bigint, grib binary")
    decoded = files.mapInPandas(
        decode,
        schema=(
            "doc_id bigint, record_number int, ni int, nj int, "
            "lat_first_mdeg int, values array<double>"
        ),
    )
    # Arrow maps Python NaN in a list<double> to NULL — filter both
    # spellings of "missing" (isnan(NULL) is false, so NULL needs its
    # own clause).
    present = F.filter("values", _is_present)
    return decoded.select(
        "doc_id",
        "record_number",
        "ni",
        "nj",
        "lat_first_mdeg",
        present.alias("pv"),
        F.size("values").alias("n_cells"),
    ).select(
        "doc_id",
        "record_number",
        "ni",
        "nj",
        "lat_first_mdeg",
        F.size("pv").cast("bigint").alias("n_present"),
        (F.col("n_cells") - F.size("pv")).cast("bigint").alias("n_missing"),
        F.round(
            F.aggregate("pv", F.lit(0).cast("bigint"), lambda a, x: a + x.cast("bigint"))
            .cast("double")
            / F.size("pv"),
            6,
        ).alias("mean_val"),
        F.array_min("pv").cast("bigint").alias("min_val"),
        F.array_max("pv").cast("bigint").alias("max_val"),
    ).orderBy("doc_id")


# --- GRIB1 normals → anomaly, end-to-end from bytes ------------------------
# 36 monthly records (3 years × 12 months) on a fixed 12×8 grid; cell
# (i, j) of month m is 100 + 2*((m*17 + i*3 + j*5) % 50) — even steps so
# the R=100/E=1 packing round-trips bit-exactly (see grid_grib1_decode).
_GRIB_ANOM_MONTHS = 36
_GRIB_ANOM_NI = 12
_GRIB_ANOM_NJ = 8


@query(
    "grid_grib1_anomaly",
    tags=("grid", "codec", "python", "join", "agg"),
    oracle=f"""
WITH cells AS (
  SELECT m.m AS m, m.m % 12 AS mo, i.i AS i, j.j AS j,
         100 + 2 * ((m.m * 17 + i.i * 3 + j.j * 5) % 50) AS v
  FROM UNNEST(generate_series(0, {_GRIB_ANOM_MONTHS - 1})) AS m(m),
       UNNEST(generate_series(0, {_GRIB_ANOM_NI - 1})) AS i(i),
       UNNEST(generate_series(0, {_GRIB_ANOM_NJ - 1})) AS j(j)
),
normals AS (
  SELECT mo, i, j, AVG(CAST(v AS DOUBLE)) AS normal
  FROM cells GROUP BY mo, i, j
),
latest AS (
  SELECT mo, i, j, v FROM cells WHERE m >= 24
)
SELECT CAST(l.mo + 1 AS INTEGER) AS month,
       CAST(90000 - l.j * 1000 AS INTEGER) AS lat_mdeg,
       CAST(l.i * 1000 AS INTEGER) AS lon_mdeg,
       ROUND(l.v - n.normal, 6) AS anomaly
FROM latest l JOIN normals n ON l.mo = n.mo AND l.i = n.i AND l.j = n.j
ORDER BY month, lat_mdeg DESC, lon_mdeg
""",
)
def grid_grib1_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's ENTIRE grib1_normal + grib1_anomaly export path
    (/root/reference/src/file-conversions.js:16-47: record extract →
    ``cdo timmean`` climatological normal → ``cdo sub`` anomaly) run
    end-to-end FROM GRIB BYTES by the engine: 36 monthly single-record
    GRIB1 files are synthesized executor-side (one file per month — the
    archive layout), decoded through the real codec in mapInPandas, and
    the normals (per calendar-month mean over 3 years) and anomaly
    (latest year − normal) are JVM-side aggregation + equi-join over
    the decoded cells — A1 and J1 fed by S5's binary scan.

    Grid georeferencing is witnessed: output lat/lon come from the
    decoded GDS (lat_first − j·dlat, lon_first + i·dlon), and the month
    column from each record's decoded PDS reference time — a codec that
    mangled either header would fail the hash even with correct values.

    Scale: one file per month decodes independently (embarrassingly
    parallel); the normals aggregate carries |months × cells| rows into
    a per-(calendar-month, cell) mean and the anomaly is an equi-join on
    (month, cell) — the exact plan era5_monthly_anomaly runs on parquet,
    now fed by the binary scan. Fixture-independent lattice (like
    grid_hillshade): the archive is synthesized, not read from sf_dir.
    """
    from typing import Iterator

    import numpy as np
    import pandas as pd

    from ..grid.grib1 import decode_grib1, encode_grib1_message

    months = spark.range(_GRIB_ANOM_MONTHS).select(F.col("id").alias("m"))

    def synth(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        i = np.arange(_GRIB_ANOM_NI)[None, :]
        j = np.arange(_GRIB_ANOM_NJ)[:, None]
        for pdf in batches:
            rows = []
            for m in pdf["m"]:
                m = int(m)
                v = 100 + 2 * ((m * 17 + i * 3 + j * 5) % 50)
                rows.append(
                    {
                        "m": m,
                        "grib": encode_grib1_message(
                            v.astype(np.float64),
                            parameter=11,
                            reftime=(2018 + m // 12, m % 12 + 1, 1, 0, 0),
                            reference_value=100.0,
                            binary_scale=1,
                            nbits=8,
                        ),
                    }
                )
            yield pd.DataFrame(rows)

    def decode(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            out = []
            for m, buf in zip(pdf["m"], pdf["grib"]):
                rec = decode_grib1(bytes(buf))
                yy, mo = rec.reftime[0], rec.reftime[1]
                for j in range(rec.nj):
                    lat = rec.lat_first_mdeg - j * rec.dlat_mdeg
                    for i in range(rec.ni):
                        out.append(
                            {
                                "year": yy,
                                "month": mo,
                                "lat_mdeg": lat,
                                "lon_mdeg": rec.lon_first_mdeg + i * rec.dlon_mdeg,
                                "v": float(rec.values[j, i]),
                            }
                        )
            yield pd.DataFrame(out)

    files = months.mapInPandas(synth, schema="m bigint, grib binary")
    cells = files.mapInPandas(
        decode,
        schema="year int, month int, lat_mdeg int, lon_mdeg int, v double",
    )
    normals = cells.groupBy("month", "lat_mdeg", "lon_mdeg").agg(
        F.avg("v").alias("normal")
    )
    latest = cells.filter(F.col("year") == 2020).select(
        "month", "lat_mdeg", "lon_mdeg", "v"
    )
    return (
        latest.join(normals, ["month", "lat_mdeg", "lon_mdeg"])
        .select(
            "month",
            "lat_mdeg",
            "lon_mdeg",
            F.round(F.col("v") - F.col("normal"), 6).alias("anomaly"),
        )
        .orderBy("month", F.desc("lat_mdeg"), "lon_mdeg")
    )


@query(
    "grid_grib1_inventory",
    tags=("grid", "codec", "python", "ingest"),
    oracle="""
WITH g AS (
  SELECT doc_id,
         8 + doc_id % 5 AS ni,
         4 + doc_id % 4 AS nj
  FROM documents WHERE doc_id % 3 = 2 AND doc_id < 300
),
recs AS (
  SELECT doc_id, ni, nj, r.r AS r
  FROM g, UNNEST(generate_series(0, 2)) AS r(r)
)
SELECT doc_id,
       CAST(r + 1 AS INTEGER) AS record_number,
       CAST(11 + r AS INTEGER) AS parameter,
       CAST(2020 AS INTEGER) AS year,
       CAST(1 AS INTEGER) AS month,
       CAST(ni AS INTEGER) AS ni,
       CAST(nj AS INTEGER) AS nj,
       CAST(8 AS INTEGER) AS nbits,
       r = 1 AS has_bitmap
FROM recs ORDER BY doc_id, record_number
""",
)
def grid_grib1_inventory(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``wgrib``'s record inventory as a query: list every record of
    every archive file — number, parameter, reference time, grid shape,
    packing width, bitmap flag — by parsing ONLY the fixed-size headers
    (PDS/GDS + section lengths), never unpacking a value bit
    (``grib1.inspect_grib1``). This is the projection-pushdown story for
    binary formats: the reference picks records by inventory position
    before extracting (/root/reference/src/file-conversions.js:120-127),
    and at 100 TB the inventory pass reads a few hundred bytes per
    record instead of the raster payload. Same synthetic 3-record files
    as ``grid_grib1_decode``; the oracle restates the header fields
    closed-form.
    """
    from typing import Iterator

    import pandas as pd

    from ..grid.grib1 import inspect_grib1, iter_messages

    ids = (
        table(spark, sf_dir, "documents")
        .filter((F.col("doc_id") % 3 == 2) & (F.col("doc_id") < 300))
        .select("doc_id")
    )

    def synth(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            yield pd.DataFrame(
                [{"doc_id": int(d), "grib": _synth_grib1_file(int(d))} for d in pdf["doc_id"]]
            )

    def inventory(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            rows = []
            for doc_id, buf in zip(pdf["doc_id"], pdf["grib"]):
                for n, msg in enumerate(iter_messages(bytes(buf)), start=1):
                    h = inspect_grib1(msg)
                    rows.append(
                        {
                            "doc_id": int(doc_id),
                            "record_number": n,
                            "parameter": h["parameter"],
                            "year": h["year"],
                            "month": h["month"],
                            "ni": h["ni"],
                            "nj": h["nj"],
                            "nbits": h["nbits"],
                            "has_bitmap": h["has_bitmap"],
                        }
                    )
            yield pd.DataFrame(rows)

    files = ids.mapInPandas(synth, schema="doc_id bigint, grib binary")
    return files.mapInPandas(
        inventory,
        schema=(
            "doc_id bigint, record_number int, parameter int, year int, "
            "month int, ni int, nj int, nbits int, has_bitmap boolean"
        ),
    ).orderBy("doc_id", "record_number")


# --- GRIB2 regex match + decode -------------------------------------------
# Synthetic GRIB2 archive: doc d's file holds 4 records r=0..3 with
# category r % 2 and number r; cell (i, j) of record r is
# 200 + 2*((d*11 + r*7 + i*5 + j*3) % 100) (R=200, E=1, 8-bit — exact).
# The query runs wgrib2's selection: -match "c{d%2}," -limit 2, so the
# selected records are r = (d % 2) + 2·(rank − 1) for rank 1, 2.


@query(
    "grid_grib2_match_decode",
    tags=("grid", "codec", "python", "ingest"),
    oracle="""
WITH g AS (
  SELECT doc_id,
         6 + doc_id % 4 AS ni,
         4 + doc_id % 3 AS nj,
         doc_id % 2 AS c
  FROM documents WHERE doc_id % 3 = 1 AND doc_id < 300
),
recs AS (
  SELECT doc_id, ni, nj, c, k.k + 1 AS match_rank, c + 2 * k.k AS r
  FROM g, UNNEST(generate_series(0, 1)) AS k(k)
),
cells AS (
  SELECT doc_id, match_rank, c, r, ni, nj,
         200 + 2 * ((doc_id * 11 + r * 7 + i.i * 5 + j.j * 3) % 100) AS v
  FROM recs,
       LATERAL (SELECT unnest(generate_series(0, ni - 1)) AS i) i,
       LATERAL (SELECT unnest(generate_series(0, nj - 1)) AS j) j
)
SELECT doc_id,
       CAST(match_rank AS INTEGER) AS match_rank,
       CAST(c AS INTEGER) AS category,
       CAST(r AS INTEGER) AS number,
       CAST(ni * nj AS BIGINT) AS n_cells,
       ROUND(CAST(SUM(v) AS DOUBLE) / (ni * nj), 6) AS mean_val,
       CAST(MIN(v) AS BIGINT) AS min_val,
       CAST(MAX(v) AS BIGINT) AS max_val
FROM cells
GROUP BY doc_id, match_rank, c, r, ni, nj
ORDER BY doc_id, match_rank
""",
)
def grid_grib2_match_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's GRIB2 ingest path end-to-end — ``wgrib2 input
    -match <regex> -limit <n> -grib``
    (/root/reference/src/file-conversions.js:75-99) replaced by the
    engine's pure-Python edition-2 codec (grid/grib2.py): per document a
    4-record GRIB2 FILE is synthesized executor-side (real section 0-8
    bytes: IEEE-float reference value, signed-magnitude 16/32-bit scale
    factors and microdegree coordinates, templates 3.0/4.0/5.0), records
    are selected by REGEX over wgrib2-style inventory lines with a count
    limit, and each selected record decodes through Arrow/mapInPandas
    with statistics aggregated JVM-side.

    The oracle restates the synthetic field and the match arithmetic
    (selected r = (d mod 2) + 2·(rank−1)) closed-form — the hash gate
    proves scan → inventory render → regex match → limit → section
    parse → unpack is exactly the declared semantics. Witnessed
    category/number columns pin Section-4 parsing.

    Scale: same embarrassingly-parallel shape as grid_grib1_decode —
    payload bytes never shuffle; the regex runs over header-derived
    inventory strings only (a few hundred bytes per record), so at
    archive scale matching costs metadata, not raster I/O.
    """
    from typing import Iterator

    import numpy as np
    import pandas as pd

    from ..grid.grib2 import decode_grib2, encode_grib2_message, match_records

    ids = (
        table(spark, sf_dir, "documents")
        .filter((F.col("doc_id") % 3 == 1) & (F.col("doc_id") < 300))
        .select("doc_id")
    )

    def synth(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                ni, nj = 6 + d % 4, 4 + d % 3
                i = np.arange(ni)[None, :]
                j = np.arange(nj)[:, None]
                msgs = []
                for r in range(4):
                    v = 200 + 2 * ((d * 11 + r * 7 + i * 5 + j * 3) % 100)
                    msgs.append(
                        encode_grib2_message(
                            v.astype(np.float64),
                            category=r % 2,
                            number=r,
                            reference_value=200.0,
                            binary_scale=1,
                            nbits=8,
                        )
                    )
                rows.append({"doc_id": d, "grib": b"".join(msgs)})
            yield pd.DataFrame(rows)

    def match_decode(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            rows = []
            for doc_id, buf in zip(pdf["doc_id"], pdf["grib"]):
                d = int(doc_id)
                for rank, msg in enumerate(
                    match_records(bytes(buf), f"c{d % 2},", limit=2), start=1
                ):
                    rec = decode_grib2(msg)
                    rows.append(
                        {
                            "doc_id": d,
                            "match_rank": rank,
                            "category": rec.category,
                            "number": rec.number,
                            "values": rec.values.reshape(-1).tolist(),
                        }
                    )
            yield pd.DataFrame(rows)

    files = ids.mapInPandas(synth, schema="doc_id bigint, grib binary")
    decoded = files.mapInPandas(
        match_decode,
        schema=(
            "doc_id bigint, match_rank int, category int, number int, "
            "values array<double>"
        ),
    )
    return decoded.select(
        "doc_id",
        "match_rank",
        "category",
        "number",
        F.size("values").cast("bigint").alias("n_cells"),
        F.round(
            F.aggregate("values", F.lit(0).cast("bigint"), lambda a, x: a + x.cast("bigint"))
            .cast("double")
            / F.size("values"),
            6,
        ).alias("mean_val"),
        F.array_min("values").cast("bigint").alias("min_val"),
        F.array_max("values").cast("bigint").alias("max_val"),
    ).orderBy("doc_id", "match_rank")


# --- GRIB1 landing-directory scan (the file-based ingest entry) ------------
# 12 monthly .grib files, each holding 2 records (parameter 11 = temp,
# 61 = precip); cell (i, j) of month m, parameter index p is
# 100 + 50·p + 2·((m·17 + p·23 + i·3 + j·5) % 50) on a 10×6 grid
# (R=100+50p, E=1, 8-bit — bit-exact decode).
_LANDING_MONTHS = 12
_LANDING_NI = 10
_LANDING_NJ = 6
_LANDING_PARAMS = (11, 61)


def ensure_grib1_landing(
    spark: SparkSession, sf_dir: str, n_months: int = _LANDING_MONTHS
) -> str:
    """Write the shared GRIB1 landing directory once per session (atomic
    per-file temp+rename, the reference's download discipline) and
    return its path. The default 12-month landing (year 2020) feeds the
    batch landing scan AND the streaming anomaly pipeline; the 36-month
    form (2020-2022, month index t continuing the same formula) feeds
    the byte-real flagship, whose normals need multiple years per
    calendar month. Year 2020 is always t=0-11, so the 12-month landing
    is exactly the 36-month landing's first year."""
    import atexit
    import shutil
    import tempfile

    import numpy as np

    from ..grid.grib1 import encode_grib1_message
    from .catalog import session_cache_suffix

    base = os.path.join(
        tempfile.gettempdir(),
        f"mdi_grib_landing_{n_months}_{session_cache_suffix(spark, sf_dir)}",
    )
    complete = os.path.join(base, "_complete")
    landing = os.path.join(base, "landing")
    base_year = 2020
    if not os.path.exists(complete):
        shutil.rmtree(base, ignore_errors=True)
        os.makedirs(landing)
        i = np.arange(_LANDING_NI)[None, :]
        j = np.arange(_LANDING_NJ)[:, None]
        for t in range(n_months):
            year, month = base_year + t // 12, t % 12 + 1
            msgs = []
            for p, param in enumerate(_LANDING_PARAMS):
                v = 100 + 50 * p + 2 * ((t * 17 + p * 23 + i * 3 + j * 5) % 50)
                msgs.append(
                    encode_grib1_message(
                        v.astype(np.float64),
                        parameter=param,
                        reftime=(year, month, 1, 0, 0),
                        reference_value=float(100 + 50 * p),
                        binary_scale=1,
                        nbits=8,
                    )
                )
            name = f"era5_{year}_{month:02d}.grib"
            tmp = os.path.join(landing, f".{name}.tmp")
            with open(tmp, "wb") as f:
                f.write(b"".join(msgs))
            os.rename(tmp, os.path.join(landing, name))
        open(complete, "w").close()
        atexit.register(shutil.rmtree, base, ignore_errors=True)
    return landing


@query(
    "grid_grib1_landing_scan",
    tags=("grid", "codec", "python", "ingest", "agg"),
    oracle=f"""
WITH cells AS (
  SELECT m.m AS m, p.p AS p, i.i AS i, j.j AS j,
         100 + 50 * p.p + 2 * ((m.m * 17 + p.p * 23 + i.i * 3 + j.j * 5) % 50) AS v
  FROM UNNEST(generate_series(0, {_LANDING_MONTHS - 1})) AS m(m),
       UNNEST(generate_series(0, 1)) AS p(p),
       UNNEST(generate_series(0, {_LANDING_NI - 1})) AS i(i),
       UNNEST(generate_series(0, {_LANDING_NJ - 1})) AS j(j)
)
SELECT CAST(m + 1 AS INTEGER) AS month,
       CAST(CASE WHEN p = 0 THEN 11 ELSE 61 END AS INTEGER) AS parameter,
       CAST(COUNT(*) AS BIGINT) AS n_cells,
       ROUND(CAST(SUM(v) AS DOUBLE) / COUNT(*), 6) AS mean_val,
       CAST(MIN(v) AS BIGINT) AS min_val,
       CAST(MAX(v) AS BIGINT) AS max_val
FROM cells GROUP BY m, p ORDER BY month, parameter
""",
)
def grid_grib1_landing_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The file-based ingest entry, end-to-end on REAL FILES: a landing
    directory of 12 monthly ``.grib`` downloads (written once per
    session by the engine's own encoder) is scanned with Spark's
    binaryFile source, every record decodes through
    ``sources/grib_source.grib1_records`` (one Arrow stage), explodes to
    georeferenced cells JVM-side (``grib1_cells``), and aggregates per
    (month, parameter) — the reference's landing-area read
    (/root/reference/src/sources/era5monthly.js:172-195 downloads GRIB
    files; every downstream step reads those bytes). Unlike
    grid_grib1_decode (bytes synthesized in-plan), THIS query's bytes
    travel through the filesystem and the binaryFile scan — the actual
    "point the engine at a download directory" path, streaming-ready via
    ``grib1_records_stream`` (tests/test_grib_source.py proves
    batch ≡ streaming over the same landing).

    Scale: binaryFile splits by file → one decode task per month-file,
    the archive's natural work unit; only aggregated rows shuffle.
    Fixture-independent (the landing is the engine's own data model).
    """
    from ..sources.grib_source import grib1_cells, grib1_records

    cells = grib1_cells(grib1_records(spark, ensure_grib1_landing(spark, sf_dir)))
    return (
        cells.groupBy("month", "parameter")
        .agg(
            F.count(F.lit(1)).alias("n_cells"),
            F.round(
                F.sum(F.col("value").cast("bigint")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("mean_val"),
            F.min(F.col("value").cast("bigint")).alias("min_val"),
            F.max(F.col("value").cast("bigint")).alias("max_val"),
        )
        .orderBy("month", "parameter")
    )


# --- GRIB2 non-simple packing decode (templates 5.2 / 5.3 / 5.41) ----------
# Per selected document a 4-record GRIB2 file: record r's cell (i, j) is
# 150 + 2*((d*13 + r*7 + i*5 + j*3) % 80) — even steps, R=150, E=1, so
# the packed integer increments round-trip BIT-EXACTLY. Record 1 packs
# with template 5.2; record 2 packs 5.2 WITH missing-value management 1
# (cells where (i*2 + j + d) % 5 == 0 ride in-data as all-ones
# substitutions, NO section-6 bitmap); record 3 packs 5.3 with spatial
# differencing of order 1 + d%2; record 4 packs 5.41 (the field as one
# PNG image).


@query(
    "grid_grib2_complex_decode",
    tags=("grid", "codec", "python", "ingest"),
    oracle="""
WITH g AS (
  SELECT doc_id,
         6 + doc_id % 5 AS ni,
         3 + doc_id % 3 AS nj
  FROM documents WHERE doc_id % 3 = 0 AND doc_id < 300
),
cells AS (
  SELECT doc_id, ni, nj, r.r + 1 AS rn,
         CASE WHEN r.r = 1 AND (i.i * 2 + j.j + doc_id) % 5 = 0 THEN NULL
              ELSE 150 + 2 * ((doc_id * 13 + r.r * 7 + i.i * 5 + j.j * 3) % 80)
         END AS v
  FROM g,
       UNNEST(generate_series(0, 3)) AS r(r),
       LATERAL (SELECT unnest(generate_series(0, ni - 1)) AS i) i,
       LATERAL (SELECT unnest(generate_series(0, nj - 1)) AS j) j
)
SELECT doc_id,
       CAST(rn AS INTEGER) AS record_number,
       CAST(CASE rn WHEN 3 THEN 3 WHEN 4 THEN 41 ELSE 2 END AS INTEGER) AS tmpl,
       CAST(COUNT(v) AS BIGINT) AS n_present,
       CAST(COUNT(*) - COUNT(v) AS BIGINT) AS n_missing,
       ROUND(CAST(SUM(v) AS DOUBLE) / COUNT(v), 6) AS mean_val,
       CAST(MIN(v) AS BIGINT) AS min_val,
       CAST(MAX(v) AS BIGINT) AS max_val
FROM cells
GROUP BY doc_id, rn
ORDER BY doc_id, rn
""",
)
def grid_grib2_complex_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GRIB2 COMPLEX packing end-to-end — the representation real
    operational archives (GFS, most ERA5 GRIB2 products) actually use,
    which the reference reads through wgrib2
    (/root/reference/src/file-conversions.js:49-51,76-112). Per selected
    document a 3-record GRIB2 file is synthesized executor-side: record
    1 = template 5.2 (general group splitting: per-group references and
    widths, byte-aligned runs, continuous value stream), record 2 =
    5.2 + missing-value management 1 (missing cells ride IN the packed
    data as all-ones substitutions — no section-6 bitmap), record 3 =
    template 5.3 (spatial differencing, order 1 + d%2, signed-magnitude
    initial values and difference minimum), record 4 = template 5.41
    (PNG packing: the scaled field as one big-endian grayscale PNG —
    stdlib-zlib codec, the wgrib2/g2clib convention NCEP MRMS products
    use). Every record decodes through
    the engine's pure-Python codec in one Arrow stage; statistics
    aggregate JVM-side.

    The oracle restates the synthetic field + missing rule closed-form
    and never touches a byte — the hash gate proves group splitting,
    width/reference reconstruction, missing substitution, and
    difference integration are exactly the declared arithmetic. The
    witnessed ``tmpl`` column pins that the 5.2/5.3 branch (not a
    simple-packing fallback) produced each record.

    Scale: identical posture to grid_grib1_decode — payload bytes stay
    executor-side, only per-record statistic rows shuffle, files decode
    embarrassingly parallel.
    """
    from typing import Iterator

    import numpy as np
    import pandas as pd

    from ..grid.grib2 import decode_grib2, encode_grib2_message, iter_messages2

    ids = (
        table(spark, sf_dir, "documents")
        .filter((F.col("doc_id") % 3 == 0) & (F.col("doc_id") < 300))
        .select("doc_id")
    )

    def synth(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                ni, nj = 6 + d % 5, 3 + d % 3
                i = np.arange(ni)[None, :]
                j = np.arange(nj)[:, None]
                msgs = []
                for r in range(4):
                    v = (150 + 2 * ((d * 13 + r * 7 + i * 5 + j * 3) % 80)).astype(
                        np.float64
                    )
                    kw = dict(
                        reference_value=150.0,
                        binary_scale=1,
                        group_len=4 + d % 5,
                        category=r,
                        number=r,
                    )
                    if r == 1:
                        mm = (i * 2 + j + d) % 5 == 0
                        msgs.append(
                            encode_grib2_message(
                                v, packing="complex",
                                missing_mask=mm | np.zeros_like(v, bool), **kw,
                            )
                        )
                    elif r == 2:
                        msgs.append(
                            encode_grib2_message(
                                v, packing="complex_diff",
                                spatial_diff_order=1 + d % 2, **kw,
                            )
                        )
                    elif r == 3:
                        msgs.append(encode_grib2_message(v, packing="png", **kw))
                    else:
                        msgs.append(encode_grib2_message(v, packing="complex", **kw))
                rows.append({"doc_id": d, "grib": b"".join(msgs)})
            yield pd.DataFrame(rows)

    def decode(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            rows = []
            for doc_id, buf in zip(pdf["doc_id"], pdf["grib"]):
                d = int(doc_id)
                for rn, msg in enumerate(iter_messages2(bytes(buf)), start=1):
                    rec = decode_grib2(msg)
                    rows.append(
                        {
                            "doc_id": d,
                            "record_number": rn,
                            "tmpl": rec.packing_template,
                            "values": rec.values.reshape(-1).tolist(),
                        }
                    )
            yield pd.DataFrame(rows)

    files = ids.mapInPandas(synth, schema="doc_id bigint, grib binary")
    decoded = files.mapInPandas(
        decode,
        schema="doc_id bigint, record_number int, tmpl int, values array<double>",
    )
    present = F.filter("values", _is_present)
    return decoded.select(
        "doc_id",
        "record_number",
        "tmpl",
        present.alias("pv"),
        F.size("values").alias("n_cells"),
    ).select(
        "doc_id",
        "record_number",
        "tmpl",
        F.size("pv").cast("bigint").alias("n_present"),
        (F.col("n_cells") - F.size("pv")).cast("bigint").alias("n_missing"),
        F.round(
            F.aggregate("pv", F.lit(0).cast("bigint"), lambda a, x: a + x.cast("bigint"))
            .cast("double")
            / F.size("pv"),
            6,
        ).alias("mean_val"),
        F.array_min("pv").cast("bigint").alias("min_val"),
        F.array_max("pv").cast("bigint").alias("max_val"),
    ).orderBy("doc_id", "record_number")


# --- GRIB2 JPEG2000 (template 5.40) decode ---------------------------------
# Per selected document a 3-record GRIB2 file, grids (10 + d%6) x
# (4 + d%4), record r's cell (i, j) being
# 150 + 2*((d*11 + r*17 + i*3 + j*7) % m_r), m_r = 90 for records 1-2
# and 5000 (a ~13-bit field) for record 3.  Record 2 carries a
# section-6 bitmap hiding cells where (i + 2*j + d) % 4 == 0.


@query(
    "grid_grib2_jpeg2000_decode",
    tags=("grid", "codec", "python", "ingest"),
    oracle="""
WITH g AS (
  SELECT doc_id,
         10 + doc_id % 6 AS ni,
         4 + doc_id % 4 AS nj
  FROM documents WHERE doc_id % 7 = 2 AND doc_id < 350
),
cells AS (
  SELECT doc_id, ni, nj, r.r + 1 AS rn,
         CASE WHEN r.r = 1 AND (i.i + 2 * j.j + doc_id) % 4 = 0 THEN NULL
              ELSE 150 + 2 * ((doc_id * 11 + r.r * 17 + i.i * 3 + j.j * 7)
                              % (CASE WHEN r.r = 2 THEN 5000 ELSE 90 END))
         END AS v,
         j.j * ni + i.i AS pos
  FROM g,
       UNNEST(generate_series(0, 2)) AS r(r),
       LATERAL (SELECT unnest(generate_series(0, ni - 1)) AS i) i,
       LATERAL (SELECT unnest(generate_series(0, nj - 1)) AS j) j
)
SELECT doc_id,
       CAST(rn AS INTEGER) AS record_number,
       CAST(40 AS INTEGER) AS tmpl,
       CAST(COUNT(v) AS BIGINT) AS n_present,
       CAST(COUNT(*) - COUNT(v) AS BIGINT) AS n_missing,
       ROUND(CAST(SUM(v) AS DOUBLE) / COUNT(v), 6) AS mean_val,
       CAST(SUM(v * pos) AS BIGINT) AS wsum
FROM cells
GROUP BY doc_id, rn
ORDER BY doc_id, rn
""",
)
def grid_grib2_jpeg2000_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GRIB2 JPEG2000 packing (template 5.40) end-to-end — the wavelet
    representation most NCEP operational products (GFS pgrb2 among
    them) actually ship, which the reference reads through wgrib2's
    bundled g2clib + jasper (/root/reference/src/file-conversions.js:
    49-51,76-112). Per selected document a 3-record GRIB2 file is
    synthesized executor-side, every record packed as a lossless raw
    JPEG2000 codestream (grid/jpeg2000.py: reversible 5/3 DWT, EBCOT
    tier-1 MQ coding, tag-tree packet headers): record 1 = a dense
    ~8-bit field, record 2 = the same shape with a section-6 bitmap
    (missing cells NULL after expansion), record 3 = a ~13-bit field
    (multiple extra bit-planes through every coding pass). All three
    decode through the engine's pure-Python codec in one Arrow stage;
    statistics aggregate JVM-side.

    The oracle restates the synthetic field + missing rule closed-form
    and never touches a byte. The witnessed ``tmpl`` column pins that
    template 5.40 (not a simple-packing fallback) produced each
    record, and the position-weighted checksum ``wsum`` is raster-
    order SENSITIVE — a transposed DWT, a mis-assembled subband, or a
    code-block placed at the wrong offset hash-mismatches even when
    permutation-invariant stats survive.

    Scale: identical posture to grid_grib2_complex_decode — payload
    bytes stay executor-side, only per-record statistic rows shuffle,
    files decode embarrassingly parallel in Arrow batches.
    """
    from typing import Iterator

    import numpy as np
    import pandas as pd

    from ..grid.grib2 import decode_grib2, encode_grib2_message, iter_messages2

    ids = (
        table(spark, sf_dir, "documents")
        .filter((F.col("doc_id") % 7 == 2) & (F.col("doc_id") < 350))
        .select("doc_id")
    )

    def synth(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                ni, nj = 10 + d % 6, 4 + d % 4
                i = np.arange(ni)[None, :]
                j = np.arange(nj)[:, None]
                msgs = []
                for r in range(3):
                    mod = 5000 if r == 2 else 90
                    v = (
                        150 + 2 * ((d * 11 + r * 17 + i * 3 + j * 7) % mod)
                    ).astype(np.float64)
                    kw = dict(
                        reference_value=150.0,
                        binary_scale=1,
                        category=r,
                        number=r,
                        packing="jpeg2000",
                    )
                    if r == 1:
                        present = (i + 2 * j + d) % 4 != 0
                        msgs.append(
                            encode_grib2_message(
                                v, bitmap=present | np.zeros_like(v, bool), **kw
                            )
                        )
                    else:
                        msgs.append(encode_grib2_message(v, **kw))
                rows.append({"doc_id": d, "grib": b"".join(msgs)})
            yield pd.DataFrame(rows)

    def decode(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            rows = []
            for doc_id, buf in zip(pdf["doc_id"], pdf["grib"]):
                d = int(doc_id)
                for rn, msg in enumerate(iter_messages2(bytes(buf)), start=1):
                    rec = decode_grib2(msg)
                    rows.append(
                        {
                            "doc_id": d,
                            "record_number": rn,
                            "tmpl": rec.packing_template,
                            "values": rec.values.reshape(-1).tolist(),
                        }
                    )
            yield pd.DataFrame(rows)

    files = ids.mapInPandas(synth, schema="doc_id bigint, grib binary")
    decoded = files.mapInPandas(
        decode,
        schema="doc_id bigint, record_number int, tmpl int, values array<double>",
    )
    present = F.filter("values", _is_present)
    weighted = F.zip_with(
        "values",
        F.sequence(F.lit(0), F.size("values") - 1),
        lambda v, idx: F.when(
            _is_present(v), v.cast("bigint") * idx.cast("bigint")
        ).otherwise(F.lit(0).cast("bigint")),
    )
    return decoded.select(
        "doc_id",
        "record_number",
        "tmpl",
        present.alias("pv"),
        F.size("values").alias("n_cells"),
        F.aggregate(weighted, F.lit(0).cast("bigint"), lambda a, x: a + x).alias(
            "wsum"
        ),
    ).select(
        "doc_id",
        "record_number",
        "tmpl",
        F.size("pv").cast("bigint").alias("n_present"),
        (F.col("n_cells") - F.size("pv")).cast("bigint").alias("n_missing"),
        F.round(
            F.aggregate("pv", F.lit(0).cast("bigint"), lambda a, x: a + x.cast("bigint"))
            .cast("double")
            / F.size("pv"),
            6,
        ).alias("mean_val"),
        "wsum",
    ).orderBy("doc_id", "record_number")


# --- GRIB2 Gaussian grid (template 3.40) decode -----------------------------
# Per selected document a 2-record GRIB2 file on the GLOBAL regular
# Gaussian grid F(4 + d%3) — nj = 2N parallels at the Legendre-root
# latitudes, ni = 9 + d%5 — record 1 simple-packed, record 2
# JPEG2000-packed, cell (i, j) of record r being
# 150 + 2*((d*7 + r*19 + i*5 + j*3) % 70).  The oracle's latitude
# table is computed with numpy's INDEPENDENT Gauss-Legendre
# implementation (np.polynomial.legendre.leggauss), so the engine's
# own Newton/Bonnet root finder is witnessed against a second
# implementation, not against itself.


def _gauss_lat_values_sql() -> str:
    import numpy as np

    rows = []
    for n in (4, 5, 6):
        x, _ = np.polynomial.legendre.leggauss(2 * n)
        lats = np.degrees(np.arcsin(x))[::-1]  # ascending x -> north first
        for j, lat in enumerate(lats):
            rows.append(f"({n}, {j}, {int(round(float(lat) * 1e6))})")
    return ",\n       ".join(rows)


@query(
    "grid_grib2_gaussian_decode",
    tags=("grid", "codec", "python", "ingest"),
    oracle=f"""
WITH g AS (
  SELECT doc_id,
         4 + doc_id % 3 AS n,
         9 + doc_id % 5 AS ni
  FROM documents WHERE doc_id % 11 = 3 AND doc_id < 440
),
lat(n, j, lat_udeg) AS (
  VALUES {_gauss_lat_values_sql()}
),
lsum AS (
  SELECT g.doc_id,
         MIN(CASE WHEN l.j = 0 THEN l.lat_udeg END) AS lat0_udeg,
         SUM(l.lat_udeg * (l.j + 1)) AS latwsum
  FROM g JOIN lat l ON l.n = g.n
  GROUP BY g.doc_id
),
cells AS (
  SELECT doc_id, n, ni, r.r + 1 AS rn,
         150 + 2 * ((doc_id * 7 + r.r * 19 + i.i * 5 + j.j * 3) % 70) AS v,
         j.j * ni + i.i AS pos
  FROM g,
       UNNEST(generate_series(0, 1)) AS r(r),
       LATERAL (SELECT unnest(generate_series(0, ni - 1)) AS i) i,
       LATERAL (SELECT unnest(generate_series(0, 2 * n - 1)) AS j) j
)
SELECT c.doc_id,
       CAST(c.rn AS INTEGER) AS record_number,
       CAST(CASE c.rn WHEN 2 THEN 40 ELSE 0 END AS INTEGER) AS tmpl,
       CAST(MIN(c.n) AS INTEGER) AS gaussian_n,
       CAST(COUNT(*) AS BIGINT) AS n_cells,
       CAST(SUM(c.v) AS BIGINT) AS vsum,
       CAST(SUM(c.v * c.pos) AS BIGINT) AS wsum,
       CAST(MIN(ls.lat0_udeg) AS BIGINT) AS lat0_udeg,
       CAST(MIN(ls.latwsum) AS BIGINT) AS latwsum
FROM cells c JOIN lsum ls ON ls.doc_id = c.doc_id
GROUP BY c.doc_id, c.rn
ORDER BY c.doc_id, c.rn
""",
)
def grid_grib2_gaussian_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GRIB2 GAUSSIAN grid decode (grid template 3.40) — ERA5's native
    geometry and every ECMWF F-grid, which the reference's wgrib2 path
    handles natively (/root/reference/src/file-conversions.js:49-51,
    76-112). Per selected document a 2-record file on the global
    F(4 + d%3) grid is synthesized executor-side (record 1 simple-
    packed, record 2 JPEG2000-packed — geometry composes with every
    data representation); the engine's pure-Python codec decodes both
    and recovers the row latitudes as the arcsin roots of Legendre
    P_2N via its own Newton/Bonnet iteration (grid/grib2.py::
    gaussian_latitudes).

    Witness independence: the oracle's latitude table is generated
    with numpy's Gauss-Legendre implementation — a SECOND root finder
    — rounded to integer microdegrees, so ``lat0_udeg`` and the
    row-weighted ``latwsum`` certify the engine's quadrature nodes
    against an independent implementation, exactly (integer compare,
    no float-hash tolerance). ``wsum`` stays raster-order sensitive
    for the value payload; ``tmpl`` pins that record 2 really took the
    5.40 branch on the Gaussian geometry.

    Scale: the landing posture of every codec query — payload bytes
    executor-side, statistics rows shuffle, files embarrassingly
    parallel. Latitude recovery is O(nj^2) arithmetic on metadata, not
    data (nj rows, never Ni*Nj cells).
    """
    from typing import Iterator

    import numpy as np
    import pandas as pd

    from ..grid.grib2 import decode_grib2, encode_grib2_message, iter_messages2

    ids = (
        table(spark, sf_dir, "documents")
        .filter((F.col("doc_id") % 11 == 3) & (F.col("doc_id") < 440))
        .select("doc_id")
    )

    def synth(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                n, ni = 4 + d % 3, 9 + d % 5
                i = np.arange(ni)[None, :]
                j = np.arange(2 * n)[:, None]
                msgs = []
                for r in range(2):
                    v = (
                        150 + 2 * ((d * 7 + r * 19 + i * 5 + j * 3) % 70)
                    ).astype(np.float64)
                    msgs.append(
                        encode_grib2_message(
                            v,
                            gaussian=True,
                            packing="jpeg2000" if r == 1 else "simple",
                            reference_value=150.0,
                            binary_scale=1,
                            category=r,
                            number=r,
                        )
                    )
                rows.append({"doc_id": d, "grib": b"".join(msgs)})
            yield pd.DataFrame(rows)

    def decode(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            rows = []
            for doc_id, buf in zip(pdf["doc_id"], pdf["grib"]):
                d = int(doc_id)
                for rn, msg in enumerate(iter_messages2(bytes(buf)), start=1):
                    rec = decode_grib2(msg)
                    rows.append(
                        {
                            "doc_id": d,
                            "record_number": rn,
                            "tmpl": rec.packing_template,
                            "gaussian_n": rec.gaussian_n,
                            "values": rec.values.reshape(-1).tolist(),
                            "lats": rec.latitudes_deg.tolist(),
                        }
                    )
            yield pd.DataFrame(rows)

    files = ids.mapInPandas(synth, schema="doc_id bigint, grib binary")
    decoded = files.mapInPandas(
        decode,
        schema=(
            "doc_id bigint, record_number int, tmpl int, gaussian_n int, "
            "values array<double>, lats array<double>"
        ),
    )
    weighted = F.zip_with(
        "values",
        F.sequence(F.lit(0), F.size("values") - 1),
        lambda v, idx: v.cast("bigint") * idx.cast("bigint"),
    )
    lat_udeg = F.transform(
        "lats", lambda x: F.round(x * F.lit(1e6)).cast("bigint")
    )
    lat_weighted = F.zip_with(
        lat_udeg,
        F.sequence(F.lit(1), F.size("lats")),
        lambda lu, j: lu * j.cast("bigint"),
    )
    zero = F.lit(0).cast("bigint")
    return decoded.select(
        "doc_id",
        "record_number",
        "tmpl",
        "gaussian_n",
        F.size("values").cast("bigint").alias("n_cells"),
        F.aggregate(
            "values", zero, lambda a, x: a + x.cast("bigint")
        ).alias("vsum"),
        F.aggregate(weighted, zero, lambda a, x: a + x).alias("wsum"),
        F.element_at(lat_udeg, 1).alias("lat0_udeg"),
        F.aggregate(lat_weighted, zero, lambda a, x: a + x).alias("latwsum"),
    ).orderBy("doc_id", "record_number")


# --- GRIB2 Lambert conformal (template 3.30) decode -------------------------
# Per selected document a 2-record GRIB2 file on an HRRR-like Lambert
# grid: record 1 tangent cone (latin1 == latin2 == 38.5), record 2
# secant cone (33/45), both anchored at La1/Lo1 = (21.138, -122.72)
# with Dx = Dy = 3000·(1 + d%3) m, scanning 0x40 (+x east, +y north —
# the HRRR convention), ni = 8 + d%4, nj = 5 + d%3, cell (i, j) of
# record r being 140 + 2*((d*5 + r*23 + i*7 + j*11) % 60).


def _lcc_psi(phi):
    import math

    return math.log(math.tan(math.pi / 4 + phi / 2))


def _lcc_setup_isometric(lad, latin1, latin2, radius):
    """Cone constant n, R·F, and rho0 via the ISOMETRIC-latitude
    formulation (psi = ln tan(pi/4 + phi/2); rho = R F e^(-n psi)) —
    algebraically equal to the engine's tan-power Snyder form
    (grid/grib2.py::_lambert_setup) but implementationally distinct, so
    the oracle's embedded coordinates are a second implementation, not
    the engine talking to itself.  tests/test_grib2.py imports these
    helpers — witness independence is from the ENGINE, so the test and
    the oracle generator may share one second implementation."""
    import math

    p1, p2 = math.radians(latin1), math.radians(latin2)
    if abs(p1 - p2) < 1e-12:
        n = math.sin(p1)
    else:
        n = math.log(math.cos(p1) / math.cos(p2)) / (_lcc_psi(p2) - _lcc_psi(p1))
    rf = radius * math.cos(p1) * math.exp(n * _lcc_psi(p1)) / n
    rho0 = rf * math.exp(-n * _lcc_psi(math.radians(lad)))
    return n, rf, rho0


def _lcc_forward_isometric(lat, lon, lad, lov, latin1, latin2, radius):
    import math

    n, rf, rho0 = _lcc_setup_isometric(lad, latin1, latin2, radius)
    rho = rf * math.exp(-n * _lcc_psi(math.radians(lat)))
    theta = n * math.radians(lon - lov)
    return rho * math.sin(theta), rho0 - rho * math.cos(theta)


def _lcc_inverse_isometric(x, y, lad, lov, latin1, latin2, radius):
    import math

    n, rf, rho0 = _lcc_setup_isometric(lad, latin1, latin2, radius)
    rho = math.hypot(x, rho0 - y)
    theta = math.atan2(x, rho0 - y)
    psi_pt = -math.log(rho / rf) / n
    lat = math.degrees(2 * math.atan(math.exp(psi_pt)) - math.pi / 2)
    lon = lov + math.degrees(theta / n)
    return lat, (lon + 180.0) % 360.0 - 180.0


def _projected_stats(decoded: DataFrame, keys: tuple) -> DataFrame:
    """Shared tail of the projected-grid codec queries: value stats, the
    raster-order-sensitive wsum, and anchor/far-corner coordinates in
    integer microdegrees."""
    weighted = F.zip_with(
        "values",
        F.sequence(F.lit(0), F.size("values") - 1),
        lambda v, idx: v.cast("bigint") * idx.cast("bigint"),
    )
    zero = F.lit(0).cast("bigint")

    def udeg(c):
        return F.round(F.col(c) * F.lit(1e6)).cast("bigint")

    return decoded.select(
        *keys,
        F.size("values").cast("bigint").alias("n_cells"),
        F.aggregate("values", zero, lambda a, x: a + x.cast("bigint")).alias(
            "vsum"
        ),
        F.aggregate(weighted, zero, lambda a, x: a + x).alias("wsum"),
        udeg("lat0").alias("lat0_udeg"),
        udeg("lon0").alias("lon0_udeg"),
        udeg("corner_lat").alias("corner_lat_udeg"),
        udeg("corner_lon").alias("corner_lon_udeg"),
    ).orderBy(*[k for k in keys if k != "grid_tmpl"])


_LCC_BASE = dict(la1=21.138, lo1=-122.72, lad=38.5, lov=-97.5)
_LCC_RADIUS = 6_371_229.0


def _lcc_parallels(rn: int) -> tuple[float, float]:
    return (38.5, 38.5) if rn == 1 else (33.0, 45.0)


def _lcc_far_corner_values_sql() -> str:
    """(doc_id, rn, lat_udeg, lon_udeg) of cell (ni-1, nj-1), computed
    with the independent isometric-form projection above."""
    rows = []
    for d in range(0, 390):
        if d % 13 != 1:
            continue
        ni, nj = 8 + d % 4, 5 + d % 3
        dx = 3000.0 * (1 + d % 3)
        for rn in (1, 2):
            latin1, latin2 = _lcc_parallels(rn)
            x1, y1 = _lcc_forward_isometric(
                _LCC_BASE["la1"], _LCC_BASE["lo1"], _LCC_BASE["lad"],
                _LCC_BASE["lov"], latin1, latin2, _LCC_RADIUS,
            )
            lat, lon = _lcc_inverse_isometric(
                x1 + (ni - 1) * dx, y1 + (nj - 1) * dx,
                _LCC_BASE["lad"], _LCC_BASE["lov"], latin1, latin2, _LCC_RADIUS,
            )
            rows.append(
                f"({d}, {rn}, {int(round(lat * 1e6))}, {int(round(lon * 1e6))})"
            )
    return ",\n       ".join(rows)


@query(
    "grid_grib2_lambert_decode",
    tags=("grid", "codec", "python", "ingest"),
    oracle=f"""
WITH g AS (
  SELECT doc_id,
         8 + doc_id % 4 AS ni,
         5 + doc_id % 3 AS nj
  FROM documents WHERE doc_id % 13 = 1 AND doc_id < 390
),
corner(doc_id, rn, c_lat_udeg, c_lon_udeg) AS (
  VALUES {_lcc_far_corner_values_sql()}
),
cells AS (
  SELECT doc_id, ni, nj, r.r + 1 AS rn,
         140 + 2 * ((doc_id * 5 + r.r * 23 + i.i * 7 + j.j * 11) % 60) AS v,
         j.j * ni + i.i AS pos
  FROM g,
       UNNEST(generate_series(0, 1)) AS r(r),
       LATERAL (SELECT unnest(generate_series(0, ni - 1)) AS i) i,
       LATERAL (SELECT unnest(generate_series(0, nj - 1)) AS j) j
)
SELECT c.doc_id,
       CAST(c.rn AS INTEGER) AS record_number,
       CAST(30 AS INTEGER) AS grid_tmpl,
       CAST(COUNT(*) AS BIGINT) AS n_cells,
       CAST(SUM(c.v) AS BIGINT) AS vsum,
       CAST(SUM(c.v * c.pos) AS BIGINT) AS wsum,
       CAST(21138000 AS BIGINT) AS lat0_udeg,
       CAST(-122720000 AS BIGINT) AS lon0_udeg,
       CAST(MIN(k.c_lat_udeg) AS BIGINT) AS corner_lat_udeg,
       CAST(MIN(k.c_lon_udeg) AS BIGINT) AS corner_lon_udeg
FROM cells c JOIN corner k ON k.doc_id = c.doc_id AND k.rn = c.rn
GROUP BY c.doc_id, c.rn
ORDER BY c.doc_id, c.rn
""",
)
def grid_grib2_lambert_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GRIB2 LAMBERT CONFORMAL decode (grid template 3.30) — the
    projected geometry regional operational archives (NOAA HRRR, NAM)
    ship, which the reference reads through wgrib2
    (/root/reference/src/file-conversions.js:49-51,76-112). Per
    selected document a 2-record file is synthesized executor-side:
    record 1 on a TANGENT cone (latin1 = latin2, the HRRR setup, cone
    constant n = sin phi1), record 2 on a SECANT cone (33/45) —
    both scanning 0x40 (+y north, the projected-grid convention). The
    engine's pure-Python codec decodes values in storage order and
    recovers every cell's geographic coordinates through the spherical
    Snyder inverse (grid/grib2.py::lambert_inverse).

    Witness independence: the oracle embeds the far-corner cell's
    lat/lon computed by a SECOND projection implementation (the
    isometric-latitude formulation, algebraically equal but
    implementationally distinct), rounded to integer microdegrees —
    and the published Snyder numerical example pins the engine form in
    pytest. ``lat0/lon0`` certify the grid anchor decodes to exactly
    La1/Lo1; ``corner_*`` certify Dx/Dy mesh propagation AND the
    inverse; ``wsum`` keeps the value payload raster-order sensitive.

    Scale: the codec-query posture — bytes executor-side, statistic
    rows shuffle. Coordinate recovery is vectorized numpy inside the
    Arrow stage, O(cells) with no Python-loop inner step.
    """
    from typing import Iterator

    import numpy as np
    import pandas as pd

    from ..grid.grib2 import decode_grib2, encode_grib2_message, iter_messages2

    ids = (
        table(spark, sf_dir, "documents")
        .filter((F.col("doc_id") % 13 == 1) & (F.col("doc_id") < 390))
        .select("doc_id")
    )

    def synth(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                ni, nj = 8 + d % 4, 5 + d % 3
                dx = 3000.0 * (1 + d % 3)
                i = np.arange(ni)[None, :]
                j = np.arange(nj)[:, None]
                msgs = []
                for rn in (1, 2):
                    latin1, latin2 = _lcc_parallels(rn)
                    v = (
                        140 + 2 * ((d * 5 + (rn - 1) * 23 + i * 7 + j * 11) % 60)
                    ).astype(np.float64)
                    msgs.append(
                        encode_grib2_message(
                            v,
                            lambert=dict(
                                _LCC_BASE, latin1=latin1, latin2=latin2,
                                dx_m=dx, dy_m=dx,
                            ),
                            scanning_mode=0x40,
                            reference_value=140.0,
                            binary_scale=1,
                            category=rn,
                            number=rn,
                        )
                    )
                rows.append({"doc_id": d, "grib": b"".join(msgs)})
            yield pd.DataFrame(rows)

    def decode(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            rows = []
            for doc_id, buf in zip(pdf["doc_id"], pdf["grib"]):
                d = int(doc_id)
                for rn, msg in enumerate(iter_messages2(bytes(buf)), start=1):
                    rec = decode_grib2(msg)
                    rows.append(
                        {
                            "doc_id": d,
                            "record_number": rn,
                            "grid_tmpl": rec.grid_template,
                            "values": rec.values.reshape(-1).tolist(),
                            "lat0": float(rec.cell_lats_deg[0, 0]),
                            "lon0": float(rec.cell_lons_deg[0, 0]),
                            "corner_lat": float(rec.cell_lats_deg[-1, -1]),
                            "corner_lon": float(rec.cell_lons_deg[-1, -1]),
                        }
                    )
            yield pd.DataFrame(rows)

    files = ids.mapInPandas(synth, schema="doc_id bigint, grib binary")
    decoded = files.mapInPandas(
        decode,
        schema=(
            "doc_id bigint, record_number int, grid_tmpl int, "
            "values array<double>, lat0 double, lon0 double, "
            "corner_lat double, corner_lon double"
        ),
    )
    return _projected_stats(
        decoded, ("doc_id", "record_number", "grid_tmpl")
    )


# --- GRIB2 polar stereographic (template 3.20) decode ------------------------
# Per selected document ONE record on a north-polar-stereographic grid
# (sea-ice / Arctic product geometry): anchor (47.5, -110), true scale
# at 60N, orientation -100, Dx = Dy = 20000*(1 + d%2) m, scanning 0x40,
# ni = 7 + d%5, nj = 5 + d%4, cell (i, j) = 200 + 2*((d*3+i*13+j*7)%55).


_PS_BASE = dict(la1=47.5, lo1=-110.0, lad=60.0, lov=-100.0)


def _ps_inverse_isometric(x, y, lad, lov, radius):
    """Independent polar-stereographic inverse via the isometric-
    latitude / exponential form (rho = 2 R k0 e^(-psi)) — algebraically
    equal to the engine's tangent-half-angle Snyder form
    (grid/grib2.py::polar_stereo_inverse), implementationally distinct
    (same witness-independence contract as _lcc_inverse_isometric)."""
    import math

    k2 = 1.0 + math.sin(math.radians(lad))
    rho = math.hypot(x, y)
    psi = math.log(radius * k2 / rho)
    lat = math.degrees(2 * math.atan(math.exp(psi)) - math.pi / 2)
    lon = lov + math.degrees(math.atan2(x, -y))
    return lat, (lon + 180.0) % 360.0 - 180.0


def _ps_far_corner_values_sql() -> str:
    """(doc_id, lat_udeg, lon_udeg) of cell (ni-1, nj-1) from the
    independent isometric-form projection."""
    import math

    rows = []
    for d in range(0, 425):
        if d % 17 != 5:
            continue
        ni, nj = 7 + d % 5, 5 + d % 4
        dx = 20000.0 * (1 + d % 2)
        k2 = 1.0 + math.sin(math.radians(_PS_BASE["lad"]))
        psi1 = math.log(
            math.tan(math.pi / 4 + math.radians(_PS_BASE["la1"]) / 2)
        )
        rho1 = _LCC_RADIUS * k2 * math.exp(-psi1)
        th1 = math.radians(_PS_BASE["lo1"] - _PS_BASE["lov"])
        x1, y1 = rho1 * math.sin(th1), -rho1 * math.cos(th1)
        lat, lon = _ps_inverse_isometric(
            x1 + (ni - 1) * dx, y1 + (nj - 1) * dx,
            _PS_BASE["lad"], _PS_BASE["lov"], _LCC_RADIUS,
        )
        rows.append(f"({d}, {int(round(lat * 1e6))}, {int(round(lon * 1e6))})")
    return ",\n       ".join(rows)


@query(
    "grid_grib2_polar_decode",
    tags=("grid", "codec", "python", "ingest"),
    oracle=f"""
WITH g AS (
  SELECT doc_id,
         7 + doc_id % 5 AS ni,
         5 + doc_id % 4 AS nj
  FROM documents WHERE doc_id % 17 = 5 AND doc_id < 425
),
corner(doc_id, c_lat_udeg, c_lon_udeg) AS (
  VALUES {_ps_far_corner_values_sql()}
),
cells AS (
  SELECT doc_id, ni, nj,
         200 + 2 * ((doc_id * 3 + i.i * 13 + j.j * 7) % 55) AS v,
         j.j * ni + i.i AS pos
  FROM g,
       LATERAL (SELECT unnest(generate_series(0, ni - 1)) AS i) i,
       LATERAL (SELECT unnest(generate_series(0, nj - 1)) AS j) j
)
SELECT c.doc_id,
       CAST(20 AS INTEGER) AS grid_tmpl,
       CAST(COUNT(*) AS BIGINT) AS n_cells,
       CAST(SUM(c.v) AS BIGINT) AS vsum,
       CAST(SUM(c.v * c.pos) AS BIGINT) AS wsum,
       CAST(47500000 AS BIGINT) AS lat0_udeg,
       CAST(-110000000 AS BIGINT) AS lon0_udeg,
       CAST(MIN(k.c_lat_udeg) AS BIGINT) AS corner_lat_udeg,
       CAST(MIN(k.c_lon_udeg) AS BIGINT) AS corner_lon_udeg
FROM cells c JOIN corner k ON k.doc_id = c.doc_id
GROUP BY c.doc_id
ORDER BY c.doc_id
""",
)
def grid_grib2_polar_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GRIB2 POLAR STEREOGRAPHIC decode (grid template 3.20) — the
    projected geometry Arctic / sea-ice operational products ship,
    read by the reference through wgrib2
    (/root/reference/src/file-conversions.js:49-51,76-112). One record
    per selected document, north aspect, true scale at 60N, scanning
    0x40; values decode in storage order and every cell's geographic
    coordinates come from the engine's tangent-half-angle Snyder
    inverse (grid/grib2.py::polar_stereo_inverse), lazily and
    vectorized.

    Witness independence: the oracle embeds the far-corner cell's
    lat/lon from a SECOND implementation (the isometric-latitude
    exponential form) in integer microdegrees; the true-scale-at-LaD
    analytic property and the exact-anchor check pin the engine form
    in pytest. ``wsum`` keeps the payload raster-order sensitive.

    Scale: codec-query posture — bytes executor-side, statistic rows
    shuffle, O(cells) vectorized coordinate recovery in the Arrow
    stage.
    """
    from typing import Iterator

    import numpy as np
    import pandas as pd

    from ..grid.grib2 import decode_grib2, encode_grib2_message, iter_messages2

    ids = (
        table(spark, sf_dir, "documents")
        .filter((F.col("doc_id") % 17 == 5) & (F.col("doc_id") < 425))
        .select("doc_id")
    )

    def synth(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                ni, nj = 7 + d % 5, 5 + d % 4
                dx = 20000.0 * (1 + d % 2)
                i = np.arange(ni)[None, :]
                j = np.arange(nj)[:, None]
                v = (200 + 2 * ((d * 3 + i * 13 + j * 7) % 55)).astype(
                    np.float64
                )
                msg = encode_grib2_message(
                    v,
                    polar_stereo=dict(_PS_BASE, dx_m=dx, dy_m=dx),
                    scanning_mode=0x40,
                    reference_value=200.0,
                    binary_scale=1,
                )
                rows.append({"doc_id": d, "grib": msg})
            yield pd.DataFrame(rows)

    def decode(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            rows = []
            for doc_id, buf in zip(pdf["doc_id"], pdf["grib"]):
                d = int(doc_id)
                for msg in iter_messages2(bytes(buf)):
                    rec = decode_grib2(msg)
                    rows.append(
                        {
                            "doc_id": d,
                            "grid_tmpl": rec.grid_template,
                            "values": rec.values.reshape(-1).tolist(),
                            "lat0": float(rec.cell_lats_deg[0, 0]),
                            "lon0": float(rec.cell_lons_deg[0, 0]),
                            "corner_lat": float(rec.cell_lats_deg[-1, -1]),
                            "corner_lon": float(rec.cell_lons_deg[-1, -1]),
                        }
                    )
            yield pd.DataFrame(rows)

    files = ids.mapInPandas(synth, schema="doc_id bigint, grib binary")
    decoded = files.mapInPandas(
        decode,
        schema=(
            "doc_id bigint, grid_tmpl int, values array<double>, "
            "lat0 double, lon0 double, corner_lat double, corner_lon double"
        ),
    )
    return _projected_stats(decoded, ("doc_id", "grid_tmpl"))


# --- GRIB2 Mercator (template 3.10) decode -----------------------------------
# Per selected document ONE record on a Mercator grid (tropical-product
# geometry): anchor (-10, 100), true scale at 20N, Dx = Dy =
# 40000*(1 + d%3) m, scanning 0x40, ni = 8 + d%4, nj = 4 + d%5,
# cell (i, j) = 250 + 2*((d*9 + i*3 + j*5) % 65).


_MERC_BASE = dict(la1=-10.0, lo1=100.0, lad=20.0)


def _mercator_inverse_gudermannian(x, y, lad, radius):
    """Independent Mercator inverse via the GUDERMANNIAN form
    (lat = atan(sinh(y'))) — algebraically equal to the engine's
    2·atan(e^y') − π/2 (grid/grib2.py::mercator_inverse), but a
    distinct implementation path (sinh/atan vs exp/atan)."""
    import math

    k = radius * math.cos(math.radians(lad))
    lat = math.degrees(math.atan(math.sinh(y / k)))
    lon = math.degrees(x / k)
    return lat, (lon + 180.0) % 360.0 - 180.0


def _merc_far_corner_values_sql() -> str:
    """(doc_id, lat_udeg, lon_udeg) of cell (ni-1, nj-1) from the
    Gudermannian-form projection."""
    import math

    rows = []
    for d in range(0, 475):
        if d % 19 != 7:
            continue
        ni, nj = 8 + d % 4, 4 + d % 5
        dx = 40000.0 * (1 + d % 3)
        k = _LCC_RADIUS * math.cos(math.radians(_MERC_BASE["lad"]))
        x1 = k * math.radians(_MERC_BASE["lo1"])
        y1 = k * math.asinh(math.tan(math.radians(_MERC_BASE["la1"])))
        lat, lon = _mercator_inverse_gudermannian(
            x1 + (ni - 1) * dx, y1 + (nj - 1) * dx,
            _MERC_BASE["lad"], _LCC_RADIUS,
        )
        rows.append(f"({d}, {int(round(lat * 1e6))}, {int(round(lon * 1e6))})")
    return ",\n       ".join(rows)


@query(
    "grid_grib2_mercator_decode",
    tags=("grid", "codec", "python", "ingest"),
    oracle=f"""
WITH g AS (
  SELECT doc_id,
         8 + doc_id % 4 AS ni,
         4 + doc_id % 5 AS nj
  FROM documents WHERE doc_id % 19 = 7 AND doc_id < 475
),
corner(doc_id, c_lat_udeg, c_lon_udeg) AS (
  VALUES {_merc_far_corner_values_sql()}
),
cells AS (
  SELECT doc_id, ni, nj,
         250 + 2 * ((doc_id * 9 + i.i * 3 + j.j * 5) % 65) AS v,
         j.j * ni + i.i AS pos
  FROM g,
       LATERAL (SELECT unnest(generate_series(0, ni - 1)) AS i) i,
       LATERAL (SELECT unnest(generate_series(0, nj - 1)) AS j) j
)
SELECT c.doc_id,
       CAST(10 AS INTEGER) AS grid_tmpl,
       CAST(COUNT(*) AS BIGINT) AS n_cells,
       CAST(SUM(c.v) AS BIGINT) AS vsum,
       CAST(SUM(c.v * c.pos) AS BIGINT) AS wsum,
       CAST(-10000000 AS BIGINT) AS lat0_udeg,
       CAST(100000000 AS BIGINT) AS lon0_udeg,
       CAST(MIN(k.c_lat_udeg) AS BIGINT) AS corner_lat_udeg,
       CAST(MIN(k.c_lon_udeg) AS BIGINT) AS corner_lon_udeg
FROM cells c JOIN corner k ON k.doc_id = c.doc_id
GROUP BY c.doc_id
ORDER BY c.doc_id
""",
)
def grid_grib2_mercator_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GRIB2 MERCATOR decode (grid template 3.10) — the projected
    geometry tropical / regional marine products ship, read by the
    reference through wgrib2 (/root/reference/src/file-conversions.js:
    49-51,76-112). One record per selected document, true scale at
    20N, scanning 0x40, anchored across the equator (rows span both
    hemispheres); values decode in storage order and cell coordinates
    come from the engine's exp/atan Mercator inverse
    (grid/grib2.py::mercator_inverse), lazily and vectorized.

    Witness independence: the oracle embeds the far-corner cell's
    lat/lon from the GUDERMANNIAN formulation (atan∘sinh — a second
    implementation path) in integer microdegrees; pytest additionally
    pins per-row constant latitude / per-column constant longitude and
    exact mesh reprojection. ``wsum`` keeps the payload raster-order
    sensitive.

    Scale: codec-query posture — bytes executor-side, statistic rows
    shuffle, O(cells) vectorized coordinate recovery in the Arrow
    stage.
    """
    from typing import Iterator

    import numpy as np
    import pandas as pd

    from ..grid.grib2 import decode_grib2, encode_grib2_message, iter_messages2

    ids = (
        table(spark, sf_dir, "documents")
        .filter((F.col("doc_id") % 19 == 7) & (F.col("doc_id") < 475))
        .select("doc_id")
    )

    def synth(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                ni, nj = 8 + d % 4, 4 + d % 5
                dx = 40000.0 * (1 + d % 3)
                i = np.arange(ni)[None, :]
                j = np.arange(nj)[:, None]
                v = (250 + 2 * ((d * 9 + i * 3 + j * 5) % 65)).astype(
                    np.float64
                )
                msg = encode_grib2_message(
                    v,
                    mercator=dict(_MERC_BASE, dx_m=dx, dy_m=dx),
                    scanning_mode=0x40,
                    reference_value=250.0,
                    binary_scale=1,
                )
                rows.append({"doc_id": d, "grib": msg})
            yield pd.DataFrame(rows)

    def decode(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            rows = []
            for doc_id, buf in zip(pdf["doc_id"], pdf["grib"]):
                d = int(doc_id)
                for msg in iter_messages2(bytes(buf)):
                    rec = decode_grib2(msg)
                    rows.append(
                        {
                            "doc_id": d,
                            "grid_tmpl": rec.grid_template,
                            "values": rec.values.reshape(-1).tolist(),
                            "lat0": float(rec.cell_lats_deg[0, 0]),
                            "lon0": float(rec.cell_lons_deg[0, 0]),
                            "corner_lat": float(rec.cell_lats_deg[-1, -1]),
                            "corner_lon": float(rec.cell_lons_deg[-1, -1]),
                        }
                    )
            yield pd.DataFrame(rows)

    files = ids.mapInPandas(synth, schema="doc_id bigint, grib binary")
    decoded = files.mapInPandas(
        decode,
        schema=(
            "doc_id bigint, grid_tmpl int, values array<double>, "
            "lat0 double, lon0 double, corner_lat double, corner_lon double"
        ),
    )
    return _projected_stats(decoded, ("doc_id", "grid_tmpl"))


# --- mixed-edition archive scan with unified level metadata ----------------
# Per selected document ONE archive file holding four records on a
# (7 + d%4) × (4 + d%3) grid, record r's cell (i, j) being
# 100 + 2*((d*7 + r*13 + i*3 + j*5) % 50):
#   rn=1  GRIB1, scan 0x00, parameter 11, level 100/850
#   rn=2  GRIB1, scan 0x40 (south-first bytes), parameter 61, level 100/500
#   rn=3  GRIB2 simple,  (c0, n7),  fixed surface 100 / 8500·10^-1 = 850
#   rn=4  GRIB2 complex, (c0, n11), fixed surface coded MISSING → NULLs
# The position-weighted sum wsum = Σ v·(j·ni + i) is row-order sensitive:
# a scanner that failed to normalize the 0x40 record would hash-mismatch
# even though mean/min/max are permutation-invariant.


@query(
    "grid_grib_mixed_scan",
    tags=("grid", "codec", "python", "ingest"),
    oracle="""
WITH g AS (
  SELECT doc_id,
         7 + doc_id % 4 AS ni,
         4 + doc_id % 3 AS nj
  FROM documents WHERE doc_id % 5 = 1 AND doc_id < 300
),
cells AS (
  SELECT doc_id, ni, nj, r.r + 1 AS rn,
         100 + 2 * ((doc_id * 7 + r.r * 13 + i.i * 3 + j.j * 5) % 50) AS v,
         j.j * ni + i.i AS pos
  FROM g,
       UNNEST(generate_series(0, 3)) AS r(r),
       LATERAL (SELECT unnest(generate_series(0, ni - 1)) AS i) i,
       LATERAL (SELECT unnest(generate_series(0, nj - 1)) AS j) j
)
SELECT doc_id,
       CAST(rn AS INTEGER) AS record_number,
       CAST(CASE WHEN rn <= 2 THEN 1 ELSE 2 END AS INTEGER) AS edition,
       CAST(CASE rn WHEN 1 THEN 11 WHEN 2 THEN 61 END AS INTEGER) AS parameter,
       CAST(CASE WHEN rn >= 3 THEN 0 END AS INTEGER) AS category,
       CAST(CASE rn WHEN 3 THEN 7 WHEN 4 THEN 11 END AS INTEGER) AS number,
       CAST(CASE WHEN rn <= 3 THEN 100 END AS INTEGER) AS level_type,
       CAST(CASE rn WHEN 1 THEN 850 WHEN 2 THEN 500 WHEN 3 THEN 850 END AS INTEGER) AS level,
       CAST(90000 AS INTEGER) AS lat_first_mdeg,
       CAST(COUNT(*) AS BIGINT) AS n_cells,
       CAST(SUM(v) AS BIGINT) AS vsum,
       CAST(SUM(v * pos) AS BIGINT) AS wsum
FROM cells
GROUP BY doc_id, rn, ni, nj
ORDER BY doc_id, rn
""",
)
def grid_grib_mixed_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixed-edition archive scan through the REAL landing decode path
    (``sources/grib_source._decode_batches`` — the same Arrow stage the
    binaryFile source runs): per document one archive concatenates a
    GRIB1 north-first record, a GRIB1 scanning-mode-0x40 record (stored
    south-first ON THE WIRE, normalized by the scanner), a GRIB2
    simple-packing record with a scaled fixed surface (8500·10^-1 →
    level 850), and a GRIB2 complex-packing record whose fixed surface
    is coded missing (level columns NULL — a level filter fails
    VISIBLY, never matching a silent 0).

    The oracle pins the unified metadata contract across editions:
    GRIB1 keeps ``parameter``; GRIB2 keeps ``(category, number)`` with
    ``parameter`` NULL (c0,n11 must NOT collide with GRIB1 TMP=11); the
    position-weighted checksum ``wsum`` is row-order SENSITIVE, so a
    scanner that skipped the 0x40 row normalization hash-mismatches.

    Scale: archive files decode independently in Arrow batches; only
    per-record statistic rows shuffle — the mixed-product 100 TB
    landing-area shape.
    """
    from typing import Iterator

    import numpy as np
    import pandas as pd

    from ..grid.grib1 import encode_grib1_message
    from ..grid.grib2 import encode_grib2_message
    from ..sources.grib_source import RECORD_SCHEMA, _decode_batches

    ids = (
        table(spark, sf_dir, "documents")
        .filter((F.col("doc_id") % 5 == 1) & (F.col("doc_id") < 300))
        .select("doc_id")
    )

    def synth(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                ni, nj = 7 + d % 4, 4 + d % 3
                i = np.arange(ni)[None, :]
                j = np.arange(nj)[:, None]

                def field(r: int) -> np.ndarray:
                    return (
                        100 + 2 * ((d * 7 + r * 13 + i * 3 + j * 5) % 50)
                    ).astype(np.float64)

                msgs = [
                    encode_grib1_message(
                        field(0), parameter=11, level_type=100, level=850,
                        reference_value=100.0, binary_scale=1, nbits=8,
                    ),
                    encode_grib1_message(
                        field(1), parameter=61, level_type=100, level=500,
                        reference_value=100.0, binary_scale=1, nbits=8,
                        scanning_mode=0x40,
                    ),
                    encode_grib2_message(
                        field(2), category=0, number=7,
                        level_type=100, level_scale=1, level_value=8500,
                        reference_value=100.0, binary_scale=1, nbits=8,
                    ),
                    encode_grib2_message(
                        field(3), category=0, number=11, level_type=0xFF,
                        reference_value=100.0, binary_scale=1,
                        packing="complex_diff", group_len=5 + d % 7,
                    ),
                ]
                rows.append({"path": f"doc://{d}", "content": b"".join(msgs)})
            yield pd.DataFrame(rows)

    files = ids.mapInPandas(synth, schema="path string, content binary")
    records = files.mapInPandas(_decode_batches, schema=RECORD_SCHEMA)
    weighted = F.zip_with(
        "values",
        F.sequence(F.lit(0), F.size("values") - 1),
        lambda v, idx: v.cast("bigint") * idx.cast("bigint"),
    )
    return records.select(
        F.regexp_extract("path", r"doc://(\d+)", 1).cast("bigint").alias("doc_id"),
        "record_number",
        "edition",
        "parameter",
        "category",
        "number",
        "level_type",
        "level",
        "lat_first_mdeg",
        F.size("values").cast("bigint").alias("n_cells"),
        F.aggregate(
            "values", F.lit(0).cast("bigint"), lambda a, x: a + x.cast("bigint")
        ).alias("vsum"),
        F.aggregate(weighted, F.lit(0).cast("bigint"), lambda a, x: a + x).alias(
            "wsum"
        ),
    ).orderBy("doc_id", "record_number")


def _landing_record_bytes() -> int:
    """Every landing record is byte-identical in LENGTH (same grid, same
    nbits, 4-byte reference regardless of value) — computed once so the
    inventory oracle can pin total_bytes closed-form."""
    import numpy as np

    from ..grid.grib1 import encode_grib1_message

    v = np.zeros((_LANDING_NJ, _LANDING_NI))
    return len(
        encode_grib1_message(v, reference_value=0.0, binary_scale=1, nbits=8)
    )


_LANDING_RECORD_BYTES = _landing_record_bytes()


@query(
    "grid_grib_inventory_scan",
    tags=("grid", "codec", "python", "ingest"),
    oracle=f"""
SELECT CAST(m.m + 1 AS INTEGER) AS month,
       CAST(CASE WHEN p.p = 0 THEN 11 ELSE 61 END AS INTEGER) AS parameter,
       CAST(1 AS INTEGER) AS level_type,
       CAST(0 AS INTEGER) AS level,
       CAST(2020 AS INTEGER) AS year,
       CAST({_LANDING_NI} AS INTEGER) AS ni,
       CAST({_LANDING_NJ} AS INTEGER) AS nj,
       CAST({_LANDING_RECORD_BYTES} AS INTEGER) AS total_bytes
FROM UNNEST(generate_series(0, {_LANDING_MONTHS - 1})) AS m(m),
     UNNEST(generate_series(0, 1)) AS p(p)
ORDER BY month, parameter
""",
)
def grid_grib_inventory_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Header-ONLY landing inventory on real files: every record of the
    12-month ``.grib`` landing listed (parameter, level, reference time,
    grid shape, record length) WITHOUT unpacking a single value bit —
    ``wgrib``'s inventory listing (what the reference's record-select
    keys on, /root/reference/src/file-conversions.js:120-127) as a
    landing-directory scan. The result schema carries no values column
    at all; GRIB1 headers parse via ``inspect_grib1`` and GRIB2 via
    section splitting (``sources/grib_source.grib_inventory``).

    The oracle pins the full metadata contract closed-form including
    ``total_bytes`` (every landing record has identical length by
    construction) — a scan that touched the BDS payload wouldn't fail
    this hash, but the dedicated corrupt-payload pushdown test
    (tests/test_grib_source.py) proves value bits are never read.

    Scale: THE 100 TB metadata pass — I/O reads the archive once, CPU
    per record is a few hundred header bytes, output is one metadata
    row per record; the ``match=`` pushdown on ``grib1_records`` reuses
    the same header path to skip non-matching records before decode.
    """
    from ..sources.grib_source import grib_inventory

    inv = grib_inventory(spark, ensure_grib1_landing(spark, sf_dir))
    return inv.select(
        "month",
        "parameter",
        "level_type",
        "level",
        "year",
        "ni",
        "nj",
        "total_bytes",
    ).orderBy("month", "parameter")


# --- PDT 4.8 statistical metadata through the landing schema ----------------
# Per selected document a 2-record GRIB2 archive on a (6 + d%3) × (4 + d%2)
# grid, record r's cell (i, j) being 110 + 2*((d*3 + r*17 + i*5 + j*7) % 40):
#   rn=1  PDT 4.0 (instantaneous)       → statistical columns NULL
#   rn=2  PDT 4.8, process = d % 2 (average/accumulation), interval end
#         (2020, 1 + d%12, 1 + d%28, d%24:00), range 6 + d%18 hours


@query(
    "grid_grib_statistical_scan",
    tags=("grid", "codec", "python", "ingest"),
    oracle="""
WITH g AS (
  SELECT doc_id,
         6 + doc_id % 3 AS ni,
         4 + doc_id % 2 AS nj
  FROM documents WHERE doc_id % 31 = 9 AND doc_id < 620
),
cells AS (
  SELECT doc_id, ni, nj, r.r + 1 AS rn,
         110 + 2 * ((doc_id * 3 + r.r * 17 + i.i * 5 + j.j * 7) % 40) AS v
  FROM g,
       UNNEST(generate_series(0, 1)) AS r(r),
       LATERAL (SELECT unnest(generate_series(0, ni - 1)) AS i) i,
       LATERAL (SELECT unnest(generate_series(0, nj - 1)) AS j) j
)
SELECT doc_id,
       CAST(rn AS INTEGER) AS record_number,
       CAST(CASE WHEN rn = 2 THEN doc_id % 2 END AS INTEGER)
         AS statistical_process,
       CASE WHEN rn = 2 THEN make_timestamp(
         2020, 1 + doc_id % 12, 1 + doc_id % 28, doc_id % 24, 0, 0
       ) END AS interval_end,
       CAST(COUNT(*) AS BIGINT) AS n_cells,
       CAST(SUM(v) AS BIGINT) AS vsum
FROM cells
GROUP BY doc_id, rn
ORDER BY doc_id, rn
""",
)
def grid_grib_statistical_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PDT 4.8 STATISTICAL metadata through the REAL landing decode
    path: accumulation/average records (the form ERA5 monthly means and
    precipitation totals actually ship, read by the reference through
    wgrib2 — /root/reference/src/file-conversions.js:49-51,120-127)
    land with ``statistical_process`` (code table 4.10) and the end of
    the processing interval as a timestamp column, while instantaneous
    4.0 records keep both NULL — accumulation-vs-instantaneous is now
    FILTERABLE on landed archives, not just codec-level metadata.

    The oracle pins the whole contract closed-form: NULL statistical
    columns for rn=1, the exact process code and interval-end instant
    for rn=2, plus per-record value sums so the payload decode is
    witnessed alongside the metadata.

    Scale: the landing posture — archive bytes decode executor-side in
    one Arrow stage; only per-record statistic rows shuffle.
    """
    from typing import Iterator

    import numpy as np
    import pandas as pd

    from ..grid.grib2 import encode_grib2_message
    from ..sources.grib_source import RECORD_SCHEMA, _decode_batches

    ids = (
        table(spark, sf_dir, "documents")
        .filter((F.col("doc_id") % 31 == 9) & (F.col("doc_id") < 620))
        .select("doc_id")
    )

    def synth(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                ni, nj = 6 + d % 3, 4 + d % 2
                i = np.arange(ni)[None, :]
                j = np.arange(nj)[:, None]

                def field(r: int) -> np.ndarray:
                    return (
                        110 + 2 * ((d * 3 + r * 17 + i * 5 + j * 7) % 40)
                    ).astype(np.float64)

                msgs = [
                    encode_grib2_message(
                        field(0), category=0, number=7,
                        reference_value=110.0, binary_scale=1, nbits=8,
                    ),
                    encode_grib2_message(
                        field(1), category=0, number=11,
                        reference_value=110.0, binary_scale=1, nbits=8,
                        statistical=dict(
                            process=d % 2,
                            interval_end=(
                                2020, 1 + d % 12, 1 + d % 28, d % 24, 0,
                            ),
                            range_hours=6 + d % 18,
                        ),
                    ),
                ]
                rows.append({"path": f"doc://{d}", "content": b"".join(msgs)})
            yield pd.DataFrame(rows)

    files = ids.mapInPandas(synth, schema="path string, content binary")
    records = files.mapInPandas(_decode_batches, schema=RECORD_SCHEMA)
    return records.select(
        F.regexp_extract("path", r"doc://(\d+)", 1).cast("bigint").alias("doc_id"),
        "record_number",
        "statistical_process",
        "interval_end",
        F.size("values").cast("bigint").alias("n_cells"),
        F.aggregate(
            "values", F.lit(0).cast("bigint"), lambda a, x: a + x.cast("bigint")
        ).alias("vsum"),
    ).orderBy("doc_id", "record_number")


# --- projected grids THROUGH the landing source ------------------------------
# Per selected document ONE archive with three projected records —
# rn=1 Lambert conformal 3.30 (secant 33/45), rn=2 polar stereographic
# 3.20, rn=3 Mercator 3.10 — all scanning 0x40, record r's cell (i, j)
# being 130 + 2*((d*7 + r*13 + i*3 + j*5) % 45).  The records flow
# through grib1_records/grib1_cells (NOT a bespoke decode stage): the
# landing schema carries their per-cell coordinate arrays and the cell
# explode serves unified lat_deg/lon_deg every query can filter on.

_PROJ_BOX = (-8.43, 48.9)  # non-round edges: no cell latitude within 1e-5


def _proj_landing_grids(d: int):
    """(kind, ni, nj, mesh step) of the 3-record projected archive for
    doc ``d`` — shared by the engine synth and the oracle generator."""
    return (
        ("lcc", 4 + d % 3, 3 + d % 2, 3000.0 * (1 + d % 3)),
        ("ps", 4 + d % 2, 3 + d % 3, 20000.0 * (1 + d % 2)),
        ("mercator", 4 + d % 3, 3 + d % 3, 40000.0 * (1 + d % 2)),
    )


def _projected_landing_box_values_sql() -> str:
    """(doc_id, rn, n_box, latsum_mdeg, lonsum_mdeg, vlat) of the
    in-box cells per record, computed ENTIRELY with the independent
    second-formulation projections (isometric Lambert / polar, the
    Gudermannian Mercator) — the engine's Snyder forms never touch
    these numbers."""
    import math

    lo, hi = _PROJ_BOX
    rows = []
    for d in range(0, 574):
        if d % 41 != 8:
            continue
        for r, (kind, ni, nj, dx) in enumerate(_proj_landing_grids(d)):
            if kind == "lcc":
                x1, y1 = _lcc_forward_isometric(
                    _LCC_BASE["la1"], _LCC_BASE["lo1"], _LCC_BASE["lad"],
                    _LCC_BASE["lov"], 33.0, 45.0, _LCC_RADIUS,
                )

                def inv(x, y):
                    return _lcc_inverse_isometric(
                        x, y, _LCC_BASE["lad"], _LCC_BASE["lov"],
                        33.0, 45.0, _LCC_RADIUS,
                    )
            elif kind == "ps":
                k2 = 1.0 + math.sin(math.radians(_PS_BASE["lad"]))
                psi1 = math.log(
                    math.tan(math.pi / 4 + math.radians(_PS_BASE["la1"]) / 2)
                )
                rho1 = _LCC_RADIUS * k2 * math.exp(-psi1)
                th1 = math.radians(_PS_BASE["lo1"] - _PS_BASE["lov"])
                x1, y1 = rho1 * math.sin(th1), -rho1 * math.cos(th1)

                def inv(x, y):
                    return _ps_inverse_isometric(
                        x, y, _PS_BASE["lad"], _PS_BASE["lov"], _LCC_RADIUS
                    )
            else:
                k = _LCC_RADIUS * math.cos(math.radians(_MERC_BASE["lad"]))
                x1 = k * math.radians(_MERC_BASE["lo1"])
                y1 = k * math.asinh(math.tan(math.radians(_MERC_BASE["la1"])))

                def inv(x, y):
                    return _mercator_inverse_gudermannian(
                        x, y, _MERC_BASE["lad"], _LCC_RADIUS
                    )
            n_box = latsum = lonsum = vlat = 0
            for j in range(nj):
                for i in range(ni):
                    lat, lon = inv(x1 + i * dx, y1 + j * dx)
                    # membership must be rounding-proof: engine and
                    # second formulation agree to ~1e-9 deg, so no cell
                    # may sit within 1e-5 of a box edge
                    assert abs(lat - lo) > 1e-5 and abs(lat - hi) > 1e-5
                    if lo < lat < hi:
                        v = 130 + 2 * ((d * 7 + r * 13 + i * 3 + j * 5) % 45)
                        lm = int(round(lat * 1e3))
                        n_box += 1
                        latsum += lm
                        lonsum += int(round(lon * 1e3))
                        vlat += v * lm
            rows.append(f"({d}, {r + 1}, {n_box}, {latsum}, {lonsum}, {vlat})")
    return ",\n       ".join(rows)


@query(
    "grid_grib_projected_landing",
    tags=("grid", "codec", "python", "ingest"),
    oracle=f"""
WITH g AS (
  SELECT doc_id FROM documents WHERE doc_id % 41 = 8 AND doc_id < 574
),
rows_ AS (
  SELECT doc_id, r.r + 1 AS rn,
         CASE r.r WHEN 1 THEN 4 + doc_id % 2 ELSE 4 + doc_id % 3 END AS ni,
         CASE r.r WHEN 0 THEN 3 + doc_id % 2 ELSE 3 + doc_id % 3 END AS nj
  FROM g, UNNEST(generate_series(0, 2)) AS r(r)
),
cells AS (
  SELECT doc_id, rn,
         130 + 2 * ((doc_id * 7 + (rn - 1) * 13 + i.i * 3 + j.j * 5) % 45) AS v
  FROM rows_,
       LATERAL (SELECT unnest(generate_series(0, ni - 1)) AS i) i,
       LATERAL (SELECT unnest(generate_series(0, nj - 1)) AS j) j
),
box(doc_id, rn, n_box, latsum_mdeg, lonsum_mdeg, vlat) AS (
  VALUES {_projected_landing_box_values_sql()}
)
SELECT c.doc_id,
       CAST(c.rn AS INTEGER) AS record_number,
       CAST(CASE c.rn WHEN 1 THEN 30 WHEN 2 THEN 20 ELSE 10 END AS INTEGER)
         AS grid_template,
       CAST(COUNT(*) AS BIGINT) AS n_cells,
       CAST(SUM(c.v) AS BIGINT) AS vsum,
       CAST(MIN(b.n_box) AS BIGINT) AS n_box,
       CAST(MIN(b.latsum_mdeg) AS BIGINT) AS latsum_mdeg,
       CAST(MIN(b.lonsum_mdeg) AS BIGINT) AS lonsum_mdeg,
       CAST(MIN(b.vlat) AS BIGINT) AS vlat
FROM cells c JOIN box b ON b.doc_id = c.doc_id AND b.rn = c.rn
GROUP BY c.doc_id, c.rn
ORDER BY c.doc_id, c.rn
""",
)
def grid_grib_projected_landing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PROJECTED grids (Mercator 3.10 / polar stereo 3.20 / Lambert
    3.30) through the REAL landing source — the geometry regional
    operational archives (HRRR, NAM, sea-ice) ship, which the reference
    reads transparently through wgrib2 (/root/reference/src/
    file-conversions.js:49-51,76-112).  The records land via
    ``grib1_records`` (per-cell coordinate arrays in the record schema,
    affine georef NULL — visible, never fabricated) and explode via
    ``grib1_cells`` into unified ``lat_deg``/``lon_deg`` cells; the
    query then FILTERS BY REAL PROJECTED-CELL COORDINATES (a latitude
    box) and aggregates both all-cell and in-box statistics per record.

    Witness independence: every in-box number in the oracle —
    membership, coordinate sums in millidegrees, the payload·latitude
    coupling ``vlat`` that breaks if cells attach to the wrong
    geography — comes from the SECOND projection formulations
    (isometric Lambert/polar, Gudermannian Mercator); full-cell counts
    and value sums restate relationally.

    Scale: the landing posture — archive bytes decode executor-side,
    the explode is JVM-side posexplode, and the coordinate filter is a
    plain column predicate Catalyst can push against the exploded
    relation; only per-record statistic rows shuffle.
    """
    from typing import Iterator

    import numpy as np
    import pandas as pd

    from ..grid.grib2 import encode_grib2_message
    from ..sources.grib_source import (
        RECORD_SCHEMA,
        _decode_batches,
        grib1_cells,
    )

    ids = (
        table(spark, sf_dir, "documents")
        .filter((F.col("doc_id") % 41 == 8) & (F.col("doc_id") < 574))
        .select("doc_id")
    )

    def synth(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                msgs = []
                for r, (kind, ni, nj, dx) in enumerate(_proj_landing_grids(d)):
                    i = np.arange(ni)[None, :]
                    j = np.arange(nj)[:, None]
                    v = (
                        130 + 2 * ((d * 7 + r * 13 + i * 3 + j * 5) % 45)
                    ).astype(np.float64)
                    grid_kw = (
                        dict(lambert=dict(
                            _LCC_BASE, latin1=33.0, latin2=45.0,
                            dx_m=dx, dy_m=dx,
                        ))
                        if kind == "lcc"
                        else dict(polar_stereo=dict(_PS_BASE, dx_m=dx, dy_m=dx))
                        if kind == "ps"
                        else dict(mercator=dict(_MERC_BASE, dx_m=dx, dy_m=dx))
                    )
                    msgs.append(
                        encode_grib2_message(
                            v, scanning_mode=0x40, reference_value=130.0,
                            binary_scale=1, nbits=8, category=r, number=r,
                            **grid_kw,
                        )
                    )
                rows.append({"path": f"doc://{d}", "content": b"".join(msgs)})
            yield pd.DataFrame(rows)

    files = ids.mapInPandas(synth, schema="path string, content binary")
    records = files.mapInPandas(_decode_batches, schema=RECORD_SCHEMA)
    cells = grib1_cells(records)
    lo, hi = _PROJ_BOX
    box = (F.col("lat_deg") > F.lit(lo)) & (F.col("lat_deg") < F.lit(hi))
    latm = F.round(F.col("lat_deg") * F.lit(1e3)).cast("bigint")
    lonm = F.round(F.col("lon_deg") * F.lit(1e3)).cast("bigint")
    vb = F.col("value").cast("bigint")
    zero = F.lit(0).cast("bigint")
    return (
        cells.select(
            F.regexp_extract("path", r"doc://(\d+)", 1)
            .cast("bigint")
            .alias("doc_id"),
            "record_number",
            "grid_template",
            "lat_deg",
            "lon_deg",
            "value",
        )
        .groupBy("doc_id", "record_number", "grid_template")
        .agg(
            F.count(F.lit(1)).alias("n_cells"),
            F.sum(vb).alias("vsum"),
            F.coalesce(F.sum(F.when(box, F.lit(1).cast("bigint"))), zero)
            .alias("n_box"),
            F.coalesce(F.sum(F.when(box, latm)), zero).alias("latsum_mdeg"),
            F.coalesce(F.sum(F.when(box, lonm)), zero).alias("lonsum_mdeg"),
            F.coalesce(F.sum(F.when(box, vb * latm)), zero).alias("vlat"),
        )
        .orderBy("doc_id", "record_number")
    )


# --- REDUCED Gaussian grids (3.40 with per-row Ni) through the landing ------
# Per selected document ONE record on a global reduced Gaussian grid
# N = 2 + d%2 (nj = 2N rows), row j holding 3 + ((d + 3j) % 4) points,
# cell (j, i) = 120 + 2*((d*5 + j*11 + i*7) % 45), packed simple for
# even d and complex+spatial-differencing for odd d.  This is ERA5's
# NATIVE archive layout — the dataset the reference actually ingests.


def _reduced_lat_values_sql() -> str:
    """(N, j, lat_udeg) quadrature latitudes for the reduced grids,
    from numpy's INDEPENDENT Gauss-Legendre implementation (the same
    witness-independence pattern as the regular-Gaussian oracle)."""
    import numpy as np

    rows = []
    for n in (2, 3):
        x, _ = np.polynomial.legendre.leggauss(2 * n)
        lats = np.degrees(np.arcsin(x))[::-1]  # ascending x -> north first
        for j, lat in enumerate(lats):
            rows.append(f"({n}, {j}, {int(round(float(lat) * 1e6))})")
    return ",\n       ".join(rows)


@query(
    "grid_grib2_reduced_gaussian_decode",
    tags=("grid", "codec", "python", "ingest"),
    oracle=f"""
WITH g AS (
  SELECT doc_id, 2 + doc_id % 2 AS n
  FROM documents WHERE doc_id % 21 = 6 AND doc_id < 462
),
lat(n, j, lat_udeg) AS (
  VALUES {_reduced_lat_values_sql()}
),
rows_ AS (
  SELECT g.doc_id, g.n, j.j AS j,
         3 + ((g.doc_id + 3 * j.j) % 4) AS rowni
  FROM g, LATERAL (SELECT unnest(generate_series(0, 2 * g.n - 1)) AS j) j
),
offs AS (
  SELECT doc_id, n, j, rowni,
         COALESCE(SUM(rowni) OVER (
           PARTITION BY doc_id ORDER BY j
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS start_pos
  FROM rows_
),
cells AS (
  SELECT o.doc_id, o.n, o.j, o.start_pos + i.i AS pos,
         120 + 2 * ((o.doc_id * 5 + o.j * 11 + i.i * 7) % 45) AS v,
         CAST(ROUND(((i.i * 360.0) / o.rowni) * 1e6) AS BIGINT) AS lon_udeg
  FROM offs o,
       LATERAL (SELECT unnest(generate_series(0, o.rowni - 1)) AS i) i
),
latw AS (
  SELECT g.doc_id, SUM(l.lat_udeg * (l.j + 1)) AS latwsum
  FROM g JOIN lat l ON l.n = g.n
  GROUP BY g.doc_id
)
SELECT c.doc_id,
       CAST(40 AS INTEGER) AS grid_template,
       CAST(MIN(2 * c.n) AS INTEGER) AS nj,
       CAST(NULL AS INTEGER) AS ni,
       CAST(COUNT(*) AS BIGINT) AS n_cells,
       CAST(SUM(c.v) AS BIGINT) AS vsum,
       CAST(SUM(c.v * c.pos) AS BIGINT) AS wsum,
       CAST(MIN(lw.latwsum) AS BIGINT) AS latwsum,
       CAST(SUM(c.lon_udeg) AS BIGINT) AS lonsum_udeg,
       CAST(SUM(c.v * l.lat_udeg) AS BIGINT) AS vlat
FROM cells c
JOIN lat l ON l.n = c.n AND l.j = c.j
JOIN latw lw ON lw.doc_id = c.doc_id
GROUP BY c.doc_id
ORDER BY c.doc_id
""",
)
def grid_grib2_reduced_gaussian_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REDUCED Gaussian grid decode (template 3.40, Ni coded missing +
    the section-3 points-per-parallel list) through the REAL landing
    path — ERA5's NATIVE archive geometry, the dataset the reference
    actually ingests through wgrib2 (/root/reference/src/
    file-conversions.js:49-51,76-112; src/sources/era5monthly.js).
    Rows are RAGGED: each parallel carries its own point count, so the
    landing record keeps ``ni`` NULL, ships the exact quadrature
    latitudes in microdegrees AND per-cell coordinate arrays (row
    latitude repeated, longitudes i·360/row_ni), and ``values`` stays
    the flat storage-order concatenation.

    Witnesses: ``latwsum`` pins the engine's Newton/Bonnet quadrature
    roots against numpy's INDEPENDENT Gauss-Legendre nodes (integer
    microdegree compare); ``lonsum_udeg`` pins the ragged per-row
    longitude axes relationally; ``vlat`` couples every payload value
    to its row's latitude — a mis-sliced ragged row hash-mismatches
    even where permutation-invariant stats would pass; ``wsum`` keeps
    flat storage order sensitive.  Packing alternates simple /
    complex+spatial-differencing, so the ragged geometry is witnessed
    composing with both unpackers.

    Scale: the landing posture — per-record CPU in one Arrow stage
    (the documented native-codec swap-in point), O(rows) metadata for
    the latitude axis, statistic rows shuffle.
    """
    from typing import Iterator

    import numpy as np
    import pandas as pd

    from ..grid.grib2 import encode_grib2_message
    from ..sources.grib_source import RECORD_SCHEMA, _decode_batches

    ids = (
        table(spark, sf_dir, "documents")
        .filter((F.col("doc_id") % 21 == 6) & (F.col("doc_id") < 462))
        .select("doc_id")
    )

    def synth(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                nj = 2 * (2 + d % 2)
                row_ni = [3 + ((d + 3 * j) % 4) for j in range(nj)]
                vals = np.concatenate(
                    [
                        120.0
                        + 2 * ((d * 5 + j * 11 + np.arange(n) * 7) % 45)
                        for j, n in enumerate(row_ni)
                    ]
                )
                msg = encode_grib2_message(
                    vals,
                    reduced_ni=row_ni,
                    packing="complex_diff" if d % 2 else "simple",
                    reference_value=120.0,
                    binary_scale=1,
                    nbits=8,
                )
                rows.append({"path": f"doc://{d}", "content": msg})
            yield pd.DataFrame(rows)

    files = ids.mapInPandas(synth, schema="path string, content binary")
    records = files.mapInPandas(_decode_batches, schema=RECORD_SCHEMA)
    zero = F.lit(0).cast("bigint")
    weighted = F.zip_with(
        "values",
        F.sequence(F.lit(0), F.size("values") - 1),
        lambda v, idx: v.cast("bigint") * idx.cast("bigint"),
    )
    lat_weighted = F.zip_with(
        "latitudes_udeg",
        F.sequence(F.lit(1), F.size("latitudes_udeg")),
        lambda lu, j: lu * j.cast("bigint"),
    )
    cell_lat_udeg = F.transform(
        "cell_lats_deg", lambda x: F.round(x * F.lit(1e6)).cast("bigint")
    )
    cell_lon_udeg = F.transform(
        "cell_lons_deg", lambda x: F.round(x * F.lit(1e6)).cast("bigint")
    )
    vlat = F.zip_with(
        "values", cell_lat_udeg, lambda v, lu: v.cast("bigint") * lu
    )
    return records.select(
        F.regexp_extract("path", r"doc://(\d+)", 1).cast("bigint").alias("doc_id"),
        "grid_template",
        "nj",
        "ni",
        F.size("values").cast("bigint").alias("n_cells"),
        F.aggregate(
            "values", zero, lambda a, x: a + x.cast("bigint")
        ).alias("vsum"),
        F.aggregate(weighted, zero, lambda a, x: a + x).alias("wsum"),
        F.aggregate(lat_weighted, zero, lambda a, x: a + x).alias("latwsum"),
        F.aggregate(cell_lon_udeg, zero, lambda a, x: a + x).alias(
            "lonsum_udeg"
        ),
        F.aggregate(vlat, zero, lambda a, x: a + x).alias("vlat"),
    ).orderBy("doc_id")


@query(
    "grid_grib1_reduced_scan",
    tags=("grid", "codec", "python", "ingest"),
    oracle=f"""
WITH g AS (
  SELECT doc_id, 2 + doc_id % 2 AS n
  FROM documents WHERE doc_id % 23 = 5 AND doc_id < 460
),
lat(n, j, lat_udeg) AS (
  VALUES {_reduced_lat_values_sql()}
),
rows_ AS (
  SELECT g.doc_id, g.n, j.j AS j,
         3 + ((g.doc_id + 2 * j.j) % 4) AS rowni
  FROM g, LATERAL (SELECT unnest(generate_series(0, 2 * g.n - 1)) AS j) j
),
offs AS (
  SELECT doc_id, n, j, rowni,
         COALESCE(SUM(rowni) OVER (
           PARTITION BY doc_id ORDER BY j
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS start_pos
  FROM rows_
),
cells AS (
  SELECT o.doc_id, o.n, o.j, o.start_pos + i.i AS pos,
         80 + 2 * ((o.doc_id * 7 + o.j * 13 + i.i * 5) % 40) AS v,
         CAST(ROUND(((i.i * 360.0) / o.rowni) * 1e6) AS BIGINT) AS lon_udeg
  FROM offs o,
       LATERAL (SELECT unnest(generate_series(0, o.rowni - 1)) AS i) i
),
latw AS (
  SELECT g.doc_id, SUM(l.lat_udeg * (l.j + 1)) AS latwsum
  FROM g JOIN lat l ON l.n = g.n
  GROUP BY g.doc_id
)
SELECT c.doc_id,
       CAST(1 AS INTEGER) AS edition,
       CAST(52 AS INTEGER) AS parameter,
       CAST(6 * (1 + c.doc_id % 3) AS INTEGER) AS forecast_hours,
       CAST(MIN(2 * c.n) AS INTEGER) AS nj,
       CAST(NULL AS INTEGER) AS ni,
       CAST(COUNT(*) AS BIGINT) AS n_cells,
       CAST(SUM(c.v) AS BIGINT) AS vsum,
       CAST(SUM(c.v * c.pos) AS BIGINT) AS wsum,
       CAST(MIN(lw.latwsum) AS BIGINT) AS latwsum,
       CAST(SUM(c.lon_udeg) AS BIGINT) AS lonsum_udeg,
       CAST(SUM(c.v * l.lat_udeg) AS BIGINT) AS vlat
FROM cells c
JOIN lat l ON l.n = c.n AND l.j = c.j
JOIN latw lw ON lw.doc_id = c.doc_id
GROUP BY c.doc_id
ORDER BY c.doc_id
""",
)
def grid_grib1_reduced_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUASI-REGULAR (reduced) Gaussian EDITION-1 decode through the
    landing scan — ECMWF's native edition-1 archive layout, the very
    CDS ERA5 feed the reference consumes through wgrib
    (/root/reference/src/file-conversions.js:114-127; wgrib -d reads
    thinned grids).  Ni codes missing (0xFFFF) and the GDS PL list
    (octet 5 = 33) carries the per-parallel point counts, so rows are
    RAGGED: the landing record keeps ``ni`` NULL, ships the exact
    quadrature latitudes in microdegrees AND per-cell coordinate
    arrays, and ``values`` stays the flat storage-order concatenation —
    the SAME landing contract as GRIB2's reduced template 3.40
    (grid_grib2_reduced_gaussian_decode), so mixed-edition ERA5
    archives land uniformly.

    Witnesses mirror the edition-2 sibling: ``latwsum`` pins the
    engine's quadrature roots against numpy's independent
    Gauss-Legendre nodes; ``lonsum_udeg`` pins the ragged per-row
    longitude axes; ``vlat`` couples every payload value to its row's
    latitude (a mis-sliced ragged row hash-mismatches); ``wsum`` keeps
    flat storage order sensitive; ``forecast_hours`` rides the PDS
    lead octets through the same unified surface.  The foreign-bytes
    witness (tests/test_foreign_grib.py::
    test_foreign_reduced_gaussian_grib1_decodes_to_pinned_values)
    pins the GDS layout against hand-assembled octets.

    Scale: the landing posture — per-record CPU in one Arrow stage,
    O(rows) metadata for the latitude axis, statistic rows shuffle.
    """
    from typing import Iterator

    import numpy as np
    import pandas as pd

    from ..grid.grib1 import encode_grib1_message
    from ..sources.grib_source import RECORD_SCHEMA, _decode_batches

    ids = (
        table(spark, sf_dir, "documents")
        .filter((F.col("doc_id") % 23 == 5) & (F.col("doc_id") < 460))
        .select("doc_id")
    )

    def synth(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                nj = 2 * (2 + d % 2)
                row_ni = [3 + ((d + 2 * j) % 4) for j in range(nj)]
                vals = np.concatenate(
                    [
                        80.0 + 2 * ((d * 7 + j * 13 + np.arange(n) * 5) % 40)
                        for j, n in enumerate(row_ni)
                    ]
                )
                msg = encode_grib1_message(
                    vals,
                    parameter=52,
                    reduced_ni=row_ni,
                    forecast=dict(unit=1, value=6 * (1 + d % 3)),
                    reference_value=80.0,
                    nbits=8,
                )
                rows.append({"path": f"doc://{d}", "content": msg})
            yield pd.DataFrame(rows)

    files = ids.mapInPandas(synth, schema="path string, content binary")
    records = files.mapInPandas(_decode_batches, schema=RECORD_SCHEMA)
    zero = F.lit(0).cast("bigint")
    weighted = F.zip_with(
        "values",
        F.sequence(F.lit(0), F.size("values") - 1),
        lambda v, idx: v.cast("bigint") * idx.cast("bigint"),
    )
    lat_weighted = F.zip_with(
        "latitudes_udeg",
        F.sequence(F.lit(1), F.size("latitudes_udeg")),
        lambda lu, j: lu * j.cast("bigint"),
    )
    cell_lat_udeg = F.transform(
        "cell_lats_deg", lambda x: F.round(x * F.lit(1e6)).cast("bigint")
    )
    cell_lon_udeg = F.transform(
        "cell_lons_deg", lambda x: F.round(x * F.lit(1e6)).cast("bigint")
    )
    vlat = F.zip_with(
        "values", cell_lat_udeg, lambda v, lu: v.cast("bigint") * lu
    )
    return records.select(
        F.regexp_extract("path", r"doc://(\d+)", 1).cast("bigint").alias("doc_id"),
        "edition",
        "parameter",
        "forecast_hours",
        "nj",
        "ni",
        F.size("values").cast("bigint").alias("n_cells"),
        F.aggregate(
            "values", zero, lambda a, x: a + x.cast("bigint")
        ).alias("vsum"),
        F.aggregate(weighted, zero, lambda a, x: a + x).alias("wsum"),
        F.aggregate(lat_weighted, zero, lambda a, x: a + x).alias("latwsum"),
        F.aggregate(cell_lon_udeg, zero, lambda a, x: a + x).alias(
            "lonsum_udeg"
        ),
        F.aggregate(vlat, zero, lambda a, x: a + x).alias("vlat"),
    ).orderBy("doc_id")


@query(
    "grid_grib1_reduced_latlon_scan",
    tags=("grid", "codec", "python", "ingest"),
    oracle="""
WITH g AS (
  SELECT doc_id, 4 + doc_id % 3 AS nj,
         (70000 - (doc_id % 20) * 1000) * 1000 AS lat0_udeg
  FROM documents WHERE doc_id % 89 = 7 AND doc_id < 712
),
rows_ AS (
  SELECT g.doc_id, g.nj, j.j AS j,
         3 + ((g.doc_id + 5 * j.j) % 4) AS rowni,
         g.lat0_udeg - j.j * 2500 * 1000 AS lat_udeg
  FROM g, LATERAL (SELECT unnest(generate_series(0, g.nj - 1)) AS j) j
),
offs AS (
  SELECT doc_id, nj, j, rowni, lat_udeg,
         COALESCE(SUM(rowni) OVER (
           PARTITION BY doc_id ORDER BY j
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS start_pos
  FROM rows_
),
cells AS (
  SELECT o.doc_id, o.j, o.lat_udeg, r.r + 1 AS rn,
         o.start_pos + i.i AS pos,
         90 + ((o.doc_id * 11 + (r.r + 1) * 7 + o.j * 13 + i.i * 3) % 40)
           AS v,
         CAST(ROUND(((i.i * 360.0) / o.rowni) * 1e6) AS BIGINT) AS lon_udeg
  FROM offs o,
       UNNEST(generate_series(0, 1)) AS r(r),
       LATERAL (SELECT unnest(generate_series(0, o.rowni - 1)) AS i) i
),
latw AS (
  SELECT doc_id, SUM(lat_udeg * (j + 1)) AS latwsum
  FROM rows_ GROUP BY doc_id
)
SELECT c.doc_id,
       CAST(c.rn AS INTEGER) AS record_number,
       CAST(MIN(g.nj) AS INTEGER) AS nj,
       CAST(NULL AS INTEGER) AS ni,
       CAST(COUNT(*) AS BIGINT) AS n_cells,
       CAST(SUM(c.v) AS BIGINT) AS vsum,
       CAST(SUM(c.v * c.pos) AS BIGINT) AS wsum,
       CAST(MIN(lw.latwsum) AS BIGINT) AS latwsum,
       CAST(SUM(c.lon_udeg) AS BIGINT) AS lonsum_udeg,
       CAST(SUM(c.v * c.lat_udeg) AS BIGINT) AS vlat
FROM cells c
JOIN g ON g.doc_id = c.doc_id
JOIN latw lw ON lw.doc_id = c.doc_id
GROUP BY c.doc_id, c.rn
ORDER BY c.doc_id, c.rn
""",
)
def grid_grib1_reduced_latlon_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REDUCED (thinned) LAT/LON edition-1 grids through the landing
    scan — the DWD-era sibling of the reduced Gaussian form: the same
    GDS PL per-parallel point-count machinery on grid type 0, but with
    an AFFINE latitude axis (La1 → La2; Di/Dj coded missing, the step
    re-derived exactly from the span — a non-dividing span stops
    loudly, as does a given Dj contradicting La2).  Odd parallel
    counts are legal here (no global-Gaussian evenness), witnessed by
    per-document nj ∈ {4,5,6}.  Per-row latitudes ride the SAME
    ``latitudes_udeg``/per-cell-coordinate landing surface the reduced
    Gaussian form uses, so the unified cell explode serves both.

    Record 1 is simple-packed; record 2 carries the SAME grid through
    SECOND-ORDER (complex) packing — the thinned-grid + second-order
    composition real DWD archives shipped, exercising row-grouped
    group reassembly over ragged rows.  The oracle is fully
    closed-form (affine latitudes need no quadrature table): payload
    sums, storage-order weighting, per-row latitude weighting and the
    ragged longitude axes all pin exactly.

    Scale: the landing posture — one Arrow decode stage, O(rows)
    latitude metadata, statistic rows shuffle.
    """
    from typing import Iterator

    import numpy as np
    import pandas as pd

    from ..grid.grib1 import encode_grib1_message
    from ..sources.grib_source import RECORD_SCHEMA, _decode_batches

    ids = (
        table(spark, sf_dir, "documents")
        .filter((F.col("doc_id") % 89 == 7) & (F.col("doc_id") < 712))
        .select("doc_id")
    )

    def synth(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                nj = 4 + d % 3
                row_ni = [3 + ((d + 5 * j) % 4) for j in range(nj)]

                def field(r: int) -> np.ndarray:
                    return np.concatenate(
                        [
                            90.0
                            + ((d * 11 + r * 7 + j * 13 + np.arange(n) * 3) % 40)
                            for j, n in enumerate(row_ni)
                        ]
                    )

                enc = dict(
                    reduced_ni=row_ni,
                    reduced_latlon=True,
                    lat_first_mdeg=70_000 - (d % 20) * 1000,
                    dlat_mdeg=2_500,
                    reference_value=90.0,
                    nbits=8,
                )
                msgs = [
                    encode_grib1_message(field(1), **enc),
                    encode_grib1_message(
                        field(2), second_order=dict(groups="rows"), **enc
                    ),
                ]
                rows.append({"path": f"doc://{d}", "content": b"".join(msgs)})
            yield pd.DataFrame(rows)

    files = ids.mapInPandas(synth, schema="path string, content binary")
    records = files.mapInPandas(_decode_batches, schema=RECORD_SCHEMA)
    zero = F.lit(0).cast("bigint")
    weighted = F.zip_with(
        "values",
        F.sequence(F.lit(0), F.size("values") - 1),
        lambda v, idx: v.cast("bigint") * idx.cast("bigint"),
    )
    lat_weighted = F.zip_with(
        "latitudes_udeg",
        F.sequence(F.lit(1), F.size("latitudes_udeg")),
        lambda lu, j: lu * j.cast("bigint"),
    )
    cell_lat_udeg = F.transform(
        "cell_lats_deg", lambda x: F.round(x * F.lit(1e6)).cast("bigint")
    )
    cell_lon_udeg = F.transform(
        "cell_lons_deg", lambda x: F.round(x * F.lit(1e6)).cast("bigint")
    )
    vlat = F.zip_with(
        "values", cell_lat_udeg, lambda v, lu: v.cast("bigint") * lu
    )
    return records.select(
        F.regexp_extract("path", r"doc://(\d+)", 1).cast("bigint").alias("doc_id"),
        "record_number",
        "nj",
        "ni",
        F.size("values").cast("bigint").alias("n_cells"),
        F.aggregate(
            "values", zero, lambda a, x: a + x.cast("bigint")
        ).alias("vsum"),
        F.aggregate(weighted, zero, lambda a, x: a + x).alias("wsum"),
        F.aggregate(lat_weighted, zero, lambda a, x: a + x).alias("latwsum"),
        F.aggregate(cell_lon_udeg, zero, lambda a, x: a + x).alias(
            "lonsum_udeg"
        ),
        F.aggregate(vlat, zero, lambda a, x: a + x).alias("vlat"),
    ).orderBy("doc_id", "record_number")


@query(
    "grid_grib1_second_order_scan",
    tags=("grid", "codec", "python", "ingest"),
    oracle="""
WITH g AS (
  SELECT doc_id,
         5 + doc_id % 3 AS ni,
         4 + doc_id % 2 AS nj
  FROM documents WHERE doc_id % 73 = 17 AND doc_id < 700
),
cells AS (
  SELECT doc_id, r.r + 1 AS rn,
         60 + ((doc_id * 7 + r.r * 13 + i.i * 3 + j.j * 11) % 50) AS v,
         j.j * ni + i.i AS pos
  FROM g,
       UNNEST(generate_series(0, 2)) AS r(r),
       LATERAL (SELECT unnest(generate_series(0, ni - 1)) AS i) i,
       LATERAL (SELECT unnest(generate_series(0, nj - 1)) AS j) j
)
SELECT doc_id,
       CAST(rn AS INTEGER) AS record_number,
       CAST(COUNT(*) AS BIGINT) AS n_cells,
       CAST(SUM(v) AS BIGINT) AS vsum,
       CAST(SUM(v * pos) AS BIGINT) AS wsum
FROM cells
GROUP BY doc_id, rn
ORDER BY doc_id, rn
""",
)
def grid_grib1_second_order_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SECOND-ORDER (complex) grid-point packing through the landing
    scan — the WMO extended-BDS form DWD/ECMWF-era edition-1 archives
    ship (wgrib reads it; the reference's wgrib path,
    /root/reference/src/file-conversions.js:114-127): BDS flag bits
    2+4 raise the octet-14 extended flags carrying N1/N2 stream
    pointers, P1 group minima ("first-order values") at the octet-11
    width, and per-point deviations packed as one continuous bitstream
    at per-group widths.

    Each document's archive exercises all three layout axes on
    separate records: row-by-row grouping with a constant width,
    row-by-row with VARYING per-group widths (one width octet per
    group), and explicit groups via the SECONDARY BITMAP (a set bit
    starts a group).  The position-weighted ``wsum`` pins storage
    order through the group reassembly — a group boundary off by one
    hash-mismatches even where the plain sum would cancel.  The
    gribex general-extended bits, the matrix form and primary bitmaps
    stay loud stops (tests/test_grib1.py pins them), and a foreign
    hand-assembled witness pins the octet layout
    (tests/test_foreign_grib.py).

    Scale: identical plan shape to every landing scan — one Arrow
    decode stage, only per-record statistic rows shuffle.
    """
    from typing import Iterator

    import numpy as np
    import pandas as pd

    from ..grid.grib1 import encode_grib1_message
    from ..sources.grib_source import RECORD_SCHEMA, _decode_batches

    ids = (
        table(spark, sf_dir, "documents")
        .filter((F.col("doc_id") % 73 == 17) & (F.col("doc_id") < 700))
        .select("doc_id")
    )

    def synth(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                ni, nj = 5 + d % 3, 4 + d % 2
                i = np.arange(ni)[None, :]
                j = np.arange(nj)[:, None]

                def field(r: int) -> np.ndarray:
                    return (
                        60 + ((d * 7 + r * 13 + i * 3 + j * 11) % 50)
                    ).astype(np.float64)

                total = ni * nj
                k = 1 + d % (total - 1)
                enc = dict(reference_value=60.0, nbits=8)
                msgs = [
                    encode_grib1_message(
                        field(0), second_order=dict(groups="rows"), **enc
                    ),
                    encode_grib1_message(
                        field(1),
                        second_order=dict(groups="rows", varying=True),
                        **enc,
                    ),
                    encode_grib1_message(
                        field(2),
                        second_order=dict(
                            groups=[k, total - k], varying=True
                        ),
                        **enc,
                    ),
                ]
                rows.append({"path": f"doc://{d}", "content": b"".join(msgs)})
            yield pd.DataFrame(rows)

    files = ids.mapInPandas(synth, schema="path string, content binary")
    records = files.mapInPandas(_decode_batches, schema=RECORD_SCHEMA)
    zero = F.lit(0).cast("bigint")
    weighted = F.zip_with(
        "values",
        F.sequence(F.lit(0), F.size("values") - 1),
        lambda v, idx: v.cast("bigint") * idx.cast("bigint"),
    )
    return records.select(
        F.regexp_extract("path", r"doc://(\d+)", 1).cast("bigint").alias("doc_id"),
        "record_number",
        F.size("values").cast("bigint").alias("n_cells"),
        F.aggregate(
            "values", zero, lambda a, x: a + x.cast("bigint")
        ).alias("vsum"),
        F.aggregate(weighted, zero, lambda a, x: a + x).alias("wsum"),
    ).orderBy("doc_id", "record_number")


@query(
    "grid_geotiff_publish_scan",
    tags=("grid", "codec", "python", "ingest"),
    oracle="""
WITH g AS (
  SELECT doc_id,
         6 + doc_id % 3 AS ni,
         4 + doc_id % 2 AS nj
  FROM documents WHERE doc_id % 83 = 29 AND doc_id < 700
),
cells AS (
  SELECT doc_id, m.m AS month,
         ((doc_id * 3 + m.m * 17 + i.i * 5 + j.j * 7) % 60)
           - ((doc_id * 3 + i.i * 5 + j.j * 7) % 30) AS anomaly,
         j.j * ni + i.i AS pos
  FROM g,
       UNNEST(generate_series(1, 3)) AS m(m),
       LATERAL (SELECT unnest(generate_series(0, ni - 1)) AS i) i,
       LATERAL (SELECT unnest(generate_series(0, nj - 1)) AS j) j
)
SELECT c.doc_id, CAST(c.month AS INTEGER) AS month,
       CAST(MIN(g.ni) AS INTEGER) AS width,
       CAST(MIN(g.nj) AS INTEGER) AS height,
       CAST(MIN(g.doc_id % 360 - 180) AS DOUBLE) AS west,
       CAST(MIN(60 - g.doc_id % 30) AS DOUBLE) AS north,
       CAST(COUNT(*) FILTER (WHERE c.pos = 0) AS BIGINT) AS n_nodata,
       CAST(SUM(c.anomaly) FILTER (WHERE c.pos <> 0) AS BIGINT) AS vsum,
       CAST(SUM(c.anomaly * c.pos) FILTER (WHERE c.pos <> 0) AS BIGINT)
         AS wsum
FROM cells c JOIN g ON g.doc_id = c.doc_id
GROUP BY c.doc_id, c.month
ORDER BY c.doc_id, c.month
""",
)
def grid_geotiff_publish_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's TRUE output format, round-tripped as dataflow:
    every dataset the reference publishes is an LZW-compressed Float32
    GeoTIFF with floating-point predictor 3 and nodata −9999
    (/root/reference/src/file-conversions.js:57-74 ``gdal_translate
    -co COMPRESS=LZW -co PREDICTOR=3 -ot Float32``, ``:174-195``
    ``gdalwarp -dstnodata -9999``), consumed downstream by the GSKY
    tile server.  This query runs the anomaly math (current month −
    climatological normal), encodes each month AS that exact GeoTIFF
    through the pure-Python codec in one Arrow stage, then re-ingests
    the published bytes through a second Arrow decode stage — georef
    (tie point, pixel scale), dimensions, the nodata sentinel→NULL
    contract (P5) and payload sums all hash-checked closed-form, so a
    predictor/LZW/strip-layout defect anywhere in the publish→consume
    loop mismatches.

    One cell per raster is masked to the −9999 sentinel before encode;
    the landing surfaces it as a NULL (never a plausible −9999 value)
    and the oracle pins both the NULL count and the sums excluding it.
    Values are integer-valued anomalies (exact in Float32), so sums
    compare exactly.

    Scale: the publish/decode pair is the same fixed-work Arrow regime
    as every codec query — at 100 TB each month-file encodes/decodes
    independently (parallelism = files), only statistic rows shuffle.
    """
    from typing import Iterator

    import numpy as np
    import pandas as pd

    from ..grid.geotiff import GeoRaster, decode_geotiff, encode_geotiff

    ids = (
        table(spark, sf_dir, "documents")
        .filter((F.col("doc_id") % 83 == 29) & (F.col("doc_id") < 700))
        .select("doc_id")
    )

    def publish(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                ni, nj = 6 + d % 3, 4 + d % 2
                i = np.arange(ni)[None, :]
                j = np.arange(nj)[:, None]
                normal = (d * 3 + i * 5 + j * 7) % 30
                for m in (1, 2, 3):
                    current = (d * 3 + m * 17 + i * 5 + j * 7) % 60
                    anomaly = (current - normal).astype(np.float32)
                    anomaly[0, 0] = -9999.0  # clipped cell → nodata
                    tif = encode_geotiff(
                        GeoRaster(
                            values=anomaly,
                            west=float(d % 360 - 180),
                            north=float(60 - d % 30),
                            xres=0.25,
                            yres=0.25,
                            nodata=-9999.0,
                        ),
                        compress=True,
                    )
                    rows.append(
                        {"path": f"tif://{d}/{m}", "content": tif}
                    )
            yield pd.DataFrame(rows)

    def ingest(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                r = decode_geotiff(bytes(content))
                vals = r.values.astype(np.float64)
                if r.nodata is not None:
                    vals[vals == r.nodata] = np.nan  # sentinel → NULL
                rows.append(
                    {
                        "path": path,
                        "width": r.values.shape[1],
                        "height": r.values.shape[0],
                        "west": r.west,
                        "north": r.north,
                        "values": vals.reshape(-1).tolist(),
                    }
                )
            yield pd.DataFrame(rows)

    files = ids.mapInPandas(publish, schema="path string, content binary")
    records = files.mapInPandas(
        ingest,
        schema=(
            "path string, width int, height int, west double, "
            "north double, values array<double>"
        ),
    )
    zero = F.lit(0).cast("bigint")

    weighted = F.zip_with(
        "values",
        F.sequence(F.lit(0), F.size("values") - 1),
        lambda v, idx: F.when(
            _is_present(v), v.cast("bigint") * idx.cast("bigint")
        ).otherwise(F.lit(0).cast("bigint")),
    )
    return records.select(
        F.regexp_extract("path", r"tif://(\d+)/", 1).cast("bigint").alias("doc_id"),
        F.regexp_extract("path", r"/(\d+)$", 1).cast("int").alias("month"),
        "width",
        "height",
        "west",
        "north",
        F.aggregate(
            "values",
            zero,
            lambda a, x: a + F.when(_is_present(x), 0).otherwise(1).cast("bigint"),
        ).alias("n_nodata"),
        F.aggregate(
            "values",
            zero,
            lambda a, x: a
            + F.when(_is_present(x), x).otherwise(F.lit(0)).cast("bigint"),
        ).alias("vsum"),
        F.aggregate(weighted, zero, lambda a, x: a + x).alias("wsum"),
    ).orderBy("doc_id", "month")


# --- multi-field (submessage) GRIB2 archives --------------------------------
# Per selected document ONE archive = a single multi-field message
# holding fields rn=1..3 on a shared (5 + d%3) × (4 + d%2) grid
# (section 3 emitted once and INHERITED — the NDFD submessage layout)
# followed by a single-field message rn=4 on its own (3 + d%2) × 3
# grid; field r's cell (i, j) is 140 + 2*((d*9 + r*17 + i*5 + j*3) % 50),
# packed simple / complex+diff / PNG / simple by field.


@query(
    "grid_grib2_multifield_scan",
    tags=("grid", "codec", "python", "ingest"),
    oracle="""
WITH g AS (
  SELECT doc_id FROM documents WHERE doc_id % 37 = 4 AND doc_id < 666
),
rows_ AS (
  SELECT doc_id, r.r + 1 AS rn,
         CASE WHEN r.r = 3 THEN 3 + doc_id % 2 ELSE 5 + doc_id % 3 END AS ni,
         CASE WHEN r.r = 3 THEN 3 ELSE 4 + doc_id % 2 END AS nj
  FROM g, UNNEST(generate_series(0, 3)) AS r(r)
),
cells AS (
  SELECT doc_id, rn,
         140 + 2 * ((doc_id * 9 + (rn - 1) * 17 + i.i * 5 + j.j * 3) % 50) AS v,
         j.j * ni + i.i AS pos
  FROM rows_,
       LATERAL (SELECT unnest(generate_series(0, ni - 1)) AS i) i,
       LATERAL (SELECT unnest(generate_series(0, nj - 1)) AS j) j
)
SELECT doc_id,
       CAST(rn AS INTEGER) AS record_number,
       CAST(rn AS INTEGER) AS number,
       CAST(COUNT(*) AS BIGINT) AS n_cells,
       CAST(SUM(v) AS BIGINT) AS vsum,
       CAST(SUM(v * pos) AS BIGINT) AS wsum
FROM cells
GROUP BY doc_id, rn
ORDER BY doc_id, rn
""",
)
def grid_grib2_multifield_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MULTI-FIELD (submessage) GRIB2 archives through the REAL landing
    path: one message legally carries several fields
    (``0 1 (3 (4 5 6 7))+ 8`` — the layout NDFD-style archives ship,
    which the reference reads through wgrib2's N.M submessage numbering,
    /root/reference/src/file-conversions.js:120-127).  The landing scan
    numbers, inventories, match-filters and decodes per FIELD
    (``sources/grib_source._record_units``), with the persisting
    section 3 inherited across fields exactly once, so a submessage
    archive behaves identically to its split-into-messages form.

    Per document: fields 1-3 ride in ONE message on a shared inherited
    grid — packed simple, complex+spatial-differencing, and PNG, so the
    representation variety composes with the submessage layout — and
    record 4 is an ordinary single-field message on its own grid,
    pinning that the field counter spans message boundaries.  The
    position-weighted ``wsum`` keeps each field's raster order
    sensitive; a scan that collapsed repeated sections 4-7 (or
    mis-attributed the inherited grid) hash-mismatches.

    Scale: the landing posture — archive bytes decode executor-side in
    one Arrow stage; header-only field splitting costs section slicing,
    never value bits; only per-record statistic rows shuffle.
    """
    from typing import Iterator

    import numpy as np
    import pandas as pd

    from ..grid.grib2 import encode_grib2_message, merge_grib2_fields
    from ..sources.grib_source import RECORD_SCHEMA, _decode_batches

    ids = (
        table(spark, sf_dir, "documents")
        .filter((F.col("doc_id") % 37 == 4) & (F.col("doc_id") < 666))
        .select("doc_id")
    )

    def synth(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)

                def field(r: int, ni: int, nj: int) -> np.ndarray:
                    i = np.arange(ni)[None, :]
                    j = np.arange(nj)[:, None]
                    return (
                        140 + 2 * ((d * 9 + r * 17 + i * 5 + j * 3) % 50)
                    ).astype(np.float64)

                ni, nj = 5 + d % 3, 4 + d % 2
                packings = ("simple", "complex_diff", "png")
                multi = merge_grib2_fields(
                    [
                        encode_grib2_message(
                            field(r, ni, nj), category=0, number=r + 1,
                            reference_value=140.0, binary_scale=1, nbits=8,
                            packing=packings[r],
                        )
                        for r in range(3)
                    ]
                )
                single = encode_grib2_message(
                    field(3, 3 + d % 2, 3), category=0, number=4,
                    reference_value=140.0, binary_scale=1, nbits=8,
                )
                rows.append({"path": f"doc://{d}", "content": multi + single})
            yield pd.DataFrame(rows)

    files = ids.mapInPandas(synth, schema="path string, content binary")
    records = files.mapInPandas(_decode_batches, schema=RECORD_SCHEMA)
    weighted = F.zip_with(
        "values",
        F.sequence(F.lit(0), F.size("values") - 1),
        lambda v, idx: v.cast("bigint") * idx.cast("bigint"),
    )
    zero = F.lit(0).cast("bigint")
    return records.select(
        F.regexp_extract("path", r"doc://(\d+)", 1).cast("bigint").alias("doc_id"),
        "record_number",
        "number",
        F.size("values").cast("bigint").alias("n_cells"),
        F.aggregate(
            "values", zero, lambda a, x: a + x.cast("bigint")
        ).alias("vsum"),
        F.aggregate(weighted, zero, lambda a, x: a + x).alias("wsum"),
    ).orderBy("doc_id", "record_number")


# --- ensemble products (PDT 4.1 / 4.11) through the landing ----------------
# Per selected document ONE multi-field message carrying the whole
# ensemble: members m = 0, 1, 2 of a 3-member ensemble via PDT 4.1 on a
# shared inherited (5 + d%2) × (4 + d%3) grid, plus a 4th field — the
# ensemble-mean ACCUMULATION via PDT 4.11 (member 0 of 3 + the 4.8
# statistical block).  Field r's cell (i, j) is
# 125 + 2*((d*11 + r*7 + i*3 + j*13) % 55).


@query(
    "grid_grib2_ensemble_scan",
    tags=("grid", "codec", "python", "ingest"),
    oracle="""
WITH g AS (
  SELECT doc_id,
         5 + doc_id % 2 AS ni,
         4 + doc_id % 3 AS nj
  FROM documents WHERE doc_id % 43 = 11 AND doc_id < 645
),
cells AS (
  SELECT doc_id, r.r + 1 AS rn,
         125 + 2 * ((doc_id * 11 + r.r * 7 + i.i * 3 + j.j * 13) % 55) AS v,
         j.j * ni + i.i AS pos
  FROM g,
       UNNEST(generate_series(0, 3)) AS r(r),
       LATERAL (SELECT unnest(generate_series(0, ni - 1)) AS i) i,
       LATERAL (SELECT unnest(generate_series(0, nj - 1)) AS j) j
)
SELECT doc_id,
       CAST(rn AS INTEGER) AS record_number,
       CAST(CASE WHEN rn <= 3 THEN rn - 1 ELSE 0 END AS INTEGER)
         AS ensemble_member,
       CAST(3 AS INTEGER) AS ensemble_size,
       CAST(CASE WHEN rn = 4 THEN 1 END AS INTEGER) AS statistical_process,
       CASE WHEN rn = 4 THEN make_timestamp(
         2020, 1 + doc_id % 12, 1, 6, 0, 0
       ) END AS interval_end,
       CAST(COUNT(*) AS BIGINT) AS n_cells,
       CAST(SUM(v) AS BIGINT) AS vsum,
       CAST(SUM(v * pos) AS BIGINT) AS wsum
FROM cells
GROUP BY doc_id, rn
ORDER BY doc_id, rn
""",
)
def grid_grib2_ensemble_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ENSEMBLE products (PDT 4.1 individual member / 4.11 member +
    statistical interval) through the REAL landing path — the product
    form ensemble archives (ECMWF ENS, GEFS, ERA5 EDA) ship, read by
    the reference through wgrib2 (/root/reference/src/
    file-conversions.js:120-127).  The whole ensemble rides in ONE
    multi-field message (section 3 inherited across members — how
    ensemble GRIBs are actually laid out), and the landing schema's
    ``ensemble_member``/``ensemble_size`` columns make
    control-vs-perturbed a plain column filter; the 4.11 field also
    carries the statistical columns, witnessing that the ensemble
    octets SHIFT the statistical block by three (a parser that reused
    4.8's offsets on 4.11 would decode a garbage interval end).

    The oracle pins membership, size, the statistical contract (NULL
    for the 4.1 members), per-field payload sums and the
    raster-order-sensitive ``wsum`` closed-form.

    Scale: the landing posture — submessage splitting is section
    slicing; per-record statistic rows shuffle; nothing else moves.
    """
    from typing import Iterator

    import numpy as np
    import pandas as pd

    from ..grid.grib2 import encode_grib2_message, merge_grib2_fields
    from ..sources.grib_source import RECORD_SCHEMA, _decode_batches

    ids = (
        table(spark, sf_dir, "documents")
        .filter((F.col("doc_id") % 43 == 11) & (F.col("doc_id") < 645))
        .select("doc_id")
    )

    def synth(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                ni, nj = 5 + d % 2, 4 + d % 3
                i = np.arange(ni)[None, :]
                j = np.arange(nj)[:, None]

                def field(r: int) -> np.ndarray:
                    return (
                        125 + 2 * ((d * 11 + r * 7 + i * 3 + j * 13) % 55)
                    ).astype(np.float64)

                msgs = [
                    encode_grib2_message(
                        field(m), category=0, number=1,
                        reference_value=125.0, binary_scale=1, nbits=8,
                        ensemble=dict(type=3, member=m, size=3),
                    )
                    for m in range(3)
                ]
                msgs.append(
                    encode_grib2_message(
                        field(3), category=0, number=1,
                        reference_value=125.0, binary_scale=1, nbits=8,
                        ensemble=dict(type=0, member=0, size=3),
                        statistical=dict(
                            process=1,
                            interval_end=(2020, 1 + d % 12, 1, 6, 0),
                            range_hours=6,
                        ),
                    )
                )
                rows.append(
                    {"path": f"doc://{d}", "content": merge_grib2_fields(msgs)}
                )
            yield pd.DataFrame(rows)

    files = ids.mapInPandas(synth, schema="path string, content binary")
    records = files.mapInPandas(_decode_batches, schema=RECORD_SCHEMA)
    weighted = F.zip_with(
        "values",
        F.sequence(F.lit(0), F.size("values") - 1),
        lambda v, idx: v.cast("bigint") * idx.cast("bigint"),
    )
    zero = F.lit(0).cast("bigint")
    return records.select(
        F.regexp_extract("path", r"doc://(\d+)", 1).cast("bigint").alias("doc_id"),
        "record_number",
        "ensemble_member",
        "ensemble_size",
        "statistical_process",
        "interval_end",
        F.size("values").cast("bigint").alias("n_cells"),
        F.aggregate(
            "values", zero, lambda a, x: a + x.cast("bigint")
        ).alias("vsum"),
        F.aggregate(weighted, zero, lambda a, x: a + x).alias("wsum"),
    ).orderBy("doc_id", "record_number")


@query(
    "grid_grib2_derived_ensemble_scan",
    tags=("grid", "codec", "python", "ingest"),
    oracle="""
WITH g AS (
  SELECT doc_id,
         5 + doc_id % 3 AS ni,
         3 + doc_id % 2 AS nj
  FROM documents WHERE doc_id % 47 = 13 AND doc_id < 645
),
cells AS (
  SELECT doc_id, r.r + 1 AS rn,
         120 + 2 * ((doc_id * 5 + r.r * 9 + i.i * 7 + j.j * 3) % 50) AS v,
         j.j * ni + i.i AS pos
  FROM g,
       UNNEST(generate_series(0, 3)) AS r(r),
       LATERAL (SELECT unnest(generate_series(0, ni - 1)) AS i) i,
       LATERAL (SELECT unnest(generate_series(0, nj - 1)) AS j) j
)
SELECT doc_id,
       CAST(rn AS INTEGER) AS record_number,
       CAST(CASE WHEN rn <= 2 THEN rn - 1 END AS INTEGER) AS ensemble_member,
       CAST(CASE WHEN rn = 3 THEN 0 WHEN rn = 4 THEN 4 END AS INTEGER)
         AS derived_forecast,
       CAST(2 AS INTEGER) AS ensemble_size,
       CAST(CASE WHEN rn = 4 THEN 0 END AS INTEGER) AS statistical_process,
       CAST(CASE WHEN rn = 4 THEN 2 END AS INTEGER) AS time_range_count,
       CASE WHEN rn = 4 THEN make_timestamp(
         2020, 1 + doc_id % 12, 2, 18, 0, 0
       ) END AS interval_end,
       CAST(COUNT(*) AS BIGINT) AS n_cells,
       CAST(SUM(v) AS BIGINT) AS vsum,
       CAST(SUM(v * pos) AS BIGINT) AS wsum
FROM cells
GROUP BY doc_id, rn
ORDER BY doc_id, rn
""",
)
def grid_grib2_derived_ensemble_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DERIVED-ensemble products (PDT 4.2 mean / 4.12 spread +
    statistical interval) through the REAL landing path — the products
    ECMWF ENS and GEFS publish ALONGSIDE the 4.1 members the engine
    already lands, read by the reference through wgrib2
    (/root/reference/src/file-conversions.js:49-51,76-112).  One
    multi-field message per document carries two 4.1 members, a 4.2
    ensemble mean and a 4.12 ensemble spread over a statistical
    interval, so members-vs-derived is a plain column filter
    (``ensemble_member`` vs ``derived_forecast``) on landed archives.

    The oracle pins the code-table-4.7 derived type per field, the
    shared ensemble size, NULL membership on derived fields, the 4.12
    statistical block's +2 offset past 4.8 (a parser reusing 4.8's
    offsets would decode a garbage interval end), the n=2 compound
    time-range count on the spread field, and raster-order-sensitive
    payload sums.

    Scale: the landing posture — submessage splitting is section
    slicing; only per-record statistic rows shuffle.
    """
    from typing import Iterator

    import numpy as np
    import pandas as pd

    from ..grid.grib2 import encode_grib2_message, merge_grib2_fields
    from ..sources.grib_source import RECORD_SCHEMA, _decode_batches

    ids = (
        table(spark, sf_dir, "documents")
        .filter((F.col("doc_id") % 47 == 13) & (F.col("doc_id") < 645))
        .select("doc_id")
    )

    def synth(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                ni, nj = 5 + d % 3, 3 + d % 2
                i = np.arange(ni)[None, :]
                j = np.arange(nj)[:, None]

                def field(r: int) -> np.ndarray:
                    return (
                        120 + 2 * ((d * 5 + r * 9 + i * 7 + j * 3) % 50)
                    ).astype(np.float64)

                msgs = [
                    encode_grib2_message(
                        field(m), category=0, number=1,
                        reference_value=120.0, binary_scale=1, nbits=8,
                        ensemble=dict(type=3, member=m, size=2),
                    )
                    for m in range(2)
                ]
                msgs.append(
                    encode_grib2_message(
                        field(2), category=0, number=1,
                        reference_value=120.0, binary_scale=1, nbits=8,
                        derived=dict(type=0, size=2),  # unweighted mean
                    )
                )
                msgs.append(
                    encode_grib2_message(
                        field(3), category=0, number=1,
                        reference_value=120.0, binary_scale=1, nbits=8,
                        derived=dict(type=4, size=2),  # spread
                        statistical=dict(
                            process=0,
                            interval_end=(2020, 1 + d % 12, 2, 18, 0),
                            range_hours=6,
                            # n = 2: spread of HOURLY MAXIMA — the
                            # compound form time_range_count surfaces
                            inner_specs=[dict(process=2, range_hours=1)],
                        ),
                    )
                )
                rows.append(
                    {"path": f"doc://{d}", "content": merge_grib2_fields(msgs)}
                )
            yield pd.DataFrame(rows)

    files = ids.mapInPandas(synth, schema="path string, content binary")
    records = files.mapInPandas(_decode_batches, schema=RECORD_SCHEMA)
    weighted = F.zip_with(
        "values",
        F.sequence(F.lit(0), F.size("values") - 1),
        lambda v, idx: v.cast("bigint") * idx.cast("bigint"),
    )
    zero = F.lit(0).cast("bigint")
    return records.select(
        F.regexp_extract("path", r"doc://(\d+)", 1).cast("bigint").alias("doc_id"),
        "record_number",
        "ensemble_member",
        "derived_forecast",
        "ensemble_size",
        "statistical_process",
        "time_range_count",
        "interval_end",
        F.size("values").cast("bigint").alias("n_cells"),
        F.aggregate(
            "values", zero, lambda a, x: a + x.cast("bigint")
        ).alias("vsum"),
        F.aggregate(weighted, zero, lambda a, x: a + x).alias("wsum"),
    ).orderBy("doc_id", "record_number")


@query(
    "grid_grib2_cluster_scan",
    tags=("grid", "codec", "python", "ingest"),
    oracle="""
WITH g AS (
  SELECT doc_id,
         4 + doc_id % 3 AS ni,
         3 + doc_id % 2 AS nj
  FROM documents WHERE doc_id % 43 = 11 AND doc_id < 645
),
cells AS (
  SELECT doc_id, r.r + 1 AS rn,
         80 + 2 * ((doc_id * 7 + r.r * 5 + i.i * 3 + j.j * 11) % 45) AS v,
         j.j * ni + i.i AS pos
  FROM g,
       UNNEST(generate_series(0, 4)) AS r(r),
       LATERAL (SELECT unnest(generate_series(0, ni - 1)) AS i) i,
       LATERAL (SELECT unnest(generate_series(0, nj - 1)) AS j) j
)
SELECT doc_id,
       CAST(rn AS INTEGER) AS record_number,
       CAST(CASE WHEN rn = 1 THEN 0 END AS INTEGER) AS ensemble_member,
       CAST(CASE rn WHEN 2 THEN 0 WHEN 3 THEN 2 WHEN 4 THEN 0 WHEN 5 THEN 4
         END AS INTEGER) AS derived_forecast,
       CAST(10 + doc_id % 5 AS INTEGER) AS ensemble_size,
       CAST(CASE rn WHEN 3 THEN 1 + doc_id % 5 WHEN 4 THEN 2 + doc_id % 4
         WHEN 5 THEN 3 + doc_id % 3 END AS INTEGER) AS cluster_identifier,
       CAST(CASE WHEN rn IN (3, 4, 5) THEN 3 + doc_id % 3 END AS INTEGER)
         AS cluster_total,
       CAST(CASE rn WHEN 3 THEN 2 + doc_id % 3 WHEN 4 THEN 1 + doc_id % 2
         WHEN 5 THEN 2 + doc_id % 2 END AS INTEGER) AS cluster_size,
       CAST(CASE WHEN rn = 5 THEN 0 END AS INTEGER) AS statistical_process,
       CASE WHEN rn = 5 THEN make_timestamp(
         2020, 1 + doc_id % 12, 3, 6, 0, 0
       ) END AS interval_end,
       CAST(CASE WHEN rn = 5 THEN 1 END AS INTEGER) AS time_range_count,
       CAST(COUNT(*) AS BIGINT) AS n_cells,
       CAST(SUM(v) AS BIGINT) AS vsum,
       CAST(SUM(v * pos) AS BIGINT) AS wsum
FROM cells
GROUP BY doc_id, rn
ORDER BY doc_id, rn
""",
)
def grid_grib2_cluster_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CLUSTER-derived ensemble products (PDT 4.3 rectangular / 4.4
    circular cluster domains + the 4.13 statistical sibling) through
    the REAL landing path — the last members of the operational 4.x
    family the engine decodes (completing 4.0-4.6, 4.8-4.15),
    published by EPS cluster post-processing beside the 4.1 members
    and 4.2 all-member products the reference reads through wgrib2
    (/root/reference/src/file-conversions.js:49-51,76-112).  One
    multi-field message per document carries a 4.1 member, a 4.2
    ensemble mean, a 4.3 rectangular-domain cluster product, a 4.4
    circular-domain one and a 4.13 cluster-spread over a statistical
    interval, so member-vs-all-vs-cluster is a plain column filter on
    landed archives (``cluster_identifier`` / ``cluster_total`` /
    ``cluster_size`` — NULL on every non-cluster product).

    The oracle pins the shared ensemble size across all five
    templates, the per-template cluster identifier / total / NC (the
    4.4 layout reads NC four octets earlier than 4.3 — a parser
    reusing 4.3's offsets would decode a garbage member count),
    NULL cluster columns on 4.1/4.2 fields, the 4.13 statistical
    block's VARIABLE offset after the NC-long member list (the only
    4.x form whose statistical base depends on a count field — the
    interval-end timestamp only decodes right if the offset walk is),
    and raster-order-sensitive payload sums.

    Scale: the landing posture — submessage splitting is section
    slicing; only per-record statistic rows shuffle.
    """
    from typing import Iterator

    import numpy as np
    import pandas as pd

    from ..grid.grib2 import encode_grib2_message, merge_grib2_fields
    from ..sources.grib_source import RECORD_SCHEMA, _decode_batches

    ids = (
        table(spark, sf_dir, "documents")
        .filter((F.col("doc_id") % 43 == 11) & (F.col("doc_id") < 645))
        .select("doc_id")
    )

    def synth(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                ni, nj = 4 + d % 3, 3 + d % 2
                i = np.arange(ni)[None, :]
                j = np.arange(nj)[:, None]

                def field(r: int) -> np.ndarray:
                    return (
                        80 + 2 * ((d * 7 + r * 5 + i * 3 + j * 11) % 45)
                    ).astype(np.float64)

                enc = dict(
                    category=0, number=1,
                    reference_value=80.0, binary_scale=1, nbits=8,
                )
                size = 10 + d % 5
                msgs = [
                    encode_grib2_message(
                        field(0),
                        ensemble=dict(type=3, member=0, size=size),
                        **enc,
                    ),
                    encode_grib2_message(
                        field(1),
                        derived=dict(type=0, size=size),
                        **enc,
                    ),
                    encode_grib2_message(
                        field(2),
                        cluster=dict(
                            type=2, size=size,
                            identifier=1 + d % 5, total=3 + d % 3,
                            method=d % 2,
                            members=list(range(2 + d % 3)),
                            stddev=(1, 10 + d % 20),
                            bounds=(
                                60_000_000, 30_000_000,
                                40_000_000, -10_000_000,
                            ),
                        ),
                        **enc,
                    ),
                    encode_grib2_message(
                        field(3),
                        cluster=dict(
                            type=0, size=size,
                            identifier=2 + d % 4, total=3 + d % 3,
                            method=1,
                            members=list(range(1 + d % 2)),
                            distance=(0, 3 + d % 9),
                            center=(45_000_000, 10_000_000, 500_000),
                        ),
                        **enc,
                    ),
                    # 4.13: cluster + statistical interval — the
                    # statistical block rides AFTER the NC-long member
                    # list (the only variable-offset 4.x form), so the
                    # oracle's interval-end pin proves the offset walk
                    encode_grib2_message(
                        field(4),
                        cluster=dict(
                            type=4, size=size,
                            identifier=3 + d % 3, total=3 + d % 3,
                            method=0,
                            members=list(range(2 + d % 2)),
                            stddev=(0, 5 + d % 7),
                            bounds=(
                                55_000_000, 25_000_000,
                                35_000_000, -5_000_000,
                            ),
                        ),
                        statistical=dict(
                            process=0,
                            interval_end=(2020, 1 + d % 12, 3, 6, 0),
                            range_hours=12,
                        ),
                        **enc,
                    ),
                ]
                rows.append(
                    {"path": f"doc://{d}", "content": merge_grib2_fields(msgs)}
                )
            yield pd.DataFrame(rows)

    files = ids.mapInPandas(synth, schema="path string, content binary")
    records = files.mapInPandas(_decode_batches, schema=RECORD_SCHEMA)
    weighted = F.zip_with(
        "values",
        F.sequence(F.lit(0), F.size("values") - 1),
        lambda v, idx: v.cast("bigint") * idx.cast("bigint"),
    )
    zero = F.lit(0).cast("bigint")
    return records.select(
        F.regexp_extract("path", r"doc://(\d+)", 1).cast("bigint").alias("doc_id"),
        "record_number",
        "ensemble_member",
        "derived_forecast",
        "ensemble_size",
        "cluster_identifier",
        "cluster_total",
        "cluster_size",
        "statistical_process",
        "interval_end",
        "time_range_count",
        F.size("values").cast("bigint").alias("n_cells"),
        F.aggregate(
            "values", zero, lambda a, x: a + x.cast("bigint")
        ).alias("vsum"),
        F.aggregate(weighted, zero, lambda a, x: a + x).alias("wsum"),
    ).orderBy("doc_id", "record_number")


@query(
    "grid_grib_quarantine_scan",
    tags=("grid", "codec", "python", "ingest"),
    oracle="""
WITH g AS (
  SELECT doc_id,
         4 + doc_id % 3 AS ni,
         3 + doc_id % 2 AS nj
  FROM documents WHERE doc_id % 59 = 23 AND doc_id < 645
),
cells AS (
  SELECT doc_id, r.r + 1 AS rn,
         40 + 2 * ((doc_id * 11 + r.r * 3 + i.i * 7 + j.j * 5) % 30) AS v
  FROM g,
       UNNEST(generate_series(0, 2)) AS r(r),
       LATERAL (SELECT unnest(generate_series(0, ni - 1)) AS i) i,
       LATERAL (SELECT unnest(generate_series(0, nj - 1)) AS j) j
  WHERE r.r <> 1  -- record 2 is the quarantined one: no cells land
),
rec AS (
  SELECT doc_id, rn, CAST(COUNT(*) AS BIGINT) AS n_cells,
         CAST(SUM(v) AS BIGINT) AS vsum
  FROM cells GROUP BY doc_id, rn
  UNION ALL
  SELECT doc_id, 2, NULL, NULL FROM g
  UNION ALL
  SELECT doc_id, 4, NULL, NULL FROM g
)
SELECT doc_id,
       CAST(rn AS INTEGER) AS record_number,
       CAST(CASE WHEN rn IN (2, 4) THEN 1 ELSE 0 END AS BIGINT) AS is_error,
       CASE rn WHEN 2 THEN 'template' WHEN 4 THEN 'framing' END
         AS error_kind,
       n_cells, vsum
FROM rec
ORDER BY doc_id, rn
""",
)
def grid_grib_quarantine_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CORRUPT-RECORD QUARANTINE — the 100 TB operational posture of
    the landing scan: one torn or undecodable record among 100k files
    must not kill the job, and silently skipping it would be data
    loss, so ``on_error="quarantine"`` lands it as ONE row with the
    ``error`` column set (path, record number, the codec's ValueError
    text) and every other field NULL — the quarantine manifest a
    re-ingest job consumes — while good records, INCLUDING those
    before a tear in the same file, land normally (Spark's own
    PERMISSIVE/columnNameOfCorruptRecord posture, applied to the GRIB
    codec boundary; the default ``fail`` mode keeps the strict stop
    every other catalog query runs under).

    Each document's archive carries a good record, a record whose PDT
    word is patched to the RESERVED 4.65534 (no WMO template is or
    will be assigned there — a semantic reject that can never start
    decoding, unlike the previously-used 4.30 and 4.40, both of which
    the engine has since learned; quarantined, scan CONTINUES to the
    next record), another good
    record, and a torn trailing message (framing reject — quarantined,
    file ends there since record numbering itself is gone).  The
    oracle pins the exact 4-row pattern per document: good rows keep
    their payload sums, error rows carry their kind and NULL payload.

    Scale: identical plan shape to every landing scan (one Arrow
    decode stage, only statistic rows shuffle) — quarantine adds a
    per-record try/except, no extra pass and no extra shuffle.
    """
    from typing import Iterator

    import numpy as np
    import pandas as pd

    from ..grid.grib2 import encode_grib2_message
    from ..sources.grib_source import RECORD_SCHEMA, _decode_batches

    ids = (
        table(spark, sf_dir, "documents")
        .filter((F.col("doc_id") % 59 == 23) & (F.col("doc_id") < 645))
        .select("doc_id")
    )

    def synth(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                ni, nj = 4 + d % 3, 3 + d % 2
                i = np.arange(ni)[None, :]
                j = np.arange(nj)[:, None]

                def field(r: int) -> np.ndarray:
                    return (
                        40 + 2 * ((d * 11 + r * 3 + i * 7 + j * 5) % 30)
                    ).astype(np.float64)

                enc = dict(
                    category=0, number=1,
                    reference_value=40.0, binary_scale=1, nbits=8,
                )
                msgs = [encode_grib2_message(field(r), **enc) for r in range(3)]
                # record 2: PDT word patched to the RESERVED 4.65534
                # (never assignable — the fixture's reject template is
                # now PERMANENT; its r14 pick 4.30 and r15 pick 4.40
                # both since started decoding) — the decode must
                # quarantine it and CONTINUE
                bad = bytearray(msgs[1])
                pos = 16
                while bad[pos + 4] != 4:
                    pos += int.from_bytes(bad[pos : pos + 4], "big")
                bad[pos + 7] = 0xFF
                bad[pos + 8] = 0xFE
                # record 4: a torn trailing message (magic present,
                # body chopped) — framing quarantine ends the file
                torn = msgs[2][: len(msgs[2]) - 9]
                content = msgs[0] + bytes(bad) + msgs[2] + torn
                rows.append({"path": f"doc://{d}", "content": content})
            yield pd.DataFrame(rows)

    files = ids.mapInPandas(synth, schema="path string, content binary")
    records = files.mapInPandas(
        lambda it: _decode_batches(it, on_error="quarantine"),
        schema=RECORD_SCHEMA,
    )
    zero = F.lit(0).cast("bigint")
    return records.select(
        F.regexp_extract("path", r"doc://(\d+)", 1).cast("bigint").alias("doc_id"),
        "record_number",
        F.col("error").isNotNull().cast("bigint").alias("is_error"),
        F.when(F.col("error").startswith("record framing"), "framing")
        .when(F.col("error").contains("product definition template"), "template")
        .alias("error_kind"),
        F.when(
            F.col("error").isNull(), F.size("values").cast("bigint")
        ).alias("n_cells"),
        F.when(
            F.col("error").isNull(),
            F.aggregate("values", zero, lambda a, x: a + x.cast("bigint")),
        ).alias("vsum"),
    ).orderBy("doc_id", "record_number")


@query(
    "grid_grib2_error_scan",
    tags=("grid", "codec", "python", "ingest"),
    oracle="""
WITH g AS (
  SELECT doc_id,
         4 + doc_id % 3 AS ni,
         3 + doc_id % 2 AS nj
  FROM documents WHERE doc_id % 53 = 17 AND doc_id < 645
),
cells AS (
  SELECT doc_id, r.r + 1 AS rn,
         60 + 2 * ((doc_id * 3 + r.r * 7 + i.i * 5 + j.j * 9) % 40) AS v,
         j.j * ni + i.i AS pos
  FROM g,
       UNNEST(generate_series(0, 2)) AS r(r),
       LATERAL (SELECT unnest(generate_series(0, ni - 1)) AS i) i,
       LATERAL (SELECT unnest(generate_series(0, nj - 1)) AS j) j
)
SELECT doc_id,
       CAST(rn AS INTEGER) AS record_number,
       CAST(CASE rn WHEN 1 THEN 0 WHEN 2 THEN 7 WHEN 3 THEN 8 END
         AS INTEGER) AS product_template,
       CAST(CASE WHEN rn = 3 THEN 1 END AS INTEGER) AS statistical_process,
       CASE WHEN rn = 3 THEN make_timestamp(
         2020, 1 + doc_id % 12, 2, 6, 0, 0
       ) END AS interval_end,
       CAST(COUNT(*) AS BIGINT) AS n_cells,
       CAST(SUM(v) AS BIGINT) AS vsum,
       CAST(SUM(v * pos) AS BIGINT) AS wsum
FROM cells
GROUP BY doc_id, rn
ORDER BY doc_id, rn
""",
)
def grid_grib2_error_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYSIS-ERROR fields (PDT 4.7) and the ``product_template``
    landing column that makes them usable: template 4.7's octet layout
    is IDENTICAL to 4.0's — an error field is distinguishable from the
    analysis itself only by the template number, so the landing schema
    now carries it (NULL on edition 1, which has no PDT numbering).
    This is also the wgrib2-style family selector: "all statistical
    products" / "all ensemble-derived products" become plain column
    filters on landed archives (the reference reads these archives
    through wgrib2, /root/reference/src/file-conversions.js:49-51).

    One multi-field message per document carries the 4.0 analysis, its
    4.7 error field and a 4.8 statistical product; the oracle pins the
    template number per record (0 / 7 / 8 — a decoder collapsing 4.7
    onto 4.0 hash-mismatches immediately), the statistical columns
    staying NULL on 4.0 AND 4.7, and raster-order-sensitive payload
    sums.

    Scale: the landing posture — submessage splitting is section
    slicing; only per-record statistic rows shuffle.
    """
    from typing import Iterator

    import numpy as np
    import pandas as pd

    from ..grid.grib2 import encode_grib2_message, merge_grib2_fields
    from ..sources.grib_source import RECORD_SCHEMA, _decode_batches

    ids = (
        table(spark, sf_dir, "documents")
        .filter((F.col("doc_id") % 53 == 17) & (F.col("doc_id") < 645))
        .select("doc_id")
    )

    def synth(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                ni, nj = 4 + d % 3, 3 + d % 2
                i = np.arange(ni)[None, :]
                j = np.arange(nj)[:, None]

                def field(r: int) -> np.ndarray:
                    return (
                        60 + 2 * ((d * 3 + r * 7 + i * 5 + j * 9) % 40)
                    ).astype(np.float64)

                enc = dict(
                    category=0, number=1,
                    reference_value=60.0, binary_scale=1, nbits=8,
                )
                msgs = [
                    encode_grib2_message(field(0), **enc),
                    encode_grib2_message(field(1), error=True, **enc),
                    encode_grib2_message(
                        field(2),
                        statistical=dict(
                            process=1,
                            interval_end=(2020, 1 + d % 12, 2, 6, 0),
                            range_hours=6,
                        ),
                        **enc,
                    ),
                ]
                rows.append(
                    {"path": f"doc://{d}", "content": merge_grib2_fields(msgs)}
                )
            yield pd.DataFrame(rows)

    files = ids.mapInPandas(synth, schema="path string, content binary")
    records = files.mapInPandas(_decode_batches, schema=RECORD_SCHEMA)
    weighted = F.zip_with(
        "values",
        F.sequence(F.lit(0), F.size("values") - 1),
        lambda v, idx: v.cast("bigint") * idx.cast("bigint"),
    )
    zero = F.lit(0).cast("bigint")
    return records.select(
        F.regexp_extract("path", r"doc://(\d+)", 1).cast("bigint").alias("doc_id"),
        "record_number",
        "product_template",
        "statistical_process",
        "interval_end",
        F.size("values").cast("bigint").alias("n_cells"),
        F.aggregate(
            "values", zero, lambda a, x: a + x.cast("bigint")
        ).alias("vsum"),
        F.aggregate(weighted, zero, lambda a, x: a + x).alias("wsum"),
    ).orderBy("doc_id", "record_number")


@query(
    "grid_grib2_satellite_scan",
    tags=("grid", "codec", "python", "ingest"),
    oracle="""
WITH g AS (
  SELECT doc_id,
         4 + doc_id % 3 AS ni,
         3 + doc_id % 2 AS nj
  FROM documents WHERE doc_id % 61 = 29 AND doc_id < 645
),
cells AS (
  SELECT doc_id, r.r + 1 AS rn,
         40 + 2 * ((doc_id * 7 + r.r * 5 + i.i * 3 + j.j * 11) % 45) AS v
  FROM g,
       UNNEST(generate_series(0, 2)) AS r(r),
       LATERAL (SELECT unnest(generate_series(0, ni - 1)) AS i) i,
       LATERAL (SELECT unnest(generate_series(0, nj - 1)) AS j) j
),
vs AS (
  SELECT doc_id, rn, CAST(SUM(v) AS BIGINT) AS vsum
  FROM cells GROUP BY doc_id, rn
),
bands31 AS (
  SELECT doc_id, b.b AS b,
         300 + doc_id % 5 AS series,
         10 + b.b AS sat_number,
         600 + (doc_id + b.b) % 7 AS instrument,
         CAST(700 + (doc_id % 50) + b.b AS DOUBLE)
           / POWER(10, (b.b % 3) - 1) AS wave
  FROM g,
       LATERAL (SELECT unnest(generate_series(0, doc_id % 3)) AS b) b
),
w31 AS (
  SELECT doc_id, CAST(COUNT(*) AS INTEGER) AS satellite_bands,
         CAST(MIN(CASE WHEN b = 0 THEN series END) AS INTEGER)
           AS first_series,
         CAST(SUM(sat_number) AS BIGINT) AS num_sum,
         CAST(MIN(CASE WHEN b = 0 THEN instrument END) AS INTEGER)
           AS first_instrument,
         ROUND(SUM(wave), 6) AS wave_sum
  FROM bands31 GROUP BY doc_id
),
rec AS (
  SELECT g.doc_id, 1 AS rn, CAST(31 AS INTEGER) AS product_template,
         w31.satellite_bands, w31.first_series, w31.num_sum,
         w31.first_instrument, w31.wave_sum,
         CAST(NULL AS INTEGER) AS forecast_hours
  FROM g JOIN w31 ON g.doc_id = w31.doc_id
  UNION ALL
  SELECT doc_id, 2, CAST(32 AS INTEGER), CAST(1 AS INTEGER),
         CAST(310 AS INTEGER), CAST(15 AS BIGINT),
         CAST(650 + doc_id % 5 AS INTEGER),
         ROUND(CAST(900 + doc_id % 30 AS DOUBLE), 6),
         CAST(6 * (1 + doc_id % 4) AS INTEGER)
  FROM g
  UNION ALL
  SELECT doc_id, 3, CAST(0 AS INTEGER), CAST(NULL AS INTEGER),
         CAST(NULL AS INTEGER), CAST(NULL AS BIGINT),
         CAST(NULL AS INTEGER), CAST(NULL AS DOUBLE),
         CAST(0 AS INTEGER)
  FROM g
)
SELECT rec.doc_id, CAST(rec.rn AS INTEGER) AS record_number,
       rec.product_template, rec.satellite_bands, rec.first_series,
       rec.num_sum, rec.first_instrument,
       rec.wave_sum, rec.forecast_hours, vs.vsum
FROM rec JOIN vs ON rec.doc_id = vs.doc_id AND rec.rn = vs.rn
ORDER BY rec.doc_id, rec.rn
""",
)
def grid_grib2_satellite_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SATELLITE products through the landing scan — PDT 4.31
    (observational satellite imagery, the non-deprecated successor of
    4.30) and 4.32 (simulated/synthetic satellite imagery, the
    GOES-brightness-temperature form NCEP publishes from GFS/NAM).
    Both templates abandon the 4.0 family layout after the parameter
    octets: there are NO fixed surfaces (the contributing-spectral-
    band list stands where the level octets would be — a family-offset
    read would decode band data as levels), and 4.31 has no
    forecast-time octets either (an observation at the reference
    time).  The decode lands ``satellite_bands`` /
    ``satellite_instruments`` / ``central_wavenumbers`` columns (NULL
    on every non-satellite product), the level columns stay NULL, and
    ``forecast_hours`` is NULL on 4.31 but carries 4.32's real lead.

    Each document's archive holds a 4.31 record with 1-3 bands (the
    first band's wave-number scale factor is NEGATIVE — sign-magnitude
    on this surface too), a single-band 4.32 with a per-document lead,
    and a plain 4.0 record proving the NULL contract.  The oracle pins
    the per-band central wave numbers (value · 10^-scale), the band
    counts, the first instrument, the lead split (NULL / real / 0) and
    payload sums.

    The ensemble satellite forms 4.33/4.34 decode through the same
    branch (witnessed by grid_grib2_ensemble_satellite_scan), the
    radar template 4.20 through its own (grid_grib2_radar_scan), and
    since r15 the deprecated 4.30 decodes through its own ONE-OCTET-
    narrower band width (witnessed by
    grid_grib2_deprecated_satellite_scan) — no named product-template
    boundary remains.

    Scale: identical plan shape to every landing scan — one Arrow
    decode stage, only per-record statistic rows shuffle.
    """
    from typing import Iterator

    import numpy as np
    import pandas as pd

    from ..grid.grib2 import encode_grib2_message
    from ..sources.grib_source import RECORD_SCHEMA, _decode_batches

    ids = (
        table(spark, sf_dir, "documents")
        .filter((F.col("doc_id") % 61 == 29) & (F.col("doc_id") < 645))
        .select("doc_id")
    )

    def synth(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                ni, nj = 4 + d % 3, 3 + d % 2
                i = np.arange(ni)[None, :]
                j = np.arange(nj)[:, None]

                def field(r: int) -> np.ndarray:
                    return (
                        40 + 2 * ((d * 7 + r * 5 + i * 3 + j * 11) % 45)
                    ).astype(np.float64)

                enc = dict(
                    category=4, number=7,
                    reference_value=40.0, binary_scale=1, nbits=8,
                )
                obs_bands = [
                    dict(
                        series=300 + d % 5,
                        number=10 + b,
                        instrument=600 + (d + b) % 7,
                        scale=(b % 3) - 1,
                        value=700 + (d % 50) + b,
                    )
                    for b in range(1 + d % 3)
                ]
                msgs = [
                    encode_grib2_message(
                        field(0), satellite=dict(bands=obs_bands), **enc
                    ),
                    encode_grib2_message(
                        field(1),
                        satellite=dict(
                            simulated=True,
                            bands=[
                                dict(
                                    series=310,
                                    number=15,
                                    instrument=650 + d % 5,
                                    scale=0,
                                    value=900 + d % 30,
                                )
                            ],
                        ),
                        forecast=dict(unit=1, value=6 * (1 + d % 4)),
                        **enc,
                    ),
                    encode_grib2_message(field(2), **enc),
                ]
                rows.append({"path": f"doc://{d}", "content": b"".join(msgs)})
            yield pd.DataFrame(rows)

    files = ids.mapInPandas(synth, schema="path string, content binary")
    records = files.mapInPandas(_decode_batches, schema=RECORD_SCHEMA)
    zero = F.lit(0).cast("bigint")
    return records.select(
        F.regexp_extract("path", r"doc://(\d+)", 1).cast("bigint").alias("doc_id"),
        "record_number",
        "product_template",
        "satellite_bands",
        F.element_at("satellite_series", 1).alias("first_series"),
        F.aggregate(
            "satellite_numbers",
            F.lit(0).cast("bigint"),
            lambda a, x: a + x.cast("bigint"),
        ).alias("num_sum"),
        F.element_at("satellite_instruments", 1).alias("first_instrument"),
        F.round(
            F.aggregate(
                "central_wavenumbers", F.lit(0.0), lambda a, x: a + x
            ),
            6,
        ).alias("wave_sum"),
        "forecast_hours",
        F.aggregate(
            "values", zero, lambda a, x: a + x.cast("bigint")
        ).alias("vsum"),
    ).orderBy("doc_id", "record_number")


@query(
    "grid_grib2_ensemble_satellite_scan",
    tags=("grid", "codec", "python", "ingest"),
    oracle="""
WITH g AS (
  SELECT doc_id,
         4 + doc_id % 3 AS ni,
         3 + doc_id % 2 AS nj
  FROM documents WHERE doc_id % 67 = 31 AND doc_id < 700
),
cells AS (
  SELECT doc_id, r.r + 1 AS rn,
         30 + 2 * ((doc_id * 5 + r.r * 9 + i.i * 7 + j.j * 3) % 35) AS v
  FROM g,
       UNNEST(generate_series(0, 2)) AS r(r),
       LATERAL (SELECT unnest(generate_series(0, ni - 1)) AS i) i,
       LATERAL (SELECT unnest(generate_series(0, nj - 1)) AS j) j
),
vs AS (
  SELECT doc_id, rn, CAST(SUM(v) AS BIGINT) AS vsum
  FROM cells GROUP BY doc_id, rn
),
w33 AS (
  SELECT doc_id,
         CAST(COUNT(*) AS INTEGER) AS satellite_bands,
         ROUND(SUM(
           CAST(500 + doc_id % 40 + 3 * b.b AS DOUBLE)
             / POWER(10, b.b % 2)
         ), 6) AS wave_sum
  FROM g, LATERAL (SELECT unnest(generate_series(0, doc_id % 2)) AS b) b
  GROUP BY doc_id
),
rec AS (
  SELECT g.doc_id, 1 AS rn, CAST(33 AS INTEGER) AS product_template,
         CAST(1 + g.doc_id % 5 AS INTEGER) AS ensemble_member,
         CAST(10 AS INTEGER) AS ensemble_size,
         w33.satellite_bands, w33.wave_sum,
         CAST(6 * (1 + g.doc_id % 3) AS INTEGER) AS forecast_hours,
         CAST(NULL AS INTEGER) AS statistical_process,
         CAST(NULL AS TIMESTAMP) AS interval_end
  FROM g JOIN w33 ON w33.doc_id = g.doc_id
  UNION ALL
  SELECT doc_id, 2, CAST(34 AS INTEGER),
         CAST(2 + doc_id % 4 AS INTEGER), CAST(8 AS INTEGER),
         CAST(1 AS INTEGER),
         ROUND(CAST((90 + doc_id % 10) * 10 AS DOUBLE), 6),
         CAST(6 AS INTEGER), CAST(1 AS INTEGER),
         make_timestamp(2021, 1 + doc_id % 12, 2, 6, 0, 0)
  FROM g
  UNION ALL
  SELECT doc_id, 3, CAST(32 AS INTEGER),
         CAST(NULL AS INTEGER), CAST(NULL AS INTEGER),
         CAST(1 AS INTEGER),
         ROUND(CAST(777 AS DOUBLE), 6),
         CAST(12 AS INTEGER), CAST(NULL AS INTEGER),
         CAST(NULL AS TIMESTAMP)
  FROM g
)
SELECT rec.doc_id, CAST(rec.rn AS INTEGER) AS record_number,
       rec.product_template, rec.ensemble_member, rec.ensemble_size,
       rec.satellite_bands, rec.wave_sum, rec.forecast_hours,
       rec.statistical_process, rec.interval_end, vs.vsum
FROM rec JOIN vs ON rec.doc_id = vs.doc_id AND rec.rn = vs.rn
ORDER BY rec.doc_id, rec.rn
""",
)
def grid_grib2_ensemble_satellite_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ENSEMBLE SIMULATED SATELLITE products (PDT 4.33/4.34 — the
    per-member synthetic-imagery forms ensembles publish beside 4.32)
    through the landing scan: 4.32's leading layout, the three
    4.1-style ensemble octets AFTER the contributing-spectral-band
    list, and — 4.34 — the 4.8 statistical block after those, the
    second variable-offset statistical family besides 4.13/4.14 (a
    parser reusing a fixed offset would decode band octets as the
    interval end).  The ensemble octets land in the SAME unified
    ``ensemble_member``/``ensemble_size`` columns as 4.1/4.11, so
    "member 7 of the simulated-imagery ensemble" filters identically
    across plain and satellite archives; levels stay NULL (no fixed
    surfaces).

    Each document's archive holds a 4.33 with 1-2 bands and a
    per-document member/lead, a single-band 4.34 accumulation (its
    interval end exercising the variable-offset statistical block
    behind the band list), and a 4.32 control proving the ensemble
    columns stay NULL on the non-ensemble form.  The oracle pins the
    per-band central wave numbers, the member/size split, the
    statistical columns and payload sums.

    Scale: identical plan shape to every landing scan — one Arrow
    decode stage, only per-record statistic rows shuffle.
    """
    from typing import Iterator

    import numpy as np
    import pandas as pd

    from ..grid.grib2 import encode_grib2_message
    from ..sources.grib_source import RECORD_SCHEMA, _decode_batches

    ids = (
        table(spark, sf_dir, "documents")
        .filter((F.col("doc_id") % 67 == 31) & (F.col("doc_id") < 700))
        .select("doc_id")
    )

    def synth(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                ni, nj = 4 + d % 3, 3 + d % 2
                i = np.arange(ni)[None, :]
                j = np.arange(nj)[:, None]

                def field(r: int) -> np.ndarray:
                    return (
                        30 + 2 * ((d * 5 + r * 9 + i * 7 + j * 3) % 35)
                    ).astype(np.float64)

                enc = dict(
                    category=4, number=9,
                    reference_value=30.0, binary_scale=1, nbits=8,
                )
                bands33 = [
                    dict(
                        series=300 + b,
                        number=12 + b,
                        instrument=600 + b,
                        scale=b % 2,
                        value=500 + d % 40 + 3 * b,
                    )
                    for b in range(1 + d % 2)
                ]
                msgs = [
                    encode_grib2_message(
                        field(0),
                        satellite=dict(simulated=True, bands=bands33),
                        ensemble=dict(type=3, member=1 + d % 5, size=10),
                        forecast=dict(unit=1, value=6 * (1 + d % 3)),
                        **enc,
                    ),
                    encode_grib2_message(
                        field(1),
                        satellite=dict(
                            simulated=True,
                            bands=[
                                dict(
                                    series=310, number=20, instrument=650,
                                    scale=-1, value=90 + d % 10,
                                )
                            ],
                        ),
                        ensemble=dict(type=4, member=2 + d % 4, size=8),
                        forecast=dict(unit=1, value=6),
                        statistical=dict(
                            process=1,
                            interval_end=(2021, 1 + d % 12, 2, 6, 0),
                            range_hours=6,
                        ),
                        **enc,
                    ),
                    encode_grib2_message(
                        field(2),
                        satellite=dict(
                            simulated=True,
                            bands=[
                                dict(
                                    series=320, number=25, instrument=660,
                                    scale=0, value=777,
                                )
                            ],
                        ),
                        forecast=dict(unit=1, value=12),
                        **enc,
                    ),
                ]
                rows.append({"path": f"doc://{d}", "content": b"".join(msgs)})
            yield pd.DataFrame(rows)

    files = ids.mapInPandas(synth, schema="path string, content binary")
    records = files.mapInPandas(_decode_batches, schema=RECORD_SCHEMA)
    zero = F.lit(0).cast("bigint")
    return records.select(
        F.regexp_extract("path", r"doc://(\d+)", 1).cast("bigint").alias("doc_id"),
        "record_number",
        "product_template",
        "ensemble_member",
        "ensemble_size",
        "satellite_bands",
        F.round(
            F.aggregate(
                "central_wavenumbers", F.lit(0.0), lambda a, x: a + x
            ),
            6,
        ).alias("wave_sum"),
        "forecast_hours",
        "statistical_process",
        "interval_end",
        F.aggregate(
            "values", zero, lambda a, x: a + x.cast("bigint")
        ).alias("vsum"),
    ).orderBy("doc_id", "record_number")


@query(
    "grid_grib2_radar_scan",
    tags=("grid", "codec", "python", "ingest"),
    oracle="""
WITH g AS (
  SELECT doc_id,
         4 + doc_id % 3 AS ni,
         3 + doc_id % 2 AS nj
  FROM documents WHERE doc_id % 71 = 13 AND doc_id < 700
),
cells AS (
  SELECT doc_id, r.r + 1 AS rn,
         20 + ((doc_id * 3 + r.r * 11 + i.i * 5 + j.j * 7) % 45) AS v
  FROM g,
       UNNEST(generate_series(0, 1)) AS r(r),
       LATERAL (SELECT unnest(generate_series(0, ni - 1)) AS i) i,
       LATERAL (SELECT unnest(generate_series(0, nj - 1)) AS j) j
),
vs AS (
  SELECT doc_id, rn, CAST(SUM(v) AS BIGINT) AS vsum
  FROM cells GROUP BY doc_id, rn
)
SELECT g.doc_id,
       CAST(vs.rn AS INTEGER) AS record_number,
       CAST(CASE vs.rn WHEN 1 THEN 20 ELSE 0 END AS INTEGER)
         AS product_template,
       CAST(CASE WHEN vs.rn = 1 THEN 1 + g.doc_id % 4 END AS INTEGER)
         AS radar_sites,
       CASE WHEN vs.rn = 1 THEN
         CASE g.doc_id % 4 WHEN 0 THEN 'KTLX' WHEN 1 THEN 'KFWS'
                           WHEN 2 THEN 'KAMA' ELSE 'KINX' END
       END AS radar_site_id,
       CAST(CASE WHEN vs.rn = 1 THEN 300 + g.doc_id % 50 END AS INTEGER)
         AS radar_site_number,
       CASE WHEN vs.rn = 1 THEN 30.5 + g.doc_id % 20 END
         AS radar_site_lat,
       CASE WHEN vs.rn = 1 THEN -(90.0 + (g.doc_id % 30) * 0.5) END
         AS radar_site_lon,
       CAST(CASE WHEN vs.rn = 1 THEN 100 + g.doc_id % 300 END AS INTEGER)
         AS radar_elevation_m,
       CAST(CASE WHEN vs.rn = 1 THEN g.doc_id % 3 END AS INTEGER)
         AS radar_operating_mode,
       CAST(CASE WHEN vs.rn = 2 THEN 0 END AS INTEGER) AS forecast_hours,
       vs.vsum
FROM g JOIN vs ON vs.doc_id = g.doc_id
ORDER BY g.doc_id, vs.rn
""",
)
def grid_grib2_radar_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RADAR products (PDT 4.20 — the site-based template wgrib2
    consumes through the very -match scan path the reference shells to,
    /root/reference/src/file-conversions.js:76-112) through the landing
    scan: the template shares nothing past the parameter octets with
    the 4.0 family — site coordinates (signed-magnitude µdeg, the
    longitude here NEGATIVE to witness the sign bit), elevation,
    CCITT-IA5 and numeric site identifiers and the code-table-4.12
    operating mode land in the radar_* columns, while the level
    columns and ``forecast_hours`` stay NULL (an observation at the
    reference time has neither).

    Each document's archive holds a 4.20 with per-document site
    metadata and a plain 4.0 control record proving the NULL contract
    both ways (radar columns NULL on 4.0, lead/level NULL on 4.20).
    The oracle pins every site column plus payload sums.

    Scale: identical plan shape to every landing scan — one Arrow
    decode stage, only per-record statistic rows shuffle.
    """
    from typing import Iterator

    import numpy as np
    import pandas as pd

    from ..grid.grib2 import encode_grib2_message
    from ..sources.grib_source import RECORD_SCHEMA, _decode_batches

    ids = (
        table(spark, sf_dir, "documents")
        .filter((F.col("doc_id") % 71 == 13) & (F.col("doc_id") < 700))
        .select("doc_id")
    )

    def synth(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                ni, nj = 4 + d % 3, 3 + d % 2
                i = np.arange(ni)[None, :]
                j = np.arange(nj)[:, None]

                def field(r: int) -> np.ndarray:
                    return (
                        20 + ((d * 3 + r * 11 + i * 5 + j * 7) % 45)
                    ).astype(np.float64)

                enc = dict(
                    reference_value=20.0, binary_scale=0, nbits=8,
                )
                site_id = ["KTLX", "KFWS", "KAMA", "KINX"][d % 4]
                msgs = [
                    encode_grib2_message(
                        field(0),
                        discipline=15,
                        category=1,
                        number=195,
                        radar=dict(
                            sites=1 + d % 4,
                            site_id=site_id,
                            site_number=300 + d % 50,
                            lat_udeg=30_500_000 + (d % 20) * 1_000_000,
                            lon_udeg=-(90_000_000 + (d % 30) * 500_000),
                            elevation_m=100 + d % 300,
                            mode=d % 3,
                        ),
                        **enc,
                    ),
                    encode_grib2_message(field(1), **enc),
                ]
                rows.append({"path": f"doc://{d}", "content": b"".join(msgs)})
            yield pd.DataFrame(rows)

    files = ids.mapInPandas(synth, schema="path string, content binary")
    records = files.mapInPandas(_decode_batches, schema=RECORD_SCHEMA)
    zero = F.lit(0).cast("bigint")
    return records.select(
        F.regexp_extract("path", r"doc://(\d+)", 1).cast("bigint").alias("doc_id"),
        "record_number",
        "product_template",
        "radar_sites",
        "radar_site_id",
        "radar_site_number",
        "radar_site_lat",
        "radar_site_lon",
        "radar_elevation_m",
        "radar_operating_mode",
        "forecast_hours",
        F.aggregate(
            "values", zero, lambda a, x: a + x.cast("bigint")
        ).alias("vsum"),
    ).orderBy("doc_id", "record_number")


@query(
    "grid_grib2_probability_scan",
    tags=("grid", "codec", "python", "ingest"),
    oracle="""
WITH g AS (
  SELECT doc_id,
         4 + doc_id % 3 AS ni,
         3 + doc_id % 2 AS nj
  FROM documents WHERE doc_id % 41 = 7 AND doc_id < 645
),
cells AS (
  SELECT doc_id, r.r + 1 AS rn,
         50 + ((doc_id * 13 + r.r * 3 + i.i * 5 + j.j * 7) % 40) AS v
  FROM g,
       UNNEST(generate_series(0, 3)) AS r(r),
       LATERAL (SELECT unnest(generate_series(0, ni - 1)) AS i) i,
       LATERAL (SELECT unnest(generate_series(0, nj - 1)) AS j) j
)
SELECT doc_id,
       CAST(rn AS INTEGER) AS record_number,
       CAST(CASE rn WHEN 1 THEN 3 WHEN 2 THEN 0 WHEN 3 THEN 2
                    WHEN 4 THEN 1 END AS INTEGER) AS probability_type,
       CASE rn
         WHEN 1 THEN (27315 + doc_id) / 100.0
         WHEN 2 THEN CAST(-(5 + doc_id % 7) AS DOUBLE)
         WHEN 3 THEN (doc_id % 50) / 10.0
       END AS prob_lower_limit,
       CASE rn
         WHEN 3 THEN (doc_id % 50 + 25) / 10.0
         WHEN 4 THEN (2 + doc_id % 5) / POWER(10.0, -1)
       END AS prob_upper_limit,
       CAST(CASE WHEN rn = 4 THEN 1 END AS INTEGER) AS statistical_process,
       CASE WHEN rn = 4 THEN make_timestamp(
         2020, 1 + doc_id % 12, 1, 6, 0, 0
       ) END AS interval_end,
       CAST(CASE WHEN rn = 4 THEN 1 END AS INTEGER) AS time_range_count,
       CAST(COUNT(*) AS BIGINT) AS n_cells,
       CAST(SUM(v) AS BIGINT) AS vsum
FROM cells
GROUP BY doc_id, rn
ORDER BY doc_id, rn
""",
)
def grid_grib2_probability_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PROBABILITY forecasts (PDT 4.5 / 4.9 + statistical interval)
    through the REAL landing path — the other common operational
    ensemble-derived form (NCEP SREF/GEFS probability products), read
    by the reference through wgrib2 (/root/reference/src/
    file-conversions.js:49-51,76-112).  One multi-field message per
    document carries P(>lower), P(<lower), P(between) and a 4.9
    P(>upper) over a statistical interval; the landing schema's
    ``probability_type`` / ``prob_lower_limit`` / ``prob_upper_limit``
    columns make threshold filters plain column predicates on landed
    archives.

    The oracle pins the error-prone threshold decode closed-form:
    positive/zero/NEGATIVE scale factors (value / 10^scale with
    signed-magnitude octets — two's complement would decode a negative
    threshold as a huge magnitude), a sign-magnitude NEGATIVE scaled
    value, and the NULL contract on whichever side each probability
    type leaves unbounded — plus the 4.9 statistical block at +13 past
    4.8's offset and per-field payload sums.

    Scale: the landing posture — submessage splitting is section
    slicing; only per-record statistic rows shuffle.
    """
    from typing import Iterator

    import numpy as np
    import pandas as pd

    from ..grid.grib2 import encode_grib2_message, merge_grib2_fields
    from ..sources.grib_source import RECORD_SCHEMA, _decode_batches

    ids = (
        table(spark, sf_dir, "documents")
        .filter((F.col("doc_id") % 41 == 7) & (F.col("doc_id") < 645))
        .select("doc_id")
    )

    def synth(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                ni, nj = 4 + d % 3, 3 + d % 2
                i = np.arange(ni)[None, :]
                j = np.arange(nj)[:, None]

                def field(r: int) -> np.ndarray:
                    return (
                        50 + ((d * 13 + r * 3 + i * 5 + j * 7) % 40)
                    ).astype(np.float64)

                enc = dict(
                    category=1, number=8, reference_value=50.0, nbits=8
                )
                msgs = [
                    encode_grib2_message(
                        field(0), **enc,
                        probability=dict(
                            number=0, total=4, type=3, lower=(2, 27315 + d)
                        ),
                    ),
                    encode_grib2_message(
                        field(1), **enc,
                        probability=dict(
                            number=1, total=4, type=0,
                            lower=(0, -(5 + d % 7)),
                        ),
                    ),
                    encode_grib2_message(
                        field(2), **enc,
                        probability=dict(
                            number=2, total=4, type=2,
                            lower=(1, d % 50), upper=(1, d % 50 + 25),
                        ),
                    ),
                    encode_grib2_message(
                        field(3), **enc,
                        probability=dict(
                            number=3, total=4, type=1,
                            upper=(-1, 2 + d % 5),
                        ),
                        statistical=dict(
                            process=1,
                            interval_end=(2020, 1 + d % 12, 1, 6, 0),
                            range_hours=6,
                        ),
                    ),
                ]
                rows.append(
                    {"path": f"doc://{d}", "content": merge_grib2_fields(msgs)}
                )
            yield pd.DataFrame(rows)

    files = ids.mapInPandas(synth, schema="path string, content binary")
    records = files.mapInPandas(_decode_batches, schema=RECORD_SCHEMA)
    return records.select(
        F.regexp_extract("path", r"doc://(\d+)", 1).cast("bigint").alias("doc_id"),
        "record_number",
        "probability_type",
        "prob_lower_limit",
        "prob_upper_limit",
        "statistical_process",
        "interval_end",
        "time_range_count",
        F.size("values").cast("bigint").alias("n_cells"),
        F.aggregate(
            "values", F.lit(0).cast("bigint"), lambda a, x: a + x.cast("bigint")
        ).alias("vsum"),
    ).orderBy("doc_id", "record_number")


@query(
    "grid_grib2_percentile_scan",
    tags=("grid", "codec", "python", "ingest"),
    oracle="""
WITH g AS (
  SELECT doc_id,
         4 + doc_id % 2 AS ni,
         3 + doc_id % 3 AS nj
  FROM documents WHERE doc_id % 37 = 5 AND doc_id < 645
),
cells AS (
  SELECT doc_id, r.r + 1 AS rn,
         80 + ((doc_id * 7 + r.r * 11 + i.i * 3 + j.j * 5) % 45) AS v
  FROM g,
       UNNEST(generate_series(0, 3)) AS r(r),
       LATERAL (SELECT unnest(generate_series(0, ni - 1)) AS i) i,
       LATERAL (SELECT unnest(generate_series(0, nj - 1)) AS j) j
)
SELECT doc_id,
       CAST(rn AS INTEGER) AS record_number,
       CAST(CASE rn WHEN 1 THEN 10 WHEN 2 THEN 50 WHEN 3 THEN 90
                    WHEN 4 THEN 75 END AS INTEGER) AS percentile_value,
       CAST(CASE WHEN rn = 4 THEN 0 END AS INTEGER) AS statistical_process,
       CASE WHEN rn = 4 THEN make_timestamp(
         2020, 1 + doc_id % 12, 3, 12, 0, 0
       ) END AS interval_end,
       CAST(CASE WHEN rn = 4 THEN 1 END AS INTEGER) AS time_range_count,
       CAST(COUNT(*) AS BIGINT) AS n_cells,
       CAST(SUM(v) AS BIGINT) AS vsum
FROM cells
GROUP BY doc_id, rn
ORDER BY doc_id, rn
""",
)
def grid_grib2_percentile_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERCENTILE forecasts (PDT 4.6 / 4.10 + statistical interval)
    through the REAL landing path — completing the operational
    ensemble-derived family (members 4.1/4.11, derived 4.2/4.12,
    probability 4.5/4.9, percentile 4.6/4.10), read by the reference
    through wgrib2 (/root/reference/src/file-conversions.js:49-51,
    76-112).  One multi-field message per document carries the
    10th/50th/90th instantaneous percentiles and a 4.10 75th
    percentile over a statistical interval; the landing schema's
    ``percentile_value`` column makes percentile selection a plain
    column filter on landed archives.

    The oracle pins the percentile octet per field, the NULL contract
    on statistical columns for instantaneous 4.6 records, the 4.10
    statistical block at +1 past 4.8's offset, and per-field payload
    sums.

    Scale: the landing posture — submessage splitting is section
    slicing; only per-record statistic rows shuffle.
    """
    from typing import Iterator

    import numpy as np
    import pandas as pd

    from ..grid.grib2 import encode_grib2_message, merge_grib2_fields
    from ..sources.grib_source import RECORD_SCHEMA, _decode_batches

    ids = (
        table(spark, sf_dir, "documents")
        .filter((F.col("doc_id") % 37 == 5) & (F.col("doc_id") < 645))
        .select("doc_id")
    )

    def synth(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                ni, nj = 4 + d % 2, 3 + d % 3
                i = np.arange(ni)[None, :]
                j = np.arange(nj)[:, None]

                def field(r: int) -> np.ndarray:
                    return (
                        80 + ((d * 7 + r * 11 + i * 3 + j * 5) % 45)
                    ).astype(np.float64)

                enc = dict(
                    category=1, number=8, reference_value=80.0, nbits=8
                )
                msgs = [
                    encode_grib2_message(field(r), **enc, percentile=p)
                    for r, p in ((0, 10), (1, 50), (2, 90))
                ]
                msgs.append(
                    encode_grib2_message(
                        field(3), **enc, percentile=75,
                        statistical=dict(
                            process=0,
                            interval_end=(2020, 1 + d % 12, 3, 12, 0),
                            range_hours=24,
                        ),
                    )
                )
                rows.append(
                    {"path": f"doc://{d}", "content": merge_grib2_fields(msgs)}
                )
            yield pd.DataFrame(rows)

    files = ids.mapInPandas(synth, schema="path string, content binary")
    records = files.mapInPandas(_decode_batches, schema=RECORD_SCHEMA)
    return records.select(
        F.regexp_extract("path", r"doc://(\d+)", 1).cast("bigint").alias("doc_id"),
        "record_number",
        "percentile_value",
        "statistical_process",
        "interval_end",
        "time_range_count",
        F.size("values").cast("bigint").alias("n_cells"),
        F.aggregate(
            "values", F.lit(0).cast("bigint"), lambda a, x: a + x.cast("bigint")
        ).alias("vsum"),
    ).orderBy("doc_id", "record_number")


@query(
    "grid_grib2_forecast_lead_scan",
    tags=("grid", "codec", "python", "ingest"),
    oracle="""
WITH g AS (
  SELECT doc_id,
         4 + doc_id % 3 AS ni,
         3 + doc_id % 2 AS nj
  FROM documents WHERE doc_id % 53 = 17 AND doc_id < 645
),
cells AS (
  SELECT doc_id, r.r + 1 AS rn,
         60 + ((doc_id * 3 + r.r * 7 + i.i * 11 + j.j * 2) % 50) AS v,
         CASE r.r WHEN 0 THEN 0
                  WHEN 1 THEN 6 + doc_id % 12
                  WHEN 2 THEN 3 * (2 + doc_id % 3)
                  WHEN 3 THEN 24 * (1 + doc_id % 5) END AS lead_h
  FROM g,
       UNNEST(generate_series(0, 3)) AS r(r),
       LATERAL (SELECT unnest(generate_series(0, ni - 1)) AS i) i,
       LATERAL (SELECT unnest(generate_series(0, nj - 1)) AS j) j
)
SELECT doc_id,
       CAST(rn AS INTEGER) AS record_number,
       CAST(lead_h AS INTEGER) AS forecast_hours,
       make_timestamp(2020, 1, 1, 0, 0, 0) + to_hours(lead_h) AS valid_time,
       CAST(CASE WHEN rn = 4 THEN 1 END AS INTEGER) AS statistical_process,
       CAST(COUNT(*) AS BIGINT) AS n_cells,
       CAST(SUM(v) AS BIGINT) AS vsum
FROM cells
GROUP BY doc_id, rn, lead_h
ORDER BY doc_id, rn
""",
)
def grid_grib2_forecast_lead_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORECAST LEAD TIME through the REAL landing path — octets 18-22
    of every 4.0-family product definition (unit from code table 4.4 +
    signed-magnitude value), the field that distinguishes GFS
    f000/f006/.../f384 products the reference reads through wgrib2
    (/root/reference/src/file-conversions.js:49-51,76-112).  One
    multi-field message per document carries an analysis (lead 0),
    an hour-unit lead, a 3-HOUR-unit lead (witnessing the code-table
    conversion — a decoder reading the value without the unit would be
    3x off) and a day-unit lead on a statistical 4.8 field (the lead
    octets precede octet 34, so they must NOT shift the statistical
    block).  ``valid_time`` is derived reftime + lead in BOTH engines,
    making lead-time selection and valid-time filtering plain column
    predicates on landed archives.

    Scale: the landing posture — submessage splitting is section
    slicing; only per-record statistic rows shuffle.
    """
    from typing import Iterator

    import numpy as np
    import pandas as pd

    from ..grid.grib2 import encode_grib2_message, merge_grib2_fields
    from ..sources.grib_source import RECORD_SCHEMA, _decode_batches

    ids = (
        table(spark, sf_dir, "documents")
        .filter((F.col("doc_id") % 53 == 17) & (F.col("doc_id") < 645))
        .select("doc_id")
    )

    def synth(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                ni, nj = 4 + d % 3, 3 + d % 2
                i = np.arange(ni)[None, :]
                j = np.arange(nj)[:, None]

                def field(r: int) -> np.ndarray:
                    return (
                        60 + ((d * 3 + r * 7 + i * 11 + j * 2) % 50)
                    ).astype(np.float64)

                enc = dict(
                    category=0, number=0, reference_value=60.0, nbits=8
                )
                msgs = [
                    encode_grib2_message(field(0), **enc),  # analysis
                    encode_grib2_message(
                        field(1), **enc,
                        forecast=dict(unit=1, value=6 + d % 12),
                    ),
                    encode_grib2_message(
                        field(2), **enc,
                        forecast=dict(unit=10, value=2 + d % 3),  # 3-hour
                    ),
                    encode_grib2_message(
                        field(3), **enc,
                        forecast=dict(unit=2, value=1 + d % 5),  # days
                        statistical=dict(
                            process=1,
                            interval_end=(2020, 2, 1, 0, 0),
                            range_hours=24,
                        ),
                    ),
                ]
                rows.append(
                    {"path": f"doc://{d}", "content": merge_grib2_fields(msgs)}
                )
            yield pd.DataFrame(rows)

    files = ids.mapInPandas(synth, schema="path string, content binary")
    records = files.mapInPandas(_decode_batches, schema=RECORD_SCHEMA)
    return records.select(
        F.regexp_extract("path", r"doc://(\d+)", 1).cast("bigint").alias("doc_id"),
        "record_number",
        "forecast_hours",
        F.expr(
            "timestampadd(HOUR, forecast_hours,"
            " make_timestamp(year, month, day, hour, 0, 0))"
        ).alias("valid_time"),
        "statistical_process",
        F.size("values").cast("bigint").alias("n_cells"),
        F.aggregate(
            "values", F.lit(0).cast("bigint"), lambda a, x: a + x.cast("bigint")
        ).alias("vsum"),
    ).orderBy("doc_id", "record_number")


@query(
    "grid_grib1_forecast_lead_scan",
    tags=("grid", "codec", "python", "ingest"),
    oracle="""
WITH g AS (
  SELECT doc_id,
         4 + doc_id % 3 AS ni,
         3 + doc_id % 2 AS nj
  FROM documents WHERE doc_id % 53 = 29 AND doc_id < 645
),
cells AS (
  SELECT doc_id, r.r + 1 AS rn,
         60 + ((doc_id * 3 + r.r * 7 + i.i * 11 + j.j * 2) % 50) AS v,
         CASE r.r WHEN 0 THEN 0
                  WHEN 1 THEN 12 * (1 + doc_id % 4)
                  WHEN 2 THEN 300 + doc_id % 90
                  WHEN 3 THEN doc_id % 4 END AS lead_h
  FROM g,
       UNNEST(generate_series(0, 3)) AS r(r),
       LATERAL (SELECT unnest(generate_series(0, ni - 1)) AS i) i,
       LATERAL (SELECT unnest(generate_series(0, nj - 1)) AS j) j
)
SELECT doc_id,
       CAST(rn AS INTEGER) AS record_number,
       CAST(lead_h AS INTEGER) AS forecast_hours,
       make_timestamp(2020, 1, 1, 0, 0, 0) + to_hours(lead_h) AS valid_time,
       CAST(CASE WHEN rn = 4 THEN 1 END AS INTEGER) AS statistical_process,
       CASE WHEN rn = 4 THEN make_timestamp(2020, 1, 1, 0, 0, 0)
                            + to_hours(doc_id % 4 + 6) END AS interval_end,
       CAST(COUNT(*) AS BIGINT) AS n_cells,
       CAST(SUM(v) AS BIGINT) AS vsum
FROM cells
GROUP BY doc_id, rn, lead_h
ORDER BY doc_id, rn
""",
)
def grid_grib1_forecast_lead_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GRIB EDITION-1 forecast lead times through the REAL landing path
    — PDS octets 18-21 (code-table-4 unit, P1, P2, time range
    indicator), the fields that distinguish an ERA5 analysis from a
    forecast step in the edition-1 downloads the reference feeds to
    wgrib (/root/reference/src/file-conversions.js:114-127).  One
    4-record file per document carries an analysis (TRI 0, lead 0), a
    12-HOUR-unit lead (witnessing the code-table multiply — a decoder
    reading P1 without the unit would be 12x off), a >255-hour lead in
    the TRI-10 layout (P1 spans octets 19-20 — the GFS f384 case a
    1-octet reader truncates) and a TRI-4 accumulation whose P1/P2
    interval lands as the SAME statistical_process / interval_end
    columns GRIB2's template 4.8 uses (process normalized to
    code-table-4.10 numbering) — so lead-time selection, valid-time
    arithmetic and accumulation filtering are identical column
    predicates across editions on mixed archives.

    Scale: the landing posture — one decode task per file batch; only
    per-record statistic rows shuffle.
    """
    from typing import Iterator

    import numpy as np
    import pandas as pd

    from ..grid.grib1 import encode_grib1_message
    from ..sources.grib_source import RECORD_SCHEMA, _decode_batches

    ids = (
        table(spark, sf_dir, "documents")
        .filter((F.col("doc_id") % 53 == 29) & (F.col("doc_id") < 645))
        .select("doc_id")
    )

    def synth(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                ni, nj = 4 + d % 3, 3 + d % 2
                i = np.arange(ni)[None, :]
                j = np.arange(nj)[:, None]

                def field(r: int) -> np.ndarray:
                    return (
                        60 + ((d * 3 + r * 7 + i * 11 + j * 2) % 50)
                    ).astype(np.float64)

                enc = dict(reference_value=60.0, nbits=8)
                msgs = [
                    encode_grib1_message(field(0), **enc),  # analysis
                    encode_grib1_message(
                        field(1), **enc,
                        forecast=dict(unit=12, value=1 + d % 4),  # 12-hour
                    ),
                    encode_grib1_message(
                        field(2), **enc,
                        forecast=dict(unit=1, value=300 + d % 90),  # TRI 10
                    ),
                    encode_grib1_message(
                        field(3), **enc,
                        statistical=dict(
                            process=1, start=d % 4, end=d % 4 + 6
                        ),
                    ),
                ]
                rows.append(
                    {"path": f"doc://{d}", "content": b"".join(msgs)}
                )
            yield pd.DataFrame(rows)

    files = ids.mapInPandas(synth, schema="path string, content binary")
    records = files.mapInPandas(_decode_batches, schema=RECORD_SCHEMA)
    return records.select(
        F.regexp_extract("path", r"doc://(\d+)", 1).cast("bigint").alias("doc_id"),
        "record_number",
        "forecast_hours",
        F.expr(
            "timestampadd(HOUR, forecast_hours,"
            " make_timestamp(year, month, day, hour, 0, 0))"
        ).alias("valid_time"),
        "statistical_process",
        "interval_end",
        F.size("values").cast("bigint").alias("n_cells"),
        F.aggregate(
            "values", F.lit(0).cast("bigint"), lambda a, x: a + x.cast("bigint")
        ).alias("vsum"),
    ).orderBy("doc_id", "record_number")


@query(
    "grid_grib_layer_scan",
    tags=("grid", "codec", "python", "ingest"),
    oracle="""
WITH g AS (
  SELECT doc_id,
         4 + doc_id % 3 AS ni,
         3 + doc_id % 2 AS nj
  FROM documents WHERE doc_id % 53 = 41 AND doc_id < 645
),
cells AS (
  SELECT doc_id, r.r + 1 AS rn,
         60 + ((doc_id * 3 + r.r * 7 + i.i * 11 + j.j * 2) % 50) AS v
  FROM g,
       UNNEST(generate_series(0, 3)) AS r(r),
       LATERAL (SELECT unnest(generate_series(0, ni - 1)) AS i) i,
       LATERAL (SELECT unnest(generate_series(0, nj - 1)) AS j) j
)
SELECT doc_id,
       CAST(rn AS INTEGER) AS record_number,
       CAST(CASE WHEN rn <= 2 THEN 2 ELSE 1 END AS INTEGER) AS edition,
       CAST(CASE rn WHEN 1 THEN 100 WHEN 2 THEN 106
                    WHEN 3 THEN 100 WHEN 4 THEN 112 END AS INTEGER)
         AS level_type,
       CAST(CASE rn WHEN 1 THEN 850 + doc_id % 100 WHEN 2 THEN 0
                    WHEN 3 THEN 500 + doc_id % 200
                    WHEN 4 THEN doc_id % 20 END AS INTEGER) AS level,
       CAST(CASE rn WHEN 2 THEN 106 WHEN 4 THEN 112 END AS INTEGER)
         AS level2_type,
       CAST(CASE rn WHEN 2 THEN 10 * (1 + doc_id % 3)
                    WHEN 4 THEN doc_id % 20 + 10 END AS INTEGER) AS level2,
       CAST(COUNT(*) AS BIGINT) AS n_cells,
       CAST(SUM(v) AS BIGINT) AS vsum
FROM cells
GROUP BY doc_id, rn
ORDER BY doc_id, rn
""",
)
def grid_grib_layer_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAYER products through the REAL landing path, BOTH editions —
    the level surface the reference's wgrib/wgrib2 invocations print as
    "0-10 cm down" (/root/reference/src/file-conversions.js:49-51,
    114-127).  GRIB2 template 4.0's SECOND fixed surface (octets 29-34,
    coded missing on point levels) and GRIB1's code-table-3 layer level
    types (octets 11-12 split as top/bottom for types like 112) both
    land on unified ``level2_type``/``level2`` columns, NULL on point
    levels — so "is a layer" and "which layer" are plain column
    predicates on mixed-edition archives.  Each document's file mixes a
    GRIB2 isobaric point level, a GRIB2 soil layer whose second surface
    uses a NEGATIVE signed-magnitude scale factor (value x 10 — a
    two's-complement or sign-blind reader lands a wrong bottom), a
    GRIB1 16-bit point level (witnessing the split is NOT applied to
    point types) and a GRIB1 type-112 depth layer (witnessing it IS
    applied — folding octets 11-12 into one 16-bit number would
    fabricate "level 10" from a 0-10 cm layer).

    Scale: the landing posture — decode is one embarrassingly parallel
    Arrow stage; only per-record statistic rows shuffle.
    """
    from typing import Iterator

    import numpy as np
    import pandas as pd

    from ..grid.grib1 import encode_grib1_message
    from ..grid.grib2 import encode_grib2_message
    from ..sources.grib_source import RECORD_SCHEMA, _decode_batches

    ids = (
        table(spark, sf_dir, "documents")
        .filter((F.col("doc_id") % 53 == 41) & (F.col("doc_id") < 645))
        .select("doc_id")
    )

    def synth(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                ni, nj = 4 + d % 3, 3 + d % 2
                i = np.arange(ni)[None, :]
                j = np.arange(nj)[:, None]

                def field(r: int) -> np.ndarray:
                    return (
                        60 + ((d * 3 + r * 7 + i * 11 + j * 2) % 50)
                    ).astype(np.float64)

                enc2 = dict(
                    category=0, number=0, reference_value=60.0, nbits=8
                )
                enc1 = dict(reference_value=60.0, nbits=8)
                msgs = [
                    encode_grib2_message(
                        field(0), **enc2,
                        level_type=100, level_value=850 + d % 100,
                    ),
                    encode_grib2_message(
                        field(1), **enc2,
                        level_type=106, level_value=0,
                        level2=dict(type=106, scale=-1, value=1 + d % 3),
                    ),
                    encode_grib1_message(
                        field(2), **enc1,
                        level_type=100, level=500 + d % 200,
                    ),
                    encode_grib1_message(
                        field(3), **enc1,
                        level_type=112, level=d % 20, level2=d % 20 + 10,
                    ),
                ]
                rows.append(
                    {"path": f"doc://{d}", "content": b"".join(msgs)}
                )
            yield pd.DataFrame(rows)

    files = ids.mapInPandas(synth, schema="path string, content binary")
    records = files.mapInPandas(_decode_batches, schema=RECORD_SCHEMA)
    return records.select(
        F.regexp_extract("path", r"doc://(\d+)", 1).cast("bigint").alias("doc_id"),
        "record_number",
        "edition",
        "level_type",
        "level",
        "level2_type",
        "level2",
        F.size("values").cast("bigint").alias("n_cells"),
        F.aggregate(
            "values", F.lit(0).cast("bigint"), lambda a, x: a + x.cast("bigint")
        ).alias("vsum"),
    ).orderBy("doc_id", "record_number")


@query(
    "grid_grib_match_lead_scan",
    tags=("grid", "codec", "python", "ingest"),
    oracle="""
WITH g AS (
  SELECT doc_id,
         4 + doc_id % 3 AS ni,
         3 + doc_id % 2 AS nj
  FROM documents WHERE doc_id % 53 = 5 AND doc_id < 645
),
cells AS (
  SELECT doc_id, r.r + 1 AS rn,
         60 + ((doc_id * 3 + r.r * 7 + i.i * 11 + j.j * 2) % 50) AS v
  FROM g,
       UNNEST(generate_series(1, 2)) AS r(r),
       LATERAL (SELECT unnest(generate_series(0, ni - 1)) AS i) i,
       LATERAL (SELECT unnest(generate_series(0, nj - 1)) AS j) j
)
SELECT doc_id,
       CAST(rn AS INTEGER) AS record_number,
       CAST(CASE rn WHEN 2 THEN 2 WHEN 3 THEN 1 END AS INTEGER) AS edition,
       CAST(6 AS INTEGER) AS forecast_hours,
       CAST(COUNT(*) AS BIGINT) AS n_cells,
       CAST(SUM(v) AS BIGINT) AS vsum
FROM cells
GROUP BY doc_id, rn
ORDER BY doc_id, rn
""",
)
def grid_grib_match_lead_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """wgrib2-style ``-match`` on FORECAST LEAD, header-side — the
    inventory line now carries the converted lead as a trailing
    ``:f{hours}``, so "give me the 6-hour forecasts" is a regex the
    landing scan applies BEFORE any value bit unpacks (the reference's
    wgrib2 -match contract, /root/reference/src/file-conversions.js:
    76-99).  Each document's mixed-edition file carries an analysis
    (f0), a GRIB2 hour-unit f6, a GRIB1 f6 coded in the 3-HOUR unit
    (value 2 — matching must happen on the CONVERTED hours, or the
    regex would see f2) and a GRIB1 18-hour record whose BDS carries a
    spherical-harmonics flag the decoder rejects loudly — the scan with
    ``match=":f6$"`` must select exactly the two f6 records AND never
    decode the poisoned one, proving the filter runs header-side
    (a decode-then-filter engine crashes here).  Record numbers stay
    the file positions (2 and 3), wgrib2's N.M numbering contract.

    Scale: at 100 TB this is THE archive-subsetting path — headers are
    a few hundred bytes per record, so a lead/level/parameter match
    reads ~0.1% of the bytes a full decode would.
    """
    from functools import partial
    from typing import Iterator

    import numpy as np
    import pandas as pd

    from ..grid.grib1 import encode_grib1_message
    from ..grid.grib2 import encode_grib2_message
    from ..sources.grib_source import RECORD_SCHEMA, _decode_batches

    ids = (
        table(spark, sf_dir, "documents")
        .filter((F.col("doc_id") % 53 == 5) & (F.col("doc_id") < 645))
        .select("doc_id")
    )

    def synth(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                ni, nj = 4 + d % 3, 3 + d % 2
                i = np.arange(ni)[None, :]
                j = np.arange(nj)[:, None]

                def field(r: int) -> np.ndarray:
                    return (
                        60 + ((d * 3 + r * 7 + i * 11 + j * 2) % 50)
                    ).astype(np.float64)

                enc2 = dict(
                    category=0, number=0, reference_value=60.0, nbits=8
                )
                enc1 = dict(reference_value=60.0, nbits=8)
                poisoned = bytearray(
                    encode_grib1_message(
                        field(3), **enc1, forecast=dict(unit=1, value=18)
                    )
                )
                # Flip the BDS flags to "spherical harmonic coefficients"
                # (bit 1 of octet 4): headers still inventory fine, but
                # any attempt to DECODE this record stops loudly — so a
                # scan that only yields the matched records proves the
                # match ran header-side.
                pds_len = int.from_bytes(poisoned[8:11], "big")
                gds_off = 8 + pds_len
                bds_off = gds_off + int.from_bytes(
                    poisoned[gds_off : gds_off + 3], "big"
                )
                poisoned[bds_off + 3] |= 0x80
                msgs = [
                    encode_grib2_message(field(0), **enc2),  # analysis f0
                    encode_grib2_message(
                        field(1), **enc2, forecast=dict(unit=1, value=6)
                    ),
                    encode_grib1_message(
                        field(2), **enc1,
                        forecast=dict(unit=10, value=2),  # 3-hour unit → f6
                    ),
                    bytes(poisoned),  # f18, undecodable
                ]
                rows.append(
                    {"path": f"doc://{d}", "content": b"".join(msgs)}
                )
            yield pd.DataFrame(rows)

    files = ids.mapInPandas(synth, schema="path string, content binary")
    records = files.mapInPandas(
        partial(_decode_batches, match=r":f6$"), schema=RECORD_SCHEMA
    )
    return records.select(
        F.regexp_extract("path", r"doc://(\d+)", 1).cast("bigint").alias("doc_id"),
        "record_number",
        "edition",
        "forecast_hours",
        F.size("values").cast("bigint").alias("n_cells"),
        F.aggregate(
            "values", F.lit(0).cast("bigint"), lambda a, x: a + x.cast("bigint")
        ).alias("vsum"),
    ).orderBy("doc_id", "record_number")


@query(
    "grid_grib1_gaussian_scan",
    tags=("grid", "codec", "python", "ingest"),
    oracle=f"""
WITH g AS (
  SELECT doc_id,
         4 + doc_id % 3 AS n,
         9 + doc_id % 5 AS ni,
         3 + doc_id % 2 AS nj1
  FROM documents WHERE doc_id % 11 = 7 AND doc_id < 440
),
lat(n, j, lat_udeg) AS (
  VALUES {_gauss_lat_values_sql()}
),
cells1 AS (
  SELECT doc_id, 1 AS rn,
         60 + ((doc_id * 3 + i.i * 11 + j.j * 2) % 50) AS v,
         CAST((60000 - j.j * 1000) AS BIGINT) * 1000 AS lat_udeg
  FROM g,
       LATERAL (SELECT unnest(generate_series(0, ni - 1)) AS i) i,
       LATERAL (SELECT unnest(generate_series(0, nj1 - 1)) AS j) j
),
cells2 AS (
  SELECT doc_id, 2 AS rn,
         60 + ((doc_id * 3 + 7 + i.i * 11 + j.j * 2) % 50) AS v,
         l.lat_udeg
  FROM g,
       LATERAL (SELECT unnest(generate_series(0, ni - 1)) AS i) i,
       LATERAL (SELECT unnest(generate_series(0, 2 * n - 1)) AS j) j,
       lat l
  WHERE l.n = g.n AND l.j = j.j
),
cells AS (
  SELECT * FROM cells1 UNION ALL SELECT * FROM cells2
)
SELECT doc_id,
       CAST(rn AS INTEGER) AS record_number,
       CAST(COUNT(*) AS BIGINT) AS n_cells,
       CAST(SUM(v) AS BIGINT) AS vsum,
       CAST(MAX(lat_udeg) AS BIGINT) AS lat_max_udeg,
       CAST(SUM(v * lat_udeg) AS BIGINT) AS latvsum
FROM cells
GROUP BY doc_id, rn
ORDER BY doc_id, rn
""",
)
def grid_grib1_gaussian_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GRIB EDITION-1 GAUSSIAN grids (data representation type 4 — the
    ECMWF F-grid geometry in its edition-1 form) through the REAL
    landing path and the unified CELL explode.  GDS octets 26-27 carry
    N (parallels pole→equator) instead of Dj; the engine recomputes the
    exact Legendre quadrature latitudes (grid/grib2.py::
    gaussian_latitudes, shared across editions) and the landing record
    carries them in integer microdegrees with the affine latitude
    georef NULL — never a fabricated dlat.  Per document one file mixes
    a regular lat/lon record (affine latitudes witnessed closed-form)
    with a global F(4 + d%3) Gaussian record; ``grib1_cells`` serves
    both through the same lat_udeg column.

    Witness independence: the oracle's Gaussian latitude table comes
    from numpy's Gauss-Legendre roots (a SECOND root finder) rounded to
    integer microdegrees; ``lat_max_udeg`` pins the first parallel and
    the payload-weighted ``latvsum`` pins every row-to-latitude
    assignment exactly (integer compare, no float tolerance).

    Scale: the landing posture — decode and explode are one Arrow +
    JVM stage; only per-record statistic rows shuffle.
    """
    from typing import Iterator

    import numpy as np
    import pandas as pd

    from ..grid.grib1 import encode_grib1_message
    from ..sources.grib_source import (
        RECORD_SCHEMA,
        _decode_batches,
        grib1_cells,
    )

    ids = (
        table(spark, sf_dir, "documents")
        .filter((F.col("doc_id") % 11 == 7) & (F.col("doc_id") < 440))
        .select("doc_id")
    )

    def synth(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                n = 4 + d % 3
                ni, nj1 = 9 + d % 5, 3 + d % 2
                i = np.arange(ni)[None, :]

                def field(r: int, nj: int) -> np.ndarray:
                    j = np.arange(nj)[:, None]
                    return (
                        60 + ((d * 3 + r * 7 + i * 11 + j * 2) % 50)
                    ).astype(np.float64)

                enc = dict(reference_value=60.0, nbits=8)
                msgs = [
                    encode_grib1_message(
                        field(0, nj1), **enc,
                        lat_first_mdeg=60_000, dlat_mdeg=1_000,
                    ),
                    encode_grib1_message(field(1, 2 * n), **enc, gaussian=True),
                ]
                rows.append(
                    {"path": f"doc://{d}", "content": b"".join(msgs)}
                )
            yield pd.DataFrame(rows)

    files = ids.mapInPandas(synth, schema="path string, content binary")
    cells = grib1_cells(
        files.mapInPandas(_decode_batches, schema=RECORD_SCHEMA)
    )
    return (
        cells.groupBy(
            F.regexp_extract("path", r"doc://(\d+)", 1)
            .cast("bigint")
            .alias("doc_id"),
            "record_number",
        )
        .agg(
            F.count(F.lit(1)).alias("n_cells"),
            F.sum(F.col("value").cast("bigint")).alias("vsum"),
            F.max("lat_udeg").alias("lat_max_udeg"),
            F.sum(F.col("value").cast("bigint") * F.col("lat_udeg")).alias(
                "latvsum"
            ),
        )
        .orderBy("doc_id", "record_number")
    )


def _unrotate_trig(rlat, rlon, sp_lat, sp_lon, angle):
    """Rotated → true coordinates by the DIRECT spherical formulas
    (arcsin/atan2) under the codec's documented eccodes/COSMO
    convention (rotated north pole = antipode of the coded southern
    pole; the angle adds to the rotated longitude before the tilt;
    true longitudes measured from the coded southern-pole longitude —
    rotated (0°, 0°) under pole (−40°, 10°E) is true (50°N, 10°E)).
    This is the oracle-side SECOND formulation of
    grib2.rotated_unrotate's matrix composition — engine-vs-
    formulation independence, like the Snyder/isometric Lambert
    pair."""
    import math

    lam2 = math.radians(rlon + angle)
    phi = math.radians(rlat)
    phi_n = math.radians(-sp_lat)
    lat = math.degrees(
        math.asin(
            math.sin(phi) * math.sin(phi_n)
            + math.cos(phi) * math.cos(lam2) * math.cos(phi_n)
        )
    )
    y = math.cos(phi) * math.sin(lam2)
    x = (
        math.cos(phi) * math.cos(lam2) * math.sin(phi_n)
        - math.sin(phi) * math.cos(phi_n)
    )
    lon = sp_lon + math.degrees(math.atan2(y, x))
    lon = (lon + 180.0) % 360.0 - 180.0
    return lat, lon


def _rotated_params(d: int) -> dict:
    return dict(
        south_pole_lat=-(25 + d % 15),
        south_pole_lon=(d % 37) - 18,
        angle=(d % 5) - 2,
    )


def _rotated_corner_values_sql() -> str:
    """(doc_id, anchor/far-corner true lat/lon in µdeg) from the direct
    trig formulation."""
    rows = []
    for d in range(0, 500):
        if d % 17 != 11:
            continue
        ni, nj = 7 + d % 4, 4 + d % 3
        p = _rotated_params(d)
        la1, lo1 = 8.0 + d % 6, -(10.0 + d % 9)
        a_lat, a_lon = _unrotate_trig(
            la1, lo1, p["south_pole_lat"], p["south_pole_lon"], p["angle"]
        )
        c_lat, c_lon = _unrotate_trig(
            la1 - (nj - 1) * 0.5, lo1 + (ni - 1) * 0.5,
            p["south_pole_lat"], p["south_pole_lon"], p["angle"],
        )
        rows.append(
            f"({d}, {int(round(a_lat * 1e6))}, {int(round(a_lon * 1e6))}, "
            f"{int(round(c_lat * 1e6))}, {int(round(c_lon * 1e6))})"
        )
    return ",\n       ".join(rows)


@query(
    "grid_grib2_rotated_decode",
    tags=("grid", "codec", "python", "ingest"),
    oracle=f"""
WITH g AS (
  SELECT doc_id,
         7 + doc_id % 4 AS ni,
         4 + doc_id % 3 AS nj
  FROM documents WHERE doc_id % 17 = 11 AND doc_id < 500
),
corner(doc_id, a_lat_udeg, a_lon_udeg, c_lat_udeg, c_lon_udeg) AS (
  VALUES {_rotated_corner_values_sql()}
),
cells AS (
  SELECT doc_id, ni, nj,
         70 + ((doc_id * 3 + i.i * 11 + j.j * 2) % 50) AS v,
         j.j * ni + i.i AS pos
  FROM g,
       LATERAL (SELECT unnest(generate_series(0, ni - 1)) AS i) i,
       LATERAL (SELECT unnest(generate_series(0, nj - 1)) AS j) j
)
SELECT c.doc_id,
       CAST(1 AS INTEGER) AS grid_tmpl,
       CAST(COUNT(*) AS BIGINT) AS n_cells,
       CAST(SUM(c.v) AS BIGINT) AS vsum,
       CAST(SUM(c.v * c.pos) AS BIGINT) AS wsum,
       CAST(MIN(k.a_lat_udeg) AS BIGINT) AS lat0_udeg,
       CAST(MIN(k.a_lon_udeg) AS BIGINT) AS lon0_udeg,
       CAST(MIN(k.c_lat_udeg) AS BIGINT) AS corner_lat_udeg,
       CAST(MIN(k.c_lon_udeg) AS BIGINT) AS corner_lon_udeg
FROM cells c JOIN corner k ON k.doc_id = c.doc_id
GROUP BY c.doc_id
ORDER BY c.doc_id
""",
)
def grid_grib2_rotated_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GRIB2 ROTATED lat/lon decode (grid template 3.1) — the regional
    geometry COSMO / HIRLAM-family archives ship, read by the
    reference through wgrib2 (/root/reference/src/file-conversions.js:
    49-51,76-112).  One record per selected document on a pole that
    varies per document (latitude, longitude AND rotation angle,
    including negative angles and γ=0), half of them stored
    south-first (scanning 0x40 normalizes in ROTATED latitude); the
    engine recovers per-cell TRUE coordinates through the matrix
    unrotation (grid/grib2.py::rotated_unrotate), lazily and
    vectorized, with the affine fields never masquerading as
    geography.

    Witness independence: the oracle embeds anchor and far-corner true
    coordinates from the DIRECT arcsin/atan2 spherical formulation (a
    second implementation path) in integer microdegrees; ``wsum``
    keeps the payload raster-order sensitive, so a row flip or a
    mis-tilted pole cannot cancel.  Completes the grid-template family
    3.0/3.1/3.10/3.20/3.30/3.40.

    Scale: codec-query posture — bytes executor-side, statistic rows
    shuffle, O(cells) vectorized trig in the Arrow stage.
    """
    from typing import Iterator

    import numpy as np
    import pandas as pd

    from ..grid.grib2 import decode_grib2, encode_grib2_message, iter_messages2

    ids = (
        table(spark, sf_dir, "documents")
        .filter((F.col("doc_id") % 17 == 11) & (F.col("doc_id") < 500))
        .select("doc_id")
    )

    def synth(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                ni, nj = 7 + d % 4, 4 + d % 3
                i = np.arange(ni)[None, :]
                j = np.arange(nj)[:, None]
                v = (70 + ((d * 3 + i * 11 + j * 2) % 50)).astype(np.float64)
                msg = encode_grib2_message(
                    v,
                    rotated=_rotated_params(d),
                    lat_first_udeg=(8 + d % 6) * 1_000_000,
                    lon_first_udeg=-(10 + d % 9) * 1_000_000,
                    dlat_udeg=500_000,
                    dlon_udeg=500_000,
                    scanning_mode=0x40 if d % 2 else 0x00,
                    reference_value=70.0,
                    nbits=8,
                )
                rows.append({"doc_id": d, "grib": msg})
            yield pd.DataFrame(rows)

    def decode(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            rows = []
            for doc_id, buf in zip(pdf["doc_id"], pdf["grib"]):
                d = int(doc_id)
                for msg in iter_messages2(bytes(buf)):
                    rec = decode_grib2(msg)
                    rows.append(
                        {
                            "doc_id": d,
                            "grid_tmpl": rec.grid_template,
                            "values": rec.values.reshape(-1).tolist(),
                            "lat0": float(rec.cell_lats_deg[0, 0]),
                            "lon0": float(rec.cell_lons_deg[0, 0]),
                            "corner_lat": float(rec.cell_lats_deg[-1, -1]),
                            "corner_lon": float(rec.cell_lons_deg[-1, -1]),
                        }
                    )
            yield pd.DataFrame(rows)

    files = ids.mapInPandas(synth, schema="doc_id bigint, grib binary")
    decoded = files.mapInPandas(
        decode,
        schema=(
            "doc_id bigint, grid_tmpl int, values array<double>, "
            "lat0 double, lon0 double, corner_lat double, corner_lon double"
        ),
    )
    return _projected_stats(decoded, ("doc_id", "grid_tmpl"))


def _grib1_rotated_cells_values_sql() -> str:
    """(doc_id, i, j, true lat/lon in µdeg) for every cell of each
    selected document's rotated record, from the direct trig
    formulation (_unrotate_trig) — the oracle-side second
    implementation of the codec's matrix unrotation."""
    rows = []
    for d in range(0, 500):
        if d % 17 != 3:
            continue
        ni, nj = 7 + d % 4, 4 + d % 3
        p = _rotated_params(d)
        la1, lo1 = 8.0 + d % 6, -(10.0 + d % 9)
        for j in range(nj):
            for i in range(ni):
                lat, lon = _unrotate_trig(
                    la1 - j * 0.5, lo1 + i * 0.5,
                    p["south_pole_lat"], p["south_pole_lon"], p["angle"],
                )
                rows.append(
                    f"({d}, {i}, {j}, "
                    f"{int(round(lat * 1e6))}, {int(round(lon * 1e6))})"
                )
    return ",\n       ".join(rows)


@query(
    "grid_grib1_rotated_scan",
    tags=("grid", "codec", "python", "ingest"),
    oracle=f"""
WITH g AS (
  SELECT doc_id,
         7 + doc_id % 4 AS ni,
         4 + doc_id % 3 AS nj
  FROM documents WHERE doc_id % 17 = 3 AND doc_id < 500
),
rot(doc_id, i, j, lat_udeg, lon_udeg) AS (
  VALUES {_grib1_rotated_cells_values_sql()}
),
cells1 AS (
  SELECT doc_id, 1 AS rn,
         60 + ((doc_id * 3 + i.i * 11 + j.j * 2) % 50) AS v,
         CAST((60000 - j.j * 1000) AS BIGINT) * 1000 AS lat_udeg,
         CAST(i.i * 1000 AS BIGINT) * 1000 AS lon_udeg
  FROM g,
       LATERAL (SELECT unnest(generate_series(0, ni - 1)) AS i) i,
       LATERAL (SELECT unnest(generate_series(0, nj - 1)) AS j) j
),
cells2 AS (
  SELECT g.doc_id, 2 AS rn,
         60 + ((g.doc_id * 3 + 7 + r.i * 11 + r.j * 2) % 50) AS v,
         r.lat_udeg, r.lon_udeg
  FROM g JOIN rot r ON r.doc_id = g.doc_id
),
cells AS (
  SELECT * FROM cells1 UNION ALL SELECT * FROM cells2
)
SELECT doc_id,
       CAST(rn AS INTEGER) AS record_number,
       CAST(COUNT(*) AS BIGINT) AS n_cells,
       CAST(SUM(v) AS BIGINT) AS vsum,
       CAST(SUM(v * lat_udeg) AS BIGINT) AS latvsum,
       CAST(SUM(v * lon_udeg) AS BIGINT) AS lonvsum
FROM cells
GROUP BY doc_id, rn
ORDER BY doc_id, rn
""",
)
def grid_grib1_rotated_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GRIB EDITION-1 ROTATED lat/lon grids (data representation type
    10 — the COSMO/HIRLAM edition-1 form) through the REAL landing
    path and the unified CELL explode.  The type-0 axes are
    coordinates IN THE ROTATED SYSTEM; octets 33-42 append the south
    pole (signed-magnitude mdeg) and the rotation angle (IBM 32-bit
    float).  The record lands like the GRIB2 template-3.1 family:
    affine georef NULL — rotated axes never masquerade as geography —
    and true per-cell coordinates (the SAME cross-edition unrotation,
    grib2.rotated_unrotate) ride the cell arrays that ``grib1_cells``
    serves through the unified lat_udeg/lon_udeg columns, beside a
    regular lat/lon record witnessed closed-form.

    Witness independence: the oracle embeds EVERY rotated cell's true
    coordinates from the direct arcsin/atan2 spherical formulation;
    the payload-weighted ``latvsum``/``lonvsum`` pin each cell's
    coordinate-to-value assignment exactly (integer compare), so a row
    flip, a mis-tilted pole or a wrong IBM-float angle cannot cancel.

    Scale: the landing posture — decode + unrotation are one
    embarrassingly parallel Arrow stage (O(cells) vectorized trig);
    only per-record statistic rows shuffle.
    """
    from typing import Iterator

    import numpy as np
    import pandas as pd

    from ..grid.grib1 import encode_grib1_message
    from ..sources.grib_source import (
        RECORD_SCHEMA,
        _decode_batches,
        grib1_cells,
    )

    ids = (
        table(spark, sf_dir, "documents")
        .filter((F.col("doc_id") % 17 == 3) & (F.col("doc_id") < 500))
        .select("doc_id")
    )

    def synth(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                ni, nj = 7 + d % 4, 4 + d % 3
                i = np.arange(ni)[None, :]
                j = np.arange(nj)[:, None]

                def field(r: int) -> np.ndarray:
                    return (
                        60 + ((d * 3 + r * 7 + i * 11 + j * 2) % 50)
                    ).astype(np.float64)

                enc = dict(reference_value=60.0, nbits=8)
                p = _rotated_params(d)
                msgs = [
                    encode_grib1_message(
                        field(0), **enc,
                        lat_first_mdeg=60_000, dlat_mdeg=1_000,
                    ),
                    encode_grib1_message(
                        field(1), **enc,
                        lat_first_mdeg=(8 + d % 6) * 1000,
                        lon_first_mdeg=-(10 + d % 9) * 1000,
                        dlat_mdeg=500, dlon_mdeg=500,
                        scanning_mode=0x40 if d % 2 else 0x00,
                        rotated=p,
                    ),
                ]
                rows.append(
                    {"path": f"doc://{d}", "content": b"".join(msgs)}
                )
            yield pd.DataFrame(rows)

    files = ids.mapInPandas(synth, schema="path string, content binary")
    cells = grib1_cells(
        files.mapInPandas(_decode_batches, schema=RECORD_SCHEMA)
    )
    return (
        cells.groupBy(
            F.regexp_extract("path", r"doc://(\d+)", 1)
            .cast("bigint")
            .alias("doc_id"),
            "record_number",
        )
        .agg(
            F.count(F.lit(1)).alias("n_cells"),
            F.sum(F.col("value").cast("bigint")).alias("vsum"),
            F.sum(F.col("value").cast("bigint") * F.col("lat_udeg")).alias(
                "latvsum"
            ),
            F.sum(F.col("value").cast("bigint") * F.col("lon_udeg")).alias(
                "lonvsum"
            ),
        )
        .orderBy("doc_id", "record_number")
    )


# --- spherical-harmonic (SPECTRAL) records, both editions --------------------
# Per selected document a triangular T-spectrum (T = 3 + d % 4) with
# integer coefficients, k = 0 .. (T+1)(T+2)/2 - 1 in mode-1 order:
#   re_k = ((d*7 + k*13) mod 101) - 50
#   im_k = 0 for k <= T (the m = 0 block of a real field), else
#          ((d*5 + k*11) mod 101) - 50
# encoded as BOTH editions' spectral form (GRIB1 GDS type 50 + the BDS
# spherical-harmonics flag; GRIB2 templates 3.50 + 5.50) in one mixed
# buffer.


def _spectral_coeffs(d: int, t: int, pa: int, pb: int, pc: int, pd_: int, mod: int):
    """The deterministic integer spectrum both the engine-side synth
    and the oracle SQL restate — the FIXTURE, not the witness."""
    import numpy as np

    npairs = (t + 1) * (t + 2) // 2
    k = np.arange(npairs)
    re = ((d * pa + k * pb) % mod) - mod // 2
    im = np.where(k <= t, 0, ((d * pc + k * pd_) % mod) - mod // 2)
    return (re + 1j * im).astype(complex)


@query(
    "grid_grib_spectral_roundtrip",
    tags=("grid", "codec", "python", "ingest"),
    oracle="""
WITH g AS (
  SELECT doc_id, 3 + doc_id % 4 AS t
  FROM documents WHERE doc_id % 13 = 5 AND doc_id < 500
),
k AS (
  SELECT doc_id, t, k.k AS k,
         ((doc_id * 7 + k.k * 13) % 101) - 50 AS re,
         CASE WHEN k.k <= t THEN 0
              ELSE ((doc_id * 5 + k.k * 11) % 101) - 50 END AS im
  FROM g,
       LATERAL (
         SELECT unnest(generate_series(0, (t + 1) * (t + 2) // 2 - 1)) AS k
       ) k
)
SELECT k.doc_id,
       CAST(e.e AS INTEGER) AS edition,
       CAST(MIN(t) AS INTEGER) AS truncation,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(re) AS BIGINT) AS re_sum,
       CAST(SUM(im) AS BIGINT) AS im_sum,
       CAST(SUM((k + 1) * re) AS BIGINT) AS re_wsum,
       CAST(SUM((k + 1) * im) AS BIGINT) AS im_wsum
FROM k, UNNEST(generate_series(1, 2)) AS e(e)
GROUP BY k.doc_id, e.e
ORDER BY doc_id, edition
""",
)
def grid_grib_spectral_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPHERICAL-HARMONIC records decoded from BOTH GRIB editions —
    the spectral form ERA5/IFS native archives ship for dynamics
    variables (the boundary the engine previously rejected loudly;
    wgrib2 lists and extracts such records).  One mixed buffer per
    selected document holds the SAME triangular T-spectrum as a GRIB1
    message (GDS type 50, the BDS spherical-harmonics flag, the (0,0)
    real part unpacked as an IBM-32 float at BDS octets 12-15) and a
    GRIB2 message (grid template 3.50 + data representation 5.50, the
    (0,0) real part as an IEEE-32 in the template); the scan dispatches
    per message on the edition octet and recovers the complex
    coefficient sequence EXACTLY (integer coefficients, E = D = 0).

    Witness: per (document, edition) the coefficient count, plain and
    position-weighted sums of the real and imaginary parts — exact
    BIGINT compare, so a flipped re/im interleave, a dropped (0,0)
    coefficient, a wrong truncation or an edition-specific off-by-one
    in the unpacked-first-value layout cannot cancel.  Both editions
    must agree with the SAME closed form.

    Scale: codec-query posture — bytes stay executor-side in one Arrow
    stage, only per-record statistic rows shuffle; header cost is a
    few hundred bytes and the coefficient unpack is vectorized numpy.
    """
    from typing import Iterator

    import pandas as pd

    from ..grid.grib1 import decode_grib1, encode_grib1_message
    from ..grid.grib2 import decode_grib2, encode_grib2_message
    from ..sources.grib_source import iter_grib_messages

    ids = (
        table(spark, sf_dir, "documents")
        .filter((F.col("doc_id") % 13 == 5) & (F.col("doc_id") < 500))
        .select("doc_id")
    )

    def synth(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                t = 3 + d % 4
                c = _spectral_coeffs(d, t, 7, 13, 5, 11, 101)
                buf = encode_grib1_message(
                    c, spectral=dict(truncation=t), nbits=8, parameter=80
                ) + encode_grib2_message(
                    c, spectral=dict(truncation=t), nbits=8,
                    category=3, number=9,
                )
                rows.append({"doc_id": d, "grib": buf})
            yield pd.DataFrame(rows)

    def decode(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            rows = []
            for doc_id, buf in zip(pdf["doc_id"], pdf["grib"]):
                d = int(doc_id)
                for edition, msg in iter_grib_messages(bytes(buf)):
                    rec = (
                        decode_grib1(msg) if edition == 1 else decode_grib2(msg)
                    )
                    co = rec.spectral_coeffs
                    rows.append(
                        {
                            "doc_id": d,
                            "edition": edition,
                            "truncation": rec.spectral_truncation,
                            "re": co.real.tolist(),
                            "im": co.imag.tolist(),
                        }
                    )
            yield pd.DataFrame(rows)

    files = ids.mapInPandas(synth, schema="doc_id bigint, grib binary")
    decoded = files.mapInPandas(
        decode,
        schema=(
            "doc_id bigint, edition int, truncation int, "
            "re array<double>, im array<double>"
        ),
    )
    pair = F.posexplode(F.arrays_zip("re", "im")).alias("k", "pair")
    return (
        decoded.select("doc_id", "edition", "truncation", pair)
        .select(
            "doc_id",
            "edition",
            "truncation",
            "k",
            F.col("pair.re").cast("bigint").alias("re"),
            F.col("pair.im").cast("bigint").alias("im"),
        )
        .groupBy("doc_id", "edition")
        .agg(
            F.min("truncation").alias("truncation"),
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum("re").alias("re_sum"),
            F.sum("im").alias("im_sum"),
            F.sum((F.col("k") + 1) * F.col("re")).alias("re_wsum"),
            F.sum((F.col("k") + 1) * F.col("im")).alias("im_wsum"),
        )
        .orderBy("doc_id", "edition")
    )


def _synth_ref(d: int) -> tuple[float, float]:
    """(val_sum, val_wsum) of the document's synthesized 6×8 grid from
    the INDEPENDENT formulation: derivative-definition associated
    Legendre functions (numpy.polynomial.legendre supplies P_n and
    d^m/dmu^m; explicit factorial normalization) on numpy.leggauss
    quadrature latitudes, synthesized by the explicit triple loop —
    the oracle-side second implementation of grib2.spectral_legendre's
    recurrence + grib2.spectral_synthesis's vectorized transform (and
    of gaussian_latitudes' Newton/Bonnet roots), like the rotated
    queries' arcsin/atan2 restatement."""
    import math

    import numpy as np
    from numpy.polynomial import legendre as L

    t = 3 + d % 3
    c = _spectral_coeffs(d, t, 3, 7, 11, 5, 41)
    nodes, _ = np.polynomial.legendre.leggauss(6)
    mu = np.sort(nodes)[::-1]  # north -> south
    lon = np.radians(np.arange(8) * 45.0)

    def pbar(n, m, u):
        cn = np.zeros(n + 1)
        cn[n] = 1.0
        pnm = (1 - u * u) ** (m / 2.0) * L.legval(u, L.legder(cn, m))
        return math.sqrt(
            (2 * n + 1) * math.factorial(n - m) / math.factorial(n + m)
        ) * pnm

    vals = np.zeros((6, 8))
    pos = 0
    for m in range(t + 1):
        for n in range(m, t + 1):
            cc = c[pos]
            pos += 1
            for j in range(6):
                p = pbar(n, m, mu[j])
                for i in range(8):
                    if m == 0:
                        vals[j, i] += cc.real * p
                    else:
                        vals[j, i] += 2.0 * p * (
                            cc.real * math.cos(m * lon[i])
                            - cc.imag * math.sin(m * lon[i])
                        )
    w = np.arange(48).reshape(6, 8) + 1
    return float(vals.sum()), float((vals * w).sum())


def _synth_values_sql() -> str:
    rows = []
    for d in range(0, 500):
        if d % 17 != 6:
            continue
        s, ws = _synth_ref(d)
        rows.append(f"({d}, {s!r}, {ws!r})")
    return ",\n       ".join(rows)


@query(
    "grid_grib2_spectral_synthesis",
    tags=("grid", "codec", "python", "ingest"),
    oracle=f"""
WITH ref(doc_id, val_sum, val_wsum) AS (
  VALUES {_synth_values_sql()}
)
SELECT g.doc_id,
       CAST(3 + g.doc_id % 3 AS INTEGER) AS truncation,
       CAST(48 AS BIGINT) AS n_cells,
       ROUND(CAST(val_sum AS DOUBLE), 6) AS val_sum,
       ROUND(CAST(val_wsum AS DOUBLE), 6) AS val_wsum
FROM ref r
JOIN (
  SELECT doc_id FROM documents WHERE doc_id % 17 = 6 AND doc_id < 500
) g ON g.doc_id = r.doc_id
ORDER BY g.doc_id
""",
)
def grid_grib2_spectral_synthesis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spherical-harmonic SYNTHESIS end-to-end: spectral GRIB2 bytes →
    coefficient decode → inverse Legendre + Fourier transform onto the
    global 6-parallel Gaussian grid (grib2.spectral_synthesis) — the
    step that turns an ERA5/IFS native spectral archive into the
    lat/lon rasters every downstream operator consumes (the reference
    reaches the same gridpoint space through its external tools'
    spectral-to-grid conversion).

    Witness independence: the oracle embeds each document's grid SUM
    and position-weighted sum from a SECOND implementation path —
    derivative-definition Legendre functions with explicit factorial
    normalization on numpy.leggauss roots, explicit triple-loop
    synthesis — against the engine's Newton/Bonnet latitudes +
    recurrence Legendre + vectorized transform.  The position-weighted
    sum pins every cell's (latitude row, longitude) placement, so a
    flipped hemisphere, a conjugated imaginary part or a wrong
    normalization cannot cancel.

    Scale: synthesis is O(T²·nj) Legendre work + two rank-1 outer
    products per zonal wavenumber, vectorized in the Arrow stage; at
    archive scale each record synthesizes independently
    (embarrassingly parallel), and only statistic rows shuffle.
    """
    from typing import Iterator

    import numpy as np
    import pandas as pd

    from ..grid.grib2 import (
        decode_grib2,
        encode_grib2_message,
        spectral_synthesis,
    )

    ids = (
        table(spark, sf_dir, "documents")
        .filter((F.col("doc_id") % 17 == 6) & (F.col("doc_id") < 500))
        .select("doc_id")
    )

    def synth(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                t = 3 + d % 3
                c = _spectral_coeffs(d, t, 3, 7, 11, 5, 41)
                rows.append(
                    {
                        "doc_id": d,
                        "grib": encode_grib2_message(
                            c, spectral=dict(truncation=t), nbits=8
                        ),
                    }
                )
            yield pd.DataFrame(rows)

    def synthesize(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        w = np.arange(48).reshape(6, 8) + 1
        for pdf in batches:
            rows = []
            for doc_id, buf in zip(pdf["doc_id"], pdf["grib"]):
                rec = decode_grib2(bytes(buf))
                vals, _ = spectral_synthesis(
                    rec.spectral_coeffs, rec.spectral_truncation, 6, 8
                )
                rows.append(
                    {
                        "doc_id": int(doc_id),
                        "truncation": rec.spectral_truncation,
                        "n_cells": int(vals.size),
                        "val_sum": float(vals.sum()),
                        "val_wsum": float((vals * w).sum()),
                    }
                )
            yield pd.DataFrame(rows)

    files = ids.mapInPandas(synth, schema="doc_id bigint, grib binary")
    out = files.mapInPandas(
        synthesize,
        schema=(
            "doc_id bigint, truncation int, n_cells bigint, "
            "val_sum double, val_wsum double"
        ),
    )
    return out.select(
        "doc_id",
        "truncation",
        "n_cells",
        F.round("val_sum", 6).alias("val_sum"),
        F.round("val_wsum", 6).alias("val_wsum"),
    ).orderBy("doc_id")


# --- mixed-archive inventory robustness ---------------------------------------
# Per selected document ONE archive with five records on a 4×3 grid:
#   rn=1  GRIB1 gridpoint, hour-unit lead 6·(1 + d%3)
#   rn=2  GRIB1 gridpoint whose time range indicator is patched to 2
#         (valid-between — reinterprets P1/P2)
#   rn=3  GRIB2 gridpoint whose lead unit octet is patched to 3 (month —
#         calendar-dependent, not whole-hour convertible)
#   rn=4  GRIB1 SPECTRAL (GDS type 50, T=3)
#   rn=5  GRIB2 SPECTRAL (templates 3.50 + 5.50, T=3)


@query(
    "grid_grib_inventory_robust_scan",
    tags=("grid", "codec", "python", "ingest"),
    oracle="""
WITH g AS (
  SELECT doc_id FROM documents WHERE doc_id % 23 = 4 AND doc_id < 500
),
r(rn, edition, parameter, category, number, ni, nj, fh_kind) AS (VALUES
  (1, 1, 11,   NULL, NULL, 4,    3,    1),
  (2, 1, 61,   NULL, NULL, 4,    3,    NULL),
  (3, 2, NULL, 0,    11,   4,    3,    NULL),
  (4, 1, 80,   NULL, NULL, NULL, NULL, 0),
  (5, 2, NULL, 3,    9,    NULL, NULL, 0))
SELECT doc_id,
       CAST(rn AS INTEGER) AS record_number,
       CAST(edition AS INTEGER) AS edition,
       CAST(parameter AS INTEGER) AS parameter,
       CAST(category AS INTEGER) AS category,
       CAST(number AS INTEGER) AS number,
       CAST(ni AS INTEGER) AS ni,
       CAST(nj AS INTEGER) AS nj,
       CAST(
         CASE WHEN fh_kind = 1 THEN 6 * (1 + doc_id % 3) ELSE fh_kind END
         AS INTEGER
       ) AS forecast_hours,
       CAST(1 AS INTEGER) AS level_type,
       CAST(0 AS INTEGER) AS level
FROM g, r
ORDER BY doc_id, record_number
""",
)
def grid_grib_inventory_robust_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixed-archive inventory ROBUSTNESS: real operational archives
    hold records the gridpoint pipeline can't (or shouldn't) fully
    decode — calendar-unit leads (monthly means), reinterpreting GRIB1
    time range indicators (valid-between, climatology codes) and
    SPECTRAL fields — and wgrib/wgrib2 still LIST every one of them.
    The header-only landing inventory must therefore never abort a
    file on such a record: a non-hour-convertible lead surfaces as
    NULL ``forecast_hours`` (inventory line ``:f-``, unselectable by a
    ``:f6$``-style match) and spherical-harmonic records list with
    NULL dimensions, while the hour-unit record beside them carries
    its converted lead.

    The oracle pins all five rows per document closed-form: the
    converted 6/12/18-hour lead on rn=1, NULL leads on the patched
    TRI-2 / month-unit records, zero leads + NULL ni/nj on the two
    spectral records — so a scan that aborted, skipped, or guessed a
    lead for ANY record hash-fails.  (The FULL decode path keeps the
    loud stop for the same records — tests pin both sides.)

    Scale: the 100 TB metadata pass — a few hundred header bytes per
    record, value bits never touched, one metadata row per record out.
    """
    from typing import Iterator

    import numpy as np
    import pandas as pd

    from ..grid.grib1 import encode_grib1_message
    from ..grid.grib2 import encode_grib2_message
    from ..sources.grib_source import INVENTORY_SCHEMA, _inventory_batches

    ids = (
        table(spark, sf_dir, "documents")
        .filter((F.col("doc_id") % 23 == 4) & (F.col("doc_id") < 500))
        .select("doc_id")
    )

    def synth(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        v = np.arange(12, dtype=np.float64).reshape(3, 4)
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                enc = dict(reference_value=0.0, nbits=8)
                m1 = encode_grib1_message(
                    v, parameter=11,
                    forecast=dict(unit=1, value=6 * (1 + d % 3)), **enc,
                )
                m2 = bytearray(
                    encode_grib1_message(
                        v, parameter=61, forecast=dict(unit=1, value=6), **enc
                    )
                )
                m2[8 + 20] = 2  # PDS octet 21: TRI -> 2 (valid-between)
                m3 = bytearray(
                    encode_grib2_message(
                        v, category=0, number=11,
                        forecast=dict(unit=1, value=2), **enc,
                    )
                )
                pos = 16
                while m3[pos + 4] != 4:
                    pos += int.from_bytes(m3[pos : pos + 4], "big")
                m3[pos + 17] = 3  # section-4 octet 18: time unit -> month
                c = _spectral_coeffs(d, 3, 7, 13, 5, 11, 101)
                m4 = encode_grib1_message(
                    c, spectral=dict(truncation=3), nbits=8, parameter=80
                )
                m5 = encode_grib2_message(
                    c, spectral=dict(truncation=3), nbits=8,
                    category=3, number=9,
                )
                rows.append(
                    {
                        "path": f"doc://{d}",
                        "content": m1 + bytes(m2) + bytes(m3) + m4 + m5,
                    }
                )
            yield pd.DataFrame(rows)

    files = ids.mapInPandas(synth, schema="path string, content binary")
    inv = files.mapInPandas(_inventory_batches, schema=INVENTORY_SCHEMA)
    return inv.select(
        F.regexp_extract("path", r"doc://(\d+)", 1).cast("bigint").alias("doc_id"),
        "record_number",
        "edition",
        "parameter",
        "category",
        "number",
        "ni",
        "nj",
        "forecast_hours",
        "level_type",
        "level",
    ).orderBy("doc_id", "record_number")


# --- wgrib2-style -match on the LEVEL field, codec level ----------------------
# Per selected document ONE GRIB2 buffer with four single-field messages
# on a 4×3 grid, record r's cell (i, j) = 100 + ((d*3 + r*7 + i*5 + j*2)
# mod 50):
#   r=0  LAYER l106/0-{2 + d%3} (soil layer, second fixed surface)
#   r=1  point l1/0 (surface)
#   r=2  point l100/{500 + 100·(d%2)} (isobaric)
#   r=3  point l103/10 whose section 5 is PATCHED to template 99 —
#        decoding it raises, so the queries below only succeed if the
#        match runs header-side (sections 0/1/4), never touching 5/7.


@query(
    "grid_grib2_match_level_decode",
    tags=("grid", "codec", "python", "ingest"),
    oracle="""
WITH g AS (
  SELECT doc_id FROM documents WHERE doc_id % 29 = 3 AND doc_id < 500
),
m(pattern_id, r) AS (VALUES (1, 0), (2, 2)),
cells AS (
  SELECT doc_id, pattern_id, r,
         100 + ((doc_id * 3 + r * 7 + i.i * 5 + j.j * 2) % 50) AS v
  FROM g, m,
       UNNEST(generate_series(0, 3)) AS i(i),
       UNNEST(generate_series(0, 2)) AS j(j)
)
SELECT doc_id,
       CAST(pattern_id AS INTEGER) AS pattern_id,
       CAST(CASE WHEN pattern_id = 1 THEN 106 ELSE 100 END AS INTEGER)
         AS level_type,
       CAST(CASE WHEN pattern_id = 1 THEN 0
                 ELSE 500 + 100 * (doc_id % 2) END AS INTEGER) AS level,
       CAST(CASE WHEN pattern_id = 1 THEN 2 + doc_id % 3 END AS INTEGER)
         AS level2,
       CAST(COUNT(*) AS BIGINT) AS n_cells,
       CAST(SUM(v) AS BIGINT) AS vsum
FROM cells
GROUP BY doc_id, pattern_id
ORDER BY doc_id, pattern_id
""",
)
def grid_grib2_match_level_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """wgrib2-style ``-match`` ON THE LEVEL FIELD at the CODEC level:
    the per-field inventory line (grid/grib2.py::_field_inventory) now
    renders ``l{type}/{level}[-{level2}]`` exactly like the landing
    scan's unified line, so level/layer selections — wgrib2's
    '"0-10 cm down"' / '"500 mb"' regexes, which the reference matches
    against wgrib2's own inventory (/root/reference/src/
    file-conversions.js:79-87) — have a codec-level target too.  Per
    document, pattern 1 selects the soil LAYER by its full bounds
    (``:l106/0-2:``) and pattern 2 any isobaric level (``:l100/``);
    each must pick exactly its record out of four.

    The strong witness: the fourth record's section 5 is patched to an
    unknown data-representation template, so it decodes loudly — the
    query only returns if ``match_records`` never parses sections 5/7
    of non-matching records (headers only, the wgrib2 contract).
    Level columns come from the DECODED records; sums pin payloads.

    Scale: matching costs a few hundred header bytes per record;
    non-matching raster bytes are never unpacked — the 100 TB
    archive-subsetting path.
    """
    from typing import Iterator

    import numpy as np
    import pandas as pd

    from ..grid.grib2 import decode_grib2, encode_grib2_message, match_records

    ids = (
        table(spark, sf_dir, "documents")
        .filter((F.col("doc_id") % 29 == 3) & (F.col("doc_id") < 500))
        .select("doc_id")
    )

    def synth(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        i = np.arange(4)[None, :]
        j = np.arange(3)[:, None]
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)

                def field(r: int) -> np.ndarray:
                    return (
                        100 + ((d * 3 + r * 7 + i * 5 + j * 2) % 50)
                    ).astype(np.float64)

                enc = dict(reference_value=100.0, nbits=8)
                msgs = [
                    encode_grib2_message(
                        field(0), level_type=106, level_value=0,
                        level2=dict(type=106, value=2 + d % 3), **enc,
                    ),
                    encode_grib2_message(field(1), **enc),
                    encode_grib2_message(
                        field(2), level_type=100,
                        level_value=500 + 100 * (d % 2), **enc,
                    ),
                    encode_grib2_message(
                        field(3), level_type=103, level_value=10, **enc
                    ),
                ]
                poison = bytearray(msgs[3])
                pos = 16
                while poison[pos + 4] != 5:
                    pos += int.from_bytes(poison[pos : pos + 4], "big")
                poison[pos + 9 : pos + 11] = (99).to_bytes(2, "big")
                msgs[3] = bytes(poison)
                rows.append({"doc_id": d, "grib": b"".join(msgs)})
            yield pd.DataFrame(rows)

    def match_decode(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            rows = []
            for doc_id, buf in zip(pdf["doc_id"], pdf["grib"]):
                d = int(doc_id)
                patterns = ((1, f":l106/0-{2 + d % 3}:"), (2, ":l100/"))
                for pid, pattern in patterns:
                    for msg in match_records(bytes(buf), pattern):
                        rec = decode_grib2(msg)
                        rows.append(
                            {
                                "doc_id": d,
                                "pattern_id": pid,
                                "level_type": rec.level_type,
                                "level": rec.level_value,
                                "level2": rec.level2_value,
                                "values": rec.values.reshape(-1).tolist(),
                            }
                        )
            yield pd.DataFrame(rows)

    files = ids.mapInPandas(synth, schema="doc_id bigint, grib binary")
    decoded = files.mapInPandas(
        match_decode,
        schema=(
            "doc_id bigint, pattern_id int, level_type int, level int, "
            "level2 int, values array<double>"
        ),
    )
    return decoded.select(
        "doc_id",
        "pattern_id",
        "level_type",
        "level",
        "level2",
        F.size("values").cast("bigint").alias("n_cells"),
        F.aggregate(
            "values", F.lit(0).cast("bigint"), lambda a, x: a + x.cast("bigint")
        ).alias("vsum"),
    ).orderBy("doc_id", "pattern_id")


@query(
    "grid_grib2_spectral_complex_decode",
    tags=("grid", "codec", "python", "ingest"),
    oracle="""
WITH g AS (
  SELECT doc_id, 4 + doc_id % 3 AS t
  FROM documents WHERE doc_id % 19 = 7 AND doc_id < 500
),
k AS (
  SELECT doc_id, t, k.k AS k,
         ((doc_id * 7 + k.k * 13) % 101) - 50 AS re,
         CASE WHEN k.k <= t THEN 0
              ELSE ((doc_id * 5 + k.k * 11) % 101) - 50 END AS im
  FROM g,
       LATERAL (
         SELECT unnest(generate_series(0, (t + 1) * (t + 2) // 2 - 1)) AS k
       ) k
)
SELECT k.doc_id,
       CAST(p.p AS INTEGER) AS packing_template,
       CAST(MIN(t) AS INTEGER) AS truncation,
       CAST(CASE WHEN p.p = 51 THEN 1 + k.doc_id % 2 END AS INTEGER)
         AS sub_truncation,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(re) AS BIGINT) AS re_sum,
       CAST(SUM(im) AS BIGINT) AS im_sum,
       CAST(SUM((k + 1) * re) AS BIGINT) AS re_wsum,
       CAST(SUM((k + 1) * im) AS BIGINT) AS im_wsum
FROM k, (SELECT unnest([50, 51]) AS p) p
GROUP BY k.doc_id, p.p
ORDER BY doc_id, packing_template
""",
)
def grid_grib2_spectral_complex_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COMPLEX spectral packing (data representation template 5.51 —
    the form operational IFS/ERA5 spectral archives actually ship,
    where 5.50 is the simple sibling): the low-wavenumber sub-spectrum
    (n ≤ TS, per-document TS) rides UNPACKED as IEEE-32 floats at the
    head of section 7 and every remaining value is multiplied by the
    Laplacian weight (n(n+1))^p before simple packing — flattening the
    n^-k amplitude decay so fixed-width increments keep precision.
    Per document the SAME integer spectrum encodes as one 5.50 and one
    5.51 message (p = 1: integer weights, so BOTH decode bit-exactly);
    the scan must recover identical coefficient sums from the two
    layouts, proving the sub-spectrum split, the weight application
    and its inverse, and the packed-count bookkeeping (section 5
    declares only the PACKED count on 5.51).

    Witness: per (document, packing template) the plain and
    position-weighted integer sums of real and imaginary parts — a
    sub-spectrum boundary off by one coefficient, a weight applied to
    the wrong side, or a swapped unpacked/packed order cannot cancel;
    the 5.51 rows also pin the per-document TS.

    Scale: codec posture — and the OPERATIONAL payoff: Laplacian
    weighting is why real spectral archives fit 16-bit packing, so
    supporting 5.51 is what makes a 100 TB ERA5 native-spectral scan
    read the bytes producers actually publish.
    """
    from typing import Iterator

    import pandas as pd

    from ..grid.grib2 import decode_grib2, encode_grib2_message, iter_messages2

    ids = (
        table(spark, sf_dir, "documents")
        .filter((F.col("doc_id") % 19 == 7) & (F.col("doc_id") < 500))
        .select("doc_id")
    )

    def synth(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                t = 4 + d % 3
                c = _spectral_coeffs(d, t, 7, 13, 5, 11, 101)
                buf = encode_grib2_message(
                    c, spectral=dict(truncation=t), nbits=8
                ) + encode_grib2_message(
                    c,
                    spectral=dict(
                        truncation=t,
                        sub_truncation=1 + d % 2,
                        laplacian=1.0,
                    ),
                    nbits=16,
                )
                rows.append({"doc_id": d, "grib": buf})
            yield pd.DataFrame(rows)

    def decode(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            rows = []
            for doc_id, buf in zip(pdf["doc_id"], pdf["grib"]):
                d = int(doc_id)
                for msg in iter_messages2(bytes(buf)):
                    rec = decode_grib2(msg)
                    co = rec.spectral_coeffs
                    rows.append(
                        {
                            "doc_id": d,
                            "packing_template": rec.packing_template,
                            "truncation": rec.spectral_truncation,
                            "sub_truncation": rec.spectral_sub_truncation,
                            "re": co.real.tolist(),
                            "im": co.imag.tolist(),
                        }
                    )
            yield pd.DataFrame(rows)

    files = ids.mapInPandas(synth, schema="doc_id bigint, grib binary")
    decoded = files.mapInPandas(
        decode,
        schema=(
            "doc_id bigint, packing_template int, truncation int, "
            "sub_truncation int, re array<double>, im array<double>"
        ),
    )
    pair = F.posexplode(F.arrays_zip("re", "im")).alias("k", "pair")
    return (
        decoded.select(
            "doc_id", "packing_template", "truncation", "sub_truncation", pair
        )
        .select(
            "doc_id",
            "packing_template",
            "truncation",
            "sub_truncation",
            "k",
            F.col("pair.re").cast("bigint").alias("re"),
            F.col("pair.im").cast("bigint").alias("im"),
        )
        .groupBy("doc_id", "packing_template")
        .agg(
            F.min("truncation").alias("truncation"),
            F.min("sub_truncation").alias("sub_truncation"),
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum("re").alias("re_sum"),
            F.sum("im").alias("im_sum"),
            F.sum((F.col("k") + 1) * F.col("re")).alias("re_wsum"),
            F.sum((F.col("k") + 1) * F.col("im")).alias("im_wsum"),
        )
        .orderBy("doc_id", "packing_template")
    )


def _landing_synth_ref(d: int) -> list[tuple[int, float, float, float]]:
    """Per record (rn, val_sum, latw, lonw) of the document's
    synthesized 6×8 rasters from the INDEPENDENT formulation
    (derivative-definition Legendre on numpy.leggauss roots — see
    :func:`_synth_ref`), with the latitude weight taken from the
    MICRODEGREE-rounded quadrature value exactly as the landed
    ``lat_udeg`` column carries it."""
    import math

    import numpy as np
    from numpy.polynomial import legendre as L

    nodes, _ = np.polynomial.legendre.leggauss(6)
    mu = np.sort(nodes)[::-1]
    lat_w = np.round(np.degrees(np.arcsin(mu)) * 1e6) / 1e6
    lon_w = np.arange(8) * 45.0

    def pbar(n, m, u):
        cn = np.zeros(n + 1)
        cn[n] = 1.0
        pnm = (1 - u * u) ** (m / 2.0) * L.legval(u, L.legder(cn, m))
        return math.sqrt(
            (2 * n + 1) * math.factorial(n - m) / math.factorial(n + m)
        ) * pnm

    out = []
    for rn, seed in ((1, d), (2, d + 7)):
        t = 3 + d % 3
        c = _spectral_coeffs(seed, t, 3, 7, 11, 5, 41)
        vals = np.zeros((6, 8))
        pos = 0
        for m in range(t + 1):
            for n in range(m, t + 1):
                cc = c[pos]
                pos += 1
                for j in range(6):
                    p = pbar(n, m, mu[j])
                    for i in range(8):
                        if m == 0:
                            vals[j, i] += cc.real * p
                        else:
                            vals[j, i] += 2.0 * p * (
                                cc.real * math.cos(m * math.radians(lon_w[i]))
                                - cc.imag * math.sin(m * math.radians(lon_w[i]))
                            )
        out.append(
            (
                rn,
                float(vals.sum()),
                float((vals * lat_w[:, None]).sum()),
                float((vals * lon_w[None, :]).sum()),
            )
        )
    return out


def _landing_synth_values_sql() -> str:
    rows = []
    for d in range(0, 500):
        if d % 31 != 11:
            continue
        for rn, s, lw, lo in _landing_synth_ref(d):
            rows.append(f"({d}, {rn}, {s!r}, {lw!r}, {lo!r})")
    return ",\n       ".join(rows)


@query(
    "grid_grib_spectral_landing",
    tags=("grid", "codec", "python", "ingest"),
    oracle=f"""
WITH ref(doc_id, rn, val_sum, latw, lonw) AS (
  VALUES {_landing_synth_values_sql()}
)
SELECT g.doc_id,
       CAST(rn AS INTEGER) AS record_number,
       CAST(CASE WHEN rn = 1 THEN 1 ELSE 2 END AS INTEGER) AS edition,
       CAST(50 AS INTEGER) AS grid_template,
       CAST(48 AS BIGINT) AS n_cells,
       ROUND(CAST(val_sum AS DOUBLE), 5) AS val_sum,
       ROUND(CAST(latw AS DOUBLE), 3) AS latw,
       ROUND(CAST(lonw AS DOUBLE), 3) AS lonw
FROM ref r
JOIN (
  SELECT doc_id FROM documents WHERE doc_id % 31 = 11 AND doc_id < 500
) g ON g.doc_id = r.doc_id
ORDER BY g.doc_id, record_number
""",
)
def grid_grib_spectral_landing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPECTRAL records THROUGH the landing source with explicit
    opt-in synthesis (``synthesize_spectral=(nj, ni)``): a mixed
    archive of GRIB1 (GDS type 50, simple spectral) and GRIB2 (3.50 +
    COMPLEX 5.51) spherical-harmonic records lands as global Gaussian
    rasters — quadrature latitudes in exact microdegrees, the exact
    45-mdeg longitude step from 0°E, ``grid_template`` 50 marking each
    raster SYNTHESIZED — and the unified ``grib1_cells`` explode
    serves them like any native record.  This is the 100 TB path for
    ERA5/IFS NATIVE spectral archives: one scan, no external
    spectral-to-grid tool.

    Witness independence: the oracle embeds each record's grid sum and
    latitude/longitude-weighted sums from the derivative-formulation
    Legendre path on numpy's own quadrature roots (the latitude weight
    taken from the µdeg-rounded value exactly as ``lat_udeg`` lands),
    against the engine's Newton/Bonnet latitudes + recurrence Legendre
    + vectorized synthesis + JVM cell explode — a flipped hemisphere,
    a wrong longitude origin or a mis-assigned record cannot cancel.

    Scale: synthesis is per-record local numpy in the Arrow decode
    stage (O(T²·nj + T·nj·ni) flops); the explode and aggregation are
    pure JVM with map-side partial aggregation — nothing shuffles but
    statistic rows, same as every landing query.
    """
    from functools import partial
    from typing import Iterator

    import pandas as pd

    from ..grid.grib1 import encode_grib1_message
    from ..grid.grib2 import encode_grib2_message
    from ..sources.grib_source import (
        RECORD_SCHEMA,
        _decode_batches,
        grib1_cells,
    )

    ids = (
        table(spark, sf_dir, "documents")
        .filter((F.col("doc_id") % 31 == 11) & (F.col("doc_id") < 500))
        .select("doc_id")
    )

    def synth(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                t = 3 + d % 3
                buf = encode_grib1_message(
                    _spectral_coeffs(d, t, 3, 7, 11, 5, 41),
                    spectral=dict(truncation=t), nbits=8, parameter=80,
                ) + encode_grib2_message(
                    _spectral_coeffs(d + 7, t, 3, 7, 11, 5, 41),
                    spectral=dict(
                        truncation=t, sub_truncation=1, laplacian=1.0
                    ),
                    nbits=16, category=3, number=9,
                )
                rows.append({"path": f"doc://{d}", "content": buf})
            yield pd.DataFrame(rows)

    files = ids.mapInPandas(synth, schema="path string, content binary")
    records = files.mapInPandas(
        partial(_decode_batches, synthesize_spectral=(6, 8)),
        schema=RECORD_SCHEMA,
    )
    cells = grib1_cells(records)
    return (
        cells.groupBy(
            F.regexp_extract("path", r"doc://(\d+)", 1)
            .cast("bigint")
            .alias("doc_id"),
            "record_number",
        )
        .agg(
            F.min("grid_template").alias("gt"),
            F.count(F.lit(1)).alias("n_cells"),
            F.round(F.sum("value"), 5).alias("val_sum"),
            F.round(
                F.sum(F.col("value") * F.col("lat_udeg") / F.lit(1e6)), 3
            ).alias("latw"),
            F.round(
                F.sum(F.col("value") * F.col("lon_udeg") / F.lit(1e6)), 3
            ).alias("lonw"),
        )
        .select(
            "doc_id",
            "record_number",
            F.when(F.col("record_number") == 1, 1).otherwise(2)
            .cast("int")
            .alias("edition"),
            F.col("gt").alias("grid_template"),
            "n_cells",
            "val_sum",
            "latw",
            "lonw",
        )
        .orderBy("doc_id", "record_number")
    )


def _unstretch_trig(rlat, rlon, st_lat, st_lon, c):
    """Stretched → true coordinates by the DIRECT great-circle
    formulation: colatitude about the pole of stretching from the
    spherical law of cosines, the Schmidt map as the tan-half-
    colatitude radial scaling tan(χ_t/2) = tan(χ'/2)/c, the bearing
    from the pole (unchanged by the map), and the destination-point
    formula — the oracle-side SECOND formulation of
    grib2.schmidt_unstretch's rotate/sin-form/rotate-back composition,
    like _unrotate_trig for the rotation family."""
    import math

    p1, l1 = math.radians(st_lat), math.radians(st_lon)
    p2, l2 = math.radians(rlat), math.radians(rlon)
    cosd = math.sin(p1) * math.sin(p2) + math.cos(p1) * math.cos(p2) * math.cos(
        l2 - l1
    )
    chi = math.acos(max(-1.0, min(1.0, cosd)))
    chi_t = 2.0 * math.atan(math.tan(chi / 2.0) / c)
    brg = math.atan2(
        math.sin(l2 - l1) * math.cos(p2),
        math.cos(p1) * math.sin(p2)
        - math.sin(p1) * math.cos(p2) * math.cos(l2 - l1),
    )
    lat_t = math.asin(
        math.sin(p1) * math.cos(chi_t)
        + math.cos(p1) * math.sin(chi_t) * math.cos(brg)
    )
    lon_t = l1 + math.atan2(
        math.sin(brg) * math.sin(chi_t) * math.cos(p1),
        math.cos(chi_t) - math.sin(p1) * math.sin(lat_t),
    )
    return math.degrees(lat_t), (math.degrees(lon_t) + 180.0) % 360.0 - 180.0


def _stretched_params(d: int) -> dict:
    return dict(
        pole_lat=30.0 + d % 30,
        pole_lon=float((d % 50) - 25),
        factor=1.0 + (d % 30) / 10.0,  # includes the c = 1 identity
    )


def _stretched_corner_values_sql() -> str:
    """(doc_id, grid_tmpl, anchor/far-corner true lat/lon in µdeg)
    from the direct great-circle formulation (composed with the
    direct-trig unrotation for template 3.3)."""
    rows = []
    for d in range(0, 500):
        if d % 37 != 9:
            continue
        ni, nj = 6 + d % 3, 4 + d % 2
        sp = _stretched_params(d)
        rp = _rotated_params(d)
        la1, lo1 = 8.0 + d % 6, -(10.0 + d % 9)
        for tmpl in (2, 3):
            a = _unstretch_trig(
                la1, lo1, sp["pole_lat"], sp["pole_lon"], sp["factor"]
            )
            k = _unstretch_trig(
                la1 - (nj - 1) * 0.5, lo1 + (ni - 1) * 0.5,
                sp["pole_lat"], sp["pole_lon"], sp["factor"],
            )
            if tmpl == 3:
                a = _unrotate_trig(
                    a[0], a[1],
                    rp["south_pole_lat"], rp["south_pole_lon"], rp["angle"],
                )
                k = _unrotate_trig(
                    k[0], k[1],
                    rp["south_pole_lat"], rp["south_pole_lon"], rp["angle"],
                )
            rows.append(
                f"({d}, {tmpl}, {int(round(a[0] * 1e6))}, "
                f"{int(round(a[1] * 1e6))}, {int(round(k[0] * 1e6))}, "
                f"{int(round(k[1] * 1e6))})"
            )
    return ",\n       ".join(rows)


@query(
    "grid_grib2_stretched_decode",
    tags=("grid", "codec", "python", "ingest"),
    oracle=f"""
WITH g AS (
  SELECT doc_id,
         6 + doc_id % 3 AS ni,
         4 + doc_id % 2 AS nj
  FROM documents WHERE doc_id % 37 = 9 AND doc_id < 500
),
corner(doc_id, grid_tmpl, a_lat_udeg, a_lon_udeg, c_lat_udeg, c_lon_udeg) AS (
  VALUES {_stretched_corner_values_sql()}
),
cells AS (
  SELECT doc_id, ni, nj, t.t AS grid_tmpl,
         80 + ((doc_id * 3 + t.t * 13 + i.i * 11 + j.j * 2) % 50) AS v,
         j.j * ni + i.i AS pos
  FROM g,
       (SELECT unnest([2, 3]) AS t) t,
       LATERAL (SELECT unnest(generate_series(0, ni - 1)) AS i) i,
       LATERAL (SELECT unnest(generate_series(0, nj - 1)) AS j) j
)
SELECT c.doc_id,
       CAST(c.grid_tmpl AS INTEGER) AS grid_tmpl,
       CAST(COUNT(*) AS BIGINT) AS n_cells,
       CAST(SUM(c.v) AS BIGINT) AS vsum,
       CAST(SUM(c.v * c.pos) AS BIGINT) AS wsum,
       CAST(MIN(k.a_lat_udeg) AS BIGINT) AS lat0_udeg,
       CAST(MIN(k.a_lon_udeg) AS BIGINT) AS lon0_udeg,
       CAST(MIN(k.c_lat_udeg) AS BIGINT) AS corner_lat_udeg,
       CAST(MIN(k.c_lon_udeg) AS BIGINT) AS corner_lon_udeg
FROM cells c
JOIN corner k ON k.doc_id = c.doc_id AND k.grid_tmpl = c.grid_tmpl
GROUP BY c.doc_id, c.grid_tmpl
ORDER BY c.doc_id, c.grid_tmpl
""",
)
def grid_grib2_stretched_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GRIB2 STRETCHED lat/lon decode (grid templates 3.2 and 3.3 —
    the ARPEGE/ALADIN Schmidt geometry, completing the lat/lon family
    3.0/3.1/3.2/3.3): the 3.0 body's axes are coordinates in the
    stretched (and, for 3.3, rotated) system; the pole of stretching
    and the ×10^6 factor follow the body (3.2) or the rotation block
    (3.3).  Per document one 3.2 and one 3.3 record on per-document
    stretching poles and factors (including the c = 1 identity), half
    stored south-first; the engine recovers per-cell TRUE coordinates
    through the vectorized Schmidt unstretch
    (grid/grib2.py::schmidt_unstretch — rotate the pole of stretching
    to the north pole, apply the sin-form radial map, rotate back),
    composed with the shared unrotation for 3.3.

    Witness independence: the oracle embeds anchor and far-corner true
    coordinates from the DIRECT great-circle formulation (spherical
    law of cosines → tan-half-colatitude scaling → destination-point
    formula, composed with the direct arcsin/atan2 unrotation for
    3.3) in integer microdegrees; ``wsum`` keeps the payload
    raster-order sensitive, so a row flip, a mis-directed factor
    (concentrate-vs-dilute) or a wrong composition order cannot
    cancel.

    Scale: codec-query posture — bytes executor-side, statistic rows
    shuffle, O(cells) vectorized trig in the Arrow stage.
    """
    from typing import Iterator

    import numpy as np
    import pandas as pd

    from ..grid.grib2 import decode_grib2, encode_grib2_message, iter_messages2

    ids = (
        table(spark, sf_dir, "documents")
        .filter((F.col("doc_id") % 37 == 9) & (F.col("doc_id") < 500))
        .select("doc_id")
    )

    def synth(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                ni, nj = 6 + d % 3, 4 + d % 2
                i = np.arange(ni)[None, :]
                j = np.arange(nj)[:, None]
                msgs = []
                for tmpl in (2, 3):
                    v = (
                        80 + ((d * 3 + tmpl * 13 + i * 11 + j * 2) % 50)
                    ).astype(np.float64)
                    kw = dict(stretched=_stretched_params(d))
                    if tmpl == 3:
                        kw["rotated"] = _rotated_params(d)
                    msgs.append(
                        encode_grib2_message(
                            v,
                            lat_first_udeg=(8 + d % 6) * 1_000_000,
                            lon_first_udeg=-(10 + d % 9) * 1_000_000,
                            dlat_udeg=500_000,
                            dlon_udeg=500_000,
                            scanning_mode=0x40 if d % 2 else 0x00,
                            reference_value=80.0,
                            nbits=8,
                            **kw,
                        )
                    )
                rows.append({"doc_id": d, "grib": b"".join(msgs)})
            yield pd.DataFrame(rows)

    def decode(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            rows = []
            for doc_id, buf in zip(pdf["doc_id"], pdf["grib"]):
                d = int(doc_id)
                for msg in iter_messages2(bytes(buf)):
                    rec = decode_grib2(msg)
                    rows.append(
                        {
                            "doc_id": d,
                            "grid_tmpl": rec.grid_template,
                            "values": rec.values.reshape(-1).tolist(),
                            "lat0": float(rec.cell_lats_deg[0, 0]),
                            "lon0": float(rec.cell_lons_deg[0, 0]),
                            "corner_lat": float(rec.cell_lats_deg[-1, -1]),
                            "corner_lon": float(rec.cell_lons_deg[-1, -1]),
                        }
                    )
            yield pd.DataFrame(rows)

    files = ids.mapInPandas(synth, schema="doc_id bigint, grib binary")
    decoded = files.mapInPandas(
        decode,
        schema=(
            "doc_id bigint, grid_tmpl int, values array<double>, "
            "lat0 double, lon0 double, corner_lat double, corner_lon double"
        ),
    )
    return _projected_stats(decoded, ("doc_id", "grid_tmpl")).orderBy(
        "doc_id", "grid_tmpl"
    )


def _present(col: str):
    """Missing-cell predicate on the landed ``values`` surface: the
    codec marks masked cells NaN, Arrow maps NaN to NULL on the
    array<double> transfer, and Spark's isnan() is FALSE (not NULL) on
    NULL — so presence must check both representations explicitly."""
    return F.col(col).isNotNull() & ~F.isnan(col)


@query(
    "grid_grib1_reduced_bitmap_scan",
    tags=("grid", "codec", "python", "ingest"),
    oracle="""
WITH g AS (
  SELECT doc_id FROM documents WHERE doc_id % 29 = 11 AND doc_id < 580
),
r1rows AS (
  SELECT g.doc_id, j.j AS j,
         3 + ((g.doc_id + 5 * j.j) % 4) AS rowni,
         2 * (2 + g.doc_id % 2) AS nj
  FROM g,
       LATERAL (
         SELECT unnest(generate_series(0, 2 * (2 + g.doc_id % 2) - 1)) AS j
       ) j
),
r1off AS (
  SELECT doc_id, j, rowni, nj,
         COALESCE(SUM(rowni) OVER (
           PARTITION BY doc_id ORDER BY j
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS start_pos
  FROM r1rows
),
r1cells AS (
  SELECT o.doc_id, 1 AS rn, o.nj, o.start_pos + i.i AS pos,
         60 + 2 * ((o.doc_id * 3 + o.j * 7 + i.i * 5) % 35) AS v,
         ((o.doc_id + o.start_pos + i.i) % 4) <> 0 AS present
  FROM r1off o,
       LATERAL (SELECT unnest(generate_series(0, o.rowni - 1)) AS i) i
),
r2cells AS (
  SELECT g.doc_id, 2 AS rn, 4 AS nj, p.pos,
         40 + 3 * ((g.doc_id * 7 + p.pos * 5) % 30) AS v,
         ((p.pos + 1 + g.doc_id % 7) % 3) <> 0 AS present
  FROM g, LATERAL (SELECT unnest(generate_series(0, 15)) AS pos) p
),
cells AS (
  SELECT * FROM r1cells UNION ALL SELECT * FROM r2cells
)
SELECT doc_id,
       CAST(rn AS INTEGER) AS record_number,
       CAST(MIN(nj) AS INTEGER) AS nj,
       CAST(COUNT(*) AS BIGINT) AS n_cells,
       CAST(SUM(CASE WHEN present THEN 1 ELSE 0 END) AS BIGINT) AS n_present,
       CAST(SUM(CASE WHEN present THEN v ELSE 0 END) AS BIGINT) AS vsum,
       CAST(SUM(CASE WHEN present THEN v * pos ELSE 0 END) AS BIGINT) AS wsum,
       CAST(SUM(CASE WHEN present THEN 0 ELSE pos END) AS BIGINT) AS misspos
FROM cells
GROUP BY doc_id, rn
ORDER BY doc_id, rn
""",
)
def grid_grib1_reduced_bitmap_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BITMAPPED THINNED GRIDS + CENTRE-PREDEFINED BITMAPS through the
    landing scan — the r14 verdict's top remaining real-archive shape
    (a masked ocean/land field on a reduced ERA5-era grid; wgrib reads
    both forms, /root/reference/src/file-conversions.js:114-127).

    Record 1 is a reduced GAUSSIAN grid with a PRIMARY BITMAP: the BMS
    ships sum(row_ni) bits in storage order, the BDS packs only the
    present cells, and masked cells land NaN→NULL while the per-cell
    GEOMETRY still covers every cell (the mask hits values, never
    coordinates).  Record 2 is a reduced grid whose BMS carries a
    CENTRE-PREDEFINED bitmap NUMBER (octets 5-6 nonzero, NO bits ride
    — WMO BMS note 2): the scan resolves the mask through the job-wide
    ``predefined_bitmaps`` (centre, number) catalog threaded into the
    Arrow decode stage, and a record naming an uncatalogued mask
    quarantines loudly instead of guessing.

    Witnesses per (document, record): present/missing cell counts, the
    present-value sum, the position-weighted present sum (a mask
    shifted by ONE cell scatters every value and hash-mismatches) and
    the missing-position checksum.  Record 2's mask depends only on
    the CATALOG NUMBER — decoding it with the wrong catalog entry
    (or with record 1's in-stream logic) cannot match.  The
    foreign-bytes witness (tests/test_foreign_grib.py::
    test_foreign_reduced_bitmapped_grib1_decodes_to_pinned_values)
    pins both BMS layouts against hand-assembled octets.

    Scale: the landing posture — one Arrow decode stage, statistic
    rows shuffle; the predefined-mask catalog is a task constant
    shipped once per executor, exactly how a centre's bitmap table
    would ride a 100 TB scan.
    """
    from typing import Iterator

    import numpy as np
    import pandas as pd

    from ..grid.grib1 import encode_grib1_message
    from ..sources.grib_source import RECORD_SCHEMA, _decode_batches

    ids = (
        table(spark, sf_dir, "documents")
        .filter((F.col("doc_id") % 29 == 11) & (F.col("doc_id") < 580))
        .select("doc_id")
    )

    # the consumer-side catalog: ECMWF-style centre 74 (the encoder's
    # fixed centre octet), numbers 1-7, each mask a pure function of
    # the NUMBER over the fixed 16-cell [3,4,5,4] geometry — exactly
    # how real predefined bitmaps are published (per centre, per
    # fixed grid)
    catalog = {
        (74, n): (np.arange(16) + n) % 3 != 0 for n in range(1, 8)
    }

    def synth(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                nj = 2 * (2 + d % 2)
                row_ni = [3 + ((d + 5 * j) % 4) for j in range(nj)]
                v1 = np.concatenate(
                    [
                        60.0 + 2 * ((d * 3 + j * 7 + np.arange(n) * 5) % 35)
                        for j, n in enumerate(row_ni)
                    ]
                )
                pos1 = np.arange(v1.size)
                bm1 = (d + pos1) % 4 != 0
                msg1 = encode_grib1_message(
                    v1, reduced_ni=row_ni, bitmap=bm1,
                    reference_value=60.0, nbits=8,
                )
                rows2 = [3, 4, 5, 4]
                pos2 = np.arange(16)
                v2 = 40.0 + 3 * ((d * 7 + pos2 * 5) % 30)
                n = 1 + d % 7
                msg2 = encode_grib1_message(
                    v2, reduced_ni=rows2,
                    predefined_bitmap=dict(
                        number=n, mask=(pos2 + n) % 3 != 0
                    ),
                    reference_value=40.0, nbits=8,
                )
                rows.append({"path": f"doc://{d}", "content": msg1 + msg2})
            yield pd.DataFrame(rows)

    files = ids.mapInPandas(synth, schema="path string, content binary")
    records = files.mapInPandas(
        lambda it: _decode_batches(it, predefined_bitmaps=catalog),
        schema=RECORD_SCHEMA,
    )
    cells = records.select(
        F.regexp_extract("path", r"doc://(\d+)", 1).cast("bigint").alias(
            "doc_id"
        ),
        "record_number",
        "nj",
        F.posexplode("values").alias("pos", "v"),
    )
    return (
        cells.groupBy("doc_id", "record_number")
        .agg(
            F.min("nj").alias("nj"),
            F.count(F.lit(1)).cast("bigint").alias("n_cells"),
            # Arrow maps the codec's NaN to NULL on the array<double>
            # transfer and any residual NaN must count the same way,
            # so "present" is NOT NULL AND NOT NaN on this surface
            # (Spark's isnan(NULL) is false, not NULL)
            F.count(F.when(_present("v"), F.lit(1)))
            .cast("bigint")
            .alias("n_present"),
            F.sum(F.when(_present("v"), F.col("v")).otherwise(F.lit(0.0)))
            .cast("bigint")
            .alias("vsum"),
            F.sum(
                F.when(_present("v"), F.col("v") * F.col("pos")).otherwise(
                    F.lit(0.0)
                )
            )
            .cast("bigint")
            .alias("wsum"),
            F.sum(F.when(~_present("v"), F.col("pos")).otherwise(F.lit(0)))
            .cast("bigint")
            .alias("misspos"),
        )
        .orderBy("doc_id", "record_number")
    )


@query(
    "grid_grib1_spectral_complex_scan",
    tags=("grid", "codec", "python", "ingest"),
    oracle="""
WITH g AS (
  SELECT doc_id, 4 + doc_id % 3 AS t
  FROM documents WHERE doc_id % 31 = 12 AND doc_id < 620
),
k AS (
  SELECT doc_id, t, k.k AS k,
         ((doc_id * 7 + k.k * 13) % 101) - 50 AS re,
         CASE WHEN k.k <= t THEN 0
              ELSE ((doc_id * 5 + k.k * 11) % 101) - 50 END AS im
  FROM g,
       LATERAL (
         SELECT unnest(generate_series(0, (t + 1) * (t + 2) // 2 - 1)) AS k
       ) k
)
SELECT k.doc_id,
       CAST(f.f AS INTEGER) AS complex_form,
       CAST(MIN(t) AS INTEGER) AS truncation,
       CAST(CASE WHEN f.f = 1 THEN 1 + k.doc_id % 2 END AS INTEGER)
         AS sub_truncation,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(re) AS BIGINT) AS re_sum,
       CAST(SUM(im) AS BIGINT) AS im_sum,
       CAST(SUM((k + 1) * re) AS BIGINT) AS re_wsum,
       CAST(SUM((k + 1) * im) AS BIGINT) AS im_wsum
FROM k, (SELECT unnest([0, 1]) AS f) f
GROUP BY k.doc_id, f.f
ORDER BY doc_id, complex_form
""",
)
def grid_grib1_spectral_complex_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EDITION-1 COMPLEX spherical-harmonic packing (BDS flags 0b1100 —
    the ECMWF gribex compact archive form, the r14 verdict's item 3):
    the n ≤ TS sub-spectrum rides UNPACKED as IBM-32 floats behind the
    octet-12 N pointer (octets 14-15 carry IP = P×1000, 16-18 the
    J1/K1/M1 sub-truncation) and every remaining value is multiplied
    by the Laplacian weight (n(n+1))^P before simple packing — the
    SAME split as GRIB2 template 5.51
    (grid_grib2_spectral_complex_decode), on the edition-1 BDS layout.
    Per document the SAME integer spectrum encodes as one SIMPLE
    (flags 0b1000, the (0,0) real part at octets 12-15) and one
    COMPLEX message (P = 1: integer weights, so BOTH decode
    bit-exactly); the scan must recover identical coefficient sums
    from the two layouts.

    Witness: per (document, form) the plain and position-weighted
    integer sums of real and imaginary parts — a sub-spectrum boundary
    off by one coefficient, a weight applied to the wrong side, an N
    pointer mis-read or a swapped unpacked/packed order cannot cancel;
    the complex rows also pin the per-document TS through the
    ``sub_truncation`` landing column (NULL on the simple form).  The
    foreign-bytes witness (tests/test_foreign_grib.py::
    test_foreign_spectral_complex_grib1_decodes_to_pinned_values) pins
    the N/IP/J1K1M1 head against hand-assembled octets.

    Scale: codec posture — and the operational payoff mirrors 5.51's:
    Laplacian weighting is why ECMWF's edition-1 spectral archives fit
    fixed-width packing, so this is the byte shape a 100 TB pre-GRIB2
    ERA archive scan actually reads.
    """
    from typing import Iterator

    import pandas as pd

    from ..grid.grib1 import decode_grib1, encode_grib1_message, iter_messages

    ids = (
        table(spark, sf_dir, "documents")
        .filter((F.col("doc_id") % 31 == 12) & (F.col("doc_id") < 620))
        .select("doc_id")
    )

    def synth(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                t = 4 + d % 3
                c = _spectral_coeffs(d, t, 7, 13, 5, 11, 101)
                buf = encode_grib1_message(
                    c, spectral=dict(truncation=t), nbits=8, parameter=80
                ) + encode_grib1_message(
                    c,
                    spectral=dict(
                        truncation=t,
                        sub_truncation=1 + d % 2,
                        laplacian=1.0,
                    ),
                    nbits=16,
                    parameter=80,
                )
                rows.append({"doc_id": d, "grib": buf})
            yield pd.DataFrame(rows)

    def decode(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            rows = []
            for doc_id, buf in zip(pdf["doc_id"], pdf["grib"]):
                d = int(doc_id)
                for msg in iter_messages(bytes(buf)):
                    rec = decode_grib1(msg)
                    co = rec.spectral_coeffs
                    rows.append(
                        {
                            "doc_id": d,
                            "complex_form": int(
                                rec.spectral_sub_truncation is not None
                            ),
                            "truncation": rec.spectral_truncation,
                            "sub_truncation": rec.spectral_sub_truncation,
                            "re": co.real.tolist(),
                            "im": co.imag.tolist(),
                        }
                    )
            yield pd.DataFrame(rows)

    files = ids.mapInPandas(synth, schema="doc_id bigint, grib binary")
    decoded = files.mapInPandas(
        decode,
        schema=(
            "doc_id bigint, complex_form int, truncation int, "
            "sub_truncation int, re array<double>, im array<double>"
        ),
    )
    pair = F.posexplode(F.arrays_zip("re", "im")).alias("k", "pair")
    return (
        decoded.select(
            "doc_id", "complex_form", "truncation", "sub_truncation", pair
        )
        .select(
            "doc_id",
            "complex_form",
            "truncation",
            "sub_truncation",
            "k",
            F.col("pair.re").cast("bigint").alias("re"),
            F.col("pair.im").cast("bigint").alias("im"),
        )
        .groupBy("doc_id", "complex_form")
        .agg(
            F.min("truncation").alias("truncation"),
            F.min("sub_truncation").alias("sub_truncation"),
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum("re").alias("re_sum"),
            F.sum("im").alias("im_sum"),
            F.sum((F.col("k") + 1) * F.col("re")).alias("re_wsum"),
            F.sum((F.col("k") + 1) * F.col("im")).alias("im_wsum"),
        )
        .orderBy("doc_id", "complex_form")
    )


@query(
    "grid_grib2_diff_missing_scan",
    tags=("grid", "codec", "python", "ingest"),
    oracle="""
WITH g AS (
  SELECT doc_id, 5 + doc_id % 3 AS ni, 3 + doc_id % 2 AS nj
  FROM documents WHERE doc_id % 37 = 14 AND doc_id < 740
),
cells AS (
  SELECT g.doc_id, j.j * g.ni + i.i AS pos,
         70 + 3 * ((g.doc_id * 7 + i.i * 5 + j.j * 11) % 50) AS v,
         ((i.i + 2 * j.j + g.doc_id) % 5) <> 0 AS present
  FROM g,
       LATERAL (SELECT unnest(generate_series(0, g.nj - 1)) AS j) j,
       LATERAL (SELECT unnest(generate_series(0, g.ni - 1)) AS i) i
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_cells,
       CAST(SUM(CASE WHEN present THEN 1 ELSE 0 END) AS BIGINT) AS n_present,
       CAST(SUM(CASE WHEN present THEN v ELSE 0 END) AS BIGINT) AS vsum,
       CAST(SUM(CASE WHEN present THEN v * pos ELSE 0 END) AS BIGINT) AS wsum,
       CAST(SUM(CASE WHEN present THEN 0 ELSE pos END) AS BIGINT) AS misspos
FROM cells
GROUP BY doc_id
ORDER BY doc_id
""",
)
def grid_grib2_diff_missing_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPATIAL DIFFERENCING × MISSING-VALUE MANAGEMENT (template 5.3
    with mvm = 1 — the combination NCEP precipitation products ship,
    the r14 verdict's item 4): the differencing runs over the
    NON-MISSING subsequence only (g2clib's comunpack convention) and
    missing points ride IN-DATA as all-ones group markers — no
    section-6 bitmap.  Per document one field encodes at a
    per-document order (1 or 2) and group length with a deterministic
    missing mask; the decode must place NaN exactly at the masked
    positions while reconstructing every present value bit-exactly
    through the subsequence cumulative sums.

    Witness: present/missing counts, the present-value sum, the
    position-weighted present sum (an off-by-one in the subsequence
    scatter shifts every reconstructed value one cell and cannot
    cancel) and the missing-position checksum (that the record really
    takes the 5.3 path is pinned record-level by
    tests/test_grib2.py::test_spatial_diff_with_missing_value_
    management_property's packing_template assertion).  The
    foreign-bytes
    witness (tests/test_foreign_grib.py::
    test_foreign_spatial_diff_missing_grib2_decodes_to_pinned_values)
    pins the descriptor block and marker layout against hand-computed
    octets.

    Scale: codec posture — one Arrow decode stage, statistic rows
    shuffle; supporting 5.3+mvm is what lets a 100 TB NCEP precip
    archive scan read the producer's actual bytes instead of
    quarantining every masked record.
    """
    from typing import Iterator

    import numpy as np
    import pandas as pd

    from ..grid.grib2 import encode_grib2_message
    from ..sources.grib_source import RECORD_SCHEMA, _decode_batches

    ids = (
        table(spark, sf_dir, "documents")
        .filter((F.col("doc_id") % 37 == 14) & (F.col("doc_id") < 740))
        .select("doc_id")
    )

    def synth(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                ni, nj = 5 + d % 3, 3 + d % 2
                i = np.arange(ni)[None, :]
                j = np.arange(nj)[:, None]
                v = (70 + 3 * ((d * 7 + i * 5 + j * 11) % 50)).astype(
                    np.float64
                )
                mm = ((i + 2 * j + d) % 5 == 0) | np.zeros_like(v, bool)
                msg = encode_grib2_message(
                    v,
                    packing="complex_diff",
                    spatial_diff_order=1 + d % 2,
                    group_len=4 + d % 5,
                    missing_mask=mm,
                    reference_value=0.0,
                )
                rows.append({"path": f"doc://{d}", "content": msg})
            yield pd.DataFrame(rows)

    files = ids.mapInPandas(synth, schema="path string, content binary")
    records = files.mapInPandas(_decode_batches, schema=RECORD_SCHEMA)
    cells = records.select(
        F.regexp_extract("path", r"doc://(\d+)", 1).cast("bigint").alias(
            "doc_id"
        ),
        F.posexplode("values").alias("pos", "v"),
    )
    return (
        cells.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_cells"),
            # Arrow maps the codec's NaN to NULL on the array<double>
            # transfer and any residual NaN must count the same way,
            # so "present" is NOT NULL AND NOT NaN on this surface
            # (Spark's isnan(NULL) is false, not NULL)
            F.count(F.when(_present("v"), F.lit(1)))
            .cast("bigint")
            .alias("n_present"),
            F.sum(F.when(_present("v"), F.col("v")).otherwise(F.lit(0.0)))
            .cast("bigint")
            .alias("vsum"),
            F.sum(
                F.when(_present("v"), F.col("v") * F.col("pos")).otherwise(
                    F.lit(0.0)
                )
            )
            .cast("bigint")
            .alias("wsum"),
            F.sum(F.when(~_present("v"), F.col("pos")).otherwise(F.lit(0)))
            .cast("bigint")
            .alias("misspos"),
        )
        .orderBy("doc_id")
    )


@query(
    "grid_grib2_deprecated_satellite_scan",
    tags=("grid", "codec", "python", "ingest"),
    oracle="""
WITH g AS (
  SELECT doc_id, 4 + doc_id % 3 AS ni, 3 + doc_id % 2 AS nj,
         1 + doc_id % 3 AS nb
  FROM documents WHERE doc_id % 43 = 17 AND doc_id < 700
),
b30 AS (
  SELECT g.doc_id,
         ROUND(SUM(
           (400 + g.doc_id % 50 + 3 * b.b)
           * POWER(10.0, CAST(b.b % 2 AS DOUBLE))
         ), 6) AS wave_sum_b,
         CAST(SUM(150 + ((g.doc_id + 7 * b.b) % 100)) AS BIGINT) AS isum
  FROM g, LATERAL (SELECT unnest(generate_series(0, g.nb - 1)) AS b) b
  GROUP BY g.doc_id
),
vs AS (
  SELECT g.doc_id, r.r + 1 AS rn,
         CAST(SUM(20 + 2 * ((g.doc_id * 3 + r.r * 5 + i.i * 7 + j.j * 9)
           % 30)) AS BIGINT) AS vsum
  FROM g,
       UNNEST(generate_series(0, 1)) AS r(r),
       LATERAL (SELECT unnest(generate_series(0, g.ni - 1)) AS i) i,
       LATERAL (SELECT unnest(generate_series(0, g.nj - 1)) AS j) j
  GROUP BY g.doc_id, r.r
),
rec AS (
  SELECT g.doc_id, 1 AS rn, CAST(30 AS INTEGER) AS product_template,
         CAST(g.nb AS INTEGER) AS satellite_bands,
         b30.isum AS instr_sum,
         b30.wave_sum_b AS wave_sum
  FROM g JOIN b30 ON b30.doc_id = g.doc_id
  UNION ALL
  SELECT doc_id, 2, CAST(31 AS INTEGER), CAST(1 AS INTEGER),
         CAST(600 + doc_id % 120 AS BIGINT),
         ROUND((900 + doc_id % 30) / 10.0, 6)
  FROM g
)
SELECT rec.doc_id, CAST(rec.rn AS INTEGER) AS record_number,
       rec.product_template, rec.satellite_bands, rec.instr_sum,
       rec.wave_sum,
       CAST(NULL AS INTEGER) AS level_type,
       CAST(NULL AS INTEGER) AS forecast_hours,
       vs.vsum
FROM rec JOIN vs ON rec.doc_id = vs.doc_id AND rec.rn = vs.rn
ORDER BY rec.doc_id, rec.rn
""",
)
def grid_grib2_deprecated_satellite_scan(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """DEPRECATED satellite products (PDT 4.30 — pre-2003 archives;
    the r14 verdict's item 5, decided: DECODE, closing the LAST named
    product-template boundary): 4.31's leading layout with a band
    block one octet NARROWER per band (the instrument type is a
    SINGLE octet), so each template must decode through its own width
    — a 4.31-offset read of a 4.30 record would shear every band
    after the first, which is exactly why this template stayed a
    named error until its own decode landed.

    Each document's archive holds a 4.30 record with 1-3 bands
    (alternating wave-number scale signs) and a 4.31 CONTROL record
    whose instrument number NEEDS two octets (600+) — the pair proves
    the two band widths never cross-contaminate: the 1-octet read
    applied to the control (or the 2-octet read to the 4.30 record)
    shifts every following band byte and hash-mismatches on
    ``instr_sum``/``wave_sum``.  Levels and leads stay NULL on both
    (observations at the reference time, no fixed surfaces).

    Scale: identical plan shape to every landing scan — one Arrow
    decode stage, only per-record statistic rows shuffle.
    """
    from typing import Iterator

    import numpy as np
    import pandas as pd

    from ..grid.grib2 import encode_grib2_message
    from ..sources.grib_source import RECORD_SCHEMA, _decode_batches

    ids = (
        table(spark, sf_dir, "documents")
        .filter((F.col("doc_id") % 43 == 17) & (F.col("doc_id") < 700))
        .select("doc_id")
    )

    def synth(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                ni, nj = 4 + d % 3, 3 + d % 2
                i = np.arange(ni)[None, :]
                j = np.arange(nj)[:, None]

                def field(r: int) -> np.ndarray:
                    return (
                        20 + 2 * ((d * 3 + r * 5 + i * 7 + j * 9) % 30)
                    ).astype(np.float64)

                enc = dict(
                    category=0, number=7,
                    reference_value=20.0, binary_scale=1, nbits=8,
                )
                bands30 = [
                    dict(
                        series=333,
                        number=50 + b,
                        instrument=150 + ((d + 7 * b) % 100),
                        scale=-(b % 2),
                        value=400 + d % 50 + 3 * b,
                    )
                    for b in range(1 + d % 3)
                ]
                msgs = [
                    encode_grib2_message(
                        field(0),
                        satellite=dict(deprecated=True, bands=bands30),
                        **enc,
                    ),
                    encode_grib2_message(
                        field(1),
                        satellite=dict(
                            bands=[
                                dict(
                                    series=500, number=77,
                                    instrument=600 + d % 120,
                                    scale=1, value=900 + d % 30,
                                )
                            ]
                        ),
                        **enc,
                    ),
                ]
                rows.append({"path": f"doc://{d}", "content": b"".join(msgs)})
            yield pd.DataFrame(rows)

    files = ids.mapInPandas(synth, schema="path string, content binary")
    records = files.mapInPandas(_decode_batches, schema=RECORD_SCHEMA)
    zero = F.lit(0).cast("bigint")
    return records.select(
        F.regexp_extract("path", r"doc://(\d+)", 1).cast("bigint").alias(
            "doc_id"
        ),
        "record_number",
        "product_template",
        "satellite_bands",
        F.aggregate(
            "satellite_instruments", zero, lambda a, x: a + x.cast("bigint")
        ).alias("instr_sum"),
        F.round(
            F.aggregate(
                "central_wavenumbers", F.lit(0.0), lambda a, x: a + x
            ),
            6,
        ).alias("wave_sum"),
        "level_type",
        "forecast_hours",
        F.aggregate(
            "values", zero, lambda a, x: a + x.cast("bigint")
        ).alias("vsum"),
    ).orderBy("doc_id", "record_number")


@query(
    "grid_grib2_ieee_float_scan",
    tags=("grid", "codec", "python", "ingest"),
    oracle="""
WITH g AS (
  SELECT doc_id, 4 + doc_id % 3 AS ni, 3 + doc_id % 2 AS nj
  FROM documents WHERE doc_id % 41 = 15 AND doc_id < 820
),
r1 AS (
  SELECT g.doc_id, 1 AS rn, j.j * g.ni + i.i AS pos,
         ((g.doc_id * 3 + i.i * 7 + j.j * 5) % 40) * 2 - 20 AS vq,
         TRUE AS present
  FROM g,
       LATERAL (SELECT unnest(generate_series(0, g.nj - 1)) AS j) j,
       LATERAL (SELECT unnest(generate_series(0, g.ni - 1)) AS i) i
),
r2 AS (
  SELECT g.doc_id, 2 AS rn, j.j * g.ni + i.i AS pos,
         ((g.doc_id * 7 + (j.j * g.ni + i.i) * 3) % 50) - 12 AS vq,
         ((j.j * g.ni + i.i + g.doc_id) % 5) <> 0 AS present
  FROM g,
       LATERAL (SELECT unnest(generate_series(0, g.nj - 1)) AS j) j,
       LATERAL (SELECT unnest(generate_series(0, g.ni - 1)) AS i) i
),
cells AS (SELECT * FROM r1 UNION ALL SELECT * FROM r2)
SELECT doc_id,
       CAST(rn AS INTEGER) AS record_number,
       CAST(COUNT(*) AS BIGINT) AS n_cells,
       CAST(SUM(CASE WHEN present THEN 1 ELSE 0 END) AS BIGINT) AS n_present,
       CAST(SUM(CASE WHEN present THEN vq ELSE 0 END) AS BIGINT) AS vsum_q,
       CAST(SUM(CASE WHEN present THEN vq * pos ELSE 0 END) AS BIGINT)
         AS wsum_q,
       CAST(SUM(CASE WHEN present THEN 0 ELSE pos END) AS BIGINT) AS misspos
FROM cells
GROUP BY doc_id, rn
ORDER BY doc_id, rn
""",
)
def grid_grib2_ieee_float_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IEEE FLOATING-POINT packing (data representation template 5.4 —
    raw floats, NO reference value / scales / width; some ECMWF and
    ocean-model products ship it where quantization is unacceptable)
    through the landing scan.  Section 5 is just the point count +
    precision octet (code table 5.7), so a decoder reading the 5.0
    layout here would slice float bytes as R/E/D and shear section 7 —
    the decode must branch BEFORE the generic header reads.

    Record 1 is binary32 with half-integer values (exact in float32,
    including negatives — 5.4 is the one packing with no
    non-negative-increment constraint); record 2 is binary64 under a
    section-6 BITMAP, proving raw-float payloads compose with masking.
    Witnesses are fixed-point quarter-scaled BIGINT sums (vq = 4·v,
    exact), position-weighted, plus present/missing counts; the
    foreign-bytes witness (tests/test_foreign_grib.py::
    test_foreign_ieee_float_grib2_decodes_to_pinned_values) pins the
    short section-5 layout octet-by-octet for both precisions.

    Scale: codec posture — one Arrow decode stage, statistic rows
    shuffle; at 100 TB template 5.4 archives trade bytes for zero
    decode CPU (a memcpy-shaped frombuffer per record, the cheapest
    packing the engine reads).
    """
    from typing import Iterator

    import numpy as np
    import pandas as pd

    from ..grid.grib2 import encode_grib2_message
    from ..sources.grib_source import RECORD_SCHEMA, _decode_batches

    ids = (
        table(spark, sf_dir, "documents")
        .filter((F.col("doc_id") % 41 == 15) & (F.col("doc_id") < 820))
        .select("doc_id")
    )

    def synth(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                ni, nj = 4 + d % 3, 3 + d % 2
                i = np.arange(ni)[None, :]
                j = np.arange(nj)[:, None]
                # quarter-exact values: vq/4 with vq the oracle's ints
                v1 = (((d * 3 + i * 7 + j * 5) % 40) * 2 - 20) / 4.0
                v1 = (v1 + np.zeros((nj, ni))).astype(np.float64)
                pos = (j * ni + i).astype(np.int64)
                v2 = (((d * 7 + pos * 3) % 50) - 12) / 4.0
                bm2 = (pos + d) % 5 != 0
                msgs = [
                    encode_grib2_message(v1, packing="ieee32"),
                    encode_grib2_message(v2, packing="ieee64", bitmap=bm2),
                ]
                rows.append({"path": f"doc://{d}", "content": b"".join(msgs)})
            yield pd.DataFrame(rows)

    files = ids.mapInPandas(synth, schema="path string, content binary")
    records = files.mapInPandas(_decode_batches, schema=RECORD_SCHEMA)
    cells = records.select(
        F.regexp_extract("path", r"doc://(\d+)", 1).cast("bigint").alias(
            "doc_id"
        ),
        "record_number",
        F.posexplode("values").alias("pos", "v"),
    )
    vq = F.round(F.col("v") * 4).cast("bigint")
    return (
        cells.groupBy("doc_id", "record_number")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_cells"),
            F.count(F.when(_present("v"), F.lit(1)))
            .cast("bigint")
            .alias("n_present"),
            F.sum(F.when(_present("v"), vq).otherwise(F.lit(0)))
            .cast("bigint")
            .alias("vsum_q"),
            F.sum(F.when(_present("v"), vq * F.col("pos")).otherwise(F.lit(0)))
            .cast("bigint")
            .alias("wsum_q"),
            F.sum(F.when(~_present("v"), F.col("pos")).otherwise(F.lit(0)))
            .cast("bigint")
            .alias("misspos"),
        )
        .orderBy("doc_id", "record_number")
    )


@query(
    "grid_grib2_secondary_missing_scan",
    tags=("grid", "codec", "python", "ingest"),
    oracle="""
WITH g AS (
  SELECT doc_id, 5 + doc_id % 3 AS ni, 3 + doc_id % 2 AS nj,
         500 + doc_id % 20 AS sub2
  FROM documents WHERE doc_id % 47 = 21 AND doc_id < 940
),
cells AS (
  SELECT g.doc_id, g.sub2, j.j * g.ni + i.i AS pos,
         80 + 2 * ((g.doc_id * 5 + i.i * 3 + j.j * 7) % 45) AS v,
         (i.i + 2 * j.j + g.doc_id) % 7 AS kind
  FROM g,
       LATERAL (SELECT unnest(generate_series(0, g.nj - 1)) AS j) j,
       LATERAL (SELECT unnest(generate_series(0, g.ni - 1)) AS i) i
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_cells,
       CAST(SUM(CASE WHEN kind = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_primary,
       CAST(SUM(CASE WHEN kind = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_secondary,
       CAST(SUM(CASE WHEN kind = 0 THEN 0
                     WHEN kind = 1 THEN sub2 ELSE v END) AS BIGINT) AS vsum,
       CAST(SUM(CASE WHEN kind = 0 THEN 0
                     WHEN kind = 1 THEN sub2 * pos
                     ELSE v * pos END) AS BIGINT) AS wsum,
       CAST(SUM(CASE WHEN kind = 0 THEN pos ELSE 0 END) AS BIGINT) AS nanpos
FROM cells
GROUP BY doc_id
ORDER BY doc_id
""",
)
def grid_grib2_secondary_missing_scan(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """SECONDARY MISSING VALUES (missing-value management 2, code
    table 5.5 — the NEXRAD-style distinction between "missing" and
    e.g. "below detection threshold") through the landing scan: the
    top TWO codes at every group width are the primary / secondary
    markers, an all-secondary group codes as the all-ones-minus-1
    group reference, and the section-5 SECONDARY SUBSTITUTE (octets
    28-31) lands RAW at secondary points — the producer's declared
    field value, preserved where NaN would destroy it — while primary
    points land NaN→NULL as ever.  Composes with spatial differencing
    (the subsequence skips BOTH kinds): per document the order cycles
    0/1/2.

    Witnesses: primary/secondary counts (substitute values are
    disjoint from the data range, so the count is exact), the value
    sum INCLUDING substitutes, the position-weighted sum (a marker
    read at the wrong width scatters both) and the NaN-position
    checksum.  The foreign-bytes witness (tests/test_foreign_grib.py::
    test_foreign_mvm2_grib2_decodes_to_pinned_values) pins the marker
    codes and the raw substitute landing octet-by-octet.

    Scale: codec posture — one Arrow decode stage, statistic rows
    shuffle; supporting mvm=2 is what lets a 100 TB radar-product
    archive land without quarantining every below-threshold record.
    """
    from typing import Iterator

    import numpy as np
    import pandas as pd

    from ..grid.grib2 import encode_grib2_message
    from ..sources.grib_source import RECORD_SCHEMA, _decode_batches

    ids = (
        table(spark, sf_dir, "documents")
        .filter((F.col("doc_id") % 47 == 21) & (F.col("doc_id") < 940))
        .select("doc_id")
    )

    def synth(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                ni, nj = 5 + d % 3, 3 + d % 2
                i = np.arange(ni)[None, :]
                j = np.arange(nj)[:, None]
                v = (80 + 2 * ((d * 5 + i * 3 + j * 7) % 45)).astype(
                    np.float64
                )
                kind = (i + 2 * j + d) % 7
                mm = (kind == 0) | np.zeros_like(v, bool)
                sm = (kind == 1) | np.zeros_like(v, bool)
                order = d % 3
                kw = dict(
                    packing="complex" if order == 0 else "complex_diff",
                    missing_mask=mm,
                    secondary_mask=sm,
                    secondary_substitute=float(500 + d % 20),
                    group_len=3 + d % 6,
                    reference_value=0.0,
                )
                if order:
                    kw["spatial_diff_order"] = order
                msg = encode_grib2_message(v, **kw)
                rows.append({"path": f"doc://{d}", "content": msg})
            yield pd.DataFrame(rows)

    files = ids.mapInPandas(synth, schema="path string, content binary")
    records = files.mapInPandas(_decode_batches, schema=RECORD_SCHEMA)
    cells = records.select(
        F.regexp_extract("path", r"doc://(\d+)", 1).cast("bigint").alias(
            "doc_id"
        ),
        F.posexplode("values").alias("pos", "v"),
    )
    sub2 = F.lit(500) + F.col("doc_id") % 20
    is_sec = _present("v") & (F.col("v").cast("bigint") == sub2)
    return (
        cells.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_cells"),
            F.count(F.when(~_present("v"), F.lit(1)))
            .cast("bigint")
            .alias("n_primary"),
            F.count(F.when(is_sec, F.lit(1)))
            .cast("bigint")
            .alias("n_secondary"),
            F.sum(F.when(_present("v"), F.col("v")).otherwise(F.lit(0.0)))
            .cast("bigint")
            .alias("vsum"),
            F.sum(
                F.when(_present("v"), F.col("v") * F.col("pos")).otherwise(
                    F.lit(0.0)
                )
            )
            .cast("bigint")
            .alias("wsum"),
            F.sum(F.when(~_present("v"), F.col("pos")).otherwise(F.lit(0)))
            .cast("bigint")
            .alias("nanpos"),
        )
        .orderBy("doc_id")
    )


@query(
    "grid_grib2_aec_scan",
    tags=("grid", "codec", "python", "ingest"),
    oracle="""
WITH g AS (
  SELECT doc_id, 6 + doc_id % 4 AS ni, 3 + doc_id % 2 AS nj
  FROM documents WHERE doc_id % 53 = 11 AND doc_id < 1060
),
cells AS (
  SELECT g.doc_id, p.pos,
         100 + ((g.doc_id * 3 + p.pos * 5) % 40) AS v
  FROM g,
       LATERAL (
         SELECT unnest(generate_series(0, g.ni * g.nj - 1)) AS pos
       ) p
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_cells,
       CAST(SUM(v) AS BIGINT) AS vsum,
       CAST(SUM(v * pos) AS BIGINT) AS wsum
FROM cells
GROUP BY doc_id
ORDER BY doc_id
""",
)
def grid_grib2_aec_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCSDS 121.0 / AEC packing (data representation template 5.42 —
    the lossless Rice coding NCEP adopted for operational GFS output;
    wgrib2 reads it through libaec) through the landing scan, on the
    engine's FROM-SCRATCH codec (grid/aec.py, like the JPEG2000 and
    PNG codecs): per document the field encodes at a per-document
    CCSDS block size (8/16/32) and reference sample interval (1-4),
    exercising the preprocessor's reference-sample restarts, the
    per-block option selection and the zero/low-entropy run machinery
    across documents.

    Witness: exact integer value and position-weighted sums — any
    mis-decoded block, swallowed reference sample or off-by-one in the
    FS/split bitstream scatters values and cannot cancel.  The codec
    itself carries its own foreign-bytes witnesses for EVERY decoder
    option (tests/test_aec.py: hand-laid FS / split-k / uncompressed /
    zero-run + ROS / second-extension / preprocessed-reference
    bitstreams) and the template's octet layout is pinned by
    tests/test_foreign_grib.py::
    test_foreign_aec_grib2_decodes_to_pinned_values.

    Scale: codec posture — one Arrow decode stage, statistic rows
    shuffle; at 100 TB, 5.42 is why a post-2022 NCEP archive scan
    reads the producer's actual bytes (GFS moved to AEC), and the
    pure-Python block decoder is the same swap-in CPU constant as the
    complex unpacker (grib2._decode_complex_s7 docstring).
    """
    from typing import Iterator

    import numpy as np
    import pandas as pd

    from ..grid.grib2 import encode_grib2_message
    from ..sources.grib_source import RECORD_SCHEMA, _decode_batches

    ids = (
        table(spark, sf_dir, "documents")
        .filter((F.col("doc_id") % 53 == 11) & (F.col("doc_id") < 1060))
        .select("doc_id")
    )

    def synth(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                ni, nj = 6 + d % 4, 3 + d % 2
                pos = np.arange(ni * nj)
                v = (100 + ((d * 3 + pos * 5) % 40)).astype(
                    np.float64
                ).reshape(nj, ni)
                msg = encode_grib2_message(
                    v,
                    packing="aec",
                    nbits=8,
                    reference_value=100.0,
                    aec_block_size=8 << (d % 3),
                    aec_rsi=1 + d % 4,
                )
                rows.append({"path": f"doc://{d}", "content": msg})
            yield pd.DataFrame(rows)

    files = ids.mapInPandas(synth, schema="path string, content binary")
    records = files.mapInPandas(_decode_batches, schema=RECORD_SCHEMA)
    cells = records.select(
        F.regexp_extract("path", r"doc://(\d+)", 1).cast("bigint").alias(
            "doc_id"
        ),
        F.posexplode("values").alias("pos", "v"),
    )
    return (
        cells.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_cells"),
            F.sum("v").cast("bigint").alias("vsum"),
            F.sum(F.col("v") * F.col("pos")).cast("bigint").alias("wsum"),
        )
        .orderBy("doc_id")
    )


@query(
    "grid_grib2_log_scan",
    tags=("grid", "codec", "python", "ingest"),
    oracle="""
WITH g AS (
  SELECT doc_id, 4 + doc_id % 3 AS ni, 3 + doc_id % 2 AS nj
  FROM documents WHERE doc_id % 59 = 7 AND doc_id < 1180
),
cells AS (
  SELECT g.doc_id, j.j * g.ni + i.i AS pos,
         CAST(ROUND(
           (EXP((g.doc_id * 3 + i.i * 5 + j.j * 7) % 9) - 10) * 1e6
         ) AS BIGINT) AS v6
  FROM g,
       LATERAL (SELECT unnest(generate_series(0, g.nj - 1)) AS j) j,
       LATERAL (SELECT unnest(generate_series(0, g.ni - 1)) AS i) i
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_cells,
       CAST(SUM(v6) AS BIGINT) AS v6sum,
       CAST(SUM(v6 * pos) AS BIGINT) AS w6sum
FROM cells
GROUP BY doc_id
ORDER BY doc_id
""",
)
def grid_grib2_log_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOGARITHM pre-processing (data representation template 5.61 —
    the ECMWF form for precipitation-style fields whose dynamic range
    spans decades): Z = ln(Y + B) simple-packs with the B parameter at
    section-5 octets 21-24, and decode inverts Y = e^Z − B.  The
    fixture builds Y = e^k − B from integer k, so the packed Z domain
    is EXACTLY the integer k sequence (R = 0, E = D = 0) and the only
    float arithmetic is one exp per cell — restated identically by the
    oracle's EXP(), with the micro-scaled fixed-point rounding margins
    verified safe for every k in 0..8 (nearest fractional distance to
    a rounding boundary is 7e-3, vs the ~1e-13 cross-library exp
    disagreement bound).

    Witness: per document the micro-scaled value and position-weighted
    sums — a B applied on the wrong side, a log/exp inversion slip or
    an off-by-one in the Z stream cannot cancel.  The template layout
    is pinned by tests/test_foreign_grib.py::
    test_foreign_log_grib2_decodes_to_pinned_values.

    Scale: codec posture — one Arrow decode stage; the exp inversion
    is one vectorized numpy pass per record.
    """
    from typing import Iterator

    import numpy as np
    import pandas as pd

    from ..grid.grib2 import encode_grib2_message
    from ..sources.grib_source import RECORD_SCHEMA, _decode_batches

    ids = (
        table(spark, sf_dir, "documents")
        .filter((F.col("doc_id") % 59 == 7) & (F.col("doc_id") < 1180))
        .select("doc_id")
    )

    def synth(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                ni, nj = 4 + d % 3, 3 + d % 2
                i = np.arange(ni)[None, :]
                j = np.arange(nj)[:, None]
                k = ((d * 3 + i * 5 + j * 7) % 9).astype(np.float64)
                v = np.exp(k) - 10.0
                msg = encode_grib2_message(
                    v,
                    packing="log",
                    log_offset=10.0,
                    nbits=8,
                    reference_value=0.0,
                )
                rows.append({"path": f"doc://{d}", "content": msg})
            yield pd.DataFrame(rows)

    files = ids.mapInPandas(synth, schema="path string, content binary")
    records = files.mapInPandas(_decode_batches, schema=RECORD_SCHEMA)
    cells = records.select(
        F.regexp_extract("path", r"doc://(\d+)", 1).cast("bigint").alias(
            "doc_id"
        ),
        F.posexplode("values").alias("pos", "v"),
    )
    v6 = F.round(F.col("v") * F.lit(1e6)).cast("bigint")
    return (
        cells.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_cells"),
            F.sum(v6).cast("bigint").alias("v6sum"),
            F.sum(v6 * F.col("pos")).cast("bigint").alias("w6sum"),
        )
        .orderBy("doc_id")
    )


@query(
    "grid_grib2_chemistry_scan",
    tags=("grid", "codec", "python", "ingest"),
    oracle="""
WITH g AS (
  SELECT doc_id, 4 + doc_id % 3 AS ni, 3 + doc_id % 2 AS nj
  FROM documents WHERE doc_id % 61 = 13 AND doc_id < 1220
),
rec AS (
  SELECT doc_id, ni, nj, r.r AS r
  FROM g, UNNEST(generate_series(0, 3)) AS r(r)
),
cells AS (
  SELECT doc_id, r, p.pos,
         50 + ((doc_id * 3 + r * 7 + p.pos * 5) % 60) AS v
  FROM rec,
       LATERAL (
         SELECT unnest(generate_series(0, ni * nj - 1)) AS pos
       ) p
)
SELECT doc_id,
       CAST(r + 1 AS INTEGER) AS record_number,
       CAST(40 + r AS INTEGER) AS product_template,
       CAST((doc_id * 7 + r) % 200 AS INTEGER) AS constituent_type,
       CAST(CASE WHEN r IN (1, 3) THEN 1 + doc_id % 50 END
         AS INTEGER) AS ensemble_member,
       CAST(CASE WHEN r IN (2, 3) THEN 1 END AS INTEGER)
         AS statistical_process,
       CASE WHEN r IN (2, 3)
         THEN make_timestamp(2022, 1 + doc_id % 12, 3, 0, 0, 0)
       END AS interval_end,
       CAST(COUNT(*) AS BIGINT) AS n_cells,
       CAST(SUM(v) AS BIGINT) AS vsum
FROM cells
GROUP BY doc_id, r
ORDER BY doc_id, r
""",
)
def grid_grib2_chemistry_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ATMOSPHERIC-CHEMISTRY product templates 4.40-4.43 (the CAMS
    family: every form is its 4.0-family base with the 2-octet
    code-table-4.230 constituent type inserted after the parameter
    number) through the landing scan: each document's archive carries
    all four forms — plain (4.40), ensemble member (4.41),
    statistical (4.42) and ensemble-statistical (4.43) — with a
    per-record constituent, landing the new ``constituent_type``
    column beside the family's shifted ensemble / statistical fields.
    wgrib2 scans these through the same ``-match`` path the reference
    shells out to (/root/reference/src/file-conversions.js:76-112);
    CAMS forecast archives ship them operationally.

    Witness: per (document, record) the template number, constituent,
    ensemble member, statistical process AND interval end — every
    field the 2-octet insert shifts — plus exact value sums; a decoder
    reading the base-template offsets unspliced would land the
    constituent octets as the generating process and shear every later
    field.  The wire layout is pinned foreign by
    tests/test_foreign_grib.py::
    test_foreign_chemistry_ensemble_statistical_decodes.

    Scale: landing-scan posture — one Arrow decode stage, only
    per-record statistic rows shuffle; at 100 TB the constituent lands
    as a plain filterable column, so "only NO2" is a pushed predicate
    on the landed table, not a re-decode.
    """
    from typing import Iterator

    import numpy as np
    import pandas as pd

    from ..grid.grib2 import encode_grib2_message
    from ..sources.grib_source import RECORD_SCHEMA, _decode_batches

    ids = (
        table(spark, sf_dir, "documents")
        .filter((F.col("doc_id") % 61 == 13) & (F.col("doc_id") < 1220))
        .select("doc_id")
    )

    def synth(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                ni, nj = 4 + d % 3, 3 + d % 2
                pos = np.arange(ni * nj)
                ens = {"type": 3, "member": 1 + d % 50, "size": 51}
                stat = {
                    "process": 1,
                    "interval_end": (2022, 1 + d % 12, 3, 0, 0),
                    "range_hours": 24,
                }
                content = b""
                for r, extra in enumerate(
                    (
                        {},
                        {"ensemble": ens},
                        {"statistical": stat},
                        {"ensemble": ens, "statistical": stat},
                    )
                ):
                    v = (
                        50 + ((d * 3 + r * 7 + pos * 5) % 60)
                    ).astype(np.float64).reshape(nj, ni)
                    content += encode_grib2_message(
                        v,
                        chemistry=(d * 7 + r) % 200,
                        nbits=8,
                        reference_value=50.0,
                        **extra,
                    )
                rows.append({"path": f"doc://{d}", "content": content})
            yield pd.DataFrame(rows)

    files = ids.mapInPandas(synth, schema="path string, content binary")
    records = files.mapInPandas(_decode_batches, schema=RECORD_SCHEMA)
    zero = F.lit(0).cast("bigint")
    return records.select(
        F.regexp_extract("path", r"doc://(\d+)", 1).cast("bigint").alias(
            "doc_id"
        ),
        "record_number",
        "product_template",
        "constituent_type",
        "ensemble_member",
        "statistical_process",
        "interval_end",
        F.size("values").cast("bigint").alias("n_cells"),
        F.aggregate(
            "values", zero, lambda a, x: a + x.cast("bigint")
        ).alias("vsum"),
    ).orderBy("doc_id", "record_number")


@query(
    "grid_grib2_aerosol_scan",
    tags=("grid", "codec", "python", "ingest"),
    oracle="""
WITH g AS (
  SELECT doc_id, 4 + doc_id % 3 AS ni, 3 + doc_id % 2 AS nj
  FROM documents WHERE doc_id % 67 = 5 AND doc_id < 1340
),
rec AS (
  SELECT doc_id, ni, nj, r.r AS r
  FROM g, UNNEST(generate_series(0, 1)) AS r(r)
),
cells AS (
  SELECT doc_id, r, p.pos,
         30 + ((doc_id * 5 + r * 11 + p.pos * 3) % 50) AS v
  FROM rec,
       LATERAL (
         SELECT unnest(generate_series(0, ni * nj - 1)) AS pos
       ) p
)
SELECT doc_id,
       CAST(r + 1 AS INTEGER) AS record_number,
       CAST(CASE r WHEN 0 THEN 45 ELSE 48 END AS INTEGER)
         AS product_template,
       CAST(CASE r WHEN 0 THEN 62000 + doc_id % 20 ELSE 62010 END
         AS INTEGER) AS aerosol_type,
       CAST(2 AS INTEGER) AS aerosol_size_interval,
       CAST(ROUND((20 + doc_id % 30) / POWER(10, 8) * 1e9) AS BIGINT)
         AS first_size_nm,
       CAST(ROUND((50 + doc_id % 45) / POWER(10, 7) * 1e9) AS BIGINT)
         AS second_size_nm,
       CAST(CASE r WHEN 1 THEN 11 END AS INTEGER)
         AS wavelength_interval,
       CAST(CASE r WHEN 1
         THEN ROUND((440 + doc_id % 200) / POWER(10, 9) * 1e9)
       END AS BIGINT) AS first_wavelength_nm,
       CAST(CASE r WHEN 1 THEN 865 END AS BIGINT)
         AS second_wavelength_nm,
       CAST(CASE r WHEN 0 THEN 1 + doc_id % 40 END AS INTEGER)
         AS ensemble_member,
       CAST(COUNT(*) AS BIGINT) AS n_cells,
       CAST(SUM(v) AS BIGINT) AS vsum
FROM cells
GROUP BY doc_id, r
ORDER BY doc_id, r
""",
)
def grid_grib2_aerosol_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AEROSOL product templates 4.45/4.48 through the landing scan:
    each document's archive carries an ensemble aerosol record (4.45 —
    the code-table-4.233 aerosol type plus the code-table-4.91 size
    interval with both signed-magnitude (scale, value) bounds, then
    the 4.1-style ensemble octets shifted 13 deep) and an
    optical-depth record (4.48 — the same block plus the wavelength
    interval, 24 inserted octets), landing the aerosol type, the
    decoded size bounds and the wavelength bounds as columns.

    Witness: the size/wavelength bounds land as exact nanometre
    integers (ROUND(m·1e9) — both sides compute the same
    value/10^scale double then the same rounding, so any
    signed-magnitude or offset slip in the 13/24-octet insert shifts a
    bound or a later field and cannot cancel), beside the
    per-template ensemble-member presence pattern (4.45 yes, 4.48 no)
    and exact value sums.  The 4.48 wire layout is pinned foreign by
    tests/test_foreign_grib.py::test_foreign_aerosol_wavelength_decodes.

    Scale: identical landing-scan posture to the chemistry scan — one
    Arrow decode stage, statistic rows shuffle, aerosol metadata as
    filterable columns.
    """
    from typing import Iterator

    import numpy as np
    import pandas as pd

    from ..grid.grib2 import encode_grib2_message
    from ..sources.grib_source import RECORD_SCHEMA, _decode_batches

    ids = (
        table(spark, sf_dir, "documents")
        .filter((F.col("doc_id") % 67 == 5) & (F.col("doc_id") < 1340))
        .select("doc_id")
    )

    def synth(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                ni, nj = 4 + d % 3, 3 + d % 2
                pos = np.arange(ni * nj)

                def field(r: int) -> np.ndarray:
                    return (
                        30 + ((d * 5 + r * 11 + pos * 3) % 50)
                    ).astype(np.float64).reshape(nj, ni)

                sizes = {
                    "size_interval": 2,
                    "first_size": (8, 20 + d % 30),
                    "second_size": (7, 50 + d % 45),
                }
                m45 = encode_grib2_message(
                    field(0),
                    aerosol={"type": 62000 + d % 20, **sizes},
                    ensemble={"type": 3, "member": 1 + d % 40, "size": 40},
                    nbits=8,
                    reference_value=30.0,
                )
                m48 = encode_grib2_message(
                    field(1),
                    aerosol={
                        "type": 62010,
                        **sizes,
                        "wavelength_interval": 11,
                        "first_wavelength": (9, 440 + d % 200),
                        "second_wavelength": (9, 865),
                    },
                    nbits=8,
                    reference_value=30.0,
                )
                rows.append({"path": f"doc://{d}", "content": m45 + m48})
            yield pd.DataFrame(rows)

    files = ids.mapInPandas(synth, schema="path string, content binary")
    records = files.mapInPandas(_decode_batches, schema=RECORD_SCHEMA)

    def nm(col: str):
        return F.round(F.col(col) * F.lit(1e9)).cast("bigint")

    zero = F.lit(0).cast("bigint")
    return records.select(
        F.regexp_extract("path", r"doc://(\d+)", 1).cast("bigint").alias(
            "doc_id"
        ),
        "record_number",
        "product_template",
        "aerosol_type",
        "aerosol_size_interval",
        nm("aerosol_first_size_m").alias("first_size_nm"),
        nm("aerosol_second_size_m").alias("second_size_nm"),
        F.col("aerosol_wavelength_interval").alias("wavelength_interval"),
        nm("aerosol_first_wavelength_m").alias("first_wavelength_nm"),
        nm("aerosol_second_wavelength_m").alias("second_wavelength_nm"),
        "ensemble_member",
        F.size("values").cast("bigint").alias("n_cells"),
        F.aggregate(
            "values", zero, lambda a, x: a + x.cast("bigint")
        ).alias("vsum"),
    ).orderBy("doc_id", "record_number")


@query(
    "grid_grib2_reduced_bitmap_scan",
    tags=("grid", "codec", "python", "ingest"),
    oracle="""
WITH g AS (
  SELECT doc_id FROM documents WHERE doc_id % 71 = 3 AND doc_id < 1420
),
rrows AS (
  SELECT g.doc_id, r.r AS r, j.j AS j,
         3 + ((g.doc_id + 5 * j.j) % 4) AS rowni,
         2 * (2 + g.doc_id % 2) AS nj
  FROM g,
       UNNEST(generate_series(1, 2)) AS r(r),
       LATERAL (
         SELECT unnest(generate_series(0, 2 * (2 + g.doc_id % 2) - 1)) AS j
       ) j
),
roff AS (
  SELECT doc_id, r, j, rowni, nj,
         COALESCE(SUM(rowni) OVER (
           PARTITION BY doc_id, r ORDER BY j
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS start_pos
  FROM rrows
),
cells AS (
  SELECT o.doc_id, o.r, o.nj, o.start_pos + i.i AS pos,
         60 + 2 * ((o.doc_id * 3 + o.r * 5 + o.j * 7 + i.i * 5) % 35) AS v,
         ((o.doc_id + o.r + o.start_pos + i.i) % 4) <> 0 AS present
  FROM roff o,
       LATERAL (SELECT unnest(generate_series(0, o.rowni - 1)) AS i) i
)
SELECT doc_id,
       CAST(r AS INTEGER) AS record_number,
       CAST(MIN(nj) AS INTEGER) AS nj,
       CAST(COUNT(*) AS BIGINT) AS n_cells,
       CAST(SUM(CASE WHEN present THEN 1 ELSE 0 END) AS BIGINT) AS n_present,
       CAST(SUM(CASE WHEN present THEN v ELSE 0 END) AS BIGINT) AS vsum,
       CAST(SUM(CASE WHEN present THEN v * pos ELSE 0 END) AS BIGINT) AS wsum,
       CAST(SUM(CASE WHEN present THEN 0 ELSE pos END) AS BIGINT) AS misspos
FROM cells
GROUP BY doc_id, r
ORDER BY doc_id, r
""",
)
def grid_grib2_reduced_bitmap_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BITMAP × REDUCED Gaussian in EDITION 2 — closing the r15
    cross-edition asymmetry (GRIB1 reduced bitmaps landed in r15;
    the GRIB2 encoder refused the combination until r16 even though
    the decode composed generically): section 6 carries sum(row_ni)
    bits in FLAT storage order, the data section packs only the
    present cells, masked cells land NaN→NULL while the per-cell
    geometry still covers every cell.

    Record 1 packs the present subsequence SIMPLE (template 5.0);
    record 2 packs it COMPLEX with order-2 spatial differencing
    (template 5.3) — the group-splitting machinery runs over the
    bitmap-compacted stream, so a mask slip ALSO corrupts the
    differencing origin and cannot cancel.

    Witnesses per (document, record): present/missing counts, the
    present-value sum, the position-weighted present sum (a mask
    shifted by one cell scatters every value) and the missing-position
    checksum.  The wire layout is pinned foreign by
    tests/test_foreign_grib.py::
    test_foreign_reduced_bitmapped_grib2_decodes_to_pinned_values.

    Scale: the landing posture — one Arrow decode stage, statistic
    rows shuffle; masked ocean/land fields on reduced ERA5-native
    grids are exactly what a 100 TB CDS archive scan reads.
    """
    from typing import Iterator

    import numpy as np
    import pandas as pd

    from ..grid.grib2 import encode_grib2_message
    from ..sources.grib_source import RECORD_SCHEMA, _decode_batches

    ids = (
        table(spark, sf_dir, "documents")
        .filter((F.col("doc_id") % 71 == 3) & (F.col("doc_id") < 1420))
        .select("doc_id")
    )

    def synth(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                nj = 2 * (2 + d % 2)
                row_ni = [3 + ((d + 5 * j) % 4) for j in range(nj)]
                content = b""
                for r, packing in ((1, "simple"), (2, "complex_diff")):
                    v = np.concatenate(
                        [
                            60.0
                            + 2 * ((d * 3 + r * 5 + j * 7 + np.arange(n) * 5) % 35)
                            for j, n in enumerate(row_ni)
                        ]
                    )
                    pos = np.arange(v.size)
                    bm = (d + r + pos) % 4 != 0
                    content += encode_grib2_message(
                        v, reduced_ni=row_ni, bitmap=bm,
                        reference_value=60.0, nbits=8,
                        packing=packing, group_len=4,
                    )
                rows.append({"path": f"doc://{d}", "content": content})
            yield pd.DataFrame(rows)

    files = ids.mapInPandas(synth, schema="path string, content binary")
    records = files.mapInPandas(_decode_batches, schema=RECORD_SCHEMA)
    cells = records.select(
        F.regexp_extract("path", r"doc://(\d+)", 1).cast("bigint").alias(
            "doc_id"
        ),
        "record_number",
        "nj",
        F.posexplode("values").alias("pos", "v"),
    )
    return (
        cells.groupBy("doc_id", "record_number")
        .agg(
            F.min("nj").alias("nj"),
            F.count(F.lit(1)).cast("bigint").alias("n_cells"),
            F.count(F.when(_present("v"), F.lit(1)))
            .cast("bigint")
            .alias("n_present"),
            F.sum(F.when(_present("v"), F.col("v")).otherwise(F.lit(0.0)))
            .cast("bigint")
            .alias("vsum"),
            F.sum(
                F.when(_present("v"), F.col("v") * F.col("pos")).otherwise(
                    F.lit(0.0)
                )
            )
            .cast("bigint")
            .alias("wsum"),
            F.sum(F.when(~_present("v"), F.col("pos")).otherwise(F.lit(0)))
            .cast("bigint")
            .alias("misspos"),
        )
        .orderBy("doc_id", "record_number")
    )


@query(
    "grid_grib2_runlength_scan",
    tags=("grid", "codec", "python", "ingest"),
    oracle="""
WITH g AS (
  SELECT doc_id,
         10 + doc_id % 5 AS ni,
         6 + doc_id % 3 AS nj
  FROM documents WHERE doc_id % 73 = 9 AND doc_id < 1460
),
cells AS (
  SELECT doc_id, p.pos,
         CASE WHEN (doc_id + p.pos) % 7 < 3 THEN 0
              ELSE 1 + ((doc_id * 3 + p.pos // 5) % 6) END AS lv
  FROM g,
       LATERAL (
         SELECT unnest(generate_series(0, ni * nj - 1)) AS pos
       ) p
),
vals AS (
  SELECT doc_id, pos, lv,
         CASE lv WHEN 1 THEN 5 WHEN 2 THEN 10 WHEN 3 THEN 20
                 WHEN 4 THEN 40 WHEN 5 THEN 80 WHEN 6 THEN 160
         END AS v10
  FROM cells
)
SELECT doc_id,
       CAST(1 AS INTEGER) AS record_number,
       CAST(20 AS INTEGER) AS product_template,
       CAST(100 + doc_id % 50 AS INTEGER) AS radar_site_number,
       CAST(COUNT(*) AS BIGINT) AS n_cells,
       CAST(SUM(CASE WHEN lv > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_present,
       CAST(SUM(CASE WHEN lv > 0 THEN v10 ELSE 0 END) AS BIGINT)
         AS v10sum,
       CAST(SUM(CASE WHEN lv > 0 THEN v10 * pos ELSE 0 END) AS BIGINT)
         AS w10sum,
       CAST(SUM(CASE WHEN lv = 0 THEN pos ELSE 0 END) AS BIGINT)
         AS nanpos
FROM vals
GROUP BY doc_id
ORDER BY doc_id
""",
)
def grid_grib2_runlength_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RUN-LENGTH LEVEL PACKING (data representation template 5.200 —
    the JMA radar-composite packing) through the landing scan,
    composed with the radar PDT 4.20 exactly the way JMA precipitation
    composites ship: each document's record carries a level field
    (the 2-octet scaled representative table, decimal scale 1) whose
    zero level IS the missing mask, packed as nbits-wide codes with
    base-LNGU run digits (LSB-first, the JMA Technical Information
    No. 215 convention wgrib2 implements).

    The level pattern alternates missing stretches with 5-cell level
    runs, so every document exercises the run-digit machinery; the
    witnesses (present/missing counts, the exact ×10 value sum, the
    position-weighted sum and the missing-position checksum) catch a
    run shifted by one cell, a digit decoded at the wrong significance
    or a level table read at the wrong offset.  The wire layout and
    the LSB-first digit order are pinned foreign by
    tests/test_foreign_grib.py::
    test_foreign_runlength_grib2_decodes_to_pinned_values.

    Scale: the landing posture — one Arrow decode stage, statistic
    rows shuffle; RLE level fields are the densest national-composite
    archives (radar mosaics at 1 km), and the level table rides in
    section 5 per record, no side catalog.
    """
    from typing import Iterator

    import numpy as np
    import pandas as pd

    from ..grid.grib2 import encode_grib2_message
    from ..sources.grib_source import RECORD_SCHEMA, _decode_batches

    tbl = [5, 10, 20, 40, 80, 160]

    ids = (
        table(spark, sf_dir, "documents")
        .filter((F.col("doc_id") % 73 == 9) & (F.col("doc_id") < 1460))
        .select("doc_id")
    )

    def synth(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                ni, nj = 10 + d % 5, 6 + d % 3
                pos = np.arange(ni * nj)
                lv = np.where(
                    (d + pos) % 7 < 3,
                    0,
                    1 + ((d * 3 + pos // 5) % 6),
                )
                v = np.where(
                    lv == 0,
                    np.nan,
                    np.array([np.nan] + tbl)[lv] / 10.0,
                ).reshape(nj, ni)
                msg = encode_grib2_message(
                    v,
                    packing="runlength",
                    rle_table=tbl,
                    nbits=4,
                    decimal_scale=1,
                    radar=dict(
                        lat=36.0, lon=140.0, elevation=50,
                        site_id="RJTD", site_number=100 + d % 50,
                    ),
                )
                rows.append({"path": f"doc://{d}", "content": msg})
            yield pd.DataFrame(rows)

    files = ids.mapInPandas(synth, schema="path string, content binary")
    records = files.mapInPandas(_decode_batches, schema=RECORD_SCHEMA)
    cells = records.select(
        F.regexp_extract("path", r"doc://(\d+)", 1).cast("bigint").alias(
            "doc_id"
        ),
        "record_number",
        "product_template",
        "radar_site_number",
        F.posexplode("values").alias("pos", "v"),
    )
    v10 = F.round(F.col("v") * F.lit(10.0)).cast("bigint")
    return (
        cells.groupBy("doc_id")
        .agg(
            F.min("record_number").alias("record_number"),
            F.min("product_template").alias("product_template"),
            F.min("radar_site_number").alias("radar_site_number"),
            F.count(F.lit(1)).cast("bigint").alias("n_cells"),
            F.count(F.when(_present("v"), F.lit(1)))
            .cast("bigint")
            .alias("n_present"),
            F.sum(F.when(_present("v"), v10).otherwise(F.lit(0)))
            .cast("bigint")
            .alias("v10sum"),
            F.sum(
                F.when(_present("v"), v10 * F.col("pos")).otherwise(F.lit(0))
            )
            .cast("bigint")
            .alias("w10sum"),
            F.sum(F.when(~_present("v"), F.col("pos")).otherwise(F.lit(0)))
            .cast("bigint")
            .alias("nanpos"),
        )
        .orderBy("doc_id")
    )
