"""Grid/spatial catalog queries (SURVEY.md §2.2 P4, §1 data model).

The polygon-clip operator over a synthetic lat/lon grid derived
deterministically from the customer table (the fixtures carry no
coordinates). The oracle's ray-cast SQL is GENERATED from the same vertex
list as the Spark expression — one geometry definition, two renderings —
so the hash gate checks the actual clip arithmetic edge by edge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..grid.ops import point_in_polygon
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

# Deterministic synthetic coordinates: integer-derived with .5 offsets,
# identical double arithmetic in both engines.
_LON_SQL = "CAST(c_custkey * 7 % 360 AS DOUBLE) - 180.0 + 0.5"
_LAT_SQL = "CAST(c_custkey * 13 % 180 AS DOUBLE) - 90.0 + 0.5"


def _raycast_sql(lon: str, lat: str) -> str:
    """Render the exact per-edge crossing test of grid.ops.point_in_polygon
    for the fixed polygon."""
    terms = []
    n = len(CLIP_POLYGON)
    for i in range(n):
        x1, y1 = CLIP_POLYGON[i]
        x2, y2 = CLIP_POLYGON[(i + 1) % n]
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
