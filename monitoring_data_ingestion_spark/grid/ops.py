"""Raster dataflow operators over the long-format grid (SURVEY.md §2).

Each operator re-expresses one external-CLI stage of the reference's
pipeline (wgrib extract / gdalwarp clip / cdo mulc / cdo timmean /
cdo sub — /root/reference/src/file-conversions.js) as a native DataFrame
transformation, so Catalyst fuses the whole per-month pipeline into one
codegen'd pass instead of five temp-file processes.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .model import NODATA_CLIP


def nodata_to_null(df: DataFrame, sentinels: Sequence[float] = (NODATA_CLIP, -999.0)) -> DataFrame:
    """Sentinel → NULL at the scan edge (P5). Aggregates then skip nodata
    exactly like CDO's -setmissval handling."""
    cond = F.col("value").isin(list(sentinels))
    return df.withColumn("value", F.when(cond, F.lit(None)).otherwise(F.col("value")))


def record_select(df: DataFrame, variable: str) -> DataFrame:
    """Record/column-family projection (P1/S5): one variable's grid."""
    return df.filter(F.col("variable") == F.lit(variable))


def bbox_filter(df: DataFrame, north: float, west: float, south: float, east: float) -> DataFrame:
    """AOI bbox predicate (P3) — [N, W, S, E] as in the CDS `area` request
    (src/sources/era5monthly.js:34). Plain range predicates → pushed to the
    parquet scan by Catalyst."""
    return df.filter(
        F.col("lat").between(south, north) & F.col("lon").between(west, east)
    )


def scale_values(df: DataFrame, factor: float) -> DataFrame:
    """Unit conversion `cdo mulc` (F1, src/file-conversions.js:197-204)."""
    return df.withColumn("value", F.col("value") * F.lit(factor))


def point_in_polygon(lat: Column, lon: Column, vertices: Sequence[tuple[float, float]]) -> Column:
    """Ray-casting point-in-polygon as a pure native expression.

    The polygon (closed ring of (lon, lat) vertices) is folded into a
    literal edge array; crossings are counted with `aggregate` — entirely
    JVM-side, no Python UDF, broadcast-free (the geometry lives in the
    plan). For multi-thousand-vertex geometries switch to a pandas UDF with
    a broadcast prepared polygon; for the reference's single clip outline
    this form whole-stage-codegens.
    """
    edges = []
    n = len(vertices)
    for i in range(n):
        x1, y1 = vertices[i]
        x2, y2 = vertices[(i + 1) % n]
        edges.append(
            F.struct(
                F.lit(float(x1)).alias("x1"),
                F.lit(float(y1)).alias("y1"),
                F.lit(float(x2)).alias("x2"),
                F.lit(float(y2)).alias("y2"),
            )
        )
    edge_arr = F.array(*edges)
    px, py = lon, lat
    crossings = F.aggregate(
        edge_arr,
        F.lit(0),
        lambda acc, e: acc
        + F.when(
            ((e.y1 > py) != (e.y2 > py))
            & (px < (e.x2 - e.x1) * (py - e.y1) / (e.y2 - e.y1) + e.x1),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    return crossings % 2 == 1


def clip_polygon(
    df: DataFrame, vertices: Sequence[tuple[float, float]], drop_outside: bool = False
) -> DataFrame:
    """Polygon clip (P4, gdalwarp -cutline, src/file-conversions.js:174-195).

    Default matches the reference's nodata semantics: cells outside the
    polygon keep their row but get a NULL value (−9999 → NULL). With
    ``drop_outside`` the rows are filtered instead (smaller output)."""
    inside = point_in_polygon(F.col("lat"), F.col("lon"), vertices)
    if drop_outside:
        return df.filter(inside)
    return df.withColumn("value", F.when(inside, F.col("value")))


def climatological_normal(
    history: DataFrame, month: int, years: Sequence[int], variable: str
) -> DataFrame:
    """30-year same-calendar-month mean per cell (A1, `cdo timmean` over
    the normal request — src/sources/era5monthly.js:126-155,
    src/file-conversions.js:206-217). Null-ignoring, like CDO's missing
    handling. One map-side-combined hash aggregate; shuffle is |cells|."""
    return (
        history.filter(
            (F.col("variable") == variable)
            & (F.month("time") == month)
            & F.year("time").isin([int(y) for y in years])
        )
        .groupBy("lat", "lon", "variable")
        .agg(F.avg("value").alias("normal_value"))
    )


def anomaly(current: DataFrame, normals: DataFrame) -> DataFrame:
    """current − normal via grid-aligned equi-join (J1 `cdo sub` +
    J2 broadcast normals). The normals side is one grid — broadcast."""
    return (
        current.join(F.broadcast(normals), ["lat", "lon", "variable"], "left")
        .withColumn("value", F.col("value") - F.col("normal_value"))
        .drop("normal_value")
    )


def grid_to_raster(pdf, nodata: float = float(NODATA_CLIP)):
    """One group's long rows (lat, lon, value) → a north-up GeoRaster.

    Resolution is inferred from the distinct sorted coordinates; missing
    cells and NULL values become the nodata sentinel (the −9999 convention
    of the reference's outputs, src/file-conversions.js:206-217)."""
    import numpy as np

    from .geotiff import GeoRaster

    lats = np.sort(pdf["lat"].unique())[::-1]  # north first
    lons = np.sort(pdf["lon"].unique())
    yres = float(lats[0] - lats[1]) if len(lats) > 1 else 1.0
    xres = float(lons[1] - lons[0]) if len(lons) > 1 else 1.0
    lat_idx = {v: i for i, v in enumerate(lats)}
    lon_idx = {v: i for i, v in enumerate(lons)}
    values = np.full((len(lats), len(lons)), nodata, dtype="float32")
    vals = pdf["value"].to_numpy()
    for r, (la, lo) in enumerate(zip(pdf["lat"].to_numpy(), pdf["lon"].to_numpy())):
        v = vals[r]
        if v is not None and v == v:  # skip None/NaN → stay nodata
            values[lat_idx[la], lon_idx[lo]] = v
    return GeoRaster(
        values=values,
        west=float(lons[0]) - xres / 2,
        north=float(lats[0]) + yres / 2,
        xres=xres,
        yres=yres,
        nodata=nodata,
    )


def to_geotiff(
    df: DataFrame,
    out_dir: str,
    group_cols: Sequence[str] = ("variable",),
    nodata: float = float(NODATA_CLIP),
) -> DataFrame:
    """GeoTIFF sink (S6, gdal_translate -ot Float32,
    /root/reference/src/file-conversions.js:57-74): one file per group.

    Scale shape: each (variable, time, …) group is ONE raster (a global
    0.25° grid is ~6 MB of Float32) — the natural unit of parallelism. The
    write runs inside ``applyInPandas``, so N rasters encode on N executor
    slots concurrently and the driver only ever sees the manifest (path +
    dimensions per group), never pixel data. ``out_dir`` must be a shared
    filesystem on a real cluster. Returns the manifest DataFrame.
    """
    import os

    from pyspark.sql.types import IntegerType, StringType, StructField, StructType

    from .geotiff import write_geotiff

    gcols = list(group_cols)
    in_fields = {f.name: f for f in df.schema.fields}
    schema = StructType(
        [in_fields[c] for c in gcols]
        + [
            StructField("path", StringType()),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
        ]
    )

    def encode_group(key, pdf):
        import pandas as pd

        raster = grid_to_raster(pdf, nodata=nodata)
        stem = "_".join(str(k) for k in key).replace(" ", "T").replace(":", "-")
        path = os.path.join(out_dir, f"{stem}.tif")
        write_geotiff(raster, path)
        row = dict(zip(gcols, key))
        row.update(
            path=path, width=raster.values.shape[1], height=raster.values.shape[0]
        )
        return pd.DataFrame([row], columns=[f.name for f in schema.fields])

    os.makedirs(out_dir, exist_ok=True)
    return df.groupBy(*gcols).applyInPandas(encode_group, schema=schema)
