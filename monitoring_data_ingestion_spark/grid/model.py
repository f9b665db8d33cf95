"""Gridded raster convention layer (SURVEY.md §1.1-§1.2).

The reference's core "table" is a GRIB record: a dense 2-D float grid per
(variable, timestep) (/root/reference/src/sources/era5monthly.js:27-32).
The engine's canonical form is the **long-format DataFrame**
`(time, lat, lon, variable, value)` — partitionable by time, joinable on
cell, and every raster operator becomes a stock columnar expression.

Nodata sentinels (−9999 clip / −999 mean, src/file-conversions.js:183-184,
213) are mapped to NULL at the scan edge so Spark's null-ignoring
aggregates match CDO's missing-value semantics exactly (P5).
"""

from __future__ import annotations

from pyspark.sql.types import (
    DoubleType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

GRID_SCHEMA = StructType(
    [
        StructField("time", TimestampType(), False),
        StructField("lat", DoubleType(), False),
        StructField("lon", DoubleType(), False),
        StructField("variable", StringType(), False),
        StructField("value", DoubleType(), True),
    ]
)

NODATA_CLIP = -9999.0
NODATA_MEAN = -999.0
