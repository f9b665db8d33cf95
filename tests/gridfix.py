"""Synthetic climate-grid fixture (FIXTURES.md §B) with closed-form values.

value(lat, lon, year, month, variable) =
    lat * 10 + lon + month + (year - base_year) + var_offset

so the 3-year normal for month m is  lat*10 + lon + m + 1 + var_offset
and the anomaly for year y is       (y - base_year) - 1      (exact).

A handful of cells carry the −9999 nodata sentinel to exercise P5.
"""

from __future__ import annotations

import os
from datetime import datetime, timezone

VAR_OFFSETS = {"t2m": 0.0, "precip": 100.0, "unused_var": 500.0}
BASE_YEAR = 1991
LATS = [10.0 + 0.25 * i for i in range(8)]
LONS = [20.0 + 0.25 * j for j in range(8)]

# A simple convex quad covering roughly the lower-left of the AOI.
CLIP_POLY = [(19.9, 9.9), (21.1, 9.9), (21.1, 11.1), (19.9, 9.95)]


def cell_value(lat: float, lon: float, year: int, month: int, variable: str) -> float:
    return lat * 10 + lon + month + (year - BASE_YEAR) + VAR_OFFSETS[variable]


def write_fixture(spark, landing_dir: str, years: range, months: range = range(1, 13)) -> None:
    os.makedirs(landing_dir, exist_ok=True)
    rows = []
    for year in years:
        for month in months:
            ts = datetime(year, month, 1, tzinfo=timezone.utc)
            rows = []
            for variable in VAR_OFFSETS:
                for lat in LATS:
                    for lon in LONS:
                        v = cell_value(lat, lon, year, month, variable)
                        # Sentinel cells: the grid corner is always nodata.
                        if lat == LATS[0] and lon == LONS[0]:
                            v = -9999.0
                        rows.append((ts, lat, lon, variable, v))
            df = spark.createDataFrame(
                rows, "time timestamp, lat double, lon double, variable string, value double"
            )
            df.coalesce(1).write.mode("overwrite").parquet(
                os.path.join(landing_dir, f"{year:04d}-{month:02d}.parquet")
            )


DATASETS = [
    {
        "filename": "gridsource-temperature-2-m",
        "name": "Temperature (2 m)",
        "variable": "t2m",
        "unit": "K",
        "original_unit": "K",
        "factor": None,
        "anomaly": False,
    },
    {
        "filename": "gridsource-precipitation-1-day",
        "name": "Precipitation (1 day)",
        "variable": "precip",
        "unit": "mm",
        "original_unit": "m",
        "factor": 1000.0,
        "anomaly": False,
    },
    {
        "filename": "gridsource-temperature-2-m-anomaly",
        "name": "Temperature anomaly (2 m)",
        "variable": "t2m",
        "unit": "K",
        "original_unit": "K",
        "factor": None,
        "anomaly": True,
    },
]
