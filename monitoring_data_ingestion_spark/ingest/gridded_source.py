"""A gridded monthly source: the reference's ERA5 pipeline, Spark-first.

Mirrors `forage(current_state, datasets)` of
/root/reference/src/sources/era5monthly.js:36-124 end-to-end:

  cursor advance (one month, epoch 1959-01-01)      → T1
  availability check → NoUpdateNeeded               → T3
  one shared scan for all datasets' variables       → scan sharing, §4
  per-dataset: record select → clip → scale         → P1/P4/F1
  anomaly datasets: memoized climatological normal  → T7/A1/J1/J2/F2
  partitioned parquet publish + metadata            → S6/S7
  new state {date, last_updated, normals}           → T2

The "CDS download" is a landing directory of monthly parquet files (the
acquisition client in sources/cds.py fills such a directory in a real
deployment); forage itself is pure Spark from there on.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from datetime import datetime, timezone
from typing import Any, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.strings import layer_name as _layer_name_col
from ..grid.ops import (
    anomaly,
    clip_polygon,
    climatological_normal,
    nodata_to_null,
    record_select,
    scale_values,
)
from .runner import ForageResult, NoUpdateNeeded
from .state import SourceState, typical_metadata

EPOCH = "1959-01-01"


def layer_name(dataset_filename: str) -> str:
    """`-` → `_` (src/rabbit.js:38-39); driver-side twin of the column fn."""
    return dataset_filename.replace("-", "_")


def _month_iso(dt: datetime) -> str:
    return dt.strftime("%Y-%m")


def _add_month(dt: datetime) -> datetime:
    y, m = dt.year + dt.month // 12, dt.month % 12 + 1
    return dt.replace(year=y, month=m)


@dataclass
class GriddedMonthlySource:
    """One instance per upstream source (plugin-module equivalent)."""

    name: str
    landing_dir: str  # monthly parquet drops: {landing}/{YYYY-MM}.parquet
    output_root: str
    normal_years: Sequence[int] = field(default_factory=lambda: list(range(1991, 2021)))
    epoch: str = EPOCH

    # -- acquisition boundary ---------------------------------------------
    def _month_path(self, dt: datetime) -> str:
        return os.path.join(self.landing_dir, f"{_month_iso(dt)}.parquet")

    def _available(self, dt: datetime) -> bool:
        return os.path.exists(self._month_path(dt))

    def _scan_month(self, spark: SparkSession, dt: datetime) -> DataFrame:
        return nodata_to_null(spark.read.parquet(self._month_path(dt)))

    # -- normals memoization (T7) -----------------------------------------
    def _normal_path(self, variable: str, month: int) -> str:
        return os.path.join(self.output_root, "_normals", variable, f"month={month:02d}")

    def get_normal(
        self, spark: SparkSession, state: SourceState, variable: str, month: int
    ) -> DataFrame:
        """Cache-or-build the (variable, month) climatological normal
        (src/sources/era5monthly.js:129-155): on miss, scan all
        same-month years in one pass, aggregate, persist as parquet, and
        record the path in state.normals[variable][month]."""
        cached = state.normals.get(variable, {}).get(str(month))
        if cached and os.path.exists(cached):
            return spark.read.parquet(cached)
        paths = [
            self._month_path(datetime(y, month, 1, tzinfo=timezone.utc))
            for y in self.normal_years
        ]
        paths = [p for p in paths if os.path.exists(p)]
        if not paths:
            raise FileNotFoundError(f"no history for normal ({variable}, month {month})")
        history = nodata_to_null(spark.read.parquet(*paths))
        normal = climatological_normal(history, month, self.normal_years, variable)
        out = self._normal_path(variable, month)
        normal.write.mode("overwrite").parquet(out)
        state.normals.setdefault(variable, {})[str(month)] = out
        return spark.read.parquet(out)

    # -- the batch --------------------------------------------------------
    def forage(
        self, spark: SparkSession, state: SourceState, datasets: list[dict[str, Any]]
    ) -> ForageResult:
        # T1: advance the cursor exactly one month (epoch on first run).
        if state.date:
            dt = _add_month(datetime.strptime(state.date, "%Y-%m").replace(tzinfo=timezone.utc))
        else:
            dt = datetime.strptime(self.epoch, "%Y-%m-%d").replace(tzinfo=timezone.utc)
        # T3: head-of-stream / no-data probe.
        if not self._available(dt):
            raise NoUpdateNeeded(f"{self.name}: no data for {_month_iso(dt)}")

        # Scan sharing (§4): one cached scan feeds every dataset pipeline.
        month_df = self._scan_month(spark, dt).cache()
        month_iso = _month_iso(dt)
        dt_iso = dt.strftime("%Y-%m-%dT00:00:00.000Z")

        metadatas: list[dict[str, Any]] = []
        for ds in datasets:
            layer = layer_name(ds["filename"])
            df = record_select(month_df, ds["variable"])
            if ds.get("clip"):
                df = clip_polygon(df, ds["clip"])
            if ds.get("factor") not in (None, 1, 1.0):
                df = scale_values(df, float(ds["factor"]))
            if ds.get("anomaly"):
                normal = self.get_normal(spark, state, ds["variable"], dt.month)
                if ds.get("factor") not in (None, 1, 1.0):
                    normal = normal.withColumn(
                        "normal_value", F.col("normal_value") * F.lit(float(ds["factor"]))
                    )
                df = anomaly(df, normal)
            out_dir = os.path.join(self.output_root, layer, f"month={month_iso}")
            # S7: per-month overwrite = atomic republish, idempotent on retry.
            df.write.mode("overwrite").parquet(out_dir)

            prior = _load_metadata(self.output_root, layer) or {}
            md = typical_metadata(
                {
                    "name": ds.get("name", layer),
                    "unit": ds.get("unit"),
                    "original_unit": ds.get("original_unit"),
                },
                dt_iso,
                prior,
            )
            md["layer_name"] = layer
            metadatas.append(md)

        month_df.unpersist()
        new_state = SourceState(
            date=month_iso,
            last_updated=dt_iso,
            normals=state.normals,
            extra=state.extra,
        )
        return ForageResult(new_state=new_state, metadatas=metadatas)


def _load_metadata(root: str, layer: str) -> dict[str, Any] | None:
    import json

    try:
        with open(os.path.join(root, layer, "metadata.json")) as f:
            return json.load(f)
    except (OSError, json.JSONDecodeError):
        return None
