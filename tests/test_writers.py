"""Partitioned sink layer: layout, pruning, dynamic-partition idempotence,
csv/json interchange, compressed inventory bytes."""

from __future__ import annotations

import glob
import gzip
import json
import os

from pyspark.sql import functions as F

from monitoring_data_ingestion_spark.sources.readers import table
from monitoring_data_ingestion_spark.sources.writers import (
    compress_json_bytes,
    overwrite_partitions,
    read_partitioned,
    write_partitioned,
)

from .conftest import SF_SMOKE


def _events_with_month(spark):
    return table(spark, SF_SMOKE, "events").withColumn(
        "month", F.date_format("ts", "yyyy-MM-dd")
    )


def test_partitioned_parquet_layout_and_pruning(spark, tmp_path):
    path = str(tmp_path / "t")
    df = _events_with_month(spark)
    write_partitioned(df, path, ["month"])
    months = sorted(
        os.path.basename(p).split("=")[1] for p in glob.glob(f"{path}/month=*")
    )
    assert len(months) >= 2
    back = read_partitioned(spark, path)
    assert back.count() == df.count()
    # A partition predicate must prune to one directory, not filter rows.
    pruned = back.filter(F.col("month") == months[0])
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert pruned.count() == df.filter(F.col("month") == months[0]).count()
    assert "PartitionFilters: [isnotnull(month" in plan


def test_dynamic_partition_overwrite_is_idempotent(spark, tmp_path):
    """Re-writing one month replaces exactly that month (T2): other
    partitions untouched, re-run converges to the same state."""
    path = str(tmp_path / "t")
    df = _events_with_month(spark).select("event_id", "value", "month")
    write_partitioned(df, path, ["month"])
    months = sorted(r["month"] for r in df.select("month").distinct().collect())
    target = months[0]
    one = df.filter(F.col("month") == target).withColumn("value", F.lit(0.0))
    overwrite_partitions(one, path, ["month"])
    overwrite_partitions(one, path, ["month"])  # re-delivery
    back = read_partitioned(spark, path)
    assert back.count() == df.count()
    assert back.filter((F.col("month") == target) & (F.col("value") != 0.0)).count() == 0
    assert (
        back.filter(F.col("month") != target).count()
        == df.filter(F.col("month") != target).count()
    )


def test_csv_json_roundtrip(spark, tmp_path):
    src = table(spark, SF_SMOKE, "nation")
    for fmt in ("csv", "json"):
        path = str(tmp_path / fmt)
        write_partitioned(src, path, ["n_regionkey"], fmt=fmt, compression="gzip")
        back = read_partitioned(spark, path, fmt=fmt, schema=src.schema)
        assert sorted(r["n_name"] for r in back.collect()) == sorted(
            r["n_name"] for r in src.collect()
        )


def test_compress_json_bytes_roundtrip():
    obj = {"datasets": [{"name": "a", "start": "1959-01-01"}], "n": 3}
    payload, ext = compress_json_bytes(obj)
    assert ext in (".br", ".gz")
    if ext == ".gz":
        assert json.loads(gzip.decompress(payload)) == obj
    else:  # pragma: no cover - brotli not in this environment
        import brotli

        assert json.loads(brotli.decompress(payload)) == obj
    # compression actually happened
    assert len(payload) < len(json.dumps(obj).encode()) + 20
