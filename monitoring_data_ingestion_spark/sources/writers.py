"""Partitioned sinks (SURVEY.md §2.1 S6-S8 generalized).

The reference's sinks are single files published by temp-write + rename
(/root/reference/src/utility.js:94-103) with per-dataset directories and
month-stamped filenames (src/utility.js:127-133) — i.e. a hand-rolled
partitioned layout. The engine's native form is ``partitionBy`` writes:
the committer gives atomic publish, and the partition columns give scan
pruning on read.

Scale posture: partition columns must be low-cardinality (date buckets,
layer names — never raw ids); ``overwrite_partitions`` uses dynamic
partition overwrite so an incremental re-run replaces exactly the
partitions it produced (T2 idempotence), not the whole table.
"""

from __future__ import annotations

import gzip
import json
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession

try:  # brotli is the reference's inventory compression; gate the import.
    import brotli  # type: ignore

    _HAS_BROTLI = True
except Exception:  # pragma: no cover
    _HAS_BROTLI = False


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: Sequence[str],
    fmt: str = "parquet",
    mode: str = "overwrite",
    compression: str | None = None,
) -> None:
    """Write a partitioned table (parquet/csv/json). CSV/JSON carry a
    header/lines schema for interchange; parquet is the engine-native
    format (columnar, statistics, pushdown)."""
    writer = df.write.format(fmt).mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if compression:
        writer = writer.option("compression", compression)
    if fmt == "csv":
        writer = writer.option("header", "true")
    writer.save(path)


def overwrite_partitions(
    df: DataFrame, path: str, partition_by: Sequence[str], fmt: str = "parquet"
) -> None:
    """Dynamic partition overwrite: only partitions present in ``df`` are
    replaced — the idempotent re-run primitive for incremental batches
    (re-deliver month M → exactly month M's partitions rewritten)."""
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        df.write.format(fmt).mode("overwrite").partitionBy(*partition_by).save(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def read_partitioned(
    spark: SparkSession, path: str, fmt: str = "parquet", schema=None
) -> DataFrame:
    """Read a partitioned table back; partition columns come from the
    directory layout and predicates on them prune directories."""
    reader = spark.read.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "csv":
        reader = reader.option("header", "true")
        if schema is None:
            reader = reader.option("inferSchema", "true")
    return reader.load(path)


def compress_json_bytes(obj: object, quality: int = 11) -> tuple[bytes, str]:
    """Inventory-style compressed JSON (S8: the reference writes
    inventory.json.br with brotli q11, /root/reference/src/utility.js:89-92
    — and has a latent bug where the .br file is written uncompressed;
    the engine implements the evident intent). Falls back to gzip when
    brotli isn't installed; returns (payload, extension)."""
    raw = json.dumps(obj, sort_keys=True).encode("utf-8")
    if _HAS_BROTLI:
        return brotli.compress(raw, quality=quality), ".br"
    return gzip.compress(raw, compresslevel=9), ".gz"
