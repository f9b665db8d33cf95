"""Bucketed co-located joins (SURVEY.md §7 scale posture).

A fact⋈fact equi-join (orders⋈lineitem at 100 TB) shuffles both sides on
every query. Bucketing pays that shuffle ONCE at write time: both tables
are hash-clustered into the same number of buckets on the join key, and
every subsequent join/aggregation on that key runs with zero exchanges —
the payoff compounds across every downstream query that reuses the key.

Spark bucketing requires a metastore table (``saveAsTable``); plain
``.parquet(path)`` writes lose bucket metadata.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: Sequence[str],
    n_buckets: int,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Persist a table hash-clustered on ``bucket_cols``.

    ``sort_cols`` additionally sorts within each bucket file, upgrading
    downstream sort-merge joins to skip their sort phase too. n_buckets
    must MATCH across tables that will be co-joined (the co-location
    contract) — size it so one bucket ≈ one task's comfortable input
    (128-512 MB at target scale). ``path`` makes the table external at
    that location instead of the session warehouse dir.
    """
    writer = df.write.format("parquet").mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: Sequence[str], how: str = "inner"
) -> DataFrame:
    """Join two co-bucketed tables on their bucket key: with matching
    bucket counts Spark plans a SortMergeJoin with NO Exchange on either
    side (asserted in tests/test_bucketing.py)."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, list(on), how)
