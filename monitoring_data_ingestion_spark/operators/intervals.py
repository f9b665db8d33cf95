"""Interval algebra operators: coalesce (union of overlapping ranges).

Extracted from the catalog form (plans/timeseries.ts_interval_coalesce)
so the core window logic is reusable over any keyed interval table and
property-testable against a pure-Python model (tests/test_ts_properties).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def coalesce_intervals(
    df: DataFrame,
    keys: Sequence[str],
    start_col: str,
    end_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Merge transitively-overlapping [start, end) intervals per key.

    Returns one row per merged island: keys…, island (1-based per key),
    merged_start, merged_end, n_intervals. A new island begins when an
    interval's start exceeds the running max of all previous ends — the
    running max (not the previous end) is what makes the merge
    transitive: a long interval can bridge gaps its successors' starts
    alone would break.

    Scale: one shuffle on the keys serves the bridge-detection window,
    the island-numbering window (same spec, dependent frames), and the
    island aggregate (keys are a prefix of the grouping key, so the
    aggregate reuses the partitioning — asserted in tests/test_plans.py).
    """
    order_w = Window.partitionBy(*keys).orderBy(start_col, tiebreak_col)
    prev = order_w.rowsBetween(Window.unboundedPreceding, -1)
    run = order_w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    m = df.withColumn("_prev_max", F.max(end_col).over(prev))
    flagged = m.withColumn(
        "_brk",
        F.when(
            F.col("_prev_max").isNull() | (F.col(start_col) > F.col("_prev_max")), 1
        ).otherwise(0),
    )
    numbered = flagged.withColumn("island", F.sum("_brk").over(run))
    return numbered.groupBy(*keys, "island").agg(
        F.min(start_col).alias("merged_start"),
        F.max(end_col).alias("merged_end"),
        F.count(F.lit(1)).alias("n_intervals"),
    )
