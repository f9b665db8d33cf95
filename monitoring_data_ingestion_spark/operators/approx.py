"""Approximate aggregates — the 100 TB substitutes for exact expand-plans.

Exact COUNT(DISTINCT) over a high-cardinality column forces a two-shuffle
expand plan; HyperLogLog++ answers in one pass with bounded memory. The
engine declares exact count_distinct in its oracle-checked contract
(plans/tpch.agg_stats) and offers this as the documented scale escape
hatch — the accuracy trade is a test-pinned bound, not folklore.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def approx_distinct(
    df: DataFrame, col: str, keys: Sequence[str] = (), rsd: float = 0.05
) -> DataFrame:
    """approx_count_distinct (HLL++) per group; ``rsd`` is the target
    relative standard deviation (memory grows as rsd shrinks)."""
    agg = F.approx_count_distinct(col, rsd=rsd).alias(f"approx_{col}")
    if keys:
        return df.groupBy(*keys).agg(agg)
    return df.agg(agg)
