"""Skew mitigation by key salting (SURVEY.md §7 scale posture).

AQE's skew-join handling (enabled in the session factory) splits oversized
*partitions* at runtime; salting goes further for pathological single keys
— a key carrying 10% of a 100 TB fact table must be spread BEFORE the
shuffle, because no partition split helps when one reduce key dominates.

Two patterns:
  * ``salted_aggregate`` — two-phase aggregation: group on (key, salt)
    first (spreads the hot key over N reducers), then merge the partials
    per key. Correct for any algebraic aggregate expressed as
    (partial, merge) pairs.
  * ``salted_broadcast_join`` — replicate the (small) build side per salt
    value so a skewed probe side joins on (key, salt) with even reducers.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SALTS = 16


def _salt_col(n_salts: int) -> Column:
    # Deterministic per-row salt from a stable row fingerprint would require
    # a unique key; rand() is fine because salting only affects placement,
    # never values — the merge phase erases the salt.
    return (F.rand(seed=42) * n_salts).cast("int")


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    partials: dict[str, tuple[Column, Column]],
    n_salts: int = DEFAULT_SALTS,
) -> DataFrame:
    """Two-phase (salted) aggregation.

    ``partials`` maps output column → (partial_agg_expr, merge_agg_expr),
    e.g. ``{"total": (F.sum("x"), F.sum("total"))}``; count merges with
    sum, min/max with themselves. The hot key's rows spread over
    ``n_salts`` reducers in phase 1; phase 2 merges |keys|×n_salts rows.
    """
    phase1 = (
        df.withColumn("__salt", _salt_col(n_salts))
        .groupBy(*keys, "__salt")
        .agg(*[expr.alias(name) for name, (expr, _) in partials.items()])
    )
    return phase1.groupBy(*keys).agg(
        *[merge.alias(name) for name, (_, merge) in partials.items()]
    )


def salted_broadcast_join(
    fact: DataFrame,
    dim: DataFrame,
    on: Sequence[str],
    n_salts: int = DEFAULT_SALTS,
    how: str = "inner",
) -> DataFrame:
    """Join a skewed fact to a small dim on (key, salt): the dim is
    replicated ``n_salts``× (still tiny) and broadcast, so the fact never
    shuffles at all — the strongest skew defense when the build side fits
    in a broadcast."""
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("__salt")
    dim_rep = dim.select("*", salts)
    fact_s = fact.withColumn("__salt", _salt_col(n_salts))
    out = fact_s.join(F.broadcast(dim_rep), [*on, "__salt"], how)
    return out.drop("__salt")
