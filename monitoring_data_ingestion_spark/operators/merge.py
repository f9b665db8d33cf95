"""MERGE (upsert/delete) — the incremental-maintenance primitive.

The reference maintains its outputs by whole-partition replacement (one
month = one file, re-run overwrites it). MERGE generalizes to row-level
maintenance: apply a keyed batch of upserts/deletes to a target table and
publish the result — the operation every CDC / dimension-maintenance
pipeline runs per batch.

Composed from stock operators (full outer join + coalesce), so Catalyst
owns the physical strategy; paired with ``sources/versioned.py`` the
rewritten table commits as a new snapshot (old versions stay readable —
the poor-man's Delta MERGE).

Scale: a full-table rewrite per batch is the copy-on-write trade
(fast reads, write amplification). At 100 TB, partition-prune the rewrite:
join the update keys' partitions only (`overwrite_partitions` in
sources/writers.py), leaving untouched partitions as-is.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(
    target: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
    delete_col: str | None = None,
) -> DataFrame:
    """Apply ``updates`` to ``target`` by key: matching rows take the
    update's values, unmatched update rows insert, and (optionally) update
    rows with ``delete_col = true`` remove the target row.

    Column contract: ``updates`` has the same value columns as ``target``
    (plus the optional delete flag); the result has exactly the target
    schema.
    """
    value_cols = [c for c in target.columns if c not in keys]
    upd = updates
    if delete_col is None:
        upd = upd.withColumn("__delete", F.lit(False))
    else:
        upd = upd.withColumn("__delete", F.coalesce(F.col(delete_col), F.lit(False)))
        if delete_col in upd.columns:
            upd = upd.drop(delete_col)
    t = target.select(*keys, *[F.col(c).alias(f"__t_{c}") for c in value_cols])
    # A presence marker, not coalesce-per-column: a matched update row wins
    # wholesale — including columns it sets to NULL.
    u = upd.select(
        *keys,
        "__delete",
        F.lit(True).alias("__is_upd"),
        *[F.col(c).alias(f"__u_{c}") for c in value_cols],
    )
    joined = t.join(u, list(keys), "full_outer")
    merged = joined.filter(~F.coalesce(F.col("__delete"), F.lit(False))).select(
        *keys,
        *[
            F.when(F.coalesce("__is_upd", F.lit(False)), F.col(f"__u_{c}"))
            .otherwise(F.col(f"__t_{c}"))
            .alias(c)
            for c in value_cols
        ],
    )
    return merged
