"""Incremental aggregate maintenance: a materialized aggregate kept
current by merging each new batch's PARTIAL aggregates, never
re-scanning history.

The reference recomputes its climatological normals from the full grid
archive on demand (/root/reference/src/sources/era5monthly.js:126-155 —
affordable at one station-month per run); at 100 TB a full-history
re-aggregation per arriving partition is the classic accidental O(n²)
pipeline. The standard fix is maintaining the aggregate's MERGEABLE
sufficient statistics: keep (count, sum[, min, max]) per group, combine
each new batch's partial row with the stored row (counts and decimal
sums add; min/max take extrema), and derive finals (mean) at read time.
Cost per load is O(new batch + |touched groups|) regardless of history
length.

Storage rides ``sources/versioned.py``: every update commits a new
snapshot through one atomic manifest rename, so a crashed update never
leaves a half-merged state, re-delivered batch ids are idempotent
(exactly-once under replay), and old versions remain time-travelable —
the same T2 discipline as every other derived table here.

Sums are decimal (associative ⇒ partition-order-invariant), so the
maintained statistic is BIT-IDENTICAL to a from-scratch re-aggregation
— asserted, not assumed, in tests/test_incremental.py.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.versioned import CommitConflict, VersionedTable

_SUM_DEC = "decimal(30,6)"


def partial_aggregates(
    batch: DataFrame, keys: Sequence[str], value_col: str
) -> DataFrame:
    """One batch reduced to its mergeable statistics per group:
    (keys..., n, s, mn, mx). Map-side-combined hash aggregate — the
    exchange carries |groups in batch| rows."""
    return batch.groupBy(*keys).agg(
        F.count(value_col).cast("bigint").alias("n"),
        F.sum(F.col(value_col).cast(_SUM_DEC)).cast(_SUM_DEC).alias("s"),
        F.min(value_col).alias("mn"),
        F.max(value_col).alias("mx"),
    )


def merge_partials(current: DataFrame, incoming: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Combine two partial-aggregate tables: counts/sums add, extrema
    take extrema. Groups only in one side pass through. One full-outer
    equi-join on the group key — |groups| rows a side, never raw data."""
    cur = current.select(
        *keys,
        F.col("n").alias("n_a"),
        F.col("s").alias("s_a"),
        F.col("mn").alias("mn_a"),
        F.col("mx").alias("mx_a"),
    )
    inc = incoming.select(
        *keys,
        F.col("n").alias("n_b"),
        F.col("s").alias("s_b"),
        F.col("mn").alias("mn_b"),
        F.col("mx").alias("mx_b"),
    )
    zero_n = F.lit(0).cast("bigint")
    zero_s = F.lit(0).cast(_SUM_DEC)
    return cur.join(inc, list(keys), "full_outer").select(
        *keys,
        (F.coalesce("n_a", zero_n) + F.coalesce("n_b", zero_n)).alias("n"),
        (F.coalesce("s_a", zero_s) + F.coalesce("s_b", zero_s)).cast(_SUM_DEC).alias("s"),
        F.least(
            F.coalesce("mn_a", F.col("mn_b")), F.coalesce("mn_b", F.col("mn_a"))
        ).alias("mn"),
        F.greatest(
            F.coalesce("mx_a", F.col("mx_b")), F.coalesce("mx_b", F.col("mx_a"))
        ).alias("mx"),
    )


class IncrementalAggregate:
    """A versioned materialized aggregate updated batch-by-batch.

    ``apply(batch, batch_id)`` folds one new batch in (idempotent per
    batch_id — a replayed batch is a no-op); ``current()`` reads the
    maintained statistics; ``finalize()`` derives non-mergeable finals
    (mean) from them.
    """

    def __init__(self, spark: SparkSession, root: str, keys: Sequence[str], value_col: str):
        self.spark = spark
        self.keys = list(keys)
        self.value_col = value_col
        self.table = VersionedTable(root)

    def apply(self, batch: DataFrame, batch_id: str) -> int | None:
        """Merge one batch's partials into the stored statistics and
        commit a new snapshot. Returns the committed version, or None
        when ``batch_id`` was already applied (replay no-op).

        Safe under concurrent writers: the merge is built against a
        pinned base version and committed with ``expected_base`` — if
        another loader advanced the table in between (its own batch, or
        a concurrent replay of THIS batch), the commit refuses rather
        than publishing a stale-base merge, and the loop re-reads the
        new snapshot and rebuilds. Check-then-act alone (the pre-r7
        shape) let two replayers of one batch_id both pass the check and
        double-apply; now the manifest claim arbitrates."""
        while True:
            applied = {s.batch_id for s in self.table.snapshots() if s.batch_id}
            if batch_id in applied:
                return None
            base = self.table.latest_version()
            incoming = partial_aggregates(batch, self.keys, self.value_col)
            if base is None:
                merged = incoming
            else:
                merged = merge_partials(self.current(version=base), incoming, self.keys)
            try:
                return self.table.commit(merged, batch_id=batch_id, expected_base=base)
            except CommitConflict:
                continue

    def current(self, version: int | None = None) -> DataFrame:
        return self.table.read(self.spark, version=version)

    def finalize(self, version: int | None = None) -> DataFrame:
        """Derive the read-model: per-group count / mean / min / max.
        Mean divides the exact decimal sum by the count at read time —
        identical to a from-scratch aggregate over all loaded data."""
        cur = self.current(version=version)
        return cur.select(
            *self.keys,
            F.col("n").alias("n_rows"),
            (F.col("s").cast("double") / F.col("n")).alias("mean_value"),
            F.col("mn").alias("min_value"),
            F.col("mx").alias("max_value"),
        )
