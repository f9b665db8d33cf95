"""Incremental aggregate maintenance (operators/incremental.py): the
materialized aggregate folded forward batch-by-batch must be
bit-identical to a from-scratch re-aggregation after every load, be
idempotent under batch replay, and keep history time-travelable."""

from __future__ import annotations

from pyspark.sql import functions as F

from monitoring_data_ingestion_spark.operators.incremental import (
    IncrementalAggregate,
    merge_partials,
    partial_aggregates,
)
from monitoring_data_ingestion_spark.sources.readers import table

from .conftest import SF_SMOKE


def _monthly_batches(spark):
    e = table(spark, SF_SMOKE, "events").select(
        "user_id", "event_type", "value", F.dayofmonth("ts").alias("d")
    )
    return [
        e.filter(F.col("d").between(lo, hi)).drop("d")
        for lo, hi in ((1, 10), (11, 20), (21, 31))
    ]


def _full_recompute(batches):
    union = batches[0]
    for b in batches[1:]:
        union = union.unionByName(b)
    return (
        union.groupBy("event_type")
        .agg(
            F.count("value").cast("bigint").alias("n_rows"),
            (
                F.sum(F.col("value").cast("decimal(30,6)")).cast("decimal(30,6)").cast("double")
                / F.count("value")
            ).alias("mean_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
        .orderBy("event_type")
    )


def test_incremental_equals_full_recompute_after_every_load(spark, tmp_path):
    batches = _monthly_batches(spark)
    agg = IncrementalAggregate(
        spark, str(tmp_path / "normals"), keys=("event_type",), value_col="value"
    )
    for i, b in enumerate(batches):
        agg.apply(b, batch_id=f"load-{i}")
        got = agg.finalize().orderBy("event_type").collect()
        want = _full_recompute(batches[: i + 1]).collect()
        assert [tuple(r) for r in got] == [tuple(r) for r in want], f"after load {i}"


def test_replayed_batch_is_noop(spark, tmp_path):
    batches = _monthly_batches(spark)
    agg = IncrementalAggregate(
        spark, str(tmp_path / "normals"), keys=("event_type",), value_col="value"
    )
    agg.apply(batches[0], batch_id="load-0")
    agg.apply(batches[1], batch_id="load-1")
    v_before = agg.table.latest_version()
    assert agg.apply(batches[1], batch_id="load-1") is None  # replay
    assert agg.table.latest_version() == v_before
    got = agg.finalize().orderBy("event_type").collect()
    want = _full_recompute(batches[:2]).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_history_is_time_travelable(spark, tmp_path):
    batches = _monthly_batches(spark)
    agg = IncrementalAggregate(
        spark, str(tmp_path / "normals"), keys=("event_type",), value_col="value"
    )
    v1 = agg.apply(batches[0], batch_id="load-0")
    agg.apply(batches[1], batch_id="load-1")
    old = agg.finalize(version=v1).orderBy("event_type").collect()
    want = _full_recompute(batches[:1]).collect()
    assert [tuple(r) for r in old] == [tuple(r) for r in want]


def test_merge_partials_handles_disjoint_groups(spark):
    from decimal import Decimal

    a = spark.createDataFrame(
        [("x", 2, Decimal("10.0"), 1.0, 9.0)],
        "k string, n long, s decimal(30,6), mn double, mx double",
    )
    b = spark.createDataFrame(
        [("y", 1, Decimal("5.0"), 5.0, 5.0)],
        "k string, n long, s decimal(30,6), mn double, mx double",
    )
    got = {r["k"]: (r["n"], float(r["s"]), r["mn"], r["mx"])
           for r in merge_partials(a, b, ["k"]).collect()}
    assert got == {"x": (2, 10.0, 1.0, 9.0), "y": (1, 5.0, 5.0, 5.0)}


def test_partials_exchange_carries_groups_not_rows(spark):
    """The per-batch reduction must be a two-phase hash aggregate —
    partial map-side combine before the exchange."""
    b = _monthly_batches(spark)[0]
    df = partial_aggregates(b, ["event_type"], "value")
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("HashAggregate") >= 2  # partial + final
