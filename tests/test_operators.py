"""Scale-path operators: salting correctness (vs unsalted plans) and
approximate-distinct accuracy bounds."""

from __future__ import annotations

from pyspark.sql import functions as F

from monitoring_data_ingestion_spark.operators import (
    approx_distinct,
    salted_aggregate,
    salted_broadcast_join,
)
from monitoring_data_ingestion_spark.sources.readers import table

from .conftest import SF_SMOKE


def test_salted_aggregate_matches_plain(spark):
    l = table(spark, SF_SMOKE, "lineitem")
    salted = salted_aggregate(
        l,
        ["l_returnflag"],
        {
            "n": (F.count(F.lit(1)), F.sum("n")),
            "total_qty": (
                F.sum(F.col("l_quantity").cast("decimal(30,2)")),
                F.sum("total_qty"),
            ),
            "max_price": (F.max("l_extendedprice"), F.max("max_price")),
        },
    )
    plain = l.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_quantity").cast("decimal(30,2)")).alias("total_qty"),
        F.max("l_extendedprice").alias("max_price"),
    )
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salted_broadcast_join_matches_plain(spark):
    c = table(spark, SF_SMOKE, "customer")
    n = table(spark, SF_SMOKE, "nation")
    dim = n.select(F.col("n_nationkey").alias("c_nationkey"), "n_name")
    s2 = salted_broadcast_join(c, dim, ["c_nationkey"])
    p2 = c.join(F.broadcast(dim), "c_nationkey")
    assert s2.count() == p2.count()
    assert (
        sorted(r["n_name"] for r in s2.select("n_name").collect())
        == sorted(r["n_name"] for r in p2.select("n_name").collect())
    )
    # The fact side must not shuffle: no exchange below the join probe.
    plan = s2._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_salted_join_preserves_left_rows(spark):
    c = table(spark, SF_SMOKE, "customer")
    dim = (
        table(spark, SF_SMOKE, "nation")
        .select(F.col("n_nationkey").alias("c_nationkey"), "n_name")
        .filter(F.col("c_nationkey") <= 5)
    )
    out = salted_broadcast_join(c, dim, ["c_nationkey"], how="left")
    assert out.count() == c.count()
    assert out.filter(F.col("n_name").isNull()).count() == c.filter(
        F.col("c_nationkey") > 5
    ).count()


def test_approx_distinct_within_bound(spark):
    o = table(spark, SF_SMOKE, "orders")
    exact = o.select("o_custkey").distinct().count()
    approx = approx_distinct(o, "o_custkey").first()[0]
    assert abs(approx - exact) / exact < 0.1
    grouped = approx_distinct(o, "o_orderkey", keys=["o_orderstatus"])
    assert grouped.count() == o.select("o_orderstatus").distinct().count()


def test_merge_upsert_null_update_wins(spark):
    """A matched update row wins wholesale — including columns it sets to
    NULL (coalesce-per-column would silently keep the old value)."""
    from pyspark.sql import Row

    from monitoring_data_ingestion_spark.operators.merge import merge_upsert

    target = spark.createDataFrame(
        [Row(k=1, v="old1", w=10), Row(k=2, v="old2", w=20)]
    )
    updates = spark.createDataFrame([Row(k=1, v=None, w=11), Row(k=3, v="new3", w=30)])
    out = {r["k"]: r for r in merge_upsert(target, updates, keys=["k"]).collect()}
    assert out[1]["v"] is None and out[1]["w"] == 11  # NULL update applied
    assert out[2]["v"] == "old2"  # untouched
    assert out[3]["v"] == "new3"  # inserted


def test_merge_upsert_delete_branch(spark):
    from pyspark.sql import Row

    from monitoring_data_ingestion_spark.operators.merge import merge_upsert

    target = spark.createDataFrame([Row(k=1, v=1.0), Row(k=2, v=2.0)])
    updates = spark.createDataFrame(
        [Row(k=2, v=0.0, dead=True), Row(k=9, v=9.0, dead=False)]
    )
    out = merge_upsert(target, updates, keys=["k"], delete_col="dead")
    assert sorted(r["k"] for r in out.collect()) == [1, 9]
