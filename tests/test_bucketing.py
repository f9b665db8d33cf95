"""Bucketed co-located joins: the write-once-shuffle-never contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from monitoring_data_ingestion_spark.operators.bucketing import (
    bucketed_join,
    write_bucketed,
)
from monitoring_data_ingestion_spark.sources.readers import table

from .conftest import SF_SMOKE


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    # warehouse.dir is a static conf — managed tables land in the default
    # warehouse; DROP TABLE below removes their files.
    o = table(spark, SF_SMOKE, "orders")
    l = table(spark, SF_SMOKE, "lineitem")
    write_bucketed(o, "b_orders", ["o_orderkey"], 8, sort_cols=["o_orderkey"])
    write_bucketed(l, "b_lineitem", ["l_orderkey"], 8, sort_cols=["l_orderkey"])
    yield o, l
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    """The whole point: co-bucketed fact⋈fact joins run with zero
    shuffles — both sides scan pre-clustered buckets. Auto-broadcast is
    disabled to model the 100 TB case (neither fact side broadcastable);
    at fixture scale Spark would otherwise just broadcast."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        l = spark.table("b_lineitem").withColumnRenamed("l_orderkey", "o_orderkey")
        joined = spark.table("b_orders").join(l, "o_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "SortMergeJoin" in plan
        assert "Bucketed: true" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_matches_plain(spark, bucketed_tables):
    o, l = bucketed_tables
    bucketed = (
        spark.table("b_orders")
        .join(
            spark.table("b_lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .count()
    )
    plain = o.join(l, o.o_orderkey == l.l_orderkey).count()
    assert bucketed == plain


def test_bucketed_aggregation_skips_shuffle(spark, bucketed_tables):
    """GroupBy on the bucket key also reuses the clustering: no exchange
    before the aggregate."""
    agg = spark.table("b_lineitem").groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("n"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
