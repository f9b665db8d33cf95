"""UDTF surface (§2.10): month-span backfill enumeration."""

from __future__ import annotations

from monitoring_data_ingestion_spark.functions.udtfs import MonthSpan, register_udtfs


def test_month_span_direct(spark):
    register_udtfs(spark)
    rows = spark.sql(
        "SELECT month_start, idx FROM month_span('1959-11-01', '1960-02-01') ORDER BY idx"
    ).collect()
    assert [r["month_start"] for r in rows] == [
        "1959-11-01",
        "1959-12-01",
        "1960-01-01",
        "1960-02-01",
    ]
    assert [r["idx"] for r in rows] == [0, 1, 2, 3]


def test_month_span_lateral_join(spark):
    register_udtfs(spark)
    spark.sql("SELECT * FROM VALUES ('a', '2020-01-01', '2020-03-01') AS t(src, s, e)") \
        .createOrReplaceTempView("spans")
    rows = spark.sql(
        """
        SELECT s.src, m.month_start
        FROM spans s, LATERAL month_span(s.s, s.e) m
        ORDER BY m.idx
        """
    ).collect()
    assert len(rows) == 3
    assert rows[0]["src"] == "a" and rows[-1]["month_start"] == "2020-03-01"


def test_month_span_epoch_length(spark):
    """1959-01 → 2020-12 is the reference's ~800-month backfill depth."""
    register_udtfs(spark)
    n = spark.sql("SELECT * FROM month_span('1959-01-01', '2020-12-01')").count()
    assert n == (2020 - 1959) * 12 + 12
