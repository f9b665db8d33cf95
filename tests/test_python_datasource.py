"""Custom Python Data Source (gridmonths): batch parity, pushdown pruning,
month-paced streaming, and checkpoint resume.

The streaming offset is the reference's watermark cursor
(/root/reference/src/sources/era5monthly.js:37-43) re-expressed as a real
Spark streaming offset; these tests pin the advance-one-month pacing (T1)
and exactly-once resume (T2) through the actual checkpoint machinery.
"""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from monitoring_data_ingestion_spark.sources import python_datasource as pds
from tests.gridfix import write_fixture


@pytest.fixture(scope="module")
def landing(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("gridmonths"))
    write_fixture(spark, d, years=range(1991, 1992), months=range(1, 5))  # 4 months
    pds.register(spark)
    return d


def _batch(spark, landing, **options):
    r = spark.read.format(pds.FORMAT_NAME).option("path", landing)
    for k, v in options.items():
        r = r.option(k, v)
    return r.load()


def test_batch_matches_native_parquet_scan(spark, landing):
    got = _batch(spark, landing)
    want = spark.read.parquet(os.path.join(landing, "*.parquet"))
    assert got.schema.simpleString() == want.schema.simpleString()
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def test_batch_start_end_options_prune(spark, landing):
    got = _batch(spark, landing, start="1991-02", end="1991-03")
    months = [r[0] for r in got.select(F.date_format("time", "yyyy-MM")).distinct().collect()]
    assert sorted(months) == ["1991-02", "1991-03"]


def test_variable_filter_pushed_into_scan(spark, landing):
    df = _batch(spark, landing).filter(F.col("variable") == "t2m")
    assert df.select("variable").distinct().collect()[0][0] == "t2m"
    assert df.count() == 4 * 64  # 4 months x 8x8 grid
    # Fully handled by the source: the executed plan has NO post-scan
    # Filter node — the predicate lives inside the Python scan.
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Filter (" not in plan, plan


def test_time_bound_prunes_month_partitions(spark, landing):
    reader = pds.GridMonthsReader({"path": landing})
    from datetime import datetime

    from pyspark.sql.datasource import GreaterThanOrEqual, LessThan

    residual = list(
        reader.pushFilters(
            [
                GreaterThanOrEqual(("time",), datetime(1991, 2, 1)),
                LessThan(("time",), datetime(1991, 4, 1)),
            ]
        )
    )
    # Time filters are *partially* pushed: partitions pruned, filter returned.
    assert len(residual) == 2
    parts = reader.partitions()
    assert len(parts) == 2  # 1991-02, 1991-03 out of 4 months
    # End-to-end values still correct (Spark re-applies the bound).
    df = _batch(spark, landing).filter(
        (F.col("time") >= F.lit("1991-02-01")) & (F.col("time") < F.lit("1991-04-01"))
    )
    assert df.count() == 2 * 3 * 64  # 2 months x 3 vars x 64 cells


def _run_stream(spark, landing, checkpoint, out_table, batches_wanted, extra=()):
    seen = []

    def sink(batch_df, batch_id):
        rows = (
            batch_df.select(F.date_format("time", "yyyy-MM").alias("m"))
            .distinct()
            .collect()
        )
        seen.append(sorted(r["m"] for r in rows))

    reader = spark.readStream.format(pds.FORMAT_NAME).option("path", landing)
    for k, v in extra:
        reader = reader.option(k, v)
    q = (
        reader.load()
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .start()
    )
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            nonempty = [b for b in seen if b]
            if len(nonempty) >= batches_wanted:
                break
            time.sleep(0.3)
    finally:
        q.stop()
        q.awaitTermination(30)
    return [b for b in seen if b]


PACED = (("maxMonthsPerTrigger", "1"),)


def test_stream_paced_one_month_per_batch(spark, landing, tmp_path):
    ckpt = str(tmp_path / "ckpt_paced")
    batches = _run_stream(spark, landing, ckpt, "t", batches_wanted=4, extra=PACED)
    # Each micro-batch carries exactly one month, in order (T1 pacing).
    assert batches[:4] == [["1991-01"], ["1991-02"], ["1991-03"], ["1991-04"]]


def test_stream_resume_from_checkpoint(spark, landing, tmp_path):
    ckpt = str(tmp_path / "ckpt_resume")
    first = _run_stream(spark, landing, ckpt, "t", batches_wanted=2, extra=PACED)
    assert first[0] == ["1991-01"]
    consumed = {m for b in first for m in b}
    # Restart against the same checkpoint: only unseen months may arrive.
    second = _run_stream(spark, landing, ckpt, "t", batches_wanted=1, extra=PACED)
    replayed = [m for b in second for m in b if m in consumed]
    assert not replayed, f"checkpoint resume replayed {replayed}"
    assert any(b for b in second), "no progress after restart"


def test_stream_drain_mode_available_now(spark, landing, tmp_path):
    """Without maxMonthsPerTrigger the source drains everything available —
    the mode Trigger.AvailableNow requires (it fixes the end offset from a
    single latestOffset call at query start)."""
    seen = []

    def sink(batch_df, batch_id):
        rows = batch_df.select(F.date_format("time", "yyyy-MM").alias("m")).distinct().collect()
        seen.append(sorted(r["m"] for r in rows))

    q = (
        spark.readStream.format(pds.FORMAT_NAME)
        .option("path", landing)
        .load()
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt_drain"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "availableNow drain did not terminate"
    months = sorted(m for b in seen for m in b)
    assert months == ["1991-01", "1991-02", "1991-03", "1991-04"]
