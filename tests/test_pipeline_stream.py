"""End-to-end: the reference's main loop as one Structured Streaming query.

gridmonths stream → sentinel→NULL → broadcast normals join → anomaly →
idempotent month-partitioned publish. The fixture's closed-form values
(tests/gridfix.py) make the expected anomaly exact:

    value = lat*10 + lon + month + (year − 1991) + var_offset
    normal over years {1991..1993} = ... + mean(0,1,2) = ... + 1
    anomaly(year) = (year − 1991) − 1                      (exactly)
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from monitoring_data_ingestion_spark.streaming.pipeline import (
    anomaly_transform,
    month_partitioned_writer,
    monthly_anomaly_query,
    monthly_normals,
)
from tests.gridfix import LATS, LONS, VAR_OFFSETS, write_fixture


@pytest.fixture(scope="module")
def landing(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("pipe_landing"))
    # 1991-1993 history (normals period) + 1994 months 1-3 (the "live" head).
    write_fixture(spark, d, years=range(1991, 1995), months=range(1, 4))
    return d


@pytest.fixture(scope="module")
def normals(spark, landing):
    history = spark.read.parquet(os.path.join(landing, "199[123]-*.parquet"))
    return monthly_normals(history, years=[1991, 1992, 1993]).cache()


def test_normals_match_closed_form(normals):
    # normal(month m) = lat*10 + lon + m + 1 + var_offset; the always-
    # sentinel corner cell averages nothing (NULL normal).
    corner = normals.filter((F.col("lat") == LATS[0]) & (F.col("lon") == LONS[0]))
    assert corner.filter(F.col("normal_value").isNotNull()).count() == 0
    row = normals.filter(
        (F.col("lat") == LATS[1]) & (F.col("lon") == LONS[2]) & (F.col("variable") == "t2m")
        & (F.col("month") == 2)
    ).collect()[0]
    assert row["normal_value"] == pytest.approx(LATS[1] * 10 + LONS[2] + 2 + 1)


def test_stream_pipeline_drains_and_matches_closed_form(spark, landing, normals, tmp_path):
    out = str(tmp_path / "out")
    q = monthly_anomaly_query(
        spark,
        landing,
        normals,
        out,
        str(tmp_path / "ckpt"),
        str(tmp_path / "commits"),
        variables=["t2m", "precip"],
        available_now=True,
    )
    assert q.awaitTermination(180), "pipeline did not drain"

    got = spark.read.parquet(out)
    # 12 month partitions (1991-1994 × months 1-3), 2 variables, 8×8 grid.
    assert got.select("month_key").distinct().count() == 12
    assert got.count() == 12 * 2 * len(LATS) * len(LONS)

    # Closed-form anomaly: (year − 1991) − 1, identical for every
    # non-sentinel cell, variable and month.
    chk = (
        got.filter(F.col("lat") > LATS[0])  # exclude sentinel corner row
        .withColumn("expected", F.year("time") - F.lit(1991) - F.lit(1))
        .withColumn("err", F.abs(F.col("anomaly") - F.col("expected")))
    )
    assert chk.agg(F.max("err")).collect()[0][0] == pytest.approx(0.0)

    # Sentinel corner: value −9999 → NULL at the scan edge → NULL anomaly.
    corner = got.filter((F.col("lat") == LATS[0]) & (F.col("lon") == LONS[0]))
    assert corner.filter(F.col("value").isNotNull()).count() == 0
    assert corner.filter(F.col("anomaly").isNotNull()).count() == 0


def test_replayed_batch_converges_not_duplicates(spark, landing, normals, tmp_path):
    """T2: re-delivering a batch id must be a no-op (marker) and even a
    forced re-write must converge (dynamic partition overwrite)."""
    out = str(tmp_path / "out2")
    commits = str(tmp_path / "commits2")
    q = monthly_anomaly_query(
        spark, landing, normals, out, str(tmp_path / "ckpt2"), commits,
        variables=["t2m"], available_now=True,
    )
    assert q.awaitTermination(180)
    before = spark.read.parquet(out).count()

    # Re-deliver batch 0 through the sink object: marker short-circuits.
    from monitoring_data_ingestion_spark.streaming.sinks import IdempotentForeachBatch

    sink = IdempotentForeachBatch(commits, month_partitioned_writer(out))
    batch0 = anomaly_transform(
        spark.read.parquet(os.path.join(landing, "1991-01.parquet")), normals
    )
    sink(batch0, 0)  # committed marker exists → skipped
    assert spark.read.parquet(out).count() == before

    # Even a forced re-write of the same month converges to the same rows.
    month_partitioned_writer(out)(batch0.filter(F.col("variable") == "t2m"), 999)
    assert spark.read.parquet(out).count() == before


def test_quarantine_publish_coexists_and_replays_idempotently(spark):
    """The quarantine-through-publish flagship sibling under the real
    micro-batch engine: a torn month-file lands exactly one manifest
    row BESIDE the published dataset (the other 71 month/variable
    groups publish with full cell counts), and a second invocation in
    the same session — same checkpoint, same commit markers, same
    batch-keyed manifest slices — returns the identical result without
    re-publishing or duplicating anything."""
    from monitoring_data_ingestion_spark.plans import REGISTRY

    fn = REGISTRY["era5_grib_quarantine_publish"].fn
    first = fn(spark, "/root/testdata/sf0.001").collect()
    kinds = {}
    for r in first:
        kinds[r["kind"]] = kinds.get(r["kind"], 0) + 1
    assert kinds == {"published": 71, "quarantined": 1}
    q = [r for r in first if r["kind"] == "quarantined"]
    assert q[0]["variable"] is None and q[0]["n_rows"] == 1
    assert q[0]["time"].year == 2022 and q[0]["time"].month == 6
    # the torn month's OTHER variable (pre-tear record) still published
    pub_jun = [
        r for r in first
        if r["kind"] == "published"
        and r["time"].year == 2022 and r["time"].month == 6
    ]
    assert [(r["variable"], r["n_rows"]) for r in pub_jun] == [("t2m", 60)]
    # replay: checkpoint + commit markers + batch-keyed manifest
    # overwrite make the second run a pure read-back
    second = fn(spark, "/root/testdata/sf0.001").collect()
    assert second == first


def test_paced_trigger_rejects_available_now(spark, landing, normals, tmp_path):
    """months_per_trigger + available_now would silently truncate the
    backfill: AvailableNow fixes its end offset at query start, so a
    paced source drains exactly one increment and the query terminates
    'successfully' — the combination must stop loudly."""
    import pytest

    with pytest.raises(ValueError, match="silently truncate"):
        monthly_anomaly_query(
            spark, landing, normals,
            str(tmp_path / "out"), str(tmp_path / "ckpt"),
            str(tmp_path / "commit"),
            months_per_trigger=1, available_now=True,
        )
