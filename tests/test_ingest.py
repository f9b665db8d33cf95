"""Golden pipeline tests (SURVEY.md §5.3/§5.5): state evolution across
runs, idempotent crash-resume, empty-batch short-circuit, publish sinks."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from monitoring_data_ingestion_spark.ingest import IngestScheduler, StateStore
from monitoring_data_ingestion_spark.ingest.gridded_source import GriddedMonthlySource
from monitoring_data_ingestion_spark.ingest.runner import NoUpdateNeeded

from .gridfix import BASE_YEAR, DATASETS, LATS, LONS, cell_value, write_fixture


@pytest.fixture(scope="module")
def env(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("ingest")
    landing = str(root / "landing")
    out = str(root / "out")
    write_fixture(spark, landing, years=range(1991, 1994), months=range(1, 13))
    src = GriddedMonthlySource(
        name="gridsource",
        landing_dir=landing,
        output_root=out,
        normal_years=range(1991, 1994),
        epoch="1993-01-01",
    )
    store = StateStore(out)
    return src, store


def test_three_run_state_evolution(spark, env):
    src, store = env
    sched = IngestScheduler(spark, store)
    for expected_month in ("1993-01", "1993-02", "1993-03"):
        run = sched.run_once(src, DATASETS)
        assert run.ok and not run.skipped, run.error
        assert store.load_source("gridsource").date == expected_month

    # Non-anomaly output: value passthrough (with corner nodata → NULL).
    out = spark.read.parquet(
        os.path.join(src.output_root, "gridsource_temperature_2_m", "month=1993-01")
    )
    got = {
        (r.lat, r.lon): r.value
        for r in out.collect()
    }
    assert got[(LATS[1], LONS[1])] == cell_value(LATS[1], LONS[1], 1993, 1, "t2m")
    assert got[(LATS[0], LONS[0])] is None  # sentinel mapped to NULL

    # Unit-scaled output (m → mm).
    precip = spark.read.parquet(
        os.path.join(src.output_root, "gridsource_precipitation_1_day", "month=1993-02")
    )
    row = precip.filter((F.col("lat") == LATS[2]) & (F.col("lon") == LONS[3])).first()
    assert row.value == pytest.approx(cell_value(LATS[2], LONS[3], 1993, 2, "precip") * 1000.0)

    # Anomaly output: closed form (year−base) − mean(0,1,2) = 2 − 1 = 1.
    anom = spark.read.parquet(
        os.path.join(src.output_root, "gridsource_temperature_2_m_anomaly", "month=1993-03")
    )
    arow = anom.filter((F.col("lat") == LATS[4]) & (F.col("lon") == LONS[5])).first()
    assert arow.value == pytest.approx((1993 - BASE_YEAR) - 1.0)

    # Normals were memoized into state (T7).
    st = store.load_source("gridsource")
    assert "t2m" in st.normals and "3" in st.normals["t2m"]

    # Publish sinks: metadata min/max accumulated, inventory merged.
    md = json.load(
        open(os.path.join(src.output_root, "gridsource_temperature_2_m", "metadata.json"))
    )
    assert md["start"].startswith("1993-01") and md["end"].startswith("1993-03")
    inv = json.load(open(os.path.join(src.output_root, "inventory.json")))
    assert {e["layer_name"] for e in inv} == {
        "gridsource_temperature_2_m",
        "gridsource_precipitation_1_day",
        "gridsource_temperature_2_m_anomaly",
    }
    assert os.path.exists(os.path.join(src.output_root, "heart.json"))
    assert os.path.exists(os.path.join(src.output_root, "state.json"))


def test_crash_resume_idempotent(spark, env):
    """Kill between output write and state commit (T2): the re-run must
    reproduce identical outputs and only then advance the cursor."""
    src, store = env
    sched = IngestScheduler(spark, store)
    crashing = CrashAfterOutputsFactory(src)
    run = IngestScheduler(spark, store, max_retries=0).run_once(crashing, DATASETS)
    assert not run.ok and "injected crash" in run.error
    # Cursor did NOT advance.
    assert store.load_source("gridsource").date == "1993-03"

    # Re-run for real: month 1993-04 publishes once, state advances.
    run2 = sched.run_once(src, DATASETS)
    assert run2.ok
    assert store.load_source("gridsource").date == "1993-04"
    out = spark.read.parquet(
        os.path.join(src.output_root, "gridsource_temperature_2_m", "month=1993-04")
    )
    assert out.count() == len(LATS) * len(LONS)


def CrashAfterOutputsFactory(src):
    class Crashing:
        name = src.name

        def forage(self, spark_, state, datasets):
            src.forage(spark_, state, datasets)  # outputs written
            raise RuntimeError("injected crash after outputs, before commit")

    return Crashing()


def test_head_of_stream_short_circuit(spark, env):
    """T3: past the last landing month, forage raises NoUpdateNeeded and
    the scheduler records a skip, keeping the cursor."""
    src, store = env
    sched = IngestScheduler(spark, store)
    runs = sched.run_until_head(src, DATASETS, max_batches=100)
    assert runs[-1].skipped
    assert store.load_source("gridsource").date == "1993-12"
    # A further run is a clean skip, not an error.
    run = sched.run_once(src, DATASETS)
    assert run.ok and run.skipped


def test_retry_wrapper(spark, tmp_path):
    """T4: failed runs retry with delay; success stops the loop."""
    store = StateStore(str(tmp_path / "retry_out"))
    attempts = []

    class Flaky:
        name = "flaky"

        def forage(self, spark_, state, datasets):
            attempts.append(1)
            if len(attempts) < 3:
                raise RuntimeError("transient")
            raise NoUpdateNeeded("done")

    sleeps = []
    sched = IngestScheduler(
        spark, store, retry_delay_s=5.0, max_retries=5, sleep=sleeps.append
    )
    run = sched.run_with_retry(Flaky(), [])
    assert run.ok and run.skipped
    assert len(attempts) == 3
    assert sleeps == [5.0, 5.0]
