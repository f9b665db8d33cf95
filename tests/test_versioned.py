"""Versioned table: snapshot isolation, time travel, idempotent commits,
safe vacuum."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from monitoring_data_ingestion_spark.sources.readers import table
from monitoring_data_ingestion_spark.sources.versioned import VersionedTable

from .conftest import SF_SMOKE


@pytest.fixture()
def vt(tmp_path):
    return VersionedTable(str(tmp_path / "t"))


def test_commit_and_time_travel(spark, vt):
    n = table(spark, SF_SMOKE, "nation")
    v1 = vt.commit(n.filter(F.col("n_regionkey") == 0))
    v2 = vt.commit(n)
    assert (v1, v2) == (1, 2)
    assert vt.read(spark).count() == n.count()  # latest
    old = vt.read(spark, version=1)
    assert old.count() == n.filter(F.col("n_regionkey") == 0).count()
    assert [s.version for s in vt.snapshots()] == [1, 2]


def test_idempotent_batch_commit(spark, vt):
    n = table(spark, SF_SMOKE, "nation")
    v1 = vt.commit(n, batch_id="batch-7")
    v_again = vt.commit(n, batch_id="batch-7")  # re-delivery
    assert v1 == v_again == 1
    assert vt.latest_version() == 1


def test_uncommitted_data_invisible_and_vacuumed(spark, vt):
    n = table(spark, SF_SMOKE, "nation")
    vt.commit(n)
    # Simulate a crashed commit: data written, manifest never renamed.
    orphan_dir = os.path.join(vt.root, "data", "deadbeef")
    n.limit(3).write.parquet(orphan_dir)
    assert vt.read(spark).count() == n.count()  # snapshot unaffected
    removed = vt.vacuum()
    assert removed and all("deadbeef" in f for f in removed)
    assert not os.path.exists(orphan_dir)
    # Referenced files survive and remain readable.
    assert vt.vacuum() == []
    assert vt.read(spark).count() == n.count()


def test_missing_version_errors(spark, vt):
    with pytest.raises(FileNotFoundError):
        vt.read(spark)
    vt.commit(table(spark, SF_SMOKE, "region"))
    with pytest.raises(KeyError):
        vt.read(spark, version=99)


def test_ingest_scheduler_commits_versioned(spark, vt, tmp_path):
    """Composition: the ingest scheduler's batches publish through the
    versioned table; a crash-replayed batch (same batch id) does not
    create a new version — exactly-once end to end (T2 at table level)."""
    from monitoring_data_ingestion_spark.ingest.runner import (
        ForageResult,
        IngestScheduler,
        NoUpdateNeeded,
    )
    from monitoring_data_ingestion_spark.ingest.state import SourceState, StateStore

    events = table(spark, SF_SMOKE, "events")
    months = ["2024-01-01", "2024-01-02"]

    class VersionedSource:
        name = "versioned-demo"

        def forage(self, spark, state, datasets):
            done = state.extra.get("days", [])
            pending = [m for m in months if m not in done]
            if not pending:
                raise NoUpdateNeeded()
            day = pending[0]
            batch = events.filter(F.to_date("ts") == day)
            vt.commit(batch, batch_id=day)
            vt.commit(batch, batch_id=day)  # crash-replay of the same batch
            new = SourceState(date=day, extra={"days": done + [day]})
            return ForageResult(new_state=new, metadatas=[])

    store = StateStore(str(tmp_path / "state"))
    sched = IngestScheduler(spark, store)
    runs = sched.run_until_head(VersionedSource(), [])
    assert [r.ok for r in runs] == [True, True, True]
    assert runs[-1].skipped  # head reached
    assert vt.latest_version() == len(months)  # replays created no versions
    total = sum(vt.read(spark, version=v + 1).count() for v in range(len(months)))
    assert total == events.filter(F.to_date("ts").isin(months)).count()
