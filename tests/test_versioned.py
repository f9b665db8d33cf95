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


def test_commit_conflict_on_stale_base(spark, vt):
    """A writer that built its update against version N must NOT publish
    if another writer advanced the table to N+1 — optimistic concurrency
    rejects the lost update instead of silently committing it."""
    from monitoring_data_ingestion_spark.sources.versioned import CommitConflict

    n = table(spark, SF_SMOKE, "nation")
    base = vt.latest_version()  # None — empty table
    vt.commit(n.limit(1))  # concurrent writer sneaks in
    with pytest.raises(CommitConflict):
        vt.commit(n.limit(2), batch_id="mine", expected_base=base)
    # Same stale base but the interloper committed THIS batch_id →
    # idempotent return of its version, no conflict.
    got = vt.commit(n.limit(2), batch_id="theirs")
    assert vt.commit(n.limit(2), batch_id="theirs", expected_base=None) == got


def test_manifest_claim_is_atomic_not_clobbering(spark, vt, tmp_path):
    """Two writers racing for the same version number: the second link
    fails (no silent manifest overwrite) and the writer re-claims the
    next version — both commits survive as distinct snapshots."""
    n = table(spark, SF_SMOKE, "nation")
    vt.commit(n.limit(1))
    # Simulate the race: plant a foreign manifest at the version this
    # writer is about to claim (what a concurrent winner looks like on
    # disk between this writer's read and its link).
    import json

    foreign = vt._manifest_path(2)
    with open(foreign, "w") as f:
        json.dump(
            {"version": 2, "files": [], "batch_id": "other",
             "committed_at": "2026-01-01T00:00:00+00:00"},
            f,
        )
    v = vt.commit(n.limit(2), batch_id="mine")
    assert v == 3  # lost the claim for 2, took 3 — nothing clobbered
    assert [s.batch_id for s in vt.snapshots()] == [None, "other", "mine"]


def test_concurrent_replay_of_same_batch_is_single_apply(spark, tmp_path):
    """The ADVICE race: two loaders replaying one batch_id. The second
    apply must observe the first's commit (via the expected_base check
    inside commit) and no-op, never double-applying the batch."""
    from monitoring_data_ingestion_spark.operators.incremental import (
        IncrementalAggregate,
    )
    from monitoring_data_ingestion_spark.sources.readers import table as t

    e = t(spark, SF_SMOKE, "events").select("event_type", "value").limit(100)
    root = str(tmp_path / "agg")
    a1 = IncrementalAggregate(spark, root, keys=("event_type",), value_col="value")
    a2 = IncrementalAggregate(spark, root, keys=("event_type",), value_col="value")
    a1.apply(e, batch_id="seed")  # shared history
    # Both loaders now race to apply batch "b1". Interleave the slow
    # path by hand: a2 commits between a1's check and a1's commit —
    # modeled by a2 applying first, then a1 (whose pre-read snapshot
    # list did not contain b1) calling apply.
    assert a2.apply(e, batch_id="b1") == 2
    assert a1.apply(e, batch_id="b1") is None  # replay no-op, not double
    n_after = a1.finalize().agg(F.sum("n_rows")).collect()[0][0]
    assert n_after == 200  # seed + exactly ONE application of b1
