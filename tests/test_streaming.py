"""Streaming layer: windows, bounded-state dedup, exactly-once sinks,
heartbeat — the parts of SURVEY §2.9 not already oracle-checked via the
stream_* catalog queries."""

from __future__ import annotations

import json
import os
import time

import pytest
from pyspark.sql import functions as F

from monitoring_data_ingestion_spark.sources.readers import table
from monitoring_data_ingestion_spark.streaming import (
    HeartbeatListener,
    IdempotentForeachBatch,
    dedup_within_watermark,
    events_stream,
    foreach_batch_query,
    run_available_now_to_memory,
    session_window_agg,
    sliding_window_agg,
)

from .conftest import SF_SMOKE


def test_sliding_window_counts_match_batch(spark):
    """Hopping windows through the streaming engine: total event-window
    memberships equal the batch expansion (each event lands in
    duration/slide = 2 windows)."""
    src = events_stream(spark, SF_SMOKE)
    agg = sliding_window_agg(src, duration="1 hour", slide="30 minutes")
    out = run_available_now_to_memory(agg, output_mode="complete")
    n_events = table(spark, SF_SMOKE, "events").count()
    total_memberships = out.agg(F.sum("n_events")).first()[0]
    assert total_memberships == 2 * n_events
    assert out.filter(F.col("mean_value").isNull()).count() == 0


def test_session_window_matches_batch_sessionize(spark):
    """session_window sessions must equal the batch gaps-and-islands
    sessionization (same 30-minute gap) in count and membership."""
    from monitoring_data_ingestion_spark.plans.timeseries import ts_sessionize

    src = events_stream(spark, SF_SMOKE)
    agg = session_window_agg(src, gap="30 minutes", keys=("user_id",))
    streamed = run_available_now_to_memory(agg, output_mode="complete")
    batch = ts_sessionize(spark, SF_SMOKE)
    assert streamed.count() == batch.count()
    s = streamed.agg(F.sum("n_events")).first()[0]
    b = batch.agg(F.sum("n_events")).first()[0]
    assert s == b


def test_dedup_within_watermark_drops_duplicates(spark):
    src = events_stream(spark, SF_SMOKE).select("event_id", "ts", "value")
    doubled = src.union(src)
    deduped = dedup_within_watermark(doubled, keys=("event_id",), watermark="1 hour")
    out = run_available_now_to_memory(deduped, output_mode="append")
    n = table(spark, SF_SMOKE, "events").count()
    assert out.count() == n
    assert out.select("event_id").distinct().count() == n


def test_idempotent_foreach_batch(spark, tmp_path):
    """Re-delivered batch ids must be no-ops: output written exactly once
    (T2 exactly-once contract under crash-replay)."""
    out_dir = str(tmp_path / "out")
    calls = []

    def write(df, batch_id):
        calls.append(batch_id)
        df.write.mode("overwrite").parquet(f"{out_dir}/batch={batch_id}")

    sink = IdempotentForeachBatch(str(tmp_path / "commits"), write)
    batch = table(spark, SF_SMOKE, "events").limit(10)
    sink(batch, 0)
    sink(batch, 0)  # crash-replay of the same batch
    sink(batch, 1)
    assert calls == [0, 1]
    assert sink.is_committed(0) and sink.is_committed(1) and not sink.is_committed(2)
    assert spark.read.parquet(f"{out_dir}/batch=0").count() == 10


def test_foreach_batch_query_end_to_end(spark, tmp_path):
    """Full loop: file stream → foreachBatch idempotent sink → checkpoint;
    restart with the same checkpoint reprocesses nothing."""
    out_dir = str(tmp_path / "out")
    written = []

    def write(df, batch_id):
        written.append(batch_id)
        df.write.mode("overwrite").parquet(f"{out_dir}/batch={batch_id}")

    sink = IdempotentForeachBatch(str(tmp_path / "commits"), write)
    ckpt = str(tmp_path / "ckpt")
    src = events_stream(spark, SF_SMOKE).select("event_id", "ts", "value")
    q = foreach_batch_query(src, sink, ckpt)
    assert q.awaitTermination(120)
    assert written == [0]
    # Restart from the same checkpoint: source offsets are committed, so
    # no batch re-runs (and even if one did, the sink would skip it).
    q2 = foreach_batch_query(src, sink, ckpt)
    assert q2.awaitTermination(120)
    assert written == [0]


def test_heartbeat_listener(spark, tmp_path):
    heart = str(tmp_path / "heart.json")
    listener = HeartbeatListener(heart)
    spark.streams.addListener(listener)
    try:
        src = events_stream(spark, SF_SMOKE).select("event_id")
        run_available_now_to_memory(src, output_mode="append")
        deadline = time.time() + 30
        while time.time() < deadline and not os.path.exists(heart):
            time.sleep(0.5)
        assert os.path.exists(heart)
        beat = json.load(open(heart))
        assert "last_beat" in beat and "batch_id" in beat
    finally:
        spark.streams.removeListener(listener)


def test_stateful_across_multiple_microbatches(spark, tmp_path):
    """True incremental execution: the landing dir holds one file per day
    and maxFilesPerTrigger=1 forces one micro-batch per file — per-key
    state must carry across batches and the final stateful result must
    equal the batch GROUP BY (T1/T7 across real batch boundaries)."""
    from pyspark.sql import functions as F

    from monitoring_data_ingestion_spark.streaming.sources import file_stream
    from monitoring_data_ingestion_spark.streaming.stateful import running_user_stats

    e = table(spark, SF_SMOKE, "events").select("event_id", "ts", "user_id", "value")
    days = [r["d"] for r in e.select(F.to_date("ts").alias("d")).distinct().collect()]
    assert len(days) >= 2
    landing = tmp_path / "landing"
    for i, d in enumerate(sorted(days)):
        e.filter(F.to_date("ts") == d).coalesce(1).write.parquet(
            str(landing / f"day={i}" / "part")
        )
    src = file_stream(
        spark,
        str(landing),
        e.schema,
        path_glob="*.parquet",
        max_files_per_trigger=1,
    )
    updates = running_user_stats(src)
    name = "multi_batch_stats"
    q = (
        updates.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)
    assert q.lastProgress["batchId"] >= 1  # really ran >1 micro-batch
    out = spark.table(name)
    # A key seen in k batches has k update rows; max = final state.
    final = out.groupBy("user_id").agg(F.max("n_events").alias("n"))
    expect = e.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    got = {r["user_id"]: r["n"] for r in final.collect()}
    want = {r["user_id"]: r["n"] for r in expect.collect()}
    assert got == want
    assert out.count() > expect.count()  # multiple updates per key occurred


def _daily_landing(spark, tmp_path, group_days=5):
    """Write the events fixture as one parquet file per group of days so
    maxFilesPerTrigger=1 paces one micro-batch per group — the watermark
    advances at every batch boundary."""
    from pyspark.sql import functions as F

    e = table(spark, SF_SMOKE, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    days = sorted(
        r["d"] for r in e.select(F.dayofmonth("ts").alias("d")).distinct().collect()
    )
    landing = tmp_path / "landing"
    for i in range(0, len(days), group_days):
        chunk = days[i : i + group_days]
        e.filter(F.dayofmonth("ts").isin(chunk)).coalesce(1).write.parquet(
            str(landing / f"g={i:02d}" / "part")
        )
    return e, str(landing)


def test_interval_join_state_evicted_by_watermark(spark, tmp_path):
    """The stream-stream interval join must EVICT per-key state once the
    watermark passes p_ts + interval: across >=3 paced micro-batches the
    state store reports removed rows, and the final state is a small
    fraction of everything ever buffered — bounded state on unbounded
    input (the reference's liveness concern: its loop never holds more
    than one month in flight, /root/reference/src/rabbit-sanctuary.js).
    """
    from monitoring_data_ingestion_spark.streaming.ops import (
        purchase_click_interval_join,
    )
    from monitoring_data_ingestion_spark.streaming.sources import file_stream

    e, landing = _daily_landing(spark, tmp_path)
    src = file_stream(
        spark, landing, e.schema, path_glob="*.parquet", max_files_per_trigger=1
    )
    joined = purchase_click_interval_join(src, watermark="2 hours")
    q = (
        joined.writeStream.format("memory")
        .queryName("interval_join_eviction")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    progresses = [p for p in q.recentProgress if p.get("stateOperators")]
    assert len([p for p in progresses if p["batchId"] >= 0]) >= 3  # >=3 paced triggers
    ops = [p["stateOperators"][0] for p in progresses]
    assert ops[0]["operatorName"] == "symmetricHashJoin"
    removed = sum(o["numRowsRemoved"] for o in ops)
    added = sum(o["numRowsUpdated"] for o in ops)
    final_total = ops[-1]["numRowsTotal"]
    assert removed > 0, "watermark never evicted join state"
    # Bounded-state liveness: the final state holds only the tail that the
    # watermark has not yet released, NOT the whole history ever buffered.
    assert final_total < added / 2, (final_total, added)
    # Peak state never approaches total input rows on either side.
    n_input = e.filter(e.event_type.isin("purchase", "click")).count()
    assert max(o["numRowsTotal"] for o in ops) < n_input


def test_dedup_within_watermark_state_evicted(spark, tmp_path):
    """dropDuplicatesWithinWatermark state must shrink once keys age past
    the watermark — dedup state is a sliding window over event time, not
    an ever-growing set of all keys seen."""
    from monitoring_data_ingestion_spark.streaming.ops import dedup_within_watermark
    from monitoring_data_ingestion_spark.streaming.sources import file_stream

    e, landing = _daily_landing(spark, tmp_path)
    src = file_stream(
        spark, landing, e.schema, path_glob="*.parquet", max_files_per_trigger=1
    )
    deduped = dedup_within_watermark(src, keys=("event_id",), watermark="1 hour")
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_eviction")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    progresses = [p for p in q.recentProgress if p.get("stateOperators")]
    assert len(progresses) >= 3
    ops = [p["stateOperators"][0] for p in progresses]
    removed = sum(o["numRowsRemoved"] for o in ops)
    n_keys = e.select("event_id").distinct().count()
    final_total = ops[-1]["numRowsTotal"]
    assert removed > 0, "watermark never evicted dedup state"
    assert final_total < n_keys, (final_total, n_keys)  # not all keys retained


def test_ohlc_append_mode_evicts_closed_bars(spark, tmp_path):
    """The production posture for OHLC bars is APPEND mode, where the
    watermark finalizes and evicts closed bars — bounded state on an
    unbounded stream. Across paced micro-batches the state store must
    report removed rows, every emitted bar must match the batch audit
    exactly, and every bar closed before the final watermark must have
    been emitted (nothing lost by eviction)."""
    from monitoring_data_ingestion_spark.streaming.ops import ohlc_window_agg
    from monitoring_data_ingestion_spark.streaming.sources import file_stream

    e, landing = _daily_landing(spark, tmp_path)
    src = file_stream(
        spark, landing, e.schema, path_glob="*.parquet", max_files_per_trigger=1
    )
    q = (
        ohlc_window_agg(src, duration="1 hour", keys=("event_type",), watermark="2 hours")
        .writeStream.format("memory")
        .queryName("ohlc_append")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    progresses = [p for p in q.recentProgress if p.get("stateOperators")]
    assert len(progresses) >= 3
    removed = sum(p["stateOperators"][0]["numRowsRemoved"] for p in progresses)
    assert removed > 0, "watermark never evicted closed OHLC bars"

    # Batch audit: same OHLC definition over the full fixture.
    from pyspark.sql import Window as W

    order_w = W.partitionBy(
        F.date_trunc("hour", "ts").alias("h"), "event_type"
    ).orderBy("ts", "event_id")
    b = (
        e.withColumn("window_start", F.date_trunc("hour", "ts"))
        .groupBy("window_start", "event_type")
        .agg(
            F.min(F.struct("ts", "event_id", "value"))["value"].alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max(F.struct("ts", "event_id", "value"))["value"].alias("close"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    want = {
        (r.window_start, r.event_type): (r.open, r.high, r.low, r.close, r.n_events)
        for r in b.collect()
    }
    got_rows = spark.sql("SELECT * FROM ohlc_append").collect()
    assert got_rows, "append mode emitted no finalized bars"
    for r in got_rows:
        key = (r.window_start, r.event_type)
        assert want[key] == (r.open, r.high, r.low, r.close, r.n_events), key

    # Completeness below the final watermark: every audited bar whose
    # window END precedes the last reported watermark was emitted.
    import datetime as dt

    wm_str = q.lastProgress["eventTime"].get("watermark")
    assert wm_str is not None
    wm = dt.datetime.fromisoformat(wm_str.replace("Z", "+00:00")).replace(tzinfo=None)
    emitted = {(r.window_start, r.event_type) for r in got_rows}
    for (ws, et) in want:
        if ws + dt.timedelta(hours=1) <= wm:
            assert (ws, et) in emitted, (ws, et, wm)


def test_gap_fn_multi_chunk_and_late_events():
    """Arrow hands a big group to applyInPandasWithState as MULTIPLE
    chunks; `_gap_fn` must sort the union of the chunks, not each chunk,
    or a chunk seam fabricates/hides gaps. A late event below the carried
    state must also not regress state (it would fabricate a gap before
    the next on-time event)."""
    import pandas as pd

    from monitoring_data_ingestion_spark.streaming.stateful import _gap_fn

    HOUR = 3_600_000_000
    DAY = 24 * HOUR

    class FakeState:
        def __init__(self, value=None):
            self._v = value

        @property
        def exists(self):
            return self._v is not None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = tuple(v)

    def run(chunks_us, state):
        pdfs = (
            pd.DataFrame({"ts": pd.to_datetime(c, unit="us")}) for c in chunks_us
        )
        (out,) = list(_gap_fn((7,), pdfs, state))
        return {(r.gap_start_us, r.gap_end_us) for r in out.itertuples()}

    # Chunk seam: the later half of the batch arrives in the FIRST chunk.
    # Sorted union = [0h, 1h, 2h, 3h] → no gap; per-chunk sorting would
    # difference 3h→0h backwards and 1h-vs-state wrongly.
    st = FakeState()
    assert run([[2 * HOUR, 3 * HOUR], [0, 1 * HOUR]], st) == set()
    assert st.get == (3 * HOUR,)

    # A real gap that straddles the chunk seam must still be found once.
    st = FakeState()
    got = run([[3 * DAY], [0, 1 * HOUR]], st)
    assert got == {(1 * HOUR, 3 * DAY)}

    # Late event below carried state: state must not regress, and no
    # phantom gap may be emitted against the stale timestamp.
    st = FakeState((10 * DAY,))
    assert run([[1 * HOUR]], st) == set()
    assert st.get == (10 * DAY,)
    # The next on-time event measures from the true watermark.
    assert run([[10 * DAY + 2 * DAY]], st) == {(10 * DAY, 12 * DAY)}


def test_gap_alerts_correct_under_tiny_arrow_chunks(spark, tmp_path):
    """End-to-end witness for the multi-chunk fix: force Arrow to hand
    applyInPandasWithState ~7-row chunks (far below any real group size)
    and drain the full gap pipeline — output must still equal the batch
    audit exactly. Before the fix, per-chunk sorting with carried state
    fabricated/missed gaps at every chunk seam."""
    from monitoring_data_ingestion_spark.streaming.sources import file_stream
    from monitoring_data_ingestion_spark.streaming.stateful import gap_alerts

    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
    try:
        e, landing = _daily_landing(spark, tmp_path)
        src = file_stream(
            spark, landing, e.schema, path_glob="*.parquet", max_files_per_trigger=1
        )
        q = (
            gap_alerts(src)
            .writeStream.format("memory")
            .queryName("gap_alerts_tiny_chunks")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(300)
        out = spark.sql("SELECT * FROM gap_alerts_tiny_chunks")
        got = {(r.user_id, r.gap_start_us, r.gap_end_us) for r in out.collect()}
        from pyspark.sql import Window as W

        order_w = W.partitionBy("user_id").orderBy("ts", "event_id")
        batch = (
            e.select(
                "user_id",
                F.unix_micros(F.lag("ts").over(order_w)).alias("gap_start_us"),
                F.unix_micros("ts").alias("gap_end_us"),
            )
            .filter(F.col("gap_end_us") - F.col("gap_start_us") > 86_400_000_000)
        )
        want = {(r.user_id, r.gap_start_us, r.gap_end_us) for r in batch.collect()}
        assert got == want
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
        else:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", prev)


def test_gap_alerts_state_is_one_row_per_key(spark, tmp_path):
    """The heartbeat-gap state machine must hold exactly one state row per
    key no matter how many batches or events flow through — the bounded-
    liveness contract (state = last timestamp only), and gaps that span
    micro-batches must still be reported."""
    from monitoring_data_ingestion_spark.streaming.sources import file_stream
    from monitoring_data_ingestion_spark.streaming.stateful import gap_alerts

    e, landing = _daily_landing(spark, tmp_path)
    src = file_stream(
        spark, landing, e.schema, path_glob="*.parquet", max_files_per_trigger=1
    )
    q = (
        gap_alerts(src)
        .writeStream.format("memory")
        .queryName("gap_alerts_state")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    progresses = [p for p in q.recentProgress if p.get("stateOperators")]
    assert len(progresses) >= 3  # paced triggers: state crossed batches
    n_keys = e.select("user_id").distinct().count()
    ops = [p["stateOperators"][0] for p in progresses]
    assert max(o["numRowsTotal"] for o in ops) <= n_keys
    # cross-batch correctness: the drained output equals the batch audit
    out = spark.sql("SELECT * FROM gap_alerts_state")
    got = {(r.user_id, r.gap_start_us, r.gap_end_us) for r in out.collect()}
    from pyspark.sql import Window as W

    order_w = W.partitionBy("user_id").orderBy("ts", "event_id")
    batch = (
        e.select(
            "user_id",
            F.unix_micros(F.lag("ts").over(order_w)).alias("gap_start_us"),
            F.unix_micros("ts").alias("gap_end_us"),
        )
        .filter(F.col("gap_end_us") - F.col("gap_start_us") > 86_400_000_000)
    )
    want = {(r.user_id, r.gap_start_us, r.gap_end_us) for r in batch.collect()}
    assert got == want


def test_heartbeat_listener_scoped_to_one_query(tmp_path):
    """A session-level listener receives EVERY query's events; scoped to
    ``query_name`` it must ignore other queries — otherwise any live
    query keeps the heartbeat fresh after the monitored pipeline died,
    defeating the liveness monitor (T8)."""
    heart = str(tmp_path / "heart.json")
    listener = HeartbeatListener(heart, query_name="monitored_q")

    class _Evt:
        name = "other_q"
        id = "id-1"

    class _Prog:
        class progress:
            name = "other_q"
            id = "id-1"
            batchId = 3

    listener.onQueryStarted(_Evt())
    listener.onQueryProgress(_Prog())
    assert not os.path.exists(heart)  # another query never beats
    _Evt.name = "monitored_q"
    listener.onQueryStarted(_Evt())
    assert os.path.exists(heart)
    assert json.load(open(heart))["query"] == "monitored_q"


def test_stale_commit_markers_after_checkpoint_reset_fail_loudly(spark, tmp_path):
    """Commit markers share the checkpoint's lifecycle: if the
    checkpoint was reset (batch ids restart at 0) while old markers
    survive, every batch would silently skip as already-committed and
    the stream would 'succeed' having written nothing — the sink must
    stop loudly instead."""
    import pytest

    calls = []

    def write(df, bid):
        calls.append(bid)

    commits = str(tmp_path / "commits")
    sink = IdempotentForeachBatch(commits, write)
    df = spark.range(1)
    sink(df, 0)
    sink(df, 1)
    assert calls == [0, 1]
    # same run: re-delivery of batch 1 skips silently (correct)
    sink(df, 1)
    assert calls == [0, 1]
    # new run against a RESET checkpoint: batch 0 arrives while marker
    # 1 exists -> loud stop naming both dirs' shared lifecycle
    fresh = IdempotentForeachBatch(commits, write)
    with pytest.raises(ValueError, match="checkpoint was reset"):
        fresh(df, 0)


def test_memory_sink_views_do_not_accumulate(spark):
    """Each drained streaming result must not pin a new in-memory table
    for the session's lifetime: the next drain drops the previous
    view, bounding driver memory to one outstanding result."""
    src1 = events_stream(spark, SF_SMOKE).select("event_id")
    out1 = run_available_now_to_memory(src1, output_mode="append")
    first_view = spark._mdi_memory_sink_view
    assert out1.count() > 0
    src2 = events_stream(spark, SF_SMOKE).select("user_id")
    out2 = run_available_now_to_memory(src2, output_mode="append")
    assert out2.count() > 0
    assert spark._mdi_memory_sink_view != first_view
    assert not spark.catalog.tableExists(first_view)
