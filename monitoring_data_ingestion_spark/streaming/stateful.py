"""Custom stateful streaming operators (T7: the reference's cross-run
normals cache, /root/reference/src/sources/era5monthly.js:129-155,
generalized to arbitrary per-key state).

``applyInPandasWithState`` is the engine's extensibility point for state
machines the built-in windowed aggregates can't express: per-key state
lives in the state store (checkpointed, partitioned by key — scales
horizontally with executors), and each micro-batch's rows for a key arrive
as Arrow batches.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_OUT_SCHEMA = "user_id bigint, n_events bigint, first_ts_us bigint, last_ts_us bigint"
_STATE_SCHEMA = "n bigint, mn bigint, mx bigint"


def _stats_fn(
    key: Tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Running (count, min ts, max ts) per key, carried across batches in
    the state store; one updated summary row is emitted per batch in which
    the key appears."""
    (user_id,) = key
    if state.exists:
        n, mn, mx = state.get
    else:
        n, mn, mx = 0, None, None
    for pdf in pdfs:
        ts_us = pdf["ts"].values.astype("datetime64[us]").astype("int64")
        if len(ts_us):
            n += len(ts_us)
            lo, hi = int(ts_us.min()), int(ts_us.max())
            mn = lo if mn is None else min(mn, lo)
            mx = hi if mx is None else max(mx, hi)
    state.update((n, mn, mx))
    yield pd.DataFrame(
        [{"user_id": user_id, "n_events": n, "first_ts_us": mn, "last_ts_us": mx}]
    )


def running_user_stats(df: DataFrame) -> DataFrame:
    """Per-user running event stats as a stateful streaming operator.

    Output timestamps are carried as epoch-microsecond longs (state-store
    types stay timezone-free); callers convert with ``timestamp_micros``.
    Scale: state is one 3-long tuple per key, shuffled once on user_id and
    then pinned to its state-store partition — no growth with event count.
    """
    return df.select("user_id", "ts").groupBy("user_id").applyInPandasWithState(
        _stats_fn,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


_GAP_OUT_SCHEMA = "user_id bigint, gap_start_us bigint, gap_end_us bigint, gap_us bigint"
_GAP_STATE_SCHEMA = "last_us bigint"

_GAP_THRESHOLD_US = 86_400_000_000  # 24 h — same contract as ts_gap_detection


def _gap_fn(
    key: Tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Emit every silence longer than the threshold between consecutive
    events of a key. State is ONE long (the last seen timestamp) per key
    regardless of stream length — the bounded-liveness state machine.

    The whole micro-batch is materialized and sorted ONCE before
    differencing: Arrow hands the group over as ~10k-row chunks
    (spark.sql.execution.arrow.maxRecordsPerBatch), so sorting
    per-chunk while carrying ``last`` across chunks would difference
    out-of-order at every chunk seam. State also only advances forward
    (``max``): an event older than the carried watermark is a late
    arrival already accounted for and must not regress state, which
    would fabricate a gap before the next on-time event."""
    (user_id,) = key
    last = state.get[0] if state.exists else None
    chunks = [
        pdf["ts"].values.astype("datetime64[us]").astype("int64") for pdf in pdfs
    ]
    ts_us = np.sort(np.concatenate(chunks)) if chunks else np.empty(0, dtype="int64")
    out = []
    for t in ts_us:
        t = int(t)
        if last is not None and t <= last:
            continue  # late duplicate/out-of-order event — already covered
        if last is not None and t - last > _GAP_THRESHOLD_US:
            out.append(
                {
                    "user_id": user_id,
                    "gap_start_us": last,
                    "gap_end_us": t,
                    "gap_us": t - last,
                }
            )
        last = t
    if last is not None:
        state.update((last,))
    yield pd.DataFrame(out, columns=["user_id", "gap_start_us", "gap_end_us", "gap_us"])


def gap_alerts(df: DataFrame) -> DataFrame:
    """Heartbeat-gap alerts as a custom stateful operator: the streaming
    form of plans/timeseries.ts_gap_detection. State per key is a single
    epoch-microsecond long carried across micro-batches, so a key that
    goes silent and returns three batches later still reports the full
    gap — something a watermarked window aggregate cannot express
    (the gap spans an unbounded number of windows)."""
    return df.select("user_id", "ts").groupBy("user_id").applyInPandasWithState(
        _gap_fn,
        outputStructType=_GAP_OUT_SCHEMA,
        stateStructType=_GAP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
