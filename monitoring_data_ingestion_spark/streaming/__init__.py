"""Structured Streaming layer (SURVEY.md §2.9 T1-T9).

The reference's ingestion loop is a hand-rolled micro-batch scheduler:
watch a directory, run one incremental batch per source, commit state
after outputs, retry on failure, heartbeat per run
(/root/reference/src/rabbit-sanctuary.js:10-73, src/rabbit.js:14-16,51-61).
This package is the Spark-native restatement: file-stream sources,
watermarked windows, stateful operators, exactly-once foreachBatch sinks,
and a StreamingQueryListener heartbeat.

Batch-incremental equivalents (the ``ingest/`` package) share the same
sink/state code — a source can run either as a trigger loop or as a
Structured Streaming query without rewriting its transform.
"""

from .sources import events_stream, file_stream
from .ops import (
    dedup_within_watermark,
    session_window_agg,
    sliding_window_agg,
    tumbling_window_agg,
)
from .pipeline import (
    anomaly_transform,
    monthly_anomaly_query,
    monthly_normals,
)
from .stateful import running_user_stats
from .sinks import (
    IdempotentForeachBatch,
    foreach_batch_query,
    run_available_now_to_memory,
)
from .heartbeat import HeartbeatListener

__all__ = [
    "events_stream",
    "file_stream",
    "tumbling_window_agg",
    "sliding_window_agg",
    "session_window_agg",
    "dedup_within_watermark",
    "running_user_stats",
    "anomaly_transform",
    "monthly_anomaly_query",
    "monthly_normals",
    "IdempotentForeachBatch",
    "foreach_batch_query",
    "run_available_now_to_memory",
    "HeartbeatListener",
]
