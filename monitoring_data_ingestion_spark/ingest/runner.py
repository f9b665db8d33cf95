"""Incremental ingest scheduler (SURVEY.md §2.11 X1-X3, §3.1).

The reference's RabbitSanctuary (/root/reference/src/rabbit-sanctuary.js:
10-106) schedules each source on a loop: run → on success re-queue
immediately → on failure re-queue after a retry delay; a watchdog kills
hung runs; every run starts with a heartbeat.

Spark-first redesign (SURVEY §3.1): one long-lived driver; each "run" is a
micro-batch function `forage(spark, state, datasets) -> ForageResult`
executed inline (Spark's scheduler provides the parallelism the reference
got from worker threads — per-dataset fan-out happens inside the plan, not
via threads). The scheduler keeps the same observable semantics: bounded
retries, per-run heartbeat, commit ordering outputs → state.
"""

from __future__ import annotations

import time
import traceback
from dataclasses import dataclass, field
from typing import Any, Callable, Protocol

from pyspark.sql import SparkSession

from .sinks import publish_inventory, publish_state_summary, write_heartbeat
from .state import SourceState, StateStore


@dataclass
class ForageResult:
    """What a source run returns (mirrors `{new_state, metadatas}` of
    /root/reference/src/sources/era5monthly.js:123)."""

    new_state: SourceState
    metadatas: list[dict[str, Any]] = field(default_factory=list)


class NoUpdateNeeded(Exception):
    """Head-of-stream reached (T3, src/sources/era5monthly.js:159-170):
    keep the cursor, try again next trigger."""


class Source(Protocol):
    name: str

    def forage(
        self, spark: SparkSession, state: SourceState, datasets: list[dict[str, Any]]
    ) -> ForageResult: ...


@dataclass
class SourceRun:
    source_name: str
    ok: bool
    skipped: bool = False
    error: str | None = None
    elapsed_s: float = 0.0


class IngestScheduler:
    """Drives sources to head-of-stream with retry semantics.

    `run_until_head` is the batch-mode equivalent of the reference's
    immediate-requeue-on-success loop (src/rabbit-sanctuary.js:56-71):
    each successful batch advances the watermark one period; the loop stops
    at NoUpdateNeeded or after `max_batches`.
    """

    def __init__(
        self,
        spark: SparkSession,
        store: StateStore,
        retry_delay_s: float = 0.0,
        max_retries: int = 2,
        clock: Callable[[], float] = time.monotonic,
        sleep: Callable[[float], None] = time.sleep,
    ) -> None:
        self.spark = spark
        self.store = store
        self.retry_delay_s = retry_delay_s
        self.max_retries = max_retries
        self._clock = clock
        self._sleep = sleep
        self.runs: list[SourceRun] = []

    def run_once(self, source: Source, datasets: list[dict[str, Any]]) -> SourceRun:
        """One batch: heartbeat → forage → publish metadata → commit state
        → rebuild inventory/state summary. Commit ordering is the T2
        contract: if we crash before `commit_source`, re-running the batch
        reproduces identical outputs (idempotent overwrite writes)."""
        t0 = self._clock()
        write_heartbeat(self.store.root)
        state = self.store.load_source(source.name)
        try:
            result = source.forage(self.spark, state, datasets)
        except NoUpdateNeeded:
            run = SourceRun(source.name, ok=True, skipped=True, elapsed_s=self._clock() - t0)
            self.runs.append(run)
            return run
        except Exception:
            run = SourceRun(
                source.name, ok=False, error=traceback.format_exc(), elapsed_s=self._clock() - t0
            )
            self.runs.append(run)
            return run
        # Outputs (parquet + metadata.json) are already written by forage;
        # only now do we advance the watermark.
        for md in result.metadatas:
            if md:
                self.store.write_dataset_metadata(md["layer_name"], md)
        self.store.commit_source(source.name, result.new_state)
        publish_inventory(self.store.root)
        publish_state_summary(self.store.root)
        run = SourceRun(source.name, ok=True, elapsed_s=self._clock() - t0)
        self.runs.append(run)
        return run

    def run_with_retry(self, source: Source, datasets: list[dict[str, Any]]) -> SourceRun:
        attempt = 0
        while True:
            run = self.run_once(source, datasets)
            if run.ok or attempt >= self.max_retries:
                return run
            attempt += 1
            if self.retry_delay_s:
                self._sleep(self.retry_delay_s)

    def run_until_head(
        self, source: Source, datasets: list[dict[str, Any]], max_batches: int = 1000
    ) -> list[SourceRun]:
        out = []
        for _ in range(max_batches):
            run = self.run_with_retry(source, datasets)
            out.append(run)
            if run.skipped or not run.ok:
                break
        return out
