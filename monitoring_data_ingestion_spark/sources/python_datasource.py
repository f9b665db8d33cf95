"""Custom Python Data Source: the reference's source-plugin model as a
first-class Spark source (PySpark 4.x ``pyspark.sql.datasource`` API).

The reference discovers sources as plugin modules and pulls **one month of
gridded data per run**, tracking progress in a JSON watermark file
(/root/reference/src/rabbit.js:20-26, src/sources/era5monthly.js:36-43).
This module re-expresses that contract natively:

- ``spark.read.format("gridmonths")`` — batch scan over a landing directory
  of ``YYYY-MM.parquet`` month files, with **filter pushdown into the
  source** (SURVEY.md §2.2 P3): ``variable`` equality/IN is evaluated
  inside the scan via Arrow predicate, and time bounds prune whole month
  partitions at planning time — the Spark-native analogue of the reference
  sending the variable list + month in the CDS request so the *server*
  subsets (src/sources/era5monthly.js:46-56).
- ``spark.readStream.format("gridmonths")`` — the incremental path: the
  streaming offset IS the month cursor (T1), with exactly-once resume
  from the Spark checkpoint replacing the hand-rolled JSON state file
  (T2). Pacing follows the FileStreamSource idiom: set
  ``maxMonthsPerTrigger`` for strict N-months-per-micro-batch pacing
  under a ProcessingTime trigger (the reference's one-month-per-run
  contract); omit it to drain all available months per batch — required
  for ``Trigger.AvailableNow`` backfills, which capture a single
  latestOffset at query start as the fixed end.

Scale posture: the driver only ever lists the landing directory (cheap);
all row IO happens executor-side via Arrow record batches, one partition
per month file, so a 800-month backfill (src/sources/era5monthly.js:40)
reads in parallel across the cluster while the *streaming* path paces it
month-by-month exactly like the reference.
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass
from typing import Iterable, Iterator, List, Sequence, Tuple

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    LessThan,
    LessThanOrEqual,
)
from pyspark.sql.types import StructType

from ..grid.model import GRID_SCHEMA

_MONTH_RE = re.compile(r"^(\d{4})-(\d{2})\.parquet$")

FORMAT_NAME = "gridmonths"


def _list_months(path: str) -> List[str]:
    """Sorted ``YYYY-MM`` keys present in the landing dir (lexicographic ==
    chronological for zero-padded keys). Driver-side metadata only."""
    out = []
    for name in os.listdir(path):
        m = _MONTH_RE.match(name)
        if m and 1 <= int(m.group(2)) <= 12:
            out.append(name[:-len(".parquet")])
    return sorted(out)


def _month_files(path: str, month: str) -> List[str]:
    """Data files for one month entry: either a single parquet file or a
    Spark-written directory of part files (skip _SUCCESS/.crc markers)."""
    entry = os.path.join(path, f"{month}.parquet")
    if os.path.isfile(entry):
        return [entry]
    return sorted(
        os.path.join(entry, f)
        for f in os.listdir(entry)
        if f.endswith(".parquet") and not f.startswith(".")
    )


def _month_bounds(month: str):
    """[start, next_month_start) UTC span of a month key."""
    from datetime import datetime, timezone

    y, mo = int(month[:4]), int(month[5:7])
    start = datetime(y, mo, 1, tzinfo=timezone.utc)
    ny, nmo = (y + 1, 1) if mo == 12 else (y, mo + 1)
    return start, datetime(ny, nmo, 1, tzinfo=timezone.utc)


@dataclass
class MonthPartition(InputPartition):
    files: Tuple[str, ...]
    variables: Tuple[str, ...] | None  # None = no pushdown, read all


def _read_month(partition: MonthPartition) -> Iterator["object"]:
    """Executor-side Arrow scan of one month. Yields RecordBatch — the
    zero-copy fast path into Spark's vectorized reader."""
    import pyarrow as pa
    import pyarrow.dataset as pads

    target = pa.schema(
        [
            pa.field("time", pa.timestamp("us", tz="UTC")),
            pa.field("lat", pa.float64()),
            pa.field("lon", pa.float64()),
            pa.field("variable", pa.string()),
            pa.field("value", pa.float64()),
        ]
    )
    dataset = pads.dataset(list(partition.files), format="parquet")
    predicate = None
    if partition.variables is not None:
        predicate = pads.field("variable").isin(list(partition.variables))
    scanner = dataset.scanner(
        columns=["time", "lat", "lon", "variable", "value"], filter=predicate
    )
    for batch in scanner.to_batches():
        if batch.num_rows:
            yield pa.Table.from_batches([batch]).cast(target).to_batches()[0]


def _prune_months(months: List[str], time_filters: List[Filter]) -> List[str]:
    """Partition pruning: keep only months whose [start, end) span can
    satisfy every pushed time bound. Conservative — a month survives unless
    the bound excludes its entire span (the residual row-level filter is
    still applied by Spark; see ``pushFilters`` returning time filters)."""
    kept = []
    for m in months:
        lo, hi = _month_bounds(m)  # span is [lo, hi)
        ok = True
        for f in time_filters:
            v = f.value
            if v is not None and getattr(v, "tzinfo", None) is None:
                from datetime import timezone

                v = v.replace(tzinfo=timezone.utc)
            if isinstance(f, EqualTo):
                ok &= lo <= v < hi
            elif isinstance(f, GreaterThan) or isinstance(f, GreaterThanOrEqual):
                # any t in [lo, hi) with t >(=) v exists iff v < last instant
                ok &= v < hi
            elif isinstance(f, LessThan):
                ok &= lo < v
            elif isinstance(f, LessThanOrEqual):
                ok &= lo <= v
        if ok:
            kept.append(m)
    return kept


class GridMonthsReader(DataSourceReader):
    def __init__(self, options):
        self.path = options["path"]
        self.start = options.get("start")  # inclusive YYYY-MM
        self.end = options.get("end")  # inclusive YYYY-MM
        self.variables: Tuple[str, ...] | None = None
        self.time_filters: List[Filter] = []

    def pushFilters(self, filters: List[Filter]) -> Iterable[Filter]:
        for f in filters:
            col = f.attribute[0] if len(f.attribute) == 1 else None
            if isinstance(f, EqualTo) and col == "variable":
                self.variables = (f.value,)  # fully handled in the scan
            elif isinstance(f, In) and col == "variable":
                self.variables = tuple(f.value)
            elif col == "time" and isinstance(
                f, (EqualTo, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual)
            ):
                # Partially pushed: prunes month partitions here, but the
                # row-level bound is returned for Spark to re-check (months
                # are coarser than timestamps).
                self.time_filters.append(f)
                yield f
            else:
                yield f

    def partitions(self) -> Sequence[InputPartition]:
        months = _list_months(self.path)
        if self.start:
            months = [m for m in months if m >= self.start]
        if self.end:
            months = [m for m in months if m <= self.end]
        months = _prune_months(months, self.time_filters)
        return [
            MonthPartition(files=tuple(_month_files(self.path, m)), variables=self.variables)
            for m in months
        ]

    def read(self, partition: MonthPartition):
        return _read_month(partition)


class GridMonthsStreamReader(DataSourceStreamReader):
    """Month-cursor stream: offset ``{"next": "YYYY-MM"}`` is exactly the
    reference's watermark state ``{date}`` (src/sources/era5monthly.js:37-41)
    — advance by up to ``maxMonthsPerTrigger`` available months per trigger,
    resume from checkpoint after restart."""

    def __init__(self, options):
        self.path = options["path"]
        self.start = options.get("start")
        # FileStreamSource idiom: maxMonthsPerTrigger ABSENT → drain mode
        # (every batch takes all available months — what availableNow
        # backfills need, since Trigger.AvailableNow captures ONE
        # latestOffset at query start as the fixed end); PRESENT → strict
        # per-trigger pacing for the ProcessingTime service loop (the
        # reference's one-month-per-run contract).
        self.paced = "maxmonthspertrigger" in options
        self.per_trigger = int(options.get("maxmonthspertrigger", "1"))
        self.variables = None
        # Two pieces of in-memory state, both "YYYY-MM" month keys, both
        # monotone, designed around three facts established empirically
        # against Spark 4.1's MicroBatchExecution (see tests):
        # 1. latestOffset() runs BEFORE initialOffset() on a fresh start —
        #    the first poll always sees unknown position.
        # 2. commit(end) for batch N is only delivered while batch N+1 is
        #    being PLANNED — so pacing cannot wait for commit (deadlock);
        #    the cursor must advance at poll time.
        # 3. If latestOffset ever regresses below the checkpointed offset,
        #    Spark plans a batch ending at the regressed offset and the NEXT
        #    batch starts from it → duplicate reads, unless emission is
        #    clamped to a floor of durably-scheduled months.
        #
        # _floor: months below it are durably scheduled into some logged
        #   batch — learned ONLY from partitions() starts (which replay
        #   first after a crash-restart) and commit() ends. Clamps emission.
        # _cursor: pacing position — advances by per_trigger months each
        #   latestOffset poll; purely in-memory, never gates emission.
        self._floor: str | None = None
        self._cursor: str | None = None

    def _months(self) -> List[str]:
        months = _list_months(self.path)
        if self.start:
            months = [m for m in months if m >= self.start]
        return months

    @staticmethod
    def _mx(cur: str | None, key: str) -> str:
        return key if cur is None or key > cur else cur

    def initialOffset(self) -> dict:
        months = self._months()
        first = self.start or (months[0] if months else "0000-00")
        # Nothing below the initial key exists, so it is a safe floor too.
        self._floor = self._mx(self._floor, first)
        self._cursor = self._mx(self._cursor, first)
        return {"next": first}

    def latestOffset(self) -> dict:
        if not self.paced:
            # Drain mode: offer everything currently listed, floored so a
            # post-consumption file removal can never regress the offset.
            months = self._months()
            if not months:
                return self.initialOffset() if self._floor is None else {"next": self._floor}
            return {"next": self._mx(self._floor, self._next_key(months[-1]))}
        if self._cursor is None and self._floor is None:
            # First poll: fresh start (initialOffset hasn't run yet) or a
            # fully-committed restart. Returning the initial key is safe in
            # both — fresh start plans at most a zero-width batch; restart
            # plans one regressed batch that the floor clamp empties, whose
            # partitions() start re-teaches the position.
            return self.initialOffset()
        cur = self._mx(self._cursor, self._floor or "0000-00")
        ahead = [m for m in self._months() if m >= cur][: self.per_trigger]
        if not ahead:
            return {"next": cur}
        nxt = self._next_key(ahead[-1])
        self._cursor = self._mx(cur, nxt)
        return {"next": nxt}

    @staticmethod
    def _next_key(month: str) -> str:
        y, mo = int(month[:4]), int(month[5:7])
        y, mo = (y + 1, 1) if mo == 12 else (y, mo + 1)
        return f"{y:04d}-{mo:02d}"

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        # start is durable (it came from the offset log), so it raises the
        # floor. Replayed batches pass their original start (>= every
        # earlier start, and commit-ends only trail it), so the clamp is a
        # no-op for legitimate replays — it only empties the synthetic
        # regressed batch described in __init__ fact 3.
        self._floor = self._mx(self._floor, start["next"])
        self._cursor = self._mx(self._cursor, self._floor)
        lo = self._mx(self._floor, start["next"])
        months = [m for m in self._months() if lo <= m < end["next"]]
        return [
            MonthPartition(files=tuple(_month_files(self.path, m)), variables=self.variables)
            for m in months
        ]

    def read(self, partition: MonthPartition):
        return _read_month(partition)

    def commit(self, end: dict) -> None:
        self._floor = self._mx(self._floor, end["next"])


class GridMonthsDataSource(DataSource):
    """``format("gridmonths")`` — options: ``path`` (landing dir of
    ``YYYY-MM.parquet`` files/dirs), ``start``/``end`` (inclusive YYYY-MM),
    ``maxMonthsPerTrigger`` (streaming: strict per-trigger pacing when set;
    drain-all-available when omitted — use drain with availableNow)."""

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self) -> StructType:
        return GRID_SCHEMA

    def reader(self, schema: StructType) -> DataSourceReader:
        return GridMonthsReader(self.options)

    def streamReader(self, schema: StructType) -> DataSourceStreamReader:
        return GridMonthsStreamReader(self.options)


def register(spark) -> None:
    # Runtime-settable; required because GridMonthsReader overrides
    # pushFilters (Spark refuses such sources with pushdown disabled).
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(GridMonthsDataSource)
