"""Small-file compaction for parquet table directories.

At 100 TB the killer isn't one big file — it's millions of tiny ones:
every micro-batch, late-arriving partition rewrite, or over-parallel
write (the engine's streaming sink emits one file per month per trigger)
leaves files far below the scan-efficient size, and each costs a task
launch, a footer read, and a NameNode/listing entry per query. Compaction
rewrites a directory to a target file size, trading one bounded rewrite
for every future scan's speedup.

Design:

* ``compaction_plan`` is pure arithmetic over the current file listing —
  unit-testable, driver-cheap (listing only, never data).
* ``compact_parquet`` rewrites via a single Spark job (coalesce to the
  planned file count — a NARROW dependency, no shuffle; the data is
  already partitioned arbitrarily and compaction must not reorder it) and
  commits by atomic directory swap, so readers never observe a half-
  compacted table and a crashed compaction leaves the original intact
  (S7's atomic-rename contract applied to maintenance).
* Partitioned layouts compact per partition directory (each partition is
  its own swap unit), which is how a 100 TB table compacts incrementally.
"""

from __future__ import annotations

import os
import shutil
import uuid
from dataclasses import dataclass

from pyspark.sql import SparkSession

DEFAULT_TARGET_MB = 128


@dataclass(frozen=True)
class CompactionPlan:
    n_files: int
    total_bytes: int
    target_files: int

    @property
    def worth_it(self) -> bool:
        """Skip rewrites that wouldn't reduce the file count — the
        no-update short-circuit (T3) applied to maintenance."""
        return self.target_files < self.n_files


def _data_files(path: str) -> list[str]:
    out = []
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet") and not f.startswith(("_", ".")):
                out.append(os.path.join(root, f))
    return out


def compaction_plan(path: str, target_mb: int = DEFAULT_TARGET_MB) -> CompactionPlan:
    """Plan from the file listing alone: ceil(total / target) output files,
    never more than the current count."""
    files = _data_files(path)
    total = sum(os.path.getsize(f) for f in files)
    target_bytes = target_mb * 1024 * 1024
    want = max(1, -(-total // target_bytes)) if total else 1
    return CompactionPlan(
        n_files=len(files), total_bytes=total, target_files=min(want, max(len(files), 1))
    )


def compact_parquet(
    spark: SparkSession, path: str, target_mb: int = DEFAULT_TARGET_MB
) -> CompactionPlan:
    """Rewrite ``path`` to the planned file count and atomically swap.

    The rewrite is ``coalesce`` (narrow — no shuffle, no reordering of
    row groups beyond file concatenation); the swap is rename(old→trash),
    rename(new→old), delete(trash) so a reader holding the old listing
    finishes against intact files and a crash before the second rename
    leaves the original directory untouched.
    """
    plan = compaction_plan(path, target_mb)
    if not plan.worth_it:
        return plan
    staging = f"{path}.__compact-{uuid.uuid4().hex[:8]}"
    spark.read.parquet(path).coalesce(plan.target_files).write.mode("overwrite").parquet(
        staging
    )
    trash = f"{path}.__old-{uuid.uuid4().hex[:8]}"
    os.rename(path, trash)
    try:
        os.rename(staging, path)
    except BaseException:  # roll back the first rename on any failure
        os.rename(trash, path)
        raise
    shutil.rmtree(trash)
    return plan


def compact_partitioned(
    spark: SparkSession, table_dir: str, target_mb: int = DEFAULT_TARGET_MB
) -> dict[str, CompactionPlan]:
    """Compact each ``key=value`` partition directory independently —
    every partition is its own atomic swap unit, so a long-running
    compaction of a huge table can stop anywhere and every completed
    partition stays consistent."""
    results: dict[str, CompactionPlan] = {}
    for entry in sorted(os.listdir(table_dir)):
        sub = os.path.join(table_dir, entry)
        if os.path.isdir(sub) and "=" in entry:
            results[entry] = compact_parquet(spark, sub, target_mb)
    return results
