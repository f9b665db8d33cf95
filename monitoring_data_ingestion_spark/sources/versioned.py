"""Versioned parquet tables: atomic publish + snapshot reads (time travel).

The reference publishes each batch by temp-write + rename and keeps
`last_successful_update` state so failed runs never expose partial output
(/root/reference/src/utility.js:94-103, src/rabbit.js:51-61). Generalized
to table granularity: every commit writes immutable data files plus ONE
atomically-renamed manifest; readers resolve a manifest (latest or a
pinned version) and see an exact snapshot — never a torn write. This is
the lightweight core of the Delta/Iceberg pattern, built on nothing but
parquet + rename, and it supplies:

  * exactly-once publish: commits carry a batch id; a re-delivered batch
    returns the already-committed version (T2 idempotence at table level);
  * time travel: `read(spark, version=n)` pins an old snapshot —
    reproducible backfills and audits;
  * safe vacuum: only files unreferenced by ANY manifest are deleted.

Scale: a manifest lists file paths (KBs per commit); data files are
written once and never rewritten, so commit cost is the data write plus
one rename regardless of table size.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import uuid
from dataclasses import dataclass
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession

_MANIFEST_DIR = "_manifests"
_DATA_DIR = "data"

# Sentinel: distinguishes "caller did not pass expected_base" from the
# legitimate expected_base=None ("I expect to create version 1").
_UNSET = object()


class CommitConflict(Exception):
    """Another writer committed between this writer's snapshot read and
    its manifest claim. The caller must re-read the new latest snapshot,
    rebuild its update against it, and retry — optimistic concurrency,
    the Delta/Iceberg protocol."""


@dataclass
class Snapshot:
    version: int
    files: list[str]
    batch_id: str | None
    committed_at: str
    n_files: int


class VersionedTable:
    def __init__(self, root: str) -> None:
        self.root = root
        os.makedirs(os.path.join(root, _MANIFEST_DIR), exist_ok=True)
        os.makedirs(os.path.join(root, _DATA_DIR), exist_ok=True)

    # -- manifests ---------------------------------------------------------
    def _manifest_path(self, version: int) -> str:
        return os.path.join(self.root, _MANIFEST_DIR, f"v{version:08d}.json")

    def snapshots(self) -> list[Snapshot]:
        out = []
        for path in sorted(glob.glob(os.path.join(self.root, _MANIFEST_DIR, "v*.json"))):
            with open(path) as f:
                m = json.load(f)
            out.append(
                Snapshot(
                    version=m["version"],
                    files=m["files"],
                    batch_id=m.get("batch_id"),
                    committed_at=m["committed_at"],
                    n_files=len(m["files"]),
                )
            )
        return out

    def latest_version(self) -> int | None:
        snaps = self.snapshots()
        return snaps[-1].version if snaps else None

    def _resolve(self, version: int | None) -> Snapshot:
        snaps = self.snapshots()
        if not snaps:
            raise FileNotFoundError(f"versioned table {self.root} has no commits")
        if version is None:
            return snaps[-1]
        for s in snaps:
            if s.version == version:
                return s
        raise KeyError(f"version {version} not found in {self.root}")

    # -- commit / read -----------------------------------------------------
    def commit(
        self,
        df: DataFrame,
        batch_id: str | None = None,
        expected_base: int | None | object = _UNSET,
    ) -> int:
        """Publish ``df`` as the next snapshot; returns its version.

        Idempotent on ``batch_id``: a re-delivered batch returns the
        version that already committed it, writing nothing. Crash safety:
        data files without a manifest are invisible to readers and
        reclaimable by vacuum; the manifest claim is the commit point.

        Concurrency: the claim is ``os.link`` (atomic fail-if-exists on
        POSIX), so two writers racing for the same version number cannot
        both win — a plain rename would silently clobber. On losing a
        claim the writer re-checks ``batch_id`` (another replayer may
        have just committed this very batch → return its version) and
        otherwise retries under the next version number.

        Pass ``expected_base`` (the ``latest_version()`` the caller built
        ``df`` against) to demand serializability: if any OTHER writer
        committed on top of that base first, :class:`CommitConflict` is
        raised instead of silently publishing an update derived from a
        stale snapshot (lost update). Callers catch it, re-read, rebuild,
        retry — see ``operators/incremental.py``.
        """
        # One manifest-list read per attempt (snapshots() is O(versions)
        # file opens; a long-lived incremental store must not pay it four
        # times per commit).
        snaps = self.snapshots()
        if batch_id is not None:
            for s in snaps:
                if s.batch_id == batch_id:
                    return s.version
        commit_id = uuid.uuid4().hex
        data_dir = os.path.join(self.root, _DATA_DIR, commit_id)
        df.write.mode("errorifexists").parquet(data_dir)
        files = sorted(
            os.path.relpath(p, self.root)
            for p in glob.glob(os.path.join(data_dir, "*.parquet"))
        )
        first_attempt = True
        while True:
            if not first_attempt:
                snaps = self.snapshots()  # fresh view after losing a race
                if batch_id is not None:
                    # A concurrent replayer of the same batch may have won
                    # the claim we just lost — stay idempotent.
                    for s in snaps:
                        if s.batch_id == batch_id:
                            return s.version
            first_attempt = False
            latest = snaps[-1].version if snaps else None
            if expected_base is not _UNSET and latest != expected_base:
                # Someone else advanced the table since the caller read
                # its base snapshot. If it was a replay of THIS batch,
                # stay idempotent; otherwise surface the conflict.
                if batch_id is not None:
                    for s in snaps:
                        if s.batch_id == batch_id:
                            return s.version
                raise CommitConflict(
                    f"{self.root}: expected base {expected_base}, found {latest}"
                )
            version = (latest or 0) + 1
            manifest = {
                "version": version,
                "files": files,
                "batch_id": batch_id,
                "committed_at": datetime.now(timezone.utc).isoformat(),
            }
            tmp = self._manifest_path(version) + f".tmp-{commit_id}"
            with open(tmp, "w", encoding="utf-8") as f:
                json.dump(manifest, f)
            try:
                os.link(tmp, self._manifest_path(version))
                os.unlink(tmp)
                return version
            except FileExistsError:
                # Lost the claim race — loop: the top re-reads the
                # manifest list, returns idempotently if a concurrent
                # replayer committed this batch, conflicts via
                # expected_base, or takes the next version.
                os.unlink(tmp)

    def read(self, spark: SparkSession, version: int | None = None) -> DataFrame:
        """Snapshot read: latest manifest, or time travel to ``version``."""
        snap = self._resolve(version)
        paths = [os.path.join(self.root, f) for f in snap.files]
        return spark.read.parquet(*paths)

    # -- maintenance -------------------------------------------------------
    def vacuum(self) -> list[str]:
        """Delete data files referenced by NO manifest (failed/abandoned
        commits). Never touches files any snapshot can still read."""
        referenced = {f for s in self.snapshots() for f in s.files}
        removed = []
        for commit_dir in glob.glob(os.path.join(self.root, _DATA_DIR, "*")):
            rels = {
                os.path.relpath(p, self.root)
                for p in glob.glob(os.path.join(commit_dir, "*.parquet"))
            }
            if rels and not (rels & referenced):
                shutil.rmtree(commit_dir)
                removed.extend(sorted(rels))
        return removed
