"""Table readers for the engine's relational fixtures.

The reference's "scan" layer is file-at-a-time GRIB extraction
(/root/reference/src/file-conversions.js:114-156); here every scan is a
``spark.read.parquet`` so Catalyst gets predicate pushdown + column pruning
for free (SURVEY.md §4). At 100 TB the same call reads a partitioned
table layout — nothing in the query layer changes.
"""

from __future__ import annotations

import glob
import os
import stat as stat_mod
from functools import lru_cache

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampNTZType

# The fixture star schema + stream + LLM-pipeline tables (TESTDATA.md).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


@lru_cache(maxsize=256)
def _nanos_ts_cols(path: str) -> tuple[str, ...]:
    """Columns stored as parquet TIMESTAMP(NANOS) (Spark can't scan them
    natively — the engine normalizes at the scan edge, like the reference's
    nodata-sentinel mapping, SURVEY §2.2 P5)."""
    try:
        import pyarrow.parquet as pq
        import pyarrow as pa
    except ImportError:  # pragma: no cover
        return ()
    target = path
    if os.path.isdir(path):
        parts = sorted(glob.glob(os.path.join(path, "*.parquet")))
        if not parts:
            return ()
        target = parts[0]
    try:
        schema = pq.read_schema(target)
    except Exception:  # pragma: no cover
        return ()
    return tuple(
        f.name for f in schema if pa.types.is_timestamp(f.type) and f.type.unit == "ns"
    )


# Lazy scan handles, keyed on (session, path, mtime_ns, size). Building a
# scan DataFrame is NOT free: spark.read.parquet lists the path and reads
# footers for schema inference on every call (measured 75-400 ms per call
# at sf0.1 — 0.3-0.5 s of pure driver latency per multi-table query build,
# guide §5 "the driver should do almost no data work"). The cache holds
# only the unresolved LAZY plan — metadata, never rows — so repeated
# builds of the same query skip the re-listing; execution still computes
# everything from parquet. The mtime/size key invalidates handles for
# fixtures rewritten in place (tests regenerating tmp dirs).
_SCAN_CACHE: dict[tuple, DataFrame] = {}


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one fixture table. Lazy: no data moves until an action.

    Scan-edge normalization: parquet TIMESTAMP(NANOS) columns (which Spark
    rejects) are read as nanos-longs and converted to microsecond
    timestamps (truncating, matching DuckDB/Arrow µs semantics).
    """
    path = f"{sf_dir}/{name}.parquet"
    key = None
    try:
        st = os.stat(path)
        # Cache REGULAR FILES only (ADVICE r16): a directory-layout table's
        # mtime/size does not change when a part file inside is rewritten,
        # so a cached handle would keep a stale frozen file listing.
        # Directory fixtures (tests regenerating tmp dirs) always rebuild.
        if stat_mod.S_ISREG(st.st_mode):
            key = (spark, path, st.st_mtime_ns, st.st_size)
    except OSError:
        pass  # nonexistent yet: let spark.read fail loudly below
    if key is not None:
        cached = _SCAN_CACHE.get(key)
        if cached is not None:
            return cached
    nanos = _nanos_ts_cols(path)
    if nanos:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for c in nanos:
        # Integer division: float division would lose precision at ~1e18 ns.
        df = df.withColumn(c, F.expr(f"timestamp_micros(`{c}` div 1000)"))
    # Parquet micros without isAdjustedToUTC infer as TIMESTAMP_NTZ; the
    # engine's timestamp contract is instant semantics (watermarks, epoch
    # arithmetic). Cast at the scan edge — wall-clock values are preserved
    # (cast interprets and renders in the session timezone).
    for field in df.schema.fields:
        if isinstance(field.dataType, TimestampNTZType):
            df = df.withColumn(field.name, F.col(field.name).cast("timestamp"))
    if key is not None:
        if len(_SCAN_CACHE) > 512:  # bounded; entries are tiny plan handles
            _SCAN_CACHE.clear()
        _SCAN_CACHE[key] = df
    return df


def tables(spark: SparkSession, sf_dir: str, *names: str) -> tuple[DataFrame, ...]:
    return tuple(table(spark, sf_dir, n) for n in names)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for spark.sql use."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
