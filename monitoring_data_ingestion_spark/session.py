"""SparkSession factory.

Defaults chosen for the engine's scale posture (SURVEY.md §7):
UTC session timezone (the reference works in ISO-8601 UTC throughout,
/root/reference/src/datetime.js:29-31), Arrow-enabled Python interop,
and AQE on so skewed joins/aggregations re-plan at runtime.

Local test mode uses ``local[N]`` with a shuffle-partition count sized to
the core count; on a real cluster these settings come from spark-submit
conf and this factory only applies the semantic settings (timezone, Arrow,
AQE) without overriding cluster sizing.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Settings that define engine *semantics* — always applied.
SEMANTIC_CONF = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Parquet timestamps written by the engine stay instant-semantics.
    "spark.sql.parquet.outputTimestampType": "TIMESTAMP_MICROS",
    # Custom Python data sources (sources/python_datasource.py) declare
    # pushFilters; Spark refuses to plan them unless pushdown is opted in.
    "spark.sql.python.filterPushdown.enabled": "true",
}


def get_spark(
    app_name: str = "monitoring-data-ingestion-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's semantics.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` when not already
    running under a cluster manager; ``shuffle_partitions`` defaults to the
    local core count (a real deployment sizes this to data volume).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = SparkSession.builder.appName(app_name)
    if master is None and "SPARK_MASTER" not in os.environ:
        master = f"local[{cpus}]"
    if master:
        builder = builder.master(master)
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus)
    builder = builder.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    if master and master.startswith("local"):
        # Fixture tables are single small parquet files; the default 128 MB
        # split size would scan them in one task. On a real cluster the
        # default is kept — inputs there are many multi-hundred-MB files.
        builder = builder.config("spark.sql.files.maxPartitionBytes", "8m")
        builder = builder.config("spark.sql.files.openCostInBytes", "1m")
    for k, v in SEMANTIC_CONF.items():
        builder = builder.config(k, v)
    builder = builder.config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
