"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All real content lives in ``monitoring_data_ingestion_spark.plans`` — this
module is a thin adapter over the engine's query catalog.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from monitoring_data_ingestion_spark.plans import REGISTRY


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The flagship is the reference's whole anomaly dataflow generalized
    (monthly aggregate → climatological normal → broadcast join →
    subtract), see plans/timeseries.py::era5_monthly_anomaly.
    """
    return REGISTRY["era5_monthly_anomaly"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL for each oracle-checkable query."""
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}
