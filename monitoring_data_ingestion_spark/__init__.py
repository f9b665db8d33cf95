"""monitoring_data_ingestion_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference ingestion service (wmo-raf/monitoring-data-ingestion): incremental
source ingestion, a DAG of relational/raster operators, stateful watermark
bookkeeping, and metadata/catalog sinks — generalized to arbitrary tabular
data at 100 TB scale, plus LLM-data-pipeline operators (dedup, similarity
search, text analysis, multimodal columns).

Layout:
    session      — SparkSession factory (UTC, Arrow, AQE)
    sources      — readers (parquet/csv/json) + ingestion clients + sinks
    functions    — scalar function surface (temporal/math/string/hash)
    operators    — joins/aggregates/windows/dedup/similarity/text ops
    plans        — the declared query catalog (Spark fn + DuckDB oracle SQL)
    ingest       — incremental driver loop, watermark state, publish sinks
    streaming    — Structured Streaming adapters (file source, watermarks)
    grid         — gridded raster convention layer (long-format DataFrame)
"""

__version__ = "0.1.0"
