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

# The driver's correctness harness witnesses the FIRST 50 entries of
# ``queries()``.  Cumulative driver coverage through round 7 is 247/247
# green (zero failures ever), so the window's job is REGRESSION
# DETECTION under a STANDING ROTATION SCHEDULE:
#
#   1. queries with NO driver witness yet (new this round) — always
#      first;
#   2. queries whose implementation CHANGED this round — re-witness;
#   3. the cohort whose last driver witness is OLDEST, oldest first,
#      filling the window to exactly 50; anything that doesn't fit is
#      the explicit front of NEXT round's queue.
#
# Witness ages entering round 8 (from CORRECTNESS_r01-r07): 17 names
# last witnessed r2 (oldest), 40 r3, 49 r4, 44 r5, 47 r6, 50 r7.
# Round 8 takes the 9 new r8 queries + 6 GRIB queries changed by the
# r8 codec/landing work + all 17 r2 leftovers + the first 18 of the r3
# cohort (alphabetical).  The 22 r3 names left over — the two
# multimodal_* names, pack_sequences, sample_weighted, scd2 +
# split_train_test_hash, the stream_* family, text_langid/quality, and
# the ts_* family — are round 9's queue head, keeping every cohort's
# evidence younger than ~5 rounds.
# Every entry outside the window stays locally oracle-checked each
# session (tests/test_oracle.py), and the flagship pipeline stays
# driver-checked through the ``entry`` smoke.
_PRIORITY: tuple[str, ...] = (
    # --- 1. new in round 8 (first driver witness): GRIB2 complex
    #     packing 5.2/5.3, JPEG2000 packing 5.40, Gaussian grids 3.40,
    #     Lambert grids 3.30, polar-stereographic grids 3.20, Mercator
    #     grids 3.10, the
    #     mixed-edition metadata scan, and the byte-real flagship with
    #     the publish side ---
    "grid_grib2_complex_decode",
    "grid_grib2_gaussian_decode",
    "grid_grib2_jpeg2000_decode",
    "grid_grib2_lambert_decode",
    "grid_grib2_mercator_decode",
    "grid_grib2_polar_decode",
    "grid_grib_mixed_scan",
    "grid_grib_inventory_scan",
    "era5_grib_anomaly_pipeline",
    # --- 2. changed in round 8 (GRIB codecs grew complex packing +
    #     scanning-mode 0x40; the landing source's schema gained
    #     category/number and real edition-2 levels) — re-witness every
    #     query on that surface ---
    "grid_grib1_decode",
    "grid_grib1_anomaly",
    "grid_grib1_inventory",
    "grid_grib2_match_decode",
    "grid_grib1_landing_scan",
    "stream_grib1_anomaly_pipeline",
    # --- 3. oldest cohort: the 17 round-2 leftovers ---
    "q2_min_price_supplier",
    "q4_order_priority",
    "q7_volume_shipping",
    "scalar_conditional_hash",
    "scalar_datetime",
    "scalar_math",
    "scalar_strings",
    "set_except",
    "set_intersect",
    "set_union_all",
    "set_union_distinct",
    "sort_multi_key",
    "topk_orders",
    "window_first_last",
    "window_range_frame",
    "window_rank",
    "window_running_sum",
    # --- 4. next-oldest cohort: round 3, first 18 alphabetical ---
    "agg_approx_quantile",
    "agg_hll_sketch_union",
    "contamination_ngram_overlap",
    "contamination_shingle_join",
    "dedup_cluster_assign",
    "dedup_embedding_cosine",
    "dedup_exact_docs",
    "dedup_fuzzy_levenshtein",
    "dedup_minhash_lsh_capped",
    "dedup_minhash_survivors",
    "doc_chunk_sliding",
    "doc_token_dedup",
    "era5_grid_anomaly_pipeline",
    "grid_polygon_clip",
    "grid_regrid_coarsen",
    "grid_shapefile_clip",
    "knn_ivf_pq",
    "knn_ivf_trained",
    # --- round-9 queue, in order: multimodal_feature_extract +
    #     multimodal_metadata_stats +
    #     pack_sequences + sample_weighted +
    #     scd2_validity_intervals + split_train_test_hash + the 16 other
    #     r3 leftovers (stream_dedup_
    #     union, stream_session_windows, stream_sliding_halfhour,
    #     stream_stateful_user_stats, stream_static_enrich,
    #     stream_stream_interval_join, stream_tumbling_hourly,
    #     text_langid, text_quality_score, ts_anomaly_zscore,
    #     ts_asof_join, ts_funnel, ts_gap_fill_ffill,
    #     ts_interpolate_linear, ts_range_join, ts_tumbling_hourly),
    #     then the r4 cohort (~49 ts/text names). ---
)


def _ordered_names() -> list[str]:
    rest = [n for n in REGISTRY if n not in set(_PRIORITY)]
    return [n for n in _PRIORITY if n in REGISTRY] + rest


def entry(spark: SparkSession) -> DataFrame:
    """Flagship dataflow; driver checks rows>0.

    The flagship is the reference's ENTIRE service loop on the real grid
    fixture — 36-month landing dir → custom streaming source → normals
    broadcast join → anomaly → idempotent partitioned publish — hash-
    checked against a closed-form oracle
    (plans/streaming_q.py::era5_grid_anomaly_pipeline).
    """
    return REGISTRY["era5_grid_anomaly_pipeline"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: REGISTRY[name].fn for name in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL for each oracle-checkable query."""
    return {
        name: REGISTRY[name].oracle
        for name in _ordered_names()
        if REGISTRY[name].oracle is not None
    }
