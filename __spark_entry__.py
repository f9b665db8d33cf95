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
# ``queries()``.  Cumulative driver coverage reached 148/148 in round 4, so
# from round 5 on the window's job is REGRESSION DETECTION: new queries and
# any query whose implementation changed this round go first, then the
# 16 headline (bench) queries, then the queries whose only driver witness
# is the oldest round (round 1) — freshest evidence for the hottest paths,
# oldest evidence refreshed with the remaining slots.  Every entry outside
# the window stays locally oracle-checked each session
# (tests/test_oracle.py), and the flagship pipeline stays driver-checked
# through the ``entry`` smoke.
_PRIORITY: tuple[str, ...] = (
    # --- new this round: PII scrub witnessed end-to-end (VERDICT r4 #1),
    #     and the stop-shingle-capped Jaccard the sf1 probe motivated ---
    "text_pii_scrub",
    "ts_ohlc_resample",
    "ts_ewma",
    "ts_counter_rate",
    "ts_interval_coalesce",
    "ts_anomaly_mad",
    "ts_level_shift",
    "dedup_containment",
    "dedup_containment_capped",
    "grid_zonal_stats",
    "cdc_snapshot_diff",
    "text_html_strip",
    "ts_asof_join_tolerance",
    "ts_gap_detection",
    "ts_trailing_window_range",
    "ts_downsample_lttb",
    "ts_interval_overlap_join",
    "ts_event_sequence_pattern",
    "scd2_apply_changes",
    "agg_share_of_total",
    "window_ntile_stratify",
    "dq_profile_customer",
    "dq_constraint_audit",
    "grid_gradient_slope",
    "geo_near_join",
    "stream_ohlc_hourly",
    "stream_gap_alerts",
    "join_salted_skew",
    "multimodal_audio_energy",
    "text_ngram_lm_score",
    "text_classifier_score",
    "text_bpe_pair_counts",
    "text_url_canonical_dedup",
    "embedding_pca_project",
    "knn_recall_eval",
    "grid_bilinear_regrid",
    "dedup_ngram_jaccard_capped",
    "dedup_semantic_prune",
    "scalar_calendar_clamp",
    "scalar_geo_uniform",
    "scalar_oscar_calendar",
    "sample_temperature_mix",
    # --- changed this round: _widen_if_narrow gate rewritten without the
    #     RDD round-trip (plan shape pinned unchanged, re-witness anyway) ---
    "dedup_ngram_jaccard",
    "dedup_simhash",
    # --- headline queries (the bench set — hottest paths, keep fresh) ---
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "q6_forecast_revenue",
    "q9_profit_by_nation",
    "era5_monthly_anomaly",
    "dedup_minhash_lsh",
    "knn_cosine_bruteforce",
    "knn_ivf",
    "llm_corpus_prep",
    "text_tfidf_top_terms",
    "ts_asof_join",
    "ts_range_join",
    "ts_sessionize",
    "ts_tumbling_hourly",
    # --- oldest driver evidence (round 1 window) refreshed ---
    "join_inner",
    "join_left_outer",
    "join_full_outer",
    "join_left_semi",
    "join_left_anti",
    "join_cross",
    "join_broadcast_dims",
    "join_positional_lookup",
    "agg_stats",
    "agg_stddev",
    "agg_rollup",
    "agg_cube",
    "agg_collect_sorted",
    "agg_minmax_running",
    "agg_grouping_sets",
    "agg_pivot",
    "agg_percentiles",
    "window_rank",
    "window_running_sum",
    "window_range_frame",
    "window_first_last",
    "topk_orders",
    "sort_multi_key",
    "first_after_filter",
    "set_union_all",
    "set_intersect",
    "set_except",
    "set_union_distinct",
    "filter_rlike_limit",
    "filter_bbox_pushdown",
    "project_null_sentinel",
    "scalar_math",
    "scalar_strings",
    "scalar_datetime",
    "scalar_conditional_hash",
    "dedup_exact_keep_first",
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
