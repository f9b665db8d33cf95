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
# ``queries()``.  Cumulative driver coverage through round 6 is 228/237
# green (zero failures ever), so the window's job is REGRESSION
# DETECTION under a STANDING ROTATION SCHEDULE:
#
#   1. queries with NO driver witness yet (new this round, or created
#      post-window last round) — always first;
#   2. queries whose implementation CHANGED this round — re-witness;
#   3. the cohort whose last driver witness is OLDEST, oldest first,
#      filling the window to exactly 50; anything that doesn't fit is
#      the explicit front of NEXT round's queue.
#
# Witness ages after round 6: r2 cohort (~48 relational names, oldest),
# then r3 (streaming/grid/ts, ~30), r4 (ts/text, ~25), r5, r6.  Round 7
# takes the 9 never-witnessed r6 stragglers + 10 new r7 queries + 3
# r7-changed + 28 of the r2 cohort; the 20 r2 leftovers named at the
# bottom lead round 8's window ahead of the r3 cohort, keeping every
# cohort's evidence younger than ~4 rounds.  Every entry outside the
# window stays locally oracle-checked each session
# (tests/test_oracle.py), and the flagship pipeline stays
# driver-checked through the ``entry`` smoke.
_PRIORITY: tuple[str, ...] = (
    # --- 1. never driver-witnessed (created post-window in round 6) ---
    "dq_psi_drift",
    "graph_assortativity",
    "graph_customer_similarity",
    "graph_hits_authorities",
    "graph_incremental_edges",
    "grid_hillshade",
    "sample_neyman_allocation",
    "sketch_bloom_membership",
    "sketch_count_min_tokens",
    # --- 1. new in round 7 (first driver witness) ---
    "grid_grib1_decode",
    "grid_grib1_anomaly",
    "grid_grib1_inventory",
    "grid_grib2_match_decode",
    "grid_grib1_landing_scan",
    "stream_psi_drift",
    "stream_grib1_anomaly_pipeline",
    "dq_schema_profile_drift",
    "sketch_quantile_histogram",
    "sketch_hll_distinct",
    # --- 2. changed in round 7: session cache keys now fingerprint the
    #     full fixture path (graph index / IVF index / incremental
    #     store); graph_customer_similarity + graph_hits_authorities are
    #     above already — re-witness the other three cached-index paths ---
    "graph_triangle_census_indexed",
    "knn_ivf_partitioned",
    "agg_incremental_maintenance",
    # --- 3. oldest cohort: round-2 relational core (28 of 48) ---
    "agg_collect_sorted",
    "agg_cube",
    "agg_grouping_sets",
    "agg_minmax_running",
    "agg_percentiles",
    "agg_pivot",
    "agg_rollup",
    "agg_stats",
    "agg_stddev",
    "dedup_exact_keep_first",
    "filter_bbox_pushdown",
    "filter_rlike_limit",
    "first_after_filter",
    "join_broadcast_dims",
    "join_cross",
    "join_full_outer",
    "join_inner",
    "join_left_anti",
    "join_left_outer",
    "join_left_semi",
    "join_positional_lookup",
    "project_null_sentinel",
    "q10_returned_items",
    "q14_promo_revenue",
    "q18_large_volume_customer",
    "q19_disjunctive_revenue",
    "q21_late_suppliers",
    "q22_idle_customers",
    # --- round-8 queue, in order: the 20 r2 leftovers
    #     (q2_min_price_supplier, q3_shipping_priority, q4_order_priority, q6_forecast_revenue,
    #     q7_volume_shipping, q9_profit_by_nation,
    #     scalar_conditional_hash, scalar_datetime,
    #     scalar_math, scalar_strings, set_except, set_intersect, set_union_all,
    #     set_union_distinct, sort_multi_key, topk_orders,
    #     window_first_last, window_range_frame, window_rank,
    #     window_running_sum — q1/q5 were re-witnessed r6 as headline),
    #     then the r3 cohort (streaming/grid/ts families), then r4. ---
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
