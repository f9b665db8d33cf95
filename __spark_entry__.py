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
# ``queries()``.  Cumulative driver coverage through round 12 is 282/282
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
# Witness ages entering round 13 (from CORRECTNESS_r01-r12): 30 names
# last witnessed r6 (the documented r12 spill), 44 r7, then r8-r12
# cohorts.  Round 13 takes the 2 new queries
# (era5_grib_quarantine_publish — the flagship service loop UNDER
# DAMAGE: the 36-month byte-real landing with one month-file torn
# mid-record drains through the same micro-batch pipeline with
# on_error="quarantine"; every intact record, including the torn
# month's pre-tear record, publishes through the idempotent
# month-partitioned sink while the torn record lands in a
# quarantine-manifest parquet beside the published dataset, both
# written inside ONE exactly-once foreachBatch commit so a replayed
# batch rewrites both; and grid_grib2_satellite_scan — SATELLITE
# products, PDTs 4.31 observational / 4.32 simulated imagery: the
# contributing-spectral-band list decodes into satellite_bands /
# satellite_instruments / central_wavenumbers landing columns, level
# columns stay NULL (no fixed surfaces — the band list stands where
# the level octets would be), forecast_hours NULL on the
# observational 4.31; radar 4.20, deprecated 4.30 and ensemble-
# satellite 4.33/4.34 are documented boundaries with named errors)
# + the 7 queries whose implementation changed in r13:
# grid_grib_quarantine_scan (the record-decode body is now
# loud_truncation-guarded, so a well-framed record with an internally
# short section quarantines as a manifest row instead of failing the
# whole scan task — the r12 ADVICE item — and the 4.20 reject message
# grew its documented-boundary naming) and the six inventory/match-
# surface queries behind the sign-safe scaled-level rendering
# (surface_level_text no longer zero-pads the '-' sign into the
# digits: -5 scale 1 renders -0.5, not "-.5") plus the satellite-
# family template gates added to _grib2_field_header/_field_inventory
# (grid_grib_inventory_scan, grid_grib1_inventory,
# grid_grib_inventory_robust_scan, grid_grib2_match_decode,
# grid_grib2_match_level_decode, grid_grib_match_lead_scan).  The
# self-review pass late in r13 also (a) fixed a quarantine-mode HANG
# on zero-length indicators (iter_grib_messages and both codec-level
# message iterators now reject impossible declared lengths as framing
# errors), added loud stops for >64-bit packing widths, the extended
# BDS layout, quasi-regular GRIB1 grids and out-of-range
# select_record, and gave _unpack_bits a byte-aligned fast path
# (bit-identical to the generic route — property-tested equal on all
# four widths — and 4.5x faster on a full ERA5-size field); a second
# review pass fixed the fixed-surface scaled VALUE to decode
# signed-magnitude like every other GRIB2 scaled field (a -2 PVU
# surface no longer reads as level 2147483650 — no fixture carries a
# sign-bit level, so every oracle hash is unchanged; the inventory/
# match/level queries riding the surface parsers are in the changed
# set below), added the basic-angle and complex-width loud stops, the
# codec-inventory template gate, validated encoder level octets, and
# wgrib2 -limit 0 parity; all validation-only or bit-identical for
# well-formed archives, same class as r12's torn-file contract, swept
# in tests and re-verified hash-identical across the full registry
# driver-sim.  A streaming-runtime review pass (c) scoped the heartbeat
# listener to its query, made stale commit markers after a checkpoint
# reset fail loudly, bounded the memory-sink view lifecycle (each
# drain drops the previous view — behavior-identical result, so the
# stream_* queries keep their recent evidence), defaulted landing
# streams to effectively-unbounded maxFileAge (the 7-day default
# silently skipped late-landed old-mtime files), rejected the
# months_per_trigger+AvailableNow combination that silently truncates
# a backfill, and PERSISTED the normals aggregate at every
# multi-batch pipeline (the stream-static join re-executes the static
# side per micro-batch) — the persist is a real plan change, so
# era5_grid_anomaly_pipeline joins the changed set (its streaming
# siblings already being there) and the r7 fill shrinks to one name.
# Finally (b): the review made grib1_cells drop quarantine-manifest rows
# before the explode (they fabricated one phantom all-NULL cell per
# corrupt record) while the landing grew satellite_series/
# satellite_numbers columns — the cells-path change IS a plan change
# for its callers, so the NINE existing grib1_cells queries join the
# changed set: grid_grib1_landing_scan, grid_grib_statistical_scan,
# grid_grib_projected_landing, grid_grib1_gaussian_scan,
# grid_grib1_rotated_scan, grid_grib_spectral_landing,
# stream_grib1_anomaly_pipeline, era5_grib_anomaly_pipeline,
# stream_grib_spectral_pipeline.  The remaining landing-path queries
# sit downstream only of the additive RECORD_SCHEMA growth and the
# _decode_field dispatch restructure (behavior for templates 0-15
# unchanged, evidence at most one round old, full local driver-sim
# green at HEAD) — the 6-7-round-old queue evidence outranks them,
# the same judgment the r12 window documented for the cluster-column
# growth.  Per the standing rule the queue fills the rest: the ENTIRE
# 30-name r6 spill (grid_area_weighted_mean ... variant_json_shred,
# verbatim from the r12 queue comment) and the first (alphabetical)
# name of the 44-name r7 cohort, agg_collect_sorted.
# 2 + 17 + 30 + 1 = exactly 50.  The
# remaining 43 r7 names (agg_cube, agg_grouping_sets,
# agg_incremental_maintenance, agg_minmax_running, agg_percentiles,
# agg_pivot, agg_rollup, agg_stats, agg_stddev,
# dedup_exact_keep_first, dq_psi_drift, dq_schema_profile_drift,
# filter_bbox_pushdown, filter_rlike_limit, first_after_filter,
# graph_assortativity, graph_customer_similarity,
# graph_hits_authorities, graph_incremental_edges,
# graph_triangle_census_indexed, grid_hillshade, join_broadcast_dims,
# join_cross, join_full_outer, join_inner, join_left_anti,
# join_left_outer, join_left_semi, join_positional_lookup,
# knn_ivf_partitioned, project_null_sentinel, q10_returned_items,
# q14_promo_revenue, q18_large_volume_customer,
# q19_disjunctive_revenue, q21_late_suppliers, q22_idle_customers,
# sample_neyman_allocation, sketch_bloom_membership,
# sketch_count_min_tokens, sketch_hll_distinct,
# sketch_quantile_histogram, stream_psi_drift) spill to the FRONT of
# round 14's queue, followed by the r8 cohort.  Every entry outside
# the window stays locally oracle-checked each session
# (tests/test_oracle.py), and the flagship pipeline stays
# driver-checked through the ``entry`` smoke.
_PRIORITY: tuple[str, ...] = (
    # --- 1. new in round 13 (first driver witness): the quarantine-
    #     manifest-through-publish flagship sibling and the satellite
    #     product family (PDTs 4.31/4.32) ---
    "era5_grib_quarantine_publish",
    "grid_grib2_satellite_scan",
    # --- 2. changed in round 13: the quarantine scan-path truncation
    #     guard, the sign-safe scaled-level inventory rendering, the
    #     satellite template gates on both inventory surfaces, and the
    #     grib1_cells manifest-row filter (all nine existing callers) ---
    "grid_grib_quarantine_scan",
    "grid_grib_inventory_scan",
    "grid_grib1_inventory",
    "grid_grib_inventory_robust_scan",
    "grid_grib2_match_decode",
    "grid_grib2_match_level_decode",
    "grid_grib_match_lead_scan",
    "grid_grib1_landing_scan",
    "grid_grib_statistical_scan",
    "grid_grib_projected_landing",
    "grid_grib1_gaussian_scan",
    "grid_grib1_rotated_scan",
    "grid_grib_spectral_landing",
    "stream_grib1_anomaly_pipeline",
    "era5_grib_anomaly_pipeline",
    "stream_grib_spectral_pipeline",
    "era5_grid_anomaly_pipeline",
    # --- 3. oldest cohort: the entire 30-name r6 spill (documented in
    #     the r12 queue comment), then the first 2 of the 44-name r7
    #     cohort ---
    "grid_area_weighted_mean",
    "grid_contour_cells",
    "hierarchy_recursive_paths",
    "hierarchy_recursive_rollup",
    "knn_cosine_bruteforce",
    "knn_ivf",
    "knn_mutual_graph",
    "llm_corpus_prep",
    "multimodal_image_phash_neardup",
    "multimodal_video_scene_cut",
    "q1_pricing_summary",
    "q5_region_revenue",
    "sample_class_balanced",
    "sample_dsir_importance",
    "stream_gap_alerts",
    "stream_topk_event_types",
    "text_jsd_domain_drift",
    "text_length_histogram",
    "text_ngram_novelty",
    "text_perplexity_buckets",
    "text_quality_filter_funnel",
    "text_span_dedup",
    "text_tfidf_top_terms",
    "text_winnowing_fingerprint",
    "ts_attribution_last_touch",
    "ts_autocorrelation",
    "ts_cusum_changepoint",
    "ts_seasonal_decompose",
    "ts_sessionize",
    "variant_json_shred",
    "agg_collect_sorted",
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
