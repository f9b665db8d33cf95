#!/usr/bin/env python3
"""Headline-query benchmark.

Runs the catalog's headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec", "queries": {...},
"sf": ...}.

Each query is fully materialized through the noop sink (all compute, no
output I/O) — the same measurement the driver records as BENCH_r{N}.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


N_ITER = 5  # per-query iterations; reported min + cold first iter

# Host-contention guard (r13 lesson: a contended run recorded 17.9 s —
# +57% — while a clean re-run at the same HEAD gave 13.0 s; the control
# query's own timing was the tell).  The frozen control's POST-SECTION
# best-of-3 (control_last) has sat in 0.33–0.43 s across rounds 5–13 on
# this box; a sample outside the band means the HOST was loaded, not
# that the code regressed, so the headline section re-runs ONCE and the
# per-query min is taken across both passes.  Only control_last gates:
# the PRE-SECTION sample runs ~0.54-0.72 s even on an idle box (first
# sf0.1 scans populate the page cache; early-session JIT churn), so
# gating on it fires a spurious ~12 s retry every run.  Override via
# SPARK_GRAFT_CTRL_BAND_SEC for other hardware/SFs.
CTRL_BAND_SEC = float(os.environ.get("SPARK_GRAFT_CTRL_BAND_SEC", "0.48"))


def _control_plan(spark, sf_dir: str):
    """FROZEN control query — defined inline here, never part of the
    catalog, so its plan is byte-identical across rounds. Timed before and
    after the headline section; the last/first ratio separates host-load
    swing from code regressions (this box has shown ~75% run-to-run drift
    on identical plans). Shape: pushed-filter scan -> partial+final
    hash aggregate — touches scan, codegen, and one exchange."""
    from pyspark.sql import functions as F

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.filter(F.col("l_quantity") < 30)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(30,2)")).alias("s"),
            F.count(F.lit(1)).alias("n"),
        )
    )


def _time_control(spark, sf_dir: str, n: int = 3) -> float:
    """Best-of-n wall time of the frozen control through the noop sink."""
    best = None
    for _ in range(n):
        t0 = time.perf_counter()
        _control_plan(spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 3)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from monitoring_data_ingestion_spark.session import get_spark
    from monitoring_data_ingestion_spark.plans import REGISTRY

    spark = get_spark(
        app_name="mdi-spark-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")

    headline = {n: s for n, s in sorted(REGISTRY.items()) if s.headline}

    # Warm the JVM/codegen once on the smallest fixture so per-query times
    # measure the plan, not first-run JIT. (Measured: warming EVERY plan
    # first is counterproductive — JIT profile pollution + GC pressure made
    # the timed section ~2.4× slower than a single warm-up query.)
    warm = next(iter(headline.values()))
    warm.fn(spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()

    from monitoring_data_ingestion_spark.plans.catalog import release_caches

    def run_headline_pass() -> tuple[dict[str, float], dict[str, float]]:
        times: dict[str, float] = {}
        cold: dict[str, float] = {}
        for name, spec in headline.items():
            # Best of N_ITER: single-shot timings on this box vary up to
            # 2× from GC and JIT noise; the min measures the plan, not
            # the weather. Iterations of one query share Spark's cache
            # entry for any persisted intermediate (CacheManager keys on
            # the logical plan), so for a query that persists internally
            # the min is the warm steady state; the first iteration is
            # the cold single-run number and is reported separately
            # under "cold". Caches release between queries so no query
            # benches (or holds memory) against another's.
            best = first = None
            for _ in range(N_ITER):
                t0 = time.perf_counter()
                spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                first = dt if first is None else first
                best = dt if best is None else min(best, dt)
            times[name] = round(best, 3)
            cold[name] = round(first, 3)
            release_caches()
        return times, cold

    control_first = _time_control(spark, sf_dir)
    times, cold = run_headline_pass()
    control_last = _time_control(spark, sf_dir)

    # Contention guard: either control sample outside the historical
    # band means the host was loaded sometime during this run — re-run
    # the headline section once and keep the per-query min, so the
    # recorded artifact measures the code, not a noisy neighbour.
    contended = control_last > CTRL_BAND_SEC
    retry_controls = None
    if contended:
        c0 = _time_control(spark, sf_dir)
        retry_times, retry_cold = run_headline_pass()
        c1 = _time_control(spark, sf_dir)
        retry_controls = (c0, c1)
        times = {
            n: min(times[n], retry_times.get(n, times[n])) for n in times
        }
        # the first pass's cold numbers are the contaminated samples the
        # guard exists to exclude — min-merge them too
        cold = {n: min(cold[n], retry_cold.get(n, cold[n])) for n in cold}

    total = round(sum(times.values()), 3)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": total,
                "unit": "sec",
                "n": N_ITER,
                "queries": times,
                "cold_first_iter": cold,
                # Frozen-plan host-load control: the same inline query timed
                # best-of-3 before and after the headline section. Compare
                # control_sec across rounds to normalize for host swing;
                # drift_ratio >> 1 means the host slowed DURING this run.
                # A sample outside band_sec triggered ONE full re-run of
                # the headline section (per-query min across both passes);
                # retry_first/last_sec are that pass's own control samples.
                "control": {
                    "query": "inline_lineitem_filter_agg",
                    "first_sec": control_first,
                    "last_sec": control_last,
                    "drift_ratio": round(control_last / max(control_first, 1e-9), 3),
                    "band_sec": CTRL_BAND_SEC,
                    "contention_retry": contended,
                    **(
                        {
                            "retry_first_sec": retry_controls[0],
                            "retry_last_sec": retry_controls[1],
                        }
                        if retry_controls
                        else {}
                    ),
                },
                "sf": float(sf) if sf.replace(".", "", 1).isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
