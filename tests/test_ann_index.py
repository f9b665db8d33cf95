"""Persisted IVF index (operators/ann_index.py): build/serve split with
bucket-partitioned inverted lists and dynamic-partition-pruned serving —
the on-disk realization of SCALE.md's "a probe touches only its
partitions" claim."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from monitoring_data_ingestion_spark.operators.ann_index import (
    build_ivf_index,
    serve_knn,
)
from monitoring_data_ingestion_spark.plans import REGISTRY
from monitoring_data_ingestion_spark.plans.similarity import (
    IVF_NPROBE,
    IVF_TOPK,
    N_QUERIES,
    _label_codebook,
    _vectors,
)

from .conftest import SF_SMOKE


def _build(spark, tmp_path):
    v = _vectors(spark, SF_SMOKE)
    index_dir = str(tmp_path / "ivf")
    build_ivf_index(v.select("vec_id", "e", "nrm"), _label_codebook(v), index_dir)
    return v, index_dir


def test_index_layout_is_bucket_partitioned(spark, tmp_path):
    """Inverted lists land as bucket=<id> partition directories — the
    pruning unit — with the codebook stored beside them."""
    _, index_dir = _build(spark, tmp_path)
    parts = sorted(
        d for d in os.listdir(os.path.join(index_dir, "assignments"))
        if d.startswith("bucket=")
    )
    assert len(parts) == 10  # one directory per inverted list
    assert os.path.isdir(os.path.join(index_dir, "codebook"))


def test_serve_scan_is_partition_pruned(spark, tmp_path):
    """The assignments scan must carry a dynamic-partition-pruning
    subquery on the bucket partition column: the probe list becomes a
    runtime partition filter and unprobed list directories are never
    read. This is what makes the persisted IVF an index, not a full
    scan."""
    v, index_dir = _build(spark, tmp_path)
    res = serve_knn(
        spark,
        index_dir,
        v.filter(F.col("vec_id") < N_QUERIES).select("vec_id", "e", "nrm"),
        nprobe=IVF_NPROBE,
        topk=IVF_TOPK,
    )
    res.collect()
    plan = res._jdf.queryExecution().executedPlan().toString()
    scan_lines = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert any("dynamicpruning" in l for l in scan_lines), scan_lines


def test_served_results_equal_in_plan_ivf(spark, tmp_path):
    """Build/serve must return byte-identical rows to the in-plan
    knn_ivf serving path — the index changes what is read, never the
    answer."""
    v, index_dir = _build(spark, tmp_path)
    served = serve_knn(
        spark,
        index_dir,
        v.filter(F.col("vec_id") < N_QUERIES).select("vec_id", "e", "nrm"),
        nprobe=IVF_NPROBE,
        topk=IVF_TOPK,
    ).collect()
    in_plan = REGISTRY["knn_ivf"].fn(spark, SF_SMOKE).collect()
    assert [tuple(r) for r in served] == [tuple(r) for r in in_plan]


def test_rebuild_overwrites_atomically(spark, tmp_path):
    """A second build into the same directory replaces the index (mode
    overwrite) and serving still matches — re-training is a rewrite, not
    an append."""
    v, index_dir = _build(spark, tmp_path)
    build_ivf_index(
        _vectors(spark, SF_SMOKE).select("vec_id", "e", "nrm"),
        _label_codebook(_vectors(spark, SF_SMOKE)),
        index_dir,
    )
    served = serve_knn(
        spark,
        index_dir,
        v.filter(F.col("vec_id") < N_QUERIES).select("vec_id", "e", "nrm"),
    ).collect()
    assert len(served) == N_QUERIES * 5
