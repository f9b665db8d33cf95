"""Persisted IVF index: inverted lists written bucket-PARTITIONED so a
probe reads only its lists' partitions.

The in-plan ANN queries (plans/similarity.py knn_ivf*) recompute the
coarse assignment every run; a production vector store builds the index
ONCE and serves many query batches against it. This module is that build/
serve split, and it cashes the SCALE.md claim ("at 100 TB the inverted
lists would be written bucket-partitioned so a probe touches only its
partitions") as an actual on-disk layout plus a plan assertion:

* ``build_ivf_index`` — assign every corpus vector to its nearest
  centroid (broadcast codebook, map-only pass) and write
  ``index/assignments/bucket=<id>/*.parquet`` partitioned by the list id,
  with the codebook alongside. One shuffle (the partitioned write's
  clustering); nothing else moves.
* ``serve_knn`` — rank the probe lists per query against the stored
  codebook, then join the query batch to the assignments scan ON THE
  PARTITION COLUMN. Spark's dynamic partition pruning turns the tiny
  probe list into a runtime partition filter — the scan physically skips
  every unprobed list directory, which is the I/O contract that makes IVF
  an *index* rather than a full-scan rerank
  (tests/test_ann_index.py asserts ``dynamicpruning`` in the scan and
  that served results equal the in-plan ``knn_ivf`` serving path).

Layout notes for the 100 TB posture: list directories are the pruning
unit, so k should be sized for list files in the hundreds-of-MB range
(the same row-group arithmetic as SCALE.md's layout lesson); re-training
the codebook is a new index version — pair with sources/versioned.py for
atomic swap, exactly like any other derived table.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def build_ivf_index(vectors: DataFrame, codebook: DataFrame, out_dir: str) -> None:
    """Write the IVF index: ``assignments`` partitioned by inverted-list
    id (= nearest-centroid label) carrying (vec_id, e, nrm), and the
    ``codebook`` (clabel, ce, cnrm) beside it.

    ``vectors`` must carry (vec_id, e, nrm); ``codebook`` (clabel, ce,
    cnrm). Assignment is the same max-cosine/min-label rule as
    plans/similarity._ivf_candidates, expressed as a map-side min_by
    aggregate against the broadcast codebook.
    """
    aff = F.round(_dot(F.col("e"), F.col("ce")) / (F.col("nrm") * F.col("cnrm")), 6)
    assign = (
        vectors.crossJoin(F.broadcast(codebook))
        .withColumn("acos", aff)
        .groupBy("vec_id")
        .agg(
            F.min_by(
                "clabel", F.struct((-F.col("acos")).alias("neg"), F.col("clabel"))
            ).alias("bucket")
        )
        .join(vectors, "vec_id")
        .select("bucket", "vec_id", "e", "nrm")
    )
    assign.write.mode("overwrite").partitionBy("bucket").parquet(
        os.path.join(out_dir, "assignments")
    )
    codebook.write.mode("overwrite").parquet(os.path.join(out_dir, "codebook"))


def serve_knn(
    spark: SparkSession,
    index_dir: str,
    queries: DataFrame,
    nprobe: int = 2,
    topk: int = 5,
) -> DataFrame:
    """Serve a query batch against a built index: probe the ``nprobe``
    nearest lists per query, exact-rerank within them, return
    (query_id, neighbor_id, cosine, rank).

    The assignments scan joins the probe table on the PARTITION column
    ``bucket`` with the probe side broadcast — Spark's dynamic partition
    pruning compiles that into a runtime partition filter, so only the
    probed list directories are read. The query batch rides broadcasts
    end-to-end; the only data-sized work is the scan of the probed lists.
    """
    codebook = F.broadcast(spark.read.parquet(os.path.join(index_dir, "codebook")))
    assignments = spark.read.parquet(os.path.join(index_dir, "assignments"))

    q = queries.select(
        F.col("vec_id").alias("query_id"),
        F.col("e").alias("qe"),
        F.col("nrm").alias("qnrm"),
    )
    aff = F.round(_dot(F.col("qe"), F.col("ce")) / (F.col("qnrm") * F.col("cnrm")), 6)
    w_aff = Window.partitionBy("query_id").orderBy(F.desc("acos"), "clabel")
    probes = (
        q.crossJoin(codebook)
        .withColumn("acos", aff)
        .withColumn("rn", F.row_number().over(w_aff))
        .filter(F.col("rn") <= nprobe)
        .select("query_id", F.col("clabel").alias("bucket"), "qe", "qnrm")
    )
    scored = (
        assignments.join(F.broadcast(probes), "bucket")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(
                _dot(F.col("qe"), F.col("e")) / (F.col("qnrm") * F.col("nrm")), 6
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topk)
        .select("query_id", "neighbor_id", "cosine", "rank")
        .orderBy("query_id", "rank")
    )
