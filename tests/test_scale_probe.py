"""The sf1 scale-probe generator (scripts/scale_probe.py) backs the
measured claims in SCALE.md — its layout contract and empirical-stats
generators are pinned here so a regenerated probe dataset stays
comparable across rounds."""

from __future__ import annotations

import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from monitoring_data_ingestion_spark.scripts.scale_probe import (
    PROBE_QUERIES,
    _gen_documents,
    _gen_embeddings,
    _write_single_file,
)
from monitoring_data_ingestion_spark.plans import REGISTRY


def test_write_single_file_is_file_with_bounded_row_groups(spark, tmp_path):
    """Fixture-layout contract: one FILE named <name>.parquet (the
    streaming source's pathGlobFilter matches file names), with row
    groups small enough that scans parallelize (a single default-sized
    row group serializes every scan to one task — the q1 1.2s→14.5s
    finding in SCALE.md)."""
    out = str(tmp_path)
    df = spark.range(2_000_000).select(
        F.col("id"), F.md5(F.col("id").cast("string")).alias("pad")
    )
    _write_single_file(df, out, "t")
    dest = os.path.join(out, "t.parquet")
    assert os.path.isfile(dest)  # a file, not a part-file directory
    pf = pq.ParquetFile(dest)
    assert pf.metadata.num_rows == 2_000_000
    assert pf.num_row_groups >= 4  # ~8 MB groups over a ~100 MB table
    back = spark.read.parquet(dest)
    assert back.count() == 2_000_000


def test_gen_documents_matches_fixture_stats(tmp_path):
    """Documents regenerate from the fixture's empirical vocabulary and
    length distribution — same schema, requested row multiple, tokens
    drawn from the fixture vocabulary only, planted duplicates present."""
    out = str(tmp_path)
    _gen_documents(out, factor=1, seed=7)
    t = pq.read_table(os.path.join(out, "documents.parquet"))
    assert t.column_names == ["doc_id", "text", "lang", "source", "n_chars"]
    fixture = pq.read_table("/root/testdata/sf0.1/documents.parquet")
    assert t.num_rows == fixture.num_rows  # factor=1
    vocab = {w for txt in fixture.column("text").to_pylist() for w in txt.split()}
    gen_texts = t.column("text").to_pylist()
    assert all(w in vocab for w in gen_texts[0].split())
    # n_chars is derived, and duplicates were planted at the empirical rate.
    assert all(len(txt) == n for txt, n in zip(gen_texts[:50], t.column("n_chars").to_pylist()[:50]))
    assert len(set(gen_texts)) < len(gen_texts)


def test_gen_embeddings_matches_fixture_shape(tmp_path):
    out = str(tmp_path)
    _gen_embeddings(out, factor=1, seed=7)
    t = pq.read_table(os.path.join(out, "embeddings.parquet"))
    fixture = pq.read_table("/root/testdata/sf0.1/embeddings.parquet")
    assert t.column_names == ["vec_id", "embedding", "label"]
    assert t.num_rows == fixture.num_rows
    emb = t.column("embedding").to_pylist()
    assert len(emb[0]) == len(fixture.column("embedding").to_pylist()[0])
    labels = set(t.column("label").to_pylist())
    assert labels == set(fixture.column("label").to_pylist())


def test_probe_queries_exist_in_registry():
    missing = [n for n in PROBE_QUERIES if n not in REGISTRY]
    assert not missing
