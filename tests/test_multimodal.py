"""Multimodal layer: schema, Arrow-batch plumbing, pruning, codec gates."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from monitoring_data_ingestion_spark.multimodal import (
    MEDIA_METADATA_TYPE,
    decode_image,
    extract_features,
    media_table,
    resize_image,
    sample_frames,
)
from monitoring_data_ingestion_spark.multimodal.ops import _HAS_PIL, _md5_feature

from .conftest import SF_SMOKE


def test_media_table_schema(spark):
    m = media_table(spark, SF_SMOKE)
    assert [f.name for f in m.schema.fields] == ["doc_id", "media", "meta"]
    assert m.schema["media"].dataType.typeName() == "binary"
    actual = [(f.name, f.dataType) for f in m.schema["meta"].dataType.fields]
    declared = [(f.name, f.dataType) for f in MEDIA_METADATA_TYPE.fields]
    assert actual == declared


def test_media_payload_roundtrip(spark):
    row = (
        media_table(spark, SF_SMOKE)
        .filter(F.col("doc_id") == 1)
        .select("media", "meta.n_bytes")
        .first()
    )
    assert isinstance(row["media"], (bytes, bytearray))
    assert row["n_bytes"] == len(row["media"])


def test_metadata_query_prunes_payload(spark):
    """A query over payload-independent metadata must not read the payload
    bytes — the text source column feeding `media` is pruned from the
    parquet ReadSchema. (n_bytes derives from the payload in this fixture,
    so only media_type-shaped metadata is payload-independent here; in a
    real media table the whole struct is stored and prunes.)"""
    m = media_table(spark, SF_SMOKE)
    plan = (
        m.groupBy("meta.media_type")
        .agg(F.count(F.lit(1)))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    scan_lines = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert scan_lines and all("text" not in ln for ln in scan_lines)


def test_extract_features_batched(spark):
    """mapInPandas handles multi-batch, multi-partition input and matches
    the per-row reference implementation."""
    m = media_table(spark, SF_SMOKE).filter(F.col("doc_id") < 50).repartition(7)
    out = extract_features(m, dim=2).orderBy("doc_id")
    assert out.columns == ["doc_id", "n_bytes", "f0", "f1"]
    rows = {r["doc_id"]: r for r in out.collect()}
    src = {
        r["doc_id"]: bytes(r["media"])
        for r in media_table(spark, SF_SMOKE).filter(F.col("doc_id") < 50).collect()
    }
    assert set(rows) == set(src)
    for doc_id, payload in src.items():
        assert rows[doc_id]["f0"] == pytest.approx(_md5_feature(payload, 0), abs=0)
        assert rows[doc_id]["n_bytes"] == len(payload)
        assert 0.0 <= rows[doc_id]["f1"] < 1.0


def test_sample_frames_stays_jvm_side(spark):
    m = media_table(spark, SF_SMOKE)
    frames = sample_frames(m, k=4)
    plan = frames._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "ArrowEval" not in plan
    one = frames.filter(F.col("doc_id") == 2).orderBy("slot").collect()
    n = 1 + 2 % 30
    assert [r["frame_idx"] for r in one] == [i * n // 4 for i in range(4)]


def test_codec_gates_raise_without_libs(spark):
    m = media_table(spark, SF_SMOKE)
    with pytest.raises(NotImplementedError):
        resize_image(m, 64, 64)
    if not _HAS_PIL:
        with pytest.raises(NotImplementedError):
            decode_image(m)
