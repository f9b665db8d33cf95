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


def test_non_ppm_payload_without_pil_fails_loudly(spark):
    """Text payloads are not PPM; without PIL the decode must raise a
    clear per-payload error at execution, not return garbage."""
    if _HAS_PIL:
        pytest.skip("PIL present: compressed-format fallback takes over")
    m = media_table(spark, SF_SMOKE)
    with pytest.raises(Exception, match="not binary PPM"):
        decode_image(m).collect()
    with pytest.raises(Exception, match="not binary PPM"):
        resize_image(m, 64, 64).collect()


def test_ppm_roundtrip_pure_python():
    """encode → decode → gray → resize → re-encode, no codec libraries."""
    from monitoring_data_ingestion_spark.multimodal import ppm

    rgb = bytes(
        [
            255, 0, 0,    0, 255, 0,
            0, 0, 255,    10, 20, 30,
        ]
    )
    payload = ppm.encode_ppm(2, 2, rgb)
    assert payload.startswith(b"P6\n2 2\n255\n")
    w, h, back = ppm.decode_ppm(payload)
    assert (w, h, back) == (2, 2, rgb)
    # ITU-R 601-2 integer luma
    assert ppm.gray_pixels(rgb, 2, 2) == [
        (255 * 299) // 1000,
        (255 * 587) // 1000,
        (255 * 114) // 1000,
        (10 * 299 + 20 * 587 + 30 * 114) // 1000,
    ]
    # comments + arbitrary whitespace in the header grammar
    commented = b"P6 # a comment\n# another\n 2\t2 # dims\n255\n" + rgb
    assert ppm.decode_ppm(commented) == (2, 2, rgb)
    # nearest-neighbor: upscale 2x2 -> 4x4 replicates each pixel 2x2
    up = ppm.resize_nearest(rgb, 2, 2, 4, 4)
    a = [up[(y * 4 + x) * 3 : (y * 4 + x) * 3 + 3] for y in range(4) for x in range(4)]
    assert a[0] == a[1] == a[4] == a[5] == rgb[0:3]
    assert a[2] == a[3] == a[6] == a[7] == rgb[3:6]
    # downscale back picks the top-left anchor of each 2x2 block
    down = ppm.resize_nearest(up, 4, 4, 2, 2)
    assert down == rgb
    with pytest.raises(ValueError, match="not a P6"):
        ppm.decode_ppm(b"P3\n1 1\n255\n000")
    with pytest.raises(ValueError, match="truncated"):
        ppm.decode_ppm(b"P6\n2 2\n255\n\x00\x00")
    with pytest.raises(ValueError, match="maxval"):
        ppm.decode_ppm(b"P6\n1 1\n65535\n" + bytes(6))


def test_resize_decode_distributed_roundtrip(spark):
    """The real operators over a multi-partition synthetic PPM table:
    resize_image updates payload+meta consistently, decode_image returns
    the gradient's closed-form grayscale."""
    import pandas as pd

    from monitoring_data_ingestion_spark.multimodal.ops import _META_SCHEMA_DDL
    from monitoring_data_ingestion_spark.multimodal.ppm import synthetic_ppm

    m = media_table(spark, SF_SMOKE).filter(
        (F.col("meta.media_type") == "image") & (F.col("doc_id") < 30)
    )

    def synth(batches):
        for pdf in batches:
            rows = []
            for doc_id, meta in zip(pdf["doc_id"], pdf["meta"]):
                payload = synthetic_ppm(int(doc_id), meta["width"], meta["height"])
                nm = dict(meta)
                nm["n_bytes"] = len(payload)
                rows.append({"doc_id": doc_id, "media": payload, "meta": nm})
            yield pd.DataFrame(rows)

    src = m.select("doc_id", "meta").repartition(3).mapInPandas(
        synth, schema=f"doc_id bigint, media binary, {_META_SCHEMA_DDL}"
    )
    resized = resize_image(src, 16, 8)
    meta_rows = {r["doc_id"]: r for r in resized.select("doc_id", "meta").collect()}
    assert meta_rows and all(
        (r["meta"]["width"], r["meta"]["height"]) == (16, 8)
        for r in meta_rows.values()
    )
    decoded = {r["doc_id"]: r for r in decode_image(resized).collect()}
    for doc_id, r in decoded.items():
        assert (r["width"], r["height"]) == (16, 8)
        src_meta = {
            row["doc_id"]: row["meta"]
            for row in m.select("doc_id", "meta").collect()
        }[doc_id]
        w, h = src_meta["width"], src_meta["height"]
        expect = [
            (doc_id + (x * w) // 16 + (y * h) // 8) % 256
            for y in range(8)
            for x in range(16)
        ]
        assert r["pixels"] == expect
