"""Multimodal catalog queries: binary payload columns + typed metadata.

Three contract points of the media layer (multimodal/), each oracle-checked:
metadata-only queries never touch payload bytes (column pruning), the
Arrow-batched Python feature path (mapInPandas) is deterministic, and frame
sampling stays JVM-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window
from pyspark.sql import functions as F

from ..multimodal.model import media_table
from ..multimodal.ops import FEATURE_DIM, extract_features, sample_frames
from .catalog import query

# media_type derivation in SQL — mirror of multimodal/model.py.
_MEDIA_TYPE_SQL = (
    "CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END"
)


@query(
    "multimodal_metadata_stats",
    tags=("multimodal", "agg"),
    oracle=f"""
WITH m AS (
  SELECT doc_id, {_MEDIA_TYPE_SQL} AS media_type,
         CAST(strlen(text) AS BIGINT) AS n_bytes
  FROM documents
)
SELECT media_type, COUNT(*) AS n_items, CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
       CAST(MAX(n_bytes) AS BIGINT) AS max_bytes
FROM m GROUP BY media_type ORDER BY media_type
""",
)
def multimodal_metadata_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only media query: per-modality counts and byte totals read
    the metadata struct, never the payload — at 100 TB the binary column is
    pruned out of the scan entirely (tests assert `media` is absent from
    ReadSchema)."""
    m = media_table(spark, sf_dir)
    return (
        m.groupBy(F.col("meta.media_type").alias("media_type"))
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum("meta.n_bytes").alias("total_bytes"),
            F.max("meta.n_bytes").alias("max_bytes"),
        )
        .orderBy("media_type")
    )


@query(
    "multimodal_feature_extract",
    tags=("multimodal", "python"),
    oracle=f"""
SELECT doc_id, CAST(strlen(text) AS BIGINT) AS n_bytes,
       {", ".join(
           f"CAST(('0x' || substr(md5(text || '_{j}'), 1, 8)) AS BIGINT) / 4294967296.0 AS f{j}"
           for j in range(FEATURE_DIM)
       )}
FROM documents WHERE doc_id < 200
ORDER BY doc_id
""",
)
def multimodal_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction over payload bytes through the Arrow/Python
    boundary (mapInPandas): deterministic MD5-projection features standing
    in for a model embedding — the codec-free end-to-end proof of the
    multimodal batch plumbing (schema, batching, no shuffle)."""
    m = media_table(spark, sf_dir).filter(F.col("doc_id") < 200)
    return extract_features(m, dim=FEATURE_DIM).orderBy("doc_id")


@query(
    "multimodal_frame_sample",
    tags=("multimodal", "array"),
    oracle="""
SELECT doc_id,
       CAST(1 + doc_id % 30 AS BIGINT) AS n_frames,
       CAST(i AS BIGINT) AS slot,
       CAST(FLOOR(i * (1 + doc_id % 30) / 4.0) AS BIGINT) AS frame_idx,
       CAST(FLOOR(i * (1 + doc_id % 30) / 4.0) AS BIGINT) * 1000.0 / 25.0 AS frame_ts_ms
FROM documents, UNNEST(generate_series(0, 3)) AS t(i)
WHERE doc_id % 3 = 2
ORDER BY doc_id, slot
""",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Even frame sampling for video rows (k=4 slots → frame indices at
    25 fps timestamps): sequence/transform/posexplode, entirely JVM-side —
    selection arithmetic must not pay the Python boundary; only the decode
    of the selected frames would (stubbed, multimodal/ops.py)."""
    m = media_table(spark, sf_dir)
    return sample_frames(m, k=4).orderBy("doc_id", "slot")


@query(
    "multimodal_binary_dedup",
    tags=("multimodal", "dedup"),
    oracle=f"""
WITH m AS (
  SELECT doc_id, {_MEDIA_TYPE_SQL} AS media_type, md5(text) AS fingerprint
  FROM documents
)
SELECT media_type, fingerprint,
       CAST(MIN(doc_id) AS BIGINT) AS survivor_id,
       CAST(COUNT(*) AS BIGINT) AS n_copies
FROM m GROUP BY media_type, fingerprint
ORDER BY media_type, fingerprint
""",
)
def multimodal_binary_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup of binary payloads BEFORE any decode: content hash per
    (modality, payload), survivor = lowest doc_id — the cheap first gate
    of a multimodal ingest (hashing is the only full-payload read; every
    duplicate skips decode/feature-extract entirely).

    Scale: the hash computes map-side in the scan projection; the only
    shuffle carries (modality, hash, id) triples — never payload bytes.
    """
    m = media_table(spark, sf_dir)
    return (
        m.select(
            "doc_id",
            F.col("meta.media_type").alias("media_type"),
            F.md5("media").alias("fingerprint"),
        )
        .groupBy("media_type", "fingerprint")
        .agg(
            F.min("doc_id").alias("survivor_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .orderBy("media_type", "fingerprint")
    )


@query(
    "multimodal_image_decode_stats",
    tags=("multimodal", "python", "codec"),
    oracle="""
WITH imgs AS (
  SELECT doc_id,
         64 + (doc_id % 8) * 16 AS w,
         48 + (doc_id % 5) * 16 AS h
  FROM documents WHERE doc_id % 3 = 0 AND doc_id < 300
),
px AS (
  SELECT i.doc_id,
         (i.doc_id + (x.x * i.w) // 32 + (y.y * i.h) // 24) % 256 AS v
  FROM imgs i,
       UNNEST(generate_series(0, 31)) AS x(x),
       UNNEST(generate_series(0, 23)) AS y(y)
)
SELECT doc_id, CAST(32 AS INTEGER) AS width, CAST(24 AS INTEGER) AS height,
       CAST(SUM(v) AS DOUBLE) / 768.0 AS mean_gray
FROM px GROUP BY doc_id ORDER BY doc_id
""",
)
def multimodal_image_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The image codec path end-to-end: synthesize a deterministic PPM per
    image row (gradient pixel (doc_id+x+y)%256), run the REAL resize_image
    (nearest-neighbor 32×24, re-encoded PPM) and decode_image (pure-Python
    P6 → grayscale) operators through their Arrow/mapInPandas plumbing,
    then aggregate mean luma JVM-side.

    The oracle never sees a byte of PPM: it recomputes the same statistic
    closed-form from the gradient + the documented resize mapping
    (src = floor(dst·w/32)) — so the hash gate proves encode → resize →
    re-encode → decode → gray is exactly the declared arithmetic.

    Scale: payloads stream through Arrow record batches executor-side;
    the only shuffle is the final orderBy. Python touches bytes, never
    the aggregate (F.aggregate over the pixel array is JVM-side).
    """
    from ..multimodal.model import media_table
    from ..multimodal.ops import decode_image, resize_image
    from ..multimodal.ppm import synthetic_ppm

    import pandas as pd
    from typing import Iterator

    imgs = media_table(spark, sf_dir).filter(
        (F.col("meta.media_type") == "image") & (F.col("doc_id") < 300)
    )

    def synth(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            rows = []
            for doc_id, meta in zip(pdf["doc_id"], pdf["meta"]):
                payload = synthetic_ppm(int(doc_id), meta["width"], meta["height"])
                new_meta = dict(meta)
                new_meta["n_bytes"] = len(payload)
                rows.append({"doc_id": doc_id, "media": payload, "meta": new_meta})
            yield pd.DataFrame(rows)

    from ..multimodal.ops import _META_SCHEMA_DDL

    ppm_imgs = imgs.select("doc_id", "meta").mapInPandas(
        synth, schema=f"doc_id bigint, media binary, {_META_SCHEMA_DDL}"
    )
    decoded = decode_image(resize_image(ppm_imgs, 32, 24))
    mean = F.aggregate(
        "pixels", F.lit(0).cast("bigint"), lambda acc, x: acc + x
    ).cast("double") / F.size("pixels")
    return decoded.select(
        "doc_id", "width", "height", mean.alias("mean_gray")
    ).orderBy("doc_id")


# Deterministic synthetic PCM: sample k of doc d is
# ((d*31 + k*k) % 4096) - 2048 — integer arithmetic both engines can
# restate closed-form, spanning the int16 range's middle.
_PCM_SAMPLE_SQL = "((doc_id * 31 + (frame * 512 + j.j) * (frame * 512 + j.j)) % 4096 - 2048)"


@query(
    "multimodal_audio_energy",
    tags=("multimodal", "python", "codec", "audio"),
    oracle=f"""
WITH auds AS (
  SELECT doc_id, 2048 + (doc_id % 4) * 512 AS n
  FROM documents WHERE doc_id % 3 = 1 AND doc_id < 400
), fr AS (
  SELECT doc_id, f.f AS frame
  FROM auds, LATERAL (SELECT unnest(generate_series(0, n // 512 - 1)) AS f) f
), s AS (
  SELECT doc_id, frame,
         SUM(CAST({_PCM_SAMPLE_SQL} AS BIGINT) * {_PCM_SAMPLE_SQL}) AS sumsq
  FROM fr, LATERAL (SELECT unnest(generate_series(0, 511)) AS j) j
  GROUP BY doc_id, frame
)
SELECT doc_id, CAST(frame AS INTEGER) AS frame,
       ROUND(sqrt(CAST(sumsq AS DOUBLE) / 512.0), 6) AS rms
FROM s ORDER BY doc_id, frame
""",
)
def multimodal_audio_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The audio codec path end-to-end: synthesize deterministic 16-bit
    PCM per audio row (sample k = (doc_id·31 + k²) % 4096 − 2048), run
    the REAL decode_pcm16 operator through its Arrow/mapInPandas plumbing
    (numpy frombuffer on the actual little-endian bytes), then frame into
    512-sample windows and compute per-frame RMS energy JVM-side — the
    loudness/VAD primitive of every audio-filtering pipeline.

    The oracle never sees a byte of PCM: it restates the sample formula
    closed-form, so the hash gate proves bytes → int16 decode → framing →
    energy is exactly the declared arithmetic. Scale: payload bytes stay
    executor-side in Arrow batches; framing is an in-row slice/aggregate
    (sum of int64 squares — exact); the only shuffle is the presentation
    sort.
    """
    from typing import Iterator

    import numpy as np
    import pandas as pd

    from ..multimodal.model import media_table
    from ..multimodal.ops import decode_pcm16

    auds = media_table(spark, sf_dir).filter(
        (F.col("meta.media_type") == "audio") & (F.col("doc_id") < 400)
    )

    def synth(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                n = 2048 + (d % 4) * 512
                k = np.arange(n, dtype=np.int64)
                s = ((d * 31 + k * k) % 4096 - 2048).astype("<i2")
                rows.append({"doc_id": d, "media": s.tobytes()})
            yield pd.DataFrame(rows)

    pcm = auds.select("doc_id").mapInPandas(synth, schema="doc_id bigint, media binary")
    decoded = decode_pcm16(pcm)
    nf = (F.size("samples") / 512).cast("int")
    fr = decoded.select(
        "doc_id", "samples", F.explode(F.sequence(F.lit(0), nf - 1)).alias("frame")
    )
    sumsq = F.aggregate(
        F.slice("samples", F.col("frame") * 512 + 1, 512),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x.cast("bigint") * x.cast("bigint"),
    )
    return fr.select(
        "doc_id",
        "frame",
        F.round(F.sqrt(sumsq.cast("double") / F.lit(512.0)), 6).alias("rms"),
    ).orderBy("doc_id", "frame")


PHASH_MAX_HAMMING = 3  # ≤3 over 4 16-bit blocks → pigeonhole: one block exact


@query(
    "multimodal_image_phash_neardup",
    tags=("multimodal", "python", "codec", "dedup"),
    oracle="""
WITH imgs AS (
  SELECT doc_id,
         64 + (doc_id % 8) * 16 AS w,
         48 + (doc_id % 5) * 16 AS h
  FROM documents WHERE doc_id % 3 = 0 AND doc_id < 300
), px AS (
  SELECT i.doc_id,
         y.y * 8 + x.x AS i,
         (i.doc_id + (x.x * i.w) // 8 + (y.y * i.h) // 8) % 256 AS v
  FROM imgs i,
       UNNEST(generate_series(0, 7)) AS x(x),
       UNNEST(generate_series(0, 7)) AS y(y)
), tot AS (
  SELECT doc_id, SUM(v) AS total FROM px GROUP BY doc_id
), blocks AS (
  SELECT p.doc_id, p.i // 16 AS bp,
         CAST(SUM(CASE WHEN 64 * p.v > t.total
                       THEN 1 << (p.i % 16) ELSE 0 END) AS BIGINT) AS bv
  FROM px p JOIN tot t ON p.doc_id = t.doc_id
  GROUP BY 1, 2
), cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM blocks a JOIN blocks b ON a.bp = b.bp AND a.bv = b.bv
                             AND a.doc_id < b.doc_id
), ham AS (
  SELECT c.doc_a, c.doc_b,
         CAST(SUM(bit_count(xor(ba.bv, bb.bv))) AS INTEGER) AS hamming
  FROM cand c
  JOIN blocks ba ON ba.doc_id = c.doc_a
  JOIN blocks bb ON bb.doc_id = c.doc_b AND bb.bp = ba.bp
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, hamming FROM ham
WHERE hamming <= 3
ORDER BY doc_a, doc_b
""",
)
def multimodal_image_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-duplicate detection by perceptual average-hash: decode →
    8×8 thumbnail → 64-bit aHash (bit = pixel above image mean) → banded
    self-join on 16-bit hash blocks → exact Hamming rerank at ≤ 3 bits.
    The visual analogue of dedup_simhash (same pigeonhole banding: ≤3
    differing bits over 4 blocks forces one block equal, so candidate
    recall is exact, not probabilistic) — the image-corpus dedup step a
    multimodal training pipeline runs where text dedup runs MinHash.

    The decode/resize path is the REAL Arrow/mapInPandas codec pipeline
    (synthetic deterministic PPMs, as multimodal_image_decode_stats); the
    hash itself is pure JVM expression over the pixel array — integer
    threshold 64·v > Σv avoids the mean division entirely, so the oracle
    restates the whole dataflow closed-form from the gradient formula
    without touching a byte of PPM.

    Scale: hashing is map-side (payload bytes never shuffle — only the
    4×16-bit blocks do); candidates come from an equi-join on (block_idx,
    block_value), never all-pairs; the rerank joins the tiny hash table,
    not pixels. Work is O(images + candidate pairs), the dedup-family
    budget.
    """
    from typing import Iterator

    import pandas as pd

    from ..multimodal.model import media_table
    from ..multimodal.ops import _META_SCHEMA_DDL, decode_image, resize_image
    from ..multimodal.ppm import synthetic_ppm

    imgs = media_table(spark, sf_dir).filter(
        (F.col("meta.media_type") == "image") & (F.col("doc_id") < 300)
    )

    def synth(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            rows = []
            for doc_id, meta in zip(pdf["doc_id"], pdf["meta"]):
                payload = synthetic_ppm(int(doc_id), meta["width"], meta["height"])
                new_meta = dict(meta)
                new_meta["n_bytes"] = len(payload)
                rows.append({"doc_id": doc_id, "media": payload, "meta": new_meta})
            yield pd.DataFrame(rows)

    ppm_imgs = imgs.select("doc_id", "meta").mapInPandas(
        synth, schema=f"doc_id bigint, media binary, {_META_SCHEMA_DDL}"
    )
    decoded = decode_image(resize_image(ppm_imgs, 8, 8))

    total = F.aggregate(
        "pixels", F.lit(0).cast("bigint"), lambda acc, x: acc + x
    )
    def _block_bits(k: int):
        def merge(acc, j):
            return acc + F.when(
                F.lit(64) * F.element_at("pixels", F.lit(16 * k) + j + 1)
                > F.col("total"),
                F.pow(F.lit(2.0), j.cast("double")).cast("bigint"),
            ).otherwise(F.lit(0).cast("bigint"))

        return F.aggregate(
            F.sequence(F.lit(0), F.lit(15)), F.lit(0).cast("bigint"), merge
        )

    block_exprs = [_block_bits(k).alias(f"b{k}") for k in range(4)]
    hashes = decoded.withColumn("total", total).select("doc_id", *block_exprs)

    exploded = hashes.select(
        "doc_id",
        F.posexplode(F.array("b0", "b1", "b2", "b3")).alias("bp", "bv"),
    )
    cand = (
        exploded.alias("a")
        .join(
            exploded.alias("b"),
            (F.col("a.bp") == F.col("b.bp"))
            & (F.col("a.bv") == F.col("b.bv"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    ha = hashes.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"b{k}").alias(f"a{k}") for k in range(4)],
    )
    hb = hashes.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"b{k}").alias(f"bb{k}") for k in range(4)],
    )
    hamming = sum(
        F.bit_count(F.col(f"a{k}").bitwiseXOR(F.col(f"bb{k}"))) for k in range(4)
    ).cast("int")
    return (
        cand.join(ha, "doc_a")
        .join(hb, "doc_b")
        .select("doc_a", "doc_b", hamming.alias("hamming"))
        .filter(F.col("hamming") <= PHASH_MAX_HAMMING)
        .orderBy("doc_a", "doc_b")
    )


SCENE_CUT_DELTA = 64  # |Δ mean-luma| between adjacent frames ⇒ shot boundary


@query(
    "multimodal_video_scene_cut",
    tags=("multimodal", "python", "video", "window"),
    oracle="""
WITH vids AS (
  SELECT doc_id, 1 + doc_id % 30 AS n_frames
  FROM documents WHERE doc_id % 3 = 2
), frames AS (
  SELECT doc_id, n_frames, f.f AS frame,
         (doc_id * 37 + f.f * f.f * 11) % 256 AS luma
  FROM vids, LATERAL (SELECT unnest(generate_series(0, n_frames - 1)) AS f) f
), flagged AS (
  SELECT doc_id, n_frames, frame,
         CASE WHEN abs(luma - lag(luma) OVER (PARTITION BY doc_id ORDER BY frame)) > 64
              THEN 1 ELSE 0 END AS is_cut
  FROM frames
)
SELECT doc_id,
       CAST(MAX(n_frames) AS BIGINT) AS n_frames,
       CAST(SUM(is_cut) AS BIGINT) AS n_cuts,
       CAST(COALESCE(MIN(CASE WHEN is_cut = 1 THEN frame END), -1) AS BIGINT)
         AS first_cut_frame,
       ROUND(MAX(n_frames) / CAST(SUM(is_cut) + 1 AS DOUBLE), 6) AS mean_shot_frames
FROM flagged GROUP BY doc_id ORDER BY doc_id
""",
)
def multimodal_video_scene_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shot-boundary detection over video rows: per-frame mean luma →
    adjacent-frame delta → cut where |Δ| > 64 → per-video shot census
    (cut count, first boundary, mean shot length). The segmentation step
    a video curation pipeline runs before per-shot sampling/captioning.

    The frame-luma DECODE is the declared stub (this container ships no
    video codec): a mapInPandas stage computes the deterministic fake
    luma (doc_id·37 + frame²·11) mod 256 — real Arrow batch plumbing,
    schema, and partitioning with a fake payload, exactly the brief's
    stub contract, swappable for a real codec without touching the plan.
    Everything AFTER the boundary — frame explode (JVM sequence), lag
    window per video, shot aggregate — is the real operator.

    Scale: frame rows explode map-side; the window partitions by video
    (a shot boundary never crosses videos, so parallelism is per-video);
    the aggregate carries one row per video. Python touches only the
    stub decode, Arrow-batched, never the window or aggregate.
    """
    from typing import Iterator

    import pandas as pd

    from ..multimodal.model import media_table

    vids = media_table(spark, sf_dir).filter(F.col("meta.media_type") == "video")
    frames = vids.select(
        "doc_id",
        F.col("meta.n_frames").alias("n_frames"),
        F.explode(F.sequence(F.lit(0), F.col("meta.n_frames") - 1)).alias("frame"),
    )

    def fake_decode(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            out = pdf[["doc_id", "n_frames", "frame"]].copy()
            out["luma"] = (out["doc_id"] * 37 + out["frame"] * out["frame"] * 11) % 256
            yield out

    decoded = frames.mapInPandas(
        fake_decode, schema="doc_id bigint, n_frames int, frame int, luma bigint"
    )
    w = Window.partitionBy("doc_id").orderBy("frame")
    flagged = decoded.select(
        "doc_id",
        "n_frames",
        "frame",
        F.when(
            F.abs(F.col("luma") - F.lag("luma").over(w)) > SCENE_CUT_DELTA, 1
        )
        .otherwise(0)
        .alias("is_cut"),
    )
    n_cuts = F.sum("is_cut").cast("bigint")
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.max("n_frames").cast("bigint").alias("n_frames"),
            n_cuts.alias("n_cuts"),
            F.coalesce(
                F.min(F.when(F.col("is_cut") == 1, F.col("frame"))), F.lit(-1)
            )
            .cast("bigint")
            .alias("first_cut_frame"),
            F.round(
                F.max("n_frames").cast("double") / (n_cuts + 1).cast("double"), 6
            ).alias("mean_shot_frames"),
        )
        .orderBy("doc_id")
    )
