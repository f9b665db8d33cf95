"""Media operators: feature extraction, decode, resize, frame sampling.

Design split (the part that matters at 100 TB):

* **Plumbing is Spark-native and real** — ``mapInPandas`` with explicit
  output schemas moves payload bytes through Arrow record batches
  (columnar, zero-copy to Python); frame/window arithmetic is pure JVM
  expression (``sequence``/``transform``), no Python in that path at all.
* **Codecs**: binary PPM (P6) decodes/encodes through the dependency-free
  pure-Python codec (ppm.py) — decode/resize are REAL end-to-end paths in
  this environment; compressed formats (JPEG/PNG) additionally use PIL
  where installed. Feature extraction uses a deterministic MD5-derived
  projection of the payload bytes so results are oracle-checkable without
  any model; swapping it for a real model call changes ONE function body —
  schema, batching, and partitioning are already production-shaped.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

FEATURE_DIM = 4

try:  # pragma: no cover - exercised only where PIL exists
    from PIL import Image  # noqa: F401

    _HAS_PIL = True
except Exception:  # pragma: no cover
    _HAS_PIL = False


def _md5_feature(payload: bytes, j: int) -> float:
    """Deterministic pseudo-feature j of a payload: the first 32 bits of
    md5(payload ‖ '_j'), scaled to [0, 1). Stands in for a model embedding;
    identical to the oracle SQL definition (md5 is the one hash both
    engines and Python compute identically)."""
    h = hashlib.md5(payload + f"_{j}".encode()).hexdigest()
    return int(h[:8], 16) / 4294967296.0


def extract_features(df: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """Arrow-batched feature extraction over the binary payload column.

    Input: (doc_id, media BINARY, meta STRUCT). Output: doc_id, n_bytes,
    and f0..f{dim-1} doubles. Runs as ``mapInPandas``: each task pulls
    record batches, computes per-row features in Python, yields batches —
    the exact shape a GPU/model-inference stage uses (batch size is
    controlled by spark.sql.execution.arrow.maxRecordsPerBatch, partition
    parallelism by the upstream layout; no shuffle is introduced).
    """
    out_schema = "doc_id bigint, n_bytes bigint, " + ", ".join(
        f"f{j} double" for j in range(dim)
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["media"]
            out = {
                "doc_id": pdf["doc_id"],
                "n_bytes": payloads.map(len).astype("int64"),
            }
            for j in range(dim):
                out[f"f{j}"] = payloads.map(lambda b, j=j: _md5_feature(bytes(b), j))
            yield pd.DataFrame(out)

    return df.select("doc_id", "media").mapInPandas(gen, schema=out_schema)


def _decode_rgb(payload: bytes) -> tuple[int, int, bytes]:
    """(width, height, raw RGB) of a payload: binary PPM decodes through
    the pure-Python codec; anything else falls back to PIL when present."""
    from . import ppm

    payload = bytes(payload)
    if ppm.is_ppm(payload):
        return ppm.decode_ppm(payload)
    if _HAS_PIL:  # pragma: no cover - exercised only where PIL exists
        import io

        img = Image.open(io.BytesIO(payload)).convert("RGB")
        return img.width, img.height, img.tobytes()
    raise ValueError(
        "payload is not binary PPM (P6) and no codec library is available "
        "for compressed formats"
    )


def decode_image(df: DataFrame) -> DataFrame:
    """Decode image payloads to (doc_id, width, height, pixels ARRAY<INT>)
    — pixels are row-major ITU-R 601-2 grayscale.

    Binary PPM (P6) decodes through the dependency-free pure-Python codec
    (multimodal/ppm.py); compressed formats use PIL where installed. Runs
    as ``mapInPandas`` so payload bytes stream through Arrow batches
    executor-side — the same plumbing a GPU decode stage uses.
    """
    from . import ppm

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["media"]):
                w, h, rgb = _decode_rgb(payload)
                rows.append(
                    {
                        "doc_id": doc_id,
                        "width": w,
                        "height": h,
                        "pixels": ppm.gray_pixels(rgb, w, h),
                    }
                )
            yield pd.DataFrame(rows)

    return df.select("doc_id", "media").mapInPandas(
        gen, schema="doc_id bigint, width int, height int, pixels array<int>"
    )


_META_SCHEMA_DDL = (
    "meta struct<media_type:string,width:int,height:int,"
    "n_frames:int,fps:int,sample_rate:int,n_bytes:bigint>"
)


def resize_image(df: DataFrame, width: int, height: int) -> DataFrame:
    """Nearest-neighbor resize: (doc_id, media, meta) → (doc_id, media,
    meta) with the payload re-encoded as binary PPM and meta.width/height/
    n_bytes updated.

    Decode follows the same codec resolution as decode_image (pure PPM
    path, PIL fallback); the output payload is always PPM so a resize
    stage's output is self-describing without PIL downstream.
    """
    from . import ppm

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload, meta in zip(pdf["doc_id"], pdf["media"], pdf["meta"]):
                w, h, rgb = _decode_rgb(payload)
                out_rgb = ppm.resize_nearest(rgb, w, h, width, height)
                out_payload = ppm.encode_ppm(width, height, out_rgb)
                new_meta = dict(meta)
                new_meta.update(
                    width=width, height=height, n_bytes=len(out_payload)
                )
                rows.append(
                    {"doc_id": doc_id, "media": out_payload, "meta": new_meta}
                )
            yield pd.DataFrame(rows)

    return df.select("doc_id", "media", "meta").mapInPandas(
        gen, schema=f"doc_id bigint, media binary, {_META_SCHEMA_DDL}"
    )


def sample_frames(df: DataFrame, k: int = 4) -> DataFrame:
    """Evenly sample k frame indices per video: slot i (0-based) maps to
    frame floor(i * n_frames / k); emits timestamps at the metadata fps.

    Pure JVM path — sequence → transform → explode, no Python: frame
    *selection* is cheap arithmetic over metadata and must not pay the
    Python/Arrow boundary; only the (stubbed) frame *decode* would. At
    scale this runs map-side with zero shuffle, and the explode multiplies
    rows by exactly k.
    """
    n = F.col("meta.n_frames")
    slots = F.sequence(F.lit(0), F.lit(k - 1))
    frames: Column = F.transform(slots, lambda i: F.floor(i * n / F.lit(float(k))).cast("bigint"))
    return (
        df.filter(F.col("meta.media_type") == "video")
        .select(
            "doc_id",
            n.cast("bigint").alias("n_frames"),
            F.posexplode(frames).alias("slot", "frame_idx"),
        )
        .select(
            "doc_id",
            "n_frames",
            F.col("slot").cast("bigint").alias("slot"),
            "frame_idx",
            (F.col("frame_idx") * 1000.0 / 25.0).alias("frame_ts_ms"),
        )
    )


def decode_pcm16(df: DataFrame) -> DataFrame:
    """Decode 16-bit little-endian PCM payloads to
    (doc_id, n_samples, samples ARRAY<INT>) — the audio analogue of
    decode_image: bytes stream through Arrow ``mapInPandas`` batches
    executor-side (numpy ``frombuffer``, zero-copy until the arrow
    hand-off), and everything downstream of the raw samples (framing,
    energy, features) stays JVM-side array arithmetic.
    """
    import numpy as np

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["media"]):
                s = np.frombuffer(bytes(payload), dtype="<i2")
                rows.append(
                    {
                        "doc_id": doc_id,
                        "n_samples": len(s),
                        "samples": s.astype("int32").tolist(),
                    }
                )
            yield pd.DataFrame(rows)

    return df.select("doc_id", "media").mapInPandas(
        gen, schema="doc_id bigint, n_samples int, samples array<int>"
    )
