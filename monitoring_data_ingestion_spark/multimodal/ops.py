"""Media operators: feature extraction, decode, resize, frame sampling.

Design split (the part that matters at 100 TB):

* **Plumbing is Spark-native and real** — ``mapInPandas`` with explicit
  output schemas moves payload bytes through Arrow record batches
  (columnar, zero-copy to Python); frame/window arithmetic is pure JVM
  expression (``sequence``/``transform``), no Python in that path at all.
* **Codecs are stubbed** — PIL/librosa/ffmpeg are not in this
  environment. ``decode_image``/``resize_image`` raise
  ``NotImplementedError`` unless the library import succeeds; feature
  extraction uses a deterministic MD5-derived projection of the payload
  bytes so results are testable end-to-end (and oracle-checkable) without
  codecs. Swapping the stub for a real model call changes ONE function
  body; schema, batching, and partitioning are already production-shaped.
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


def decode_image(df: DataFrame) -> DataFrame:
    """Decode image payloads to (doc_id, width, height, pixels ARRAY<INT>).

    Real decode requires PIL, which this environment does not ship —
    the operator raises until the import gate passes. The mapInPandas
    signature/schema below is the contract a real codec plugs into.
    """
    if not _HAS_PIL:
        raise NotImplementedError(
            "image decode requires PIL; not available in this environment. "
            "extract_features provides the codec-free feature path."
        )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:  # pragma: no cover
        import io

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["media"]):
                img = Image.open(io.BytesIO(payload))
                rows.append(
                    {
                        "doc_id": doc_id,
                        "width": img.width,
                        "height": img.height,
                        "pixels": list(img.convert("L").getdata()),
                    }
                )
            yield pd.DataFrame(rows)

    return df.select("doc_id", "media").mapInPandas(
        gen, schema="doc_id bigint, width int, height int, pixels array<int>"
    )


def resize_image(df: DataFrame, width: int, height: int) -> DataFrame:
    """Resize stub — same import gate and contract as decode_image."""
    raise NotImplementedError(
        "image resize requires a codec library; not available in this "
        "environment. The operator contract is (doc_id, media, meta) -> "
        "(doc_id, media, meta) with meta.width/height updated."
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
