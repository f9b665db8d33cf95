"""Media data model: binary payload + typed metadata struct.

The reference treats raster payloads as opaque byte streams moved between
operators (GRIB/GeoTIFF buffers, /root/reference/src/download.js:101-105)
with a metadata sidecar per dataset (/root/reference/src/rabbit.js:56-71).
Generalized here: one DataFrame column holds the payload bytes, one holds a
typed metadata struct — the layout a 100 TB media lake uses (payloads in
parquet binary columns or object-store pointers, metadata queryable without
touching bytes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..sources.readers import table

#: Typed metadata carried beside every media payload. Width/height for
#: images, n_frames/fps for video, sample_rate for audio — unused members
#: are null for other modalities (sparse struct, reads as columnar nulls).
MEDIA_METADATA_TYPE = StructType(
    [
        StructField("media_type", StringType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("n_frames", IntegerType(), True),
        StructField("fps", IntegerType(), True),
        StructField("sample_rate", IntegerType(), True),
        StructField("n_bytes", LongType(), False),
    ]
)

_MEDIA_TYPES = ["image", "audio", "video"]


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The `documents` fixture lifted into the media data model: the text
    payload re-typed as opaque bytes (media BINARY) plus a deterministic
    metadata struct derived from doc_id.

    The derivation is fixed so oracle SQL can reproduce it; in production
    this DataFrame comes straight off a parquet scan with the same schema.
    Metadata stays queryable (filter/partition by media_type, dimensions)
    without deserializing payload bytes — the binary column is only read by
    operators that declare it.
    """
    d = table(spark, sf_dir, "documents")
    media_type = F.element_at(
        F.array(*[F.lit(t) for t in _MEDIA_TYPES]),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    is_img = F.col("media_type") == "image"
    is_vid = F.col("media_type") == "video"
    is_aud = F.col("media_type") == "audio"
    return (
        d.select(
            "doc_id",
            F.encode(F.col("text"), "UTF-8").alias("media"),
            media_type.alias("media_type"),
        )
        .select(
            "doc_id",
            "media",
            F.struct(
                F.col("media_type"),
                F.when(is_img | is_vid, (64 + (F.col("doc_id") % 8) * 16).cast("int")).alias(
                    "width"
                ),
                F.when(is_img | is_vid, (48 + (F.col("doc_id") % 5) * 16).cast("int")).alias(
                    "height"
                ),
                F.when(is_vid, (1 + F.col("doc_id") % 30).cast("int")).alias("n_frames"),
                F.when(is_vid, F.lit(25).cast("int")).alias("fps"),
                F.when(is_aud, F.lit(16000).cast("int")).alias("sample_rate"),
                F.length("media").cast("bigint").alias("n_bytes"),
            ).alias("meta"),
        )
    )
