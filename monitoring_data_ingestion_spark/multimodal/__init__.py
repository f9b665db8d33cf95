"""Multimodal column support: opaque binary payloads + typed metadata.

Images / audio / video are carried as ``BinaryType`` columns beside a
``StructType`` metadata column (dimensions, frame counts, sample rates).
All Spark-side plumbing — schemas, partitioning, Arrow-batched
``mapInPandas`` signatures — is real and tested; the codec step itself is
stubbed behind import-gates because media libraries are not available in
this environment (see ops.decode_image).
"""

from .model import MEDIA_METADATA_TYPE, media_table
from .ops import decode_image, extract_features, resize_image, sample_frames

__all__ = [
    "MEDIA_METADATA_TYPE",
    "media_table",
    "decode_image",
    "extract_features",
    "resize_image",
    "sample_frames",
]
