"""Multimodal column support: opaque binary payloads + typed metadata.

Images / audio / video are carried as ``BinaryType`` columns beside a
``StructType`` metadata column (dimensions, frame counts, sample rates).
All Spark-side plumbing — schemas, partitioning, Arrow-batched
``mapInPandas`` signatures — is real and tested. Binary PPM (P6) images
decode, resize, and re-encode through a dependency-free pure-Python codec
(ppm.py); compressed formats (JPEG/PNG) use PIL where installed (import-
gated — media libraries are optional in this environment).
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
