"""String scalar surface (SURVEY.md §2.8 F14-F16).

Parity targets: GSKY layer-name mangling `-`→`_`
(/root/reference/src/rabbit.js:38-39), source-prefix extraction
(/root/reference/src/rabbit.js:29-30), `{layer}_{iso}` output path
templating with `:`→`_` sanitization (/root/reference/src/utility.js:127-133).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(x) -> Column:
    return F.col(x) if isinstance(x, str) else (x if isinstance(x, Column) else F.lit(x))


def layer_name(dataset_name) -> Column:
    """Dataset filename → layer name: hyphens become underscores."""
    return F.regexp_replace(_c(dataset_name), "-", "_")


def source_prefix(dataset_name) -> Column:
    """Dataset filename prefix before the first hyphen = owning source."""
    return F.split(_c(dataset_name), "-").getItem(0)


def output_path(layer, ts, ext: str = ".tif") -> Column:
    """`{layer}_{iso}{ext}` with `:` sanitized to `_` (portable paths)."""
    iso = F.date_format(_c(ts), "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'")
    return F.concat(_c(layer), F.lit("_"), F.regexp_replace(iso, ":", "_"), F.lit(ext))
