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


# PII patterns applied in order: emails first (they contain dots and digits
# that the later patterns would otherwise mangle), then IPv4, then long
# card/account digit runs, then phone shapes. Java regex syntax (JVM-side
# regexp_replace — the redaction runs inside whole-stage codegen, no UDF).
_PII_PATTERNS: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    (r"\b\d{13,19}\b", "<ID>"),
    (r"(?<![\d.])(?:\+?\d{1,2}[ .-]?)?(?:\(\d{3}\)|\d{3})[ .-]\d{3}[ .-]\d{4}\b", "<PHONE>"),
]


def redact_pii(text) -> Column:
    """Scrub common PII shapes from free text: emails, IPv4 addresses,
    13-19-digit card/account runs, and North-American phone shapes become
    typed placeholder tokens.

    The standard pre-training scrub stage (C4/Dolma-style): cheap pattern
    classes only — the point is removing the bulk of accidental PII
    before a corpus is frozen, not perfect NER. A chain of four
    ``regexp_replace`` calls stays JVM-side and codegen-fused, so at
    100 TB this is a pure map stage with zero shuffle and no Python in
    the loop. Idempotent: placeholders match none of the patterns.
    """
    col = _c(text)
    for pat, token in _PII_PATTERNS:
        col = F.regexp_replace(col, pat, token)
    return col


def pii_match_count(text) -> Column:
    """Number of PII pattern hits in ``text`` (same classes as
    :func:`redact_pii`) — the audit metric: corpora report redactions per
    document and drop documents whose density suggests a data dump."""
    col = _c(text)
    total = F.lit(0)
    for pat, token in _PII_PATTERNS:
        # Count on the progressively-redacted text so overlapping classes
        # (an email's host looks digit-dotted) aren't double-counted —
        # mirrors exactly what redact_pii replaces. The interim text must
        # use the SAME placeholder as redact_pii: a word-character filler
        # (e.g. "x") would fuse with an adjacent digit run and destroy the
        # \b the next pattern needs ("a@b.co4111111111111111" → the card
        # run goes uncounted), making count != number of redactions.
        total = total + F.coalesce(F.size(F.regexp_extract_all(col, F.lit(pat), 0)), F.lit(0))
        col = F.regexp_replace(col, pat, token)
    return total
