"""Z-order (Morton) layout for multi-dimensional data skipping.

At 100 TB, a predicate on (a, b) can prune files only if the physical
layout clusters BOTH columns: sorting by `a` alone leaves `b`'s min/max
ranges per file as wide as the whole domain. Writing files in Morton-code
order bounds every file to a small hyper-rectangle of the (a, b) space, so
parquet footer min/max stats (and partition-level manifests) skip most of
the data for box predicates on any participating dimension.

The Morton code here is a pure native column expression (bit interleave of
two quantized 16-bit coordinates — shifts, masks, adds), so the layout pass
is one `repartitionByRange(zvalue)` + write: no UDF, no driver loop, and
the same expression is evaluable by any engine (the DuckDB oracle runs the
identical arithmetic).

Reference tie-in: the reference stores rasters row-major per file
(`/root/reference/src/file-conversions.js:57-74` GeoTIFF sink) — fine for
whole-grid reads, useless for bbox scans across thousands of files. The
z-order writer is the multi-file generalization its AOI crop
(`era5monthly.js:34`) needs at scale.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ZBITS = 16  # bits per dimension → 32-bit Morton code for 2-D


def quantize(col: Column, lo: float, hi: float, bits: int = ZBITS) -> Column:
    """Map a numeric column into [0, 2^bits) integer cells (clamped)."""
    cells = (1 << bits) - 1
    frac = (col.cast("double") - F.lit(float(lo))) / F.lit(float(hi - lo))
    clamped = F.least(F.greatest(frac, F.lit(0.0)), F.lit(1.0))
    return F.floor(clamped * cells).cast("bigint")


def morton2(x: Column, y: Column, bits: int = ZBITS) -> Column:
    """Interleave the low ``bits`` bits of x and y (x → even positions,
    y → odd): the 2-D Morton (Z-curve) code, as one codegen'd expression."""
    z = F.lit(0).cast("bigint")
    for i in range(bits):
        z = (
            z
            + F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
            + F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


def morton2_sql(x: str, y: str, bits: int = ZBITS) -> str:
    """The identical Morton interleave in ANSI SQL (DuckDB-runnable)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


def zorder_write(
    df: DataFrame,
    path: str,
    cols: Sequence[tuple[str, float, float]],
    n_files: int = 32,
    bits: int = ZBITS,
) -> None:
    """Write ``df`` as parquet laid out in Z-order over two columns.

    ``cols`` is [(name, lo, hi), (name, lo, hi)]. Range-partitioning by the
    Morton code gives each output file a contiguous Z-range = a bounded
    rectangle of the key space, which is exactly what footer min/max
    skipping needs. The sort is local per partition (sortWithinPartitions)
    — no extra global sort after the range exchange.
    """
    (xa, xlo, xhi), (ya, ylo, yhi) = cols
    z = morton2(quantize(F.col(xa), xlo, xhi, bits), quantize(F.col(ya), ylo, yhi, bits), bits)
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
