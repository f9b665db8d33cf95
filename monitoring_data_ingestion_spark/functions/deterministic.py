"""Deterministic float aggregation helpers.

Floating-point sums depend on add order, which Spark does not fix across
partitionings — but the correctness gate hash-compares values against a
single-threaded DuckDB oracle. Routing sums through ``decimal`` makes the
aggregation exact (decimal addition is associative), so the result is
bit-identical regardless of parallelism, at both sf0.01 and 100 TB.

The same trick appears in the oracle SQL:
    CAST(SUM(CAST(x AS DECIMAL(30,s))) AS DOUBLE)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dsum(col: Column | str, scale: int = 4) -> Column:
    """Order-independent sum of a double column, returned as double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(30,{scale})")).cast("double")


def davg(col: Column | str, scale: int = 4) -> Column:
    """Order-independent mean (exact decimal sum / count), as double."""
    c = F.col(col) if isinstance(col, str) else col
    return dsum(c, scale) / F.count(c)


def dsum_expr(sql_expr: str, scale: int = 4) -> str:
    """Oracle-side (ANSI SQL) rendering of :func:`dsum`."""
    return f"CAST(SUM(CAST({sql_expr} AS DECIMAL(30,{scale}))) AS DOUBLE)"


def dmoney(col: Column | str, scale: int = 8) -> Column:
    """Order-independent money sum, cents-rounded, cast-exact.

    Sums exact decimals like :func:`dsum`, but rounds the DECIMAL to 2
    places before the double cast. Engines convert decimal→double
    differently (the JVM rounds the exact value once; DuckDB converts
    the unscaled int128 then divides by 10^scale — two roundings), so a
    sum whose unscaled value exceeds 2^53 can differ in the last ulp
    between engines (measured: q1's sum_charge at the 10× fixture,
    2.8e10 at scale 8 → 2.8e18 unscaled). A cents-rounded decimal keeps
    the unscaled value below 2^53 for sums up to ~9×10^13, where BOTH
    conversion paths are exact-then-one-correct-rounding — bit-identical
    everywhere. Use for large-group currency totals; plain dsum remains
    right for bounded-magnitude sums.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.round(F.sum(c.cast(f"decimal(30,{scale})")), 2).cast("double")


def dmoney_expr(sql_expr: str, scale: int = 8) -> str:
    """DuckDB twin of :func:`dmoney`."""
    return f"CAST(ROUND(SUM(CAST({sql_expr} AS DECIMAL(30,{scale}))), 2) AS DOUBLE)"
