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
