"""Shared Spark-vs-DuckDB differential harness (mirrors the driver's t2 gate).

Canonicalization: columns sorted by name, rows sorted by all columns,
timestamps normalized to naive UTC. The comparison is *strict equality*
(after rounding floats to 9 dp) — stricter than tolerance-based checks —
because the engine's queries are designed to be bit-deterministic
(decimal-routed sums, total ordering, portable hashes).
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    out = df.copy()
    out = out[sorted(out.columns)]
    for c in out.columns:
        s = out[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            try:
                s = s.dt.tz_localize(None)
            except TypeError:
                s = s.dt.tz_convert("UTC").dt.tz_localize(None)
            out[c] = s.astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(s):
            out[c] = np.round(s.astype("float64"), 9)
        elif pd.api.types.is_integer_dtype(s):
            out[c] = s.astype("Int64")
        elif s.dtype == object:
            out[c] = s.map(lambda v: str(v) if v is not None and not pd.isna(v) else None)
    out = out.sort_values(by=list(out.columns), na_position="last").reset_index(drop=True)
    return out


def _kind(dtype) -> str:
    k = dtype.kind if hasattr(dtype, "kind") else "O"
    return {"i": "i", "u": "i", "f": "f", "M": "M", "b": "b"}.get(k, "O")


def compare(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, name: str = "") -> None:
    # Dtype parity pre-coercion: int-vs-float or date-vs-timestamp drift
    # between engines would show up as a driver schema mismatch.
    for c in sorted(set(spark_pdf.columns) & set(duck_pdf.columns)):
        ks, kd = _kind(spark_pdf[c].dtype), _kind(duck_pdf[c].dtype)
        if {ks, kd} == {"i"} and str(spark_pdf[c].dtype) != str(duck_pdf[c].dtype):
            raise AssertionError(
                f"{name}: int width differs for {c}: {spark_pdf[c].dtype} vs {duck_pdf[c].dtype}"
            )
        if ks != kd and "O" not in (ks, kd):  # object cols (nullable ints, dates) checked by value
            raise AssertionError(f"{name}: dtype kind differs for {c}: {ks} vs {kd}")
    a, b = canonicalize(spark_pdf), canonicalize(duck_pdf)
    assert list(a.columns) == list(b.columns), f"{name}: columns {list(a.columns)} != {list(b.columns)}"
    assert len(a) == len(b), f"{name}: row count {len(a)} != {len(b)}"
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av):
            both_nan = av.isna() & bv.isna()
            eq = (av == bv) | both_nan
        else:
            eq = (av == bv) | (av.isna() & bv.isna())
        if not bool(eq.all()):
            bad = (~eq).idxmax()
            raise AssertionError(
                f"{name}: column {c} mismatch at row {bad}: spark={av[bad]!r} duck={bv[bad]!r} "
                f"({int((~eq).sum())} rows differ)"
            )
