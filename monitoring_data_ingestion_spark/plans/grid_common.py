"""Shared helpers for the grid catalog modules (split out of the
former monolithic plans/grid_q.py in r16; one definition each so the
modules' presence semantics can never desynchronize)."""

from __future__ import annotations

from pyspark.sql import functions as F

def _is_present(x):
    """Cell carries a value: the missing sentinel lands as NULL or NaN
    depending on the Arrow list transfer, so every per-cell aggregate
    must treat both — ONE spelling, shared by all the grid queries."""
    return x.isNotNull() & ~F.isnan(x)


def _present(col: str):
    """Missing-cell predicate on the landed ``values`` surface: the
    codec marks masked cells NaN, Arrow maps NaN to NULL on the
    array<double> transfer, and Spark's isnan() is FALSE (not NULL) on
    NULL — so presence must check both representations explicitly."""
    return F.col(col).isNotNull() & ~F.isnan(col)
