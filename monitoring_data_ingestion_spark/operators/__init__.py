"""Reusable scale-path operators that compose the stock DataFrame API.

Everything here is a plan-rewrite helper, not a new execution primitive:
salting spreads hot keys across shuffle partitions, approximate distinct
trades exactness for a fixed-size sketch. They exist so query authors
reach for a tested pattern instead of re-deriving it per pipeline.
"""

from .skew import salted_aggregate, salted_broadcast_join
from .approx import approx_distinct

__all__ = ["salted_aggregate", "salted_broadcast_join", "approx_distinct"]
