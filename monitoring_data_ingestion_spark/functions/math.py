"""Math scalar surface (SURVEY.md §2.8 F1-F5).

Parity targets: clamp (/root/reference/src/math.js:2-4), offset modulo
(/root/reference/src/math.js:7-9), area-uniform random coordinates
(/root/reference/src/math.js:12-19). All are native Column expressions —
JVM-side, whole-stage-codegen'd, no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(x) -> Column:
    return F.col(x) if isinstance(x, str) else (x if isinstance(x, Column) else F.lit(x))


def clamp(x, lo, hi) -> Column:
    """Bound x into [lo, hi]: least(greatest(x, lo), hi)."""
    return F.least(F.greatest(_c(x), _c(lo)), _c(hi))


def modulo(x, y, offset=0) -> Column:
    """True mathematical modulo with offset: result in [offset, offset+y)."""
    return F.pmod(_c(x) - _c(offset), _c(y)) + _c(offset)


def randlon(seed: int | None = None, u=None) -> Column:
    """Uniform random longitude in [-180, 180).

    ``u`` injects an explicit uniform-[0,1) column in place of
    ``F.rand()`` — the deterministic form an oracle can hash-check (and
    the form to use when coordinates must be reproducible from a key).
    """
    r = _c(u) if u is not None else (F.rand(seed) if seed is not None else F.rand())
    return r * F.lit(360.0) - F.lit(180.0)


def randlat(seed: int | None = None, u=None) -> Column:
    """Area-uniform random latitude: degrees(asin(2u - 1)).

    ``u`` as in :func:`randlon`: explicit uniform source for
    deterministic, oracle-checkable output.
    """
    r = _c(u) if u is not None else (F.rand(seed) if seed is not None else F.rand())
    return F.degrees(F.asin(r * F.lit(2.0) - F.lit(1.0)))
