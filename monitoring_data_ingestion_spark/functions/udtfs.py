"""Python UDTFs — the table-generating extension point (SURVEY.md §2.10).

The reference's table-generating ops (the OSCAR calendar, month spans of a
backfill) are implemented natively with sequence+explode where possible
(functions/temporal.py::oscar_dates); a UDTF is the declared escape hatch
for generators whose logic can't be a Column expression. ``month_span``
is the canonical example: the reference's backfill cursor enumerates
months from the 1959-01-01 epoch to head (src/sources/era5monthly.js:38-41)
— as a UDTF the enumeration joins lateral-style against any driving table.

Scale note: a UDTF runs row-at-a-time in Python workers — use it for
low-fan-out generators driven by small inputs (a backfill plan, a config
row), never as a per-fact-row operator; high-volume generation belongs in
native `sequence`/`explode`.
"""

from __future__ import annotations

from datetime import date

from pyspark.sql.functions import udtf


@udtf(returnType="month_start string, idx int")
class MonthSpan:
    """Yield every month-start ISO date in [start, end], with its 0-based
    offset — the backfill enumeration of the ingest cursor (T1)."""

    def eval(self, start: str, end: str):  # noqa: D102
        y, m = int(start[:4]), int(start[5:7])
        ey, em = int(end[:4]), int(end[5:7])
        idx = 0
        while (y, m) <= (ey, em):
            yield f"{date(y, m, 1).isoformat()}", idx
            idx += 1
            m += 1
            if m == 13:
                y, m = y + 1, 1


def register_udtfs(spark) -> None:
    """Register the UDTF surface for SQL use (lateral join syntax)."""
    spark.udtf.register("month_span", MonthSpan)
