"""Calendar/datetime scalar surface (SURVEY.md §2.8 F6-F13).

Parity targets (all /root/reference):
  * add/subtract with month-overflow clamping — src/temporal.js:56-87.
    Spark's ``add_months`` clamps to month-end with identical semantics,
    so ``add_calendar`` composes add_months + day/time interval arithmetic.
  * round-to-unit with increment + rounding mode — src/temporal.js:89-150.
  * component replacement ("with") — src/temporal.js:34-54.
  * days_since — src/datetime.js:33-35.
  * ISO-8601 UTC formatting — src/datetime.js:29-31.
  * OSCAR valid-date calendar (72/year) — src/oscar.js:27-34.

Everything is a native Column expression; the OSCAR calendar is a
table-generating expression (sequence + transform), not a UDTF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_UNIT_SECONDS = {
    "second": 1,
    "minute": 60,
    "hour": 3600,
    "day": 86400,
}


def _c(x) -> Column:
    return F.col(x) if isinstance(x, str) else (x if isinstance(x, Column) else F.lit(x))


def add_calendar(
    ts,
    years: int = 0,
    months: int = 0,
    days: int = 0,
    hours: int = 0,
    minutes: int = 0,
    seconds: int = 0,
) -> Column:
    """Calendar-aware add matching the reference's overflow clamping.

    Reference semantics (src/temporal.js:77-82): adding months past a
    shorter month clamps to that month's last day (retry days−1 loop);
    ``add_months`` implements exactly that clamp. Day/time parts are then
    plain interval arithmetic, as in the reference (applied after the
    year/month step).
    """
    out = _c(ts)
    total_months = years * 12 + months
    if total_months:
        # add_months returns a DATE (time-of-day dropped, day clamped);
        # re-attach the original time of day as a day-time interval.
        tod = out.cast("double") - F.date_trunc("day", out).cast("double")
        out = F.to_timestamp(F.add_months(out, total_months)) + F.make_dt_interval(
            F.lit(0), F.lit(0), F.lit(0), tod
        )
    if days or hours or minutes or seconds:
        out = out + F.expr(
            f"INTERVAL {days} DAYS + INTERVAL {hours} HOURS "
            f"+ INTERVAL {minutes} MINUTES + INTERVAL {seconds} SECONDS"
        )
    return out


def datetime_with(ts, **parts) -> Column:
    """Replace datetime components, clamped to valid ranges (F8).

    Mirrors src/temporal.js:34-54: e.g. ``datetime_with(ts, day=31)`` on a
    February timestamp clamps to Feb 28/29.
    """
    t = _c(ts)
    get = {
        "year": F.year(t),
        "month": F.month(t),
        "day": F.dayofmonth(t),
        "hour": F.hour(t),
        "minute": F.minute(t),
        "second": F.second(t),
    }
    for k in parts:
        if k not in get:
            raise ValueError(f"unknown component {k}")
        get[k] = F.lit(parts[k])
    # Clamp day to the target month's length (reference's clamp loop).
    first = F.make_date(get["year"], get["month"], F.lit(1))
    max_day = F.dayofmonth(F.last_day(first))
    day = F.least(get["day"].cast("int"), max_day)
    return F.make_timestamp(
        get["year"], get["month"], day, get["hour"], get["minute"], get["second"].cast("double")
    )


def datetime_round(ts, unit: str, increment: int = 1, mode: str = "halfExpand") -> Column:
    """Round a timestamp to ``increment`` × ``unit`` (F7).

    Modes follow src/temporal.js:89-150: ``floor``/``trunc`` (identical for
    instants ≥ epoch), ``ceil``, ``halfExpand`` (round half away from the
    floor — the reference's default).  Implemented as epoch-second integer
    arithmetic for second/minute/hour/day; month uses ``date_trunc`` +
    ``add_months``.
    """
    t = _c(ts)
    if unit == "month":
        floor = F.date_trunc("month", t)
        if mode in ("floor", "trunc"):
            return floor
        nxt = F.to_timestamp(F.add_months(floor, increment))
        if mode == "ceil":
            return F.when(t == floor, floor).otherwise(nxt)
        # halfExpand on months: compare against the midpoint of the span.
        half = (nxt.cast("double") + floor.cast("double")) / 2
        return F.when(t.cast("double") >= half, nxt).otherwise(floor)
    step = _UNIT_SECONDS[unit] * increment
    secs = t.cast("double")
    floor_s = F.floor(secs / step) * step
    if mode in ("floor", "trunc"):
        out_s = floor_s
    elif mode == "ceil":
        out_s = F.ceil(secs / step) * step
    else:  # halfExpand
        out_s = F.floor(secs / step + F.lit(0.5)) * step
    return F.to_timestamp(out_s.cast("double"))


def days_in_month(ts) -> Column:
    """Length of the timestamp's month (F11, src/temporal.js:13-16)."""
    return F.dayofmonth(F.last_day(_c(ts)))


def day_of_week_iso(ts) -> Column:
    """ISO day-of-week, Monday=1 … Sunday=7 (F11, src/temporal.js:18-20:
    the reference maps JS getUTCDay's Sunday=0 to 7)."""
    return F.weekday(_c(ts)) + F.lit(1)


def days_since(a, b) -> Column:
    """Float day difference a − b (src/datetime.js:33-35)."""
    return (_c(a).cast("double") - _c(b).cast("double")) / F.lit(86400.0)


def iso_format(ts) -> Column:
    """ISO-8601 UTC string with milliseconds (src/datetime.js:29-31)."""
    return F.date_format(_c(ts), "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'")


def oscar_dates(year) -> Column:
    """Array of the 72 OSCAR valid dates for ``year`` (src/oscar.js:27-34).

    Day offsets are floor(days_in_year * i / 72), i in 0..71, with the
    leap-year rule explicit.
    """
    y = _c(year)
    jan1 = F.make_date(y, F.lit(1), F.lit(1))
    days_in_year = F.when(
        (y % 4 == 0) & ((y % 100 != 0) | (y % 400 == 0)), F.lit(366)
    ).otherwise(F.lit(365))
    idx = F.sequence(F.lit(0), F.lit(71))
    return F.transform(idx, lambda i: F.date_add(jan1, F.floor(days_in_year * i / 72).cast("int")))
