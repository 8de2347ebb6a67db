"""Date/time scalar functions (native Catalyst exprs).

Reference parity:
- ``month_delta``  — database.py:58-67 (whole calendar months between dates,
  computed by a monthrange walk; equivalently: month-index difference minus one
  when the day-of-month hasn't been reached).
- "time ago" cascade — database.py:678-694 (months→days→hours→minutes→seconds,
  first unit with value ≥1; the reference prints singular/plural).
- age in days      — database.py:274,314 (``(now-then).days``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def month_delta(start: Column, end: Column) -> Column:
    """Whole calendar months from ``start`` to ``end`` (database.py:58-67).

    (year(end)-year(start))*12 + (month(end)-month(start)), minus one when the
    end day-of-month is before the start day-of-month. Expressed with integer
    date parts (not ``months_between``) so the DuckDB oracle can state the
    identical formula.

    Divergence note: the reference walks forward by raw month lengths, so for
    start days ≥ 29 crossing short months it can undercount by one (e.g.
    Jan 31 → Mar 2). We use calendar-month semantics; documented, cosmetic.
    """
    months = (F.year(end) - F.year(start)) * 12 + (F.month(end) - F.month(start))
    return (months - F.when(F.dayofmonth(end) < F.dayofmonth(start), 1).otherwise(0)).cast("int")


def age_days(ts: Column, now: Column) -> Column:
    """Age in whole days, ``(now - then).days`` semantics (database.py:314).

    Uses the true second delta (not calendar datediff) to match Python's
    timedelta.days floor behavior.
    """
    return F.floor((now.cast("long") - ts.cast("long")) / F.lit(86400)).cast("int")


def time_ago(ts: Column, now: Column) -> Column:
    """Humanized age string (database.py:678-694).

    Cascade: months (calendar), then days, hours, minutes, seconds — first
    unit whose value is ≥ 1. The reference always pluralizes ("1 months ago",
    app-visible at database.py:681) — we keep that. It also prints float hours
    /minutes/seconds ("5.0 hours ago"); we print integers (cosmetic
    divergence, documented).
    """
    secs = now.cast("long") - ts.cast("long")
    months = month_delta(ts.cast("date"), now.cast("date"))
    days = F.floor(secs / 86400).cast("int")
    hours = F.floor(secs / 3600).cast("int")
    minutes = F.floor(secs / 60).cast("int")
    seconds = secs.cast("int")

    def unit(n: Column, name: str) -> Column:
        return F.concat(n.cast("string"), F.lit(" " + name + "s ago"))

    return (
        F.when(months >= 1, unit(months, "month"))
        .when(days >= 1, unit(days, "day"))
        .when(hours >= 1, unit(hours, "hour"))
        .when(minutes >= 1, unit(minutes, "minute"))
        .otherwise(unit(seconds, "second"))
    )
