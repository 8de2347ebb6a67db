"""Per-location retention windows + the Location precedence upgrade.

Reference parity (file:line in /root/reference/):
- the config keeps THREE day limits keyed by Location — ``sub_settings[1..3]``
  for 'top'/'hot'/'new', env ``BOT_{TOP,HOT,NEW}_DAYS``, None = keep forever
  (config.py:11-13);
- the daily sweep deletes a stored row when its age strictly exceeds ITS OWN
  location's limit (database.py:271-283: ``time_passed > sub_settings[i] and
  x[1] == loc`` per location);
- the ingest gate skips an arriving record by the same per-location windows
  (database.py:312-323);
- a RE-SEEN record's stored Location is UPGRADED to the feed it is currently
  seen in (database.py:344-350) under the precedence chain: move to feed X iff
  the stored location differs, the record is seen in X, and X's window is
  either infinite (None) or (the age is strictly inside it AND X's window is
  strictly the longest among the FINITE windows — infinite competitors are
  ignored, a reference quirk preserved here). The three feed checks run in
  order top → hot → new against the ORIGINAL stored location, so when several
  feeds qualify the LAST one in that order wins (also a reference quirk —
  each ``if`` compares ``i[0]``, the pre-update value).

Spark rendering: all pure column algebra (when/otherwise chains) — the sweep
is one filter, the upgrade one projection feeding a keyed upsert
(Warehouse.upsert = MERGE WHEN MATCHED UPDATE).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from repostcheckerbot_spark.functions.timeutil import age_days

#: the reference's feed order — upgrade ifs run in this order, last wins
FEEDS = ("top", "hot", "new")


def within_retention_by_location(
    ts_col: Column,
    loc_col: Column,
    windows: dict[str, int | None],
    now: Column | None = None,
) -> Column:
    """True iff the row survives its OWN location's window (delete when
    age > limit, database.py:271-283). Locations absent from ``windows`` (or
    mapped to None) are kept forever."""
    now = now if now is not None else F.current_timestamp()
    age = age_days(ts_col, now)
    out = None
    for loc, days in windows.items():
        keep = F.lit(True) if days is None else (age <= F.lit(days))
        out = F.when(loc_col == loc, keep) if out is None else out.when(loc_col == loc, keep)
    return F.lit(True) if out is None else out.otherwise(F.lit(True))


def sweep_candidates_by_location(
    df: DataFrame,
    windows: dict[str, int | None],
    ts_col: str = "ts",
    loc_col: str = "location",
    now: Column | None = None,
) -> DataFrame:
    """Rows the per-location daily sweep would delete."""
    return df.where(~within_retention_by_location(F.col(ts_col), F.col(loc_col), windows, now))


def _feed_qualifies(feed: str, age: Column, windows: dict[str, int | None]) -> Column:
    """database.py:344-350 predicate for one feed: window None ⇒ always; else
    age strictly inside AND strictly longest among the other FINITE windows."""
    w = windows.get(feed)
    if w is None:
        return F.lit(True)
    cond = age < F.lit(w)
    for other in FEEDS:
        if other == feed:
            continue
        ow = windows.get(other)
        if ow is not None and not w > ow:
            cond = cond & F.lit(False)
    return cond


def upgraded_location(
    loc_col: Column,
    age: Column,
    seen: dict[str, Column],
    windows: dict[str, int | None],
) -> Column:
    """The post-upgrade Location for a re-seen record (database.py:344-350).

    ``seen[feed]`` are booleans (currently listed in that feed). Each feed's
    test compares against the ORIGINAL stored location and the feeds apply in
    top → hot → new order, so the last qualifying feed wins — both reference
    quirks preserved (see module docstring).
    """
    result = loc_col
    for feed in FEEDS:
        cond = seen[feed] & (loc_col != F.lit(feed)) & _feed_qualifies(feed, age, windows)
        result = F.when(cond, F.lit(feed)).otherwise(result)
    return result


def apply_location_upgrades(
    stored: DataFrame,
    seen: DataFrame,
    windows: dict[str, int | None],
    key: str = "url",
    ts_col: str = "ts",
    loc_col: str = "location",
    now: Column | None = None,
) -> DataFrame:
    """stored(key, ts, location, …) × seen(key, seen_top, seen_hot, seen_new)
    → stored with Location upgraded per the precedence chain. Rows not re-seen
    are untouched. Feed the result to ``Warehouse.upsert(..., key=key)`` for
    the reference's ``update_database`` (database.py:233-249) rendering."""
    now = now if now is not None else F.current_timestamp()
    age = age_days(F.col(ts_col), now)
    seen_cols = {f: F.coalesce(F.col(f"seen_{f}"), F.lit(False)) for f in FEEDS}
    joined = stored.join(seen, key, "left")
    new_loc = upgraded_location(F.col(loc_col), age, seen_cols, windows)
    return joined.withColumn(loc_col, new_loc).drop(*[f"seen_{f}" for f in FEEDS])
