"""Per-location retention windows + Location precedence upgrade
(reference config.py:11-13, database.py:271-283, database.py:344-350)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from repostcheckerbot_spark.operators import locations

def NOW():
    return F.to_timestamp(F.lit("2024-03-01 00:00:00"))


def _aged(spark, rows):
    """rows: (url, age_days, location) with exact day ages vs NOW."""
    from datetime import timedelta

    base = datetime(2024, 3, 1)
    return spark.createDataFrame(
        [(u, base - timedelta(days=d), loc) for u, d, loc in rows], ["url", "ts", "location"]
    )


def test_per_location_sweep_applies_each_window(spark):
    windows = {"top": 10, "hot": 5, "new": None}
    df = _aged(
        spark,
        [
            ("a", 11, "top"),   # > 10 → swept
            ("b", 10, "top"),   # == 10 → kept (delete is strictly >)
            ("c", 6, "hot"),    # > 5 → swept
            ("d", 100, "new"),  # None → kept forever
            ("e", 100, "other"),  # unmapped location → kept
        ],
    )
    swept = {r.url for r in locations.sweep_candidates_by_location(df, windows, now=NOW()).collect()}
    assert swept == {"a", "c"}


def _upgrade(spark, loc, age, seen, windows):
    from datetime import timedelta

    df = spark.createDataFrame(
        [("u", datetime(2024, 3, 1) - timedelta(days=age), loc, *(f in seen for f in locations.FEEDS))],
        ["url", "ts", "location", "seen_top", "seen_hot", "seen_new"],
    )
    out = locations.apply_location_upgrades(
        df.select("url", "ts", "location"),
        df.select("url", "seen_top", "seen_hot", "seen_new"),
        windows,
        now=NOW(),
    )
    return out.collect()[0].location


def test_upgrade_precedence_chain(spark):
    w = {"top": 30, "hot": 10, "new": 5}
    # top has the strictly longest window → a young re-seen post moves to top
    assert _upgrade(spark, "new", 3, {"top"}, w) == "top"
    # hot's window is not the longest → never upgrades to hot
    assert _upgrade(spark, "new", 3, {"hot"}, w) == "new"
    # age at/over the window blocks the move (strict <)
    assert _upgrade(spark, "new", 30, {"top"}, w) == "new"
    # already there → untouched
    assert _upgrade(spark, "top", 3, {"top"}, w) == "top"


def test_upgrade_infinite_window_and_last_wins_quirks(spark):
    # None window always qualifies, even when another window is longer
    w = {"top": 30, "hot": 10, "new": None}
    assert _upgrade(spark, "hot", 50, {"new"}, w) == "new"
    # reference quirk: every feed test compares the ORIGINAL location and the
    # ifs run top→hot→new, so with two infinite qualifying feeds the LAST wins
    w2 = {"top": None, "hot": 10, "new": None}
    assert _upgrade(spark, "hot", 1, {"top", "new"}, w2) == "new"
    # …but a feed equal to the original location never fires, so seen-in-own
    # feed plus one other moves to the other
    assert _upgrade(spark, "new", 1, {"top", "new"}, w2) == "top"


def test_upgrade_rows_not_reseen_untouched(spark):
    from datetime import timedelta

    stored = spark.createDataFrame(
        [("a", datetime(2024, 2, 28), "new"), ("b", datetime(2024, 2, 28), "hot")],
        ["url", "ts", "location"],
    )
    seen = spark.createDataFrame([("a", True, False, False)], ["url", "seen_top", "seen_hot", "seen_new"])
    out = locations.apply_location_upgrades(stored, seen, {"top": None, "hot": None, "new": None}, now=NOW())
    got = {r.url: r.location for r in out.collect()}
    assert got == {"a": "top", "b": "hot"}
