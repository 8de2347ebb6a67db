"""Time-series operators Spark lacks natively: as-of join and gap-based
batch sessionization.

``asof_join(left, right, …)`` attaches to every left row the payload of the
LATEST right row with ``right.ts <= left.ts`` inside the same key group —
e.g. "for each click, the user's most recent prior page view".

The naive rendering is a theta-join ``l.ts >= r.ts`` + a max-per-left-row
aggregate: per key group of L lefts and R rights it materializes O(L·R)
joined rows before collapsing — the quadratic-per-key poison (a
BroadcastNestedLoopJoin or skewed sort-merge at scale). The scale-safe
rewrite used here is the classic tag-union + forward-fill:

  1. union both sides into one frame tagged ``_side`` (right = 0, left = 1);
  2. ONE window over (keys) ordered by (ts, _side, order_col):
     ``last(payload, ignorenulls=True)`` with rows unbounded-preceding →
     current forward-fills each right payload onto every later row;
  3. keep the left rows.

Cost: one shuffle on the keys and a per-key sort — linear in |L| + |R|,
skew-bounded by the largest key group (the same bound any per-key window
has), no pair materialization. Ties: a right row AT the left row's exact ts
is visible (at-or-before semantics — ``_side`` orders right rows first);
among right rows sharing a ts the largest ``order_col`` wins, making the
result deterministic when (keys, ts) is not unique.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    suffix: str = "_asof",
    order_col: str | None = None,
) -> DataFrame:
    """For each left row, the latest right payload at-or-before its timestamp.

    Returns ``left``'s columns plus ``<payload>{suffix}`` for every payload
    column (NULL when no right row precedes the left row). ``order_col``
    breaks ties among right rows sharing (keys, ts) — required for a
    deterministic result when right timestamps can collide; it must exist on
    both sides (pass None only when (keys, right_ts) is unique).
    """
    aliases = {c: f"{c}{suffix}" for c in payload_cols}
    rfields = {f.name: f.dataType for f in right.schema.fields}

    order_cols = [order_col] if order_col else []
    l2 = left.select(
        *left.columns,
        F.col(left_ts).alias("_ats"),
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(rfields[c]).alias(a) for c, a in aliases.items()],
    )
    lfields = {f.name: f for f in left.schema.fields}
    passthrough = set(keys) | set(order_cols)
    r2 = right.select(
        *[
            (F.col(c) if c in passthrough else F.lit(None).cast(lfields[c].dataType)).alias(c)
            for c in left.columns
        ],
        F.col(right_ts).alias("_ats"),
        F.lit(0).alias("_side"),
        *[F.col(c).alias(a) for c, a in aliases.items()],
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy("_ats", "_side", *order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = l2.unionByName(r2).select(
        *left.columns,
        "_side",
        *[F.last(a, ignorenulls=True).over(w).alias(a) for a in aliases.values()],
    )
    return filled.where(F.col("_side") == 1).drop("_side")


def sessionize(
    events: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    order_col: str | None = None,
) -> DataFrame:
    """Gap-based batch sessionization: assign each event a per-key
    ``session_idx`` (1-based) that increments whenever the gap to the
    previous event STRICTLY exceeds ``gap_seconds`` — the batch twin of the
    stateful streaming sessionizer (streaming.sessionize_conversations),
    sharing its quiescence rule.

    ONE window pass (lag + running sum over the same (keys, ts, order)
    ordering — one shuffle, one sort; Spark plans both functions in a single
    Window node). ``order_col`` breaks exact-timestamp ties deterministically.
    Timestamps are compared in epoch seconds after an explicit cast (parquet
    TIMESTAMP_NTZ-safe).
    """
    order_cols = [order_col] if order_col else []
    w = Window.partitionBy(*keys).orderBy(ts_col, *order_cols)
    epoch = F.unix_timestamp(F.col(ts_col).cast("timestamp"))
    prev = F.lag(epoch).over(w)
    brk = F.when(prev.isNull() | (epoch - prev > gap_seconds), 1).otherwise(0)
    run = (
        Window.partitionBy(*keys)
        .orderBy(ts_col, *order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return events.withColumn("session_idx", F.sum(brk).over(run).cast("int"))
