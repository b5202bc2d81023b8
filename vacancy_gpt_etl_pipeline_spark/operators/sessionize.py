"""Batch gap-based sessionization — the event-analytics primitive.

Assigns a session id to every event: a new session starts whenever the gap
to the user's previous event exceeds ``gap_seconds``. The classic
lag → boundary-flag → running-sum window composition:

    lag(ts)  over (user ORDER BY ts)      -- previous event time
    flag = (ts - prev > gap) or first row -- session boundary
    session_seq = sum(flag) over (user ORDER BY ts rows unbounded preceding)

Scale shape (100 TB): ONE shuffle, on the entity key. Both window passes
and the optional per-session aggregation share the same
``partitionBy(user)`` clustering, so Catalyst plans a single Exchange and
runs lag + running-sum + groupBy(user, session_seq) in the already-sorted
partitions (the groupBy keys are a superset of the window partition key —
no second shuffle). Per-user event counts are bounded in practice
(human-scale activity), so no salting is needed; a pathological bot user
is still one partition's worth of sorted scan, not a cross product.

This is the BATCH twin of streaming/windows.session_windows (Spark's
native ``session_window`` aggregation): identical gap semantics, but it
labels every EVENT with its session, which the streaming aggregate cannot
(it only emits per-session aggregates). Downstream joins (attribution,
funnel-within-session) need the per-event labels.

Timestamps: diffs use ``timestamp_diff(MICROSECOND, …)`` — exact
wall-clock arithmetic that works for TIMESTAMP and TIMESTAMP_NTZ alike
(NTZ has no numeric cast in Spark 4, and a cast through LTZ would be
session-timezone dependent).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _gap_seconds(cur: Column, prev: Column) -> Column:
    return F.timestamp_diff("MICROSECOND", prev, cur) / F.lit(1_000_000.0)


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: float = 1800.0,
    session_col: str = "session_seq",
) -> DataFrame:
    """Label every row with a per-user session sequence number (1-based).

    Ties on ``ts`` within a user sort stably by the remaining columns'
    order only if the caller pre-sorts; the boundary test itself is
    order-insensitive for ties (gap 0 never opens a session), so equal
    timestamps always land in the same session regardless of tie order —
    the labeling is deterministic even though the sort is not total.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col)
    prev = F.lag(ts_col).over(w)
    boundary = F.when(prev.isNull(), F.lit(1)).otherwise(
        (_gap_seconds(F.col(ts_col), prev) > F.lit(float(gap_seconds))).cast(
            "int"
        )
    )
    running = Window.partitionBy(user_col).orderBy(ts_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn(session_col, F.sum(boundary).over(running))


def session_summary(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: float = 1800.0,
    agg_cols: dict[str, Column] | None = None,
) -> DataFrame:
    """Per-session rollup: start/end/duration/event count (+ caller aggs).

    Runs :func:`sessionize` then groups by (user, session_seq). The groupBy
    keys extend the window partitioning key, so AQE coalesces this into the
    same exchange — one shuffle end-to-end.
    """
    labeled = sessionize(df, user_col, ts_col, gap_seconds)
    aggs = [
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        F.round(
            _gap_seconds(F.max(ts_col), F.min(ts_col)), 6
        ).alias("duration_sec"),
    ]
    for name, expr in (agg_cols or {}).items():
        aggs.append(expr.alias(name))
    return labeled.groupBy(user_col, "session_seq").agg(*aggs)
