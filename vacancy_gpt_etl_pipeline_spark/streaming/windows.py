"""Event-time windowed aggregation (extension surface; SURVEY.md §2.9).

The helpers work on BATCH and STREAMING DataFrames alike (``F.window`` /
``F.session_window`` are event-time operators, not streaming-only) — the
correctness oracles run them in batch mode; streaming tests add watermarks.

Scale: windowed aggregation shuffles on (window, keys); tumbling windows
give perfect partition pruning on the window start when the sink is
partitioned by it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_window_agg(
    df: DataFrame,
    ts_col: str = "ts",
    duration: str = "1 hour",
    group_cols: list[str] | None = None,
    value_col: str = "value",
    watermark: str | None = None,
) -> DataFrame:
    if watermark:
        df = df.withWatermark(ts_col, watermark)
    keys = [F.window(ts_col, duration).alias("w")] + [
        F.col(c) for c in (group_cols or [])
    ]
    # decimal-cast sum: exact + order-independent (double sums are neither)
    dsum = F.sum(F.col(value_col).cast("decimal(12,2)")).cast("double")
    return (
        df.groupBy(*keys)
        .agg(
            F.count("*").alias("n_events"),
            dsum.alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            *(group_cols or []),
            "n_events",
            "sum_value",
        )
    )


def sliding_window_agg(
    df: DataFrame,
    ts_col: str = "ts",
    duration: str = "1 hour",
    slide: str = "30 minutes",
    value_col: str = "value",
    watermark: str | None = None,
) -> DataFrame:
    if watermark:
        df = df.withWatermark(ts_col, watermark)
    dsum = F.sum(F.col(value_col).cast("decimal(12,2)")).cast("double")
    return (
        df.groupBy(F.window(ts_col, duration, slide).alias("w"))
        .agg(F.count("*").alias("n_events"), dsum.alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "n_events", "sum_value")
    )


def session_window_agg(
    df: DataFrame,
    ts_col: str = "ts",
    gap: str = "30 minutes",
    group_cols: list[str] | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """Session windows: events within ``gap`` of each other merge into one
    session per group key."""
    if watermark:
        df = df.withWatermark(ts_col, watermark)
    keys = [F.session_window(ts_col, gap).alias("w")] + [
        F.col(c) for c in (group_cols or [])
    ]
    return (
        df.groupBy(*keys)
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            *(group_cols or []),
            "n_events",
        )
    )
