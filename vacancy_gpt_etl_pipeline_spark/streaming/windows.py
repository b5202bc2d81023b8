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


def windowed_cms_agg(
    df: DataFrame,
    key_col: str,
    ts_col: str = "ts",
    duration: str = "1 day",
    depth: int = 4,
    width: int = 256,
    watermark: str | None = None,
) -> DataFrame:
    """Per-window count-min sketch maintenance: (window_start, row,
    bucket, counter) — the streaming companion of
    operators/sketches.cms_build. Works on batch and streaming frames
    alike (the oracle runs it in batch; streaming adds a watermark and
    emits each window's sketch once it closes).

    This is the sketch-table pattern (operators/sketches.py docstring)
    applied to frequencies on a stream: the sink holds ≤ depth×width
    rows PER WINDOW regardless of event volume, heavy-hitter questions
    replay cms_estimate against stored sketches, and window sketches
    merge (cms_merge groups away window_start) to any coarser range —
    so "top users last quarter" never rescans raw events. The depth
    expansion is a map-side explode; the one shuffle groups on
    (window, row, bucket), which map-side combines to the sketch size.
    """
    from vacancy_gpt_etl_pipeline_spark.operators.sketches import _cms_bucket

    if watermark:
        df = df.withWatermark(ts_col, watermark)
    k = F.col(key_col)
    rows = F.array(*[
        F.struct(
            F.lit(r).alias("row"), _cms_bucket(k, r, width).alias("bucket")
        )
        for r in range(depth)
    ])
    return (
        df.select(F.window(ts_col, duration).alias("w"), F.explode(rows).alias("rb"))
        .groupBy(
            "w", F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("counter"))
        .select(F.col("w.start").alias("window_start"), "row", "bucket", "counter")
    )
