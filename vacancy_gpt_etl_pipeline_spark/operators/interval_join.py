"""Bucketed interval (range) join — points into [start, end) intervals.

Spark has no native range-join optimization: a raw
``points.join(intervals, (p >= start) & (p < end))`` plans as a
BroadcastNestedLoopJoin (small side) or a cartesian product — O(n·m)
comparisons, the classic scale-killer for temporal containment joins
(event-into-session, reading-into-validity-window, variant-into-region).

The standard fix, expressed as a DataFrame composition: quantize the value
domain into fixed-width buckets. Points land in exactly one bucket;
intervals EXPLODE into every bucket they overlap. An equi-join on
(eq keys…, bucket) plus the residual containment predicate then does the
work as a plain shuffled hash join: each matching (point, interval) pair
meets in exactly ONE bucket — the point's — so the join needs no
post-dedup, and comparisons are confined to co-bucketed rows instead of
the full cross product. This is the same plan shape Databricks' range-join
hint produces, built from public primitives (sequence + explode + join).

Scale notes (100 TB):
- Shuffle volume: points ship once; intervals ship once per overlapped
  bucket (ceil(span/width) + 1 copies). Pick ``bucket_width`` near the
  TYPICAL interval span so most intervals copy ~2×.
- Skew: a pathologically long interval fans out into span/width buckets.
  ``max_buckets_per_interval`` caps the fan-out (default 1024) and raises
  at runtime if exceeded — silently clamping would drop matches, and a
  10⁶-bucket interval means the width is mis-chosen for the data.
- The residual predicate evaluates map-side inside the join stage; only
  true containment survives to downstream operators.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _epoch_seconds(col: Column, dtype: str) -> Column:
    """Column → fractional epoch seconds, one quantizer input for temporal
    and numeric domains. TIMESTAMP_NTZ has no direct numeric cast in
    Spark 4 and a cast through TIMESTAMP would be session-timezone
    dependent (non-monotonic across DST), so it diffs against the NTZ
    epoch in microseconds — pure wall-clock arithmetic, tz-free."""
    if dtype == "timestamp_ntz":
        return F.timestamp_diff(
            "MICROSECOND", F.to_timestamp_ntz(F.lit("1970-01-01 00:00:00")), col
        ) / F.lit(1_000_000.0)
    if dtype == "date":
        return F.unix_date(col) * F.lit(86400.0)
    return col.cast("double")


def _bucket(col: Column, dtype: str, width: float) -> Column:
    return F.floor(_epoch_seconds(col, dtype) / F.lit(float(width))).cast("long")


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    on: list[str] | None = None,
    bucket_width: float = 3600.0,
    max_buckets_per_interval: int = 1024,
) -> DataFrame:
    """Inner-join ``points`` rows into containing ``[start, end)`` intervals.

    Returns one row per (point, containing interval) pair with the columns
    of both inputs (shared ``on`` key columns appear once). A point inside
    two overlapping intervals yields two rows — true range-join semantics.
    Containment is half-open: ``start <= point < end``.

    ``on``: optional equality keys joined alongside the bucket (e.g.
    ``["user_id"]``) — they shrink both the shuffle hash space and the
    residual work, so always pass them when the data model has them.
    """
    on = on or []
    p_types = dict(points.dtypes)
    i_types = dict(intervals.dtypes)
    pb = points.withColumn(
        "_bkt", _bucket(F.col(point_col), p_types[point_col], bucket_width)
    )
    guard = F.when(
        F.col("_nbkt") > max_buckets_per_interval,
        F.raise_error(
            F.concat(
                F.lit(
                    f"interval spans more than {max_buckets_per_interval} "
                    f"buckets of width {bucket_width}; raise bucket_width "
                    "or split the interval: "
                ),
                F.col("_nbkt").cast("string"),
            )
        ),
    ).otherwise(F.col("_nbkt"))
    ib = (
        intervals.withColumn(
            "_b0", _bucket(F.col(start_col), i_types[start_col], bucket_width)
        )
        # end is exclusive, but a point in end's bucket can still precede
        # it — the interval must cover that bucket too
        .withColumn(
            "_b1", _bucket(F.col(end_col), i_types[end_col], bucket_width)
        )
        .withColumn("_nbkt", F.col("_b1") - F.col("_b0") + 1)
        # the guarded count feeds the sequence bound so column pruning
        # can't elide the raise_error check (a dead guard column would)
        .withColumn("_nbkt", guard)
        .withColumn("_bkt", F.explode(F.expr("sequence(_b0, _b0 + _nbkt - 1)")))
        .drop("_b0", "_b1", "_nbkt")
    )
    cond = [F.col(f"p.{k}") == F.col(f"i.{k}") for k in on]
    cond.append(F.col("p._bkt") == F.col("i._bkt"))
    cond.append(F.col(f"p.{point_col}") >= F.col(f"i.{start_col}"))
    cond.append(F.col(f"p.{point_col}") < F.col(f"i.{end_col}"))
    joined = pb.alias("p").join(ib.alias("i"), cond, "inner")
    keep = [F.col(f"p.{c}") for c in points.columns] + [
        F.col(f"i.{c}") for c in intervals.columns if c not in on
    ]
    return joined.select(*keep)
