"""Distributed 2-D skyline (Pareto-optimal set), minimize-both-dims.

The multi-criteria shortlist operator ("cheapest AND smallest"): a row
survives iff no other row is ≤ in both dimensions and < in at least one.
Pattern follows the Spark-SQL skyline integration literature (EDBT 2023,
PAPERS.md): a sort-based sweep, distributed by range-bucketing the first
dimension.

Why this scales where the textbook nested-loop doesn't: domination
checks are O(n²) as a self-join, but after sorting by (x, y) a point is
dominated iff some strict predecessor has a smaller-or-equal y — a
running minimum. Distributing that sweep:

- x is range-bucketed (broadcast 1-row min/max span, B buckets), so each
  bucket's sweep is an independent partitioned window — no global sort,
  no single-partition window.
- Cross-bucket domination needs only each bucket's MIN(y): a B-row frame
  whose prefix-minimum is computed in one tiny window and broadcast
  back. A point survives iff y beats BOTH its in-bucket strict-
  predecessor minimum AND every earlier bucket's minimum.
- Earlier buckets hold strictly smaller x by construction (equal x
  always lands in the same bucket), so the strictness of domination is
  preserved exactly.

Duplicates: identical (x, y) points do not dominate each other (no
strict inequality), so ALL duplicate rows survive together — the sweep
runs on the distinct point set and the original rows semi-join back.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["skyline2d"]


def skyline2d(
    df: DataFrame, x_col: str, y_col: str, buckets: int = 64
) -> DataFrame:
    """Rows of ``df`` not strictly dominated under (minimize ``x_col``,
    minimize ``y_col``)."""
    x, y = F.col(x_col), F.col(y_col)
    span = df.agg(F.min(x).alias("_mn"), F.max(x).alias("_mx"))
    width = (F.col("_mx") - F.col("_mn")) / F.lit(float(buckets))
    bucket = F.when(
        F.col("_mx") > F.col("_mn"),
        F.least(F.floor((x - F.col("_mn")) / width), F.lit(buckets - 1)),
    ).otherwise(F.lit(0)).cast("int")

    pts = (
        df.select(x_col, y_col)
        .distinct()
        .join(F.broadcast(span))
        .withColumn("_b", bucket)
        .drop("_mn", "_mx")
    )
    w_local = (
        Window.partitionBy("_b")
        .orderBy(x_col, y_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    pts = pts.withColumn("_lmin", F.min(y).over(w_local))

    bucket_mins = pts.groupBy("_b").agg(F.min(y).alias("_bmin"))
    w_prefix = (
        Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
    )
    prefix = bucket_mins.select(
        "_b", F.min("_bmin").over(w_prefix).alias("_pmin")
    )

    strict_min = F.least("_lmin", "_pmin")  # least() skips NULLs
    sky = (
        pts.join(F.broadcast(prefix), "_b")
        .where(strict_min.isNull() | (y < strict_min))
        .select(x_col, y_col)
    )
    return df.join(F.broadcast(sky), [x_col, y_col], "left_semi")
