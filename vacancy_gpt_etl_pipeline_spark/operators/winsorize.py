"""Exact per-group winsorization: clip a numeric column at exact
quantile bounds (default p01/p99) computed per group.

Outlier clipping is the standard robustness pass before scaling or
aggregating crawl-derived numeric features (prices, durations, scores).
Extension beyond the reference, which never aggregates anything more
robust than AVG (SURVEY §2.4 A5).

Determinism: the bounds deliberately do NOT use engine-native
percentile/quantile_cont — engines disagree on interpolation details and
result types. Both this operator and its SQL oracle derive the bound from
first principles with the same IEEE expression: rank r = 1+(n−1)·q,
bound = v⌊r⌋ + (r−⌊r⌋)·(v⌈r⌉ − v⌊r⌋) over row_number-ranked values.
Every term is the same double arithmetic in both engines, so the bound —
and therefore every clipped value — is bit-identical.

Scale shape:
- ONE per-group sort (the window) — the irreducible cost of EXACT
  quantiles; the mergeable GK sketch (operators/sketches.gk_quantiles)
  is the approximate path when a full sort is too expensive.
- Bound extraction rides the same window pass as the ranking (an
  aggregate of two flagged rows per quantile), so no second sort.
- The bounds frame is group-count-sized and broadcasts back; clipping
  is a codegen least/greatest projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["mad_outliers", "winsorize"]


def _bound(rn: str, v: str, n: str, q: float) -> F.Column:
    """Interpolated exact quantile over row_number-ranked values."""
    r = F.lit(1.0) + (F.col(n) - F.lit(1)).cast("double") * F.lit(q)
    lo, hi = F.floor(r), F.ceil(r)
    v_lo = F.min(F.when(F.col(rn) == lo, F.col(v)))
    v_hi = F.min(F.when(F.col(rn) == hi, F.col(v)))
    frac = F.min(r - lo.cast("double"))
    return v_lo + frac * (v_hi - v_lo)


def _ranked(valued: DataFrame, group_cols: list[str], order_col: str) -> DataFrame:
    """``valued`` plus ``_rn`` (1-based rank by ``order_col``) and ``_n``
    (group size) — a per-group window when grouped; when ``group_cols``
    is EMPTY the rank comes from the distributed ranking tier
    (operators/ranking) and the size from a 1-row broadcast, because an
    unpartitioned ``Window.orderBy`` would collapse the whole frame
    onto one task. Ties in ``order_col`` may rank in either order —
    harmless for quantile bounds, since tied rows carry equal values by
    definition. Skew note: a single massively-hot value cannot be split
    across range partitions (no tie-break column here), so its rows
    share one partition — still strictly better than the one-task
    global window, which put EVERY row there."""
    if group_cols:
        w = Window.partitionBy(*group_cols).orderBy(order_col)
        return valued.withColumn("_rn", F.row_number().over(w)).withColumn(
            "_n", F.count(F.lit(1)).over(Window.partitionBy(*group_cols))
        )
    from vacancy_gpt_etl_pipeline_spark.operators.ranking import (
        with_global_row_number,
    )

    ranked = with_global_row_number(valued, [F.asc(order_col)], "_rn")
    n = valued.agg(F.count(F.lit(1)).alias("_n"))
    return ranked.crossJoin(F.broadcast(n))


def _join_bounds(
    valued: DataFrame, bounds: DataFrame, group_cols: list[str]
) -> DataFrame:
    """Grouped: broadcast equi-join; global: the bounds frame is ONE row."""
    if group_cols:
        return valued.join(F.broadcast(bounds), group_cols)
    return valued.crossJoin(F.broadcast(bounds))


def winsorize(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    lower: float = 0.01,
    upper: float = 0.99,
) -> DataFrame:
    """Return ``df`` plus ``<value_col>_clipped``, ``q_lower``,
    ``q_upper`` — the input clipped to the exact per-group
    [lower, upper] quantile band.

    NULL handling: NULL values in ``value_col`` are excluded from the
    quantile ranking (Spark would otherwise sort them FIRST and shift
    every rank position, yielding NULL bounds) and from the output —
    as are rows whose group key is NULL, which the equi-join back
    drops. Pre-filter/impute upstream if those rows must survive.

    An EMPTY ``group_cols`` is the whole-frame quantile band: the rank
    then routes through the distributed ranking tier instead of an
    unpartitioned (single-task) window — see :func:`_ranked`."""
    valued = df.where(F.col(value_col).isNotNull())
    ranked = _ranked(valued, group_cols, value_col)
    bounds = ranked.groupBy(*group_cols).agg(
        _bound("_rn", value_col, "_n", lower).alias("q_lower"),
        _bound("_rn", value_col, "_n", upper).alias("q_upper"),
    )
    clipped = F.least(
        F.greatest(F.col(value_col), F.col("q_lower")), F.col("q_upper")
    )
    return (
        _join_bounds(valued, bounds, group_cols)
        .withColumn(f"{value_col}_clipped", clipped)
    )


def mad_outliers(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    k: float = 3.0,
) -> DataFrame:
    """Robust per-group outlier flags via Median Absolute Deviation:
    ``is_outlier ⇔ |x − median| > k·MAD``. The robust alternative to
    z-scores — mean/stddev are themselves dragged by the outliers they
    are supposed to find, while median and MAD have a 50% breakdown
    point.

    Both the median and the MAD are EXACT interpolated quantiles using
    the same first-principles rank expression as :func:`winsorize`, so
    every derived double is bit-identical across engines. Adds
    ``median``, ``abs_dev``, ``mad``, ``is_outlier``.

    NULL handling matches :func:`winsorize`: NULL values are excluded
    from ranking and output (they would rank first and shift the
    median), and NULL-keyed groups drop at the equi-join back.

    An EMPTY ``group_cols`` computes the whole-frame median/MAD through
    the distributed ranking tier (no single-task window).

    Scale shape: two per-group window sorts (values, then deviations) —
    exact medians cannot do better; each produces a group-count-sized
    frame that broadcasts back. All projections are codegen.
    """
    valued = df.where(F.col(value_col).isNotNull())
    ranked = _ranked(valued, group_cols, value_col)
    med = ranked.groupBy(*group_cols).agg(
        _bound("_rn", value_col, "_n", 0.5).alias("median")
    )
    with_dev = _join_bounds(valued, med, group_cols).withColumn(
        "abs_dev", F.abs(F.col(value_col) - F.col("median"))
    )
    ranked_dev = _ranked(with_dev, group_cols, "abs_dev")
    mad = ranked_dev.groupBy(*group_cols).agg(
        _bound("_rn", "abs_dev", "_n", 0.5).alias("mad")
    )
    return _join_bounds(with_dev, mad, group_cols).withColumn(
        "is_outlier", F.col("abs_dev") > F.lit(k) * F.col("mad")
    )
