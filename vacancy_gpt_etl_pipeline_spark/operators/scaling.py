"""Per-group feature scaling: min-max, z-score, and percentile rank in
one pass — the numeric normalization block of a feature-prep pipeline.

Cross-engine determinism (the hard part of z-scores): a naive
``stddev_pop`` sums doubles in partition order, which no two engines —
or two RUNS — agree on. Here the first and second moments are EXACT
decimal sums (2-decimal inputs square to 4-decimal products, both sum
exactly), cast to double only once at the end; mean/variance are then
derived with the identical IEEE expression in Spark and the oracle, and
sqrt is correctly rounded by spec. Percentile rank is pure rank
arithmetic ``(rank−1)/(n−1)``. Every output double is bit-identical.

Scale shape: ONE aggregate for the moments (group-count-sized, broadcast
back) + ONE per-group window sort for the rank — the same irreducible
sort exact quantiles need. All projections are codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["feature_scale"]


def feature_scale(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    decimal_scale: int = 2,
) -> DataFrame:
    """Add ``minmax_scaled``, ``z_score`` (population), and ``pct_rank``
    for ``value_col`` within each group. Degenerate groups are NULL-safe:
    constant groups yield NULL minmax/z (never 0/0), single rows yield
    pct_rank 0.

    ``decimal_scale`` is the fixed-point precision the z-score moments
    are summed at (the price of order-independent exact sums — see the
    module docstring): inputs with MORE fractional digits than this are
    rounded inside the mean/variance while ``minmax_scaled`` and
    ``pct_rank`` always use the raw values. The default (2) fits
    currency-like columns. The moments sum at decimal(18, scale) so
    the squared terms stay exactly representable (precision 37 ≤ 38),
    which bounds |value| < 10^(18 − scale) — raising the scale trades
    magnitude headroom for fractional precision."""
    if not 0 <= decimal_scale <= 12:
        raise ValueError(
            f"decimal_scale must be in [0, 12], got {decimal_scale}"
        )
    v = F.col(value_col)
    dec = v.cast(f"decimal(18,{decimal_scale})")
    stats = df.groupBy(*group_cols).agg(
        F.min(v).alias("_mn"),
        F.max(v).alias("_mx"),
        F.count(F.lit(1)).alias("_n"),
        F.sum(dec).cast("double").alias("_s1"),
        F.sum(dec * dec).cast("double").alias("_s2"),
    )
    w = Window.partitionBy(*group_cols).orderBy(value_col)
    n_d = F.col("_n").cast("double")
    mean = F.col("_s1") / n_d
    var = F.greatest(F.col("_s2") / n_d - mean * mean, F.lit(0.0))
    std = F.sqrt(var)
    out = (
        df.join(F.broadcast(stats), group_cols)
        .withColumn(
            "minmax_scaled",
            F.when(
                F.col("_mx") > F.col("_mn"),
                (v - F.col("_mn")) / (F.col("_mx") - F.col("_mn")),
            ),
        )
        .withColumn("z_score", F.when(std > 0.0, (v - mean) / std))
        .withColumn("pct_rank", F.percent_rank().over(w))
    )
    return out.drop("_mn", "_mx", "_n", "_s1", "_s2")
