"""Trajectory similarity via reference-point signatures (the REPOSE
ICDE'21 idea from PAPERS.md, re-expressed Spark-first).

Variable-length trajectories (a user's (time, value) event sequence)
cannot feed a vectorized similarity tier directly, and pairwise DTW /
Fréchet is O(len²) per pair — hopeless across 10⁹ users. REPOSE's move:
summarize every trajectory against a small shared set of REFERENCE
POINTS; trajectories close under the summary are candidates for the
expensive measure. Here the signature is, per reference point, the
minimum squared distance from the trajectory to that point in the
normalized (time, value) unit square — a fixed-width vector that drops
straight into the existing ANN tier (knn_brute_force / knn_lsh / IVF).

Determinism: the signature is division + multiply + MIN — min over
doubles is ORDER-FREE (unlike sum), so the whole build hash-matches any
engine with no rounding. Scale shape: one 1-row min/max broadcast, one
map-side distance projection per reference point (the reference grid is
a literal — nothing joins), one aggregate per user. The per-user frame
is user-count-sized, never event-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["REF_GRID", "trajectory_signatures"]

# fixed 4×2 grid over the normalized (time, value) unit square — shared
# verbatim with the SQL oracle
REF_GRID: list[tuple[float, float]] = [
    (x / 3.0, float(y)) for y in (0, 1) for x in range(4)
]


def trajectory_signatures(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Per-user fixed-width signature: ``(user_id, signature
    array<double>[8])`` where slot i holds min squared distance to
    reference point i in the normalized (epoch-seconds, value) square."""
    epoch_sec = F.timestamp_diff(
        "SECOND",
        F.to_timestamp_ntz(F.lit("1970-01-01 00:00:00")),
        F.col(ts_col),
    )
    pts = events.select(
        F.col(user_col).alias("user_id"),
        epoch_sec.cast("double").alias("_t"),
        F.col(value_col).cast("double").alias("_v"),
    )
    span = pts.agg(
        F.min("_t").alias("_t0"),
        F.max("_t").alias("_t1"),
        F.min("_v").alias("_v0"),
        F.max("_v").alias("_v1"),
    )
    # a zero-width global span (all-equal times or values) would make
    # the normalization 0/0 = NaN in every slot; degenerate axes pin to
    # the square's center instead (same CASE in the SQL oracle)
    d = F.when(
        F.col("_t1") > F.col("_t0"),
        (F.col("_t") - F.col("_t0")) / (F.col("_t1") - F.col("_t0")),
    ).otherwise(F.lit(0.5))
    v = F.when(
        F.col("_v1") > F.col("_v0"),
        (F.col("_v") - F.col("_v0")) / (F.col("_v1") - F.col("_v0")),
    ).otherwise(F.lit(0.5))
    norm = pts.join(F.broadcast(span)).select(
        "user_id", d.alias("_d"), v.alias("_nv")
    )
    mins = [
        F.min(
            (F.col("_d") - F.lit(rx)) * (F.col("_d") - F.lit(rx))
            + (F.col("_nv") - F.lit(ry)) * (F.col("_nv") - F.lit(ry))
        ).alias(f"_s{i}")
        for i, (rx, ry) in enumerate(REF_GRID)
    ]
    per_user = norm.groupBy("user_id").agg(*mins)
    return per_user.select(
        "user_id",
        F.array(*[F.col(f"_s{i}") for i in range(len(REF_GRID))]).alias(
            "signature"
        ),
    )
