"""Cohort retention — the longitudinal event-analytics primitive.

Buckets users by the week of their FIRST event (the cohort) and, for each
cohort × weeks-since-first, counts how many of them came back. The output
is the classic retention triangle: ``(cohort_week, week_offset,
active_users, cohort_size, retention_pct)``.

Extension beyond the reference surface (its analytics stop at the two
vacancy SQL reports): retention is the canonical follow-up question to
sessionization/funnels over the same events table, and at training-data
scale the identical shape answers "how much of last month's crawl is
still present in this month's snapshot" (cohort = first-seen batch).

Scale shape (100 TB of events):
- first-seen is ONE map-side-combined ``min(ts)`` aggregate on the user
  key — the only pass over raw events that shuffles full rows;
- events join back to their cohort on the SAME user key (hash-partitioned
  equi-join; no broadcast assumption — user cardinality grows with the
  data);
- the (cohort, offset, user) distinct + count collapses to two map-side
  combined aggregates over already-narrow rows;
- cohort sizes come from the first-seen frame (already one row per user —
  no second pass over events) and broadcast into the triangle, which has
  at most |weeks|² rows.

Weeks use ``date_trunc('WEEK')`` (ISO Monday start in both Spark and
DuckDB) so the offset arithmetic is exact integer days/7 — no timezone
or rounding hazard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def first_seen_cohorts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-user first-seen-week cohort frame ``(u, cohort_week)`` — the
    shared cohort definition for the retention triangle and its LTV
    twin. User-cardinality: this frame grows with the data and must be
    HASH-joined, never broadcast (the scale invariant both callers
    follow)."""
    return events.groupBy(F.col(user_col).alias("u")).agg(
        F.date_trunc("WEEK", F.min(ts_col)).cast("date").alias("cohort_week")
    )


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    first = first_seen_cohorts(events, user_col, ts_col)
    activity = events.select(
        F.col(user_col).alias("u"),
        F.date_trunc("WEEK", F.col(ts_col)).cast("date").alias("week"),
    ).distinct()
    # (u, week) is already distinct and week ↦ offset is injective per
    # user, so the triangle groupBy counts distinct users without a
    # second distinct pass. Monday-to-Monday diffs are exact multiples
    # of 7, so the division is exact in both engines.
    triangle = (
        activity.join(first, "u")
        .select(
            "cohort_week",
            (F.datediff("week", "cohort_week") / F.lit(7))
            .cast("int")
            .alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).alias("active_users"))
    )
    sizes = first.groupBy("cohort_week").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    return (
        triangle.join(F.broadcast(sizes), "cohort_week")
        .select(
            "cohort_week",
            "week_offset",
            "active_users",
            "cohort_size",
            # plain IEEE multiply+divide — bit-identical in any engine,
            # so NO rounding needed (rounding is only for libm-vs-JVM
            # transcendentals; here it would ADD a half-way hazard)
            (F.col("active_users") * F.lit(100.0) / F.col("cohort_size")).alias(
                "retention_pct"
            ),
        )
        .orderBy("cohort_week", "week_offset")
    )
