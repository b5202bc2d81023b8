"""skyline2d (operators/skyline): hand-checked Pareto sets, tie and
duplicate semantics, degenerate spans, and bucketing invariance."""

from __future__ import annotations

from pyspark.sql import Row

from vacancy_gpt_etl_pipeline_spark.operators.skyline import skyline2d


def _sky(spark, pts, buckets=64):
    df = spark.createDataFrame([Row(i=i, x=float(x), y=float(y)) for i, (x, y) in enumerate(pts)])
    return sorted((r["x"], r["y"]) for r in skyline2d(df, "x", "y", buckets=buckets).collect())


def test_staircase_skyline(spark):
    # staircase (1,5),(2,4),(3,3) is Pareto; (2,5),(3,4) are dominated
    pts = [(1, 5), (2, 4), (3, 3), (2, 5), (3, 4)]
    assert _sky(spark, pts) == [(1.0, 5.0), (2.0, 4.0), (3.0, 3.0)]


def test_equal_coordinate_ties(spark):
    # (1,5) dominates (2,5) (equal y, larger x) and (1,6); (1,5) stays
    pts = [(1, 5), (2, 5), (1, 6)]
    assert _sky(spark, pts) == [(1.0, 5.0)]


def test_duplicates_survive_together(spark):
    # identical points do not dominate each other: both rows come back
    df = spark.createDataFrame(
        [Row(i=1, x=1.0, y=1.0), Row(i=2, x=1.0, y=1.0), Row(i=3, x=2.0, y=2.0)]
    )
    out = skyline2d(df, "x", "y").collect()
    assert sorted(r["i"] for r in out) == [1, 2]


def test_constant_x_degenerate_span(spark):
    # all x equal: skyline is the min-y point(s) only; no 0-width crash
    pts = [(7, 3), (7, 5), (7, 9)]
    assert _sky(spark, pts) == [(7.0, 3.0)]


def test_bucketing_invariance(spark):
    # result must not depend on bucket count (cross-bucket pruning)
    import random

    rng = random.Random(17)
    pts = [(rng.randint(0, 1000), rng.randint(0, 1000)) for _ in range(400)]
    a = _sky(spark, pts, buckets=1)
    b = _sky(spark, pts, buckets=7)
    c = _sky(spark, pts, buckets=64)
    assert a == b == c and len(a) >= 1
