"""Bucketed interval join: semantics parity with the naive non-equi join,
boundary rules, overlap duplication, and the plan-shape claim (no
nested-loop / cartesian fallback)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

from vacancy_gpt_etl_pipeline_spark.operators.interval_join import interval_join


@pytest.fixture(scope="module")
def frames(spark):
    points = spark.createDataFrame(
        [(i, i % 3, float(i)) for i in range(100)],
        "pid long, k long, v double",
    )
    # overlapping, varied-span intervals per key
    intervals = spark.createDataFrame(
        [
            (iid, iid % 3, float(lo), float(lo + span))
            for iid, (lo, span) in enumerate(
                [(0, 10), (5, 10), (5, 50), (90, 5), (200, 10), (-20, 15)]
            )
        ],
        "iid long, k long, lo double, hi double",
    )
    return points, intervals


def _naive(points, intervals):
    return (
        points.alias("p")
        .join(
            intervals.alias("i"),
            (F.col("p.k") == F.col("i.k"))
            & (F.col("p.v") >= F.col("i.lo"))
            & (F.col("p.v") < F.col("i.hi")),
        )
        .select("p.pid", "i.iid")
    )


@pytest.mark.parametrize("width", [0.5, 3.0, 7.0, 1000.0])
def test_parity_with_naive_join_any_bucket_width(spark, frames, width):
    points, intervals = frames
    got = {
        (r["pid"], r["iid"])
        for r in interval_join(
            points, intervals, "v", "lo", "hi", on=["k"], bucket_width=width
        )
        .select("pid", "iid")
        .collect()
    }
    want = {(r["pid"], r["iid"]) for r in _naive(points, intervals).collect()}
    assert got == want and len(want) > 0


def test_half_open_boundaries(spark):
    points = spark.createDataFrame(
        [(1, 10.0), (2, 19.999), (3, 20.0)], "pid long, v double"
    )
    intervals = spark.createDataFrame([(7, 10.0, 20.0)], "iid long, lo double, hi double")
    got = {
        r["pid"]
        for r in interval_join(
            points, intervals, "v", "lo", "hi", bucket_width=5.0
        ).collect()
    }
    assert got == {1, 2}  # start inclusive, end exclusive


def test_point_in_overlapping_intervals_duplicates(spark):
    points = spark.createDataFrame([(1, 7.0)], "pid long, v double")
    intervals = spark.createDataFrame(
        [(1, 0.0, 10.0), (2, 5.0, 9.0)], "iid long, lo double, hi double"
    )
    rows = interval_join(points, intervals, "v", "lo", "hi", bucket_width=2.0).collect()
    assert sorted(r["iid"] for r in rows) == [1, 2]


def test_eq_keys_prevent_cross_key_matches(spark):
    points = spark.createDataFrame([(1, 0, 5.0)], "pid long, k long, v double")
    intervals = spark.createDataFrame(
        [(1, 0, 0.0, 10.0), (2, 1, 0.0, 10.0)], "iid long, k long, lo double, hi double"
    )
    rows = interval_join(
        points, intervals, "v", "lo", "hi", on=["k"], bucket_width=4.0
    ).collect()
    assert [r["iid"] for r in rows] == [1]


def test_fanout_guard_raises_for_mischosen_width(spark):
    points = spark.createDataFrame([(1, 5.0)], "pid long, v double")
    intervals = spark.createDataFrame(
        [(1, 0.0, 10000.0)], "iid long, lo double, hi double"
    )
    with pytest.raises(Exception, match="buckets of width"):
        interval_join(
            points,
            intervals,
            "v",
            "lo",
            "hi",
            bucket_width=1.0,
            max_buckets_per_interval=100,
        ).collect()


def test_plan_has_no_nested_loop_or_cartesian(spark, frames):
    points, intervals = frames
    plan = (
        interval_join(points, intervals, "v", "lo", "hi", on=["k"], bucket_width=5.0)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
