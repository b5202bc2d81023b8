"""Bucketed tables → shuffle-free co-located join (SURVEY §4.2 'bucketing
for co-located joins'): when both join sides are bucketed by the join key
with the same bucket count, the SortMergeJoin plans with NO Exchange."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def bucket_db(spark, tmp_path):
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bt LOCATION '{tmp_path}/bt'")
    yield "bt"
    spark.sql("DROP DATABASE IF EXISTS bt CASCADE")


def test_bucketed_join_has_no_exchange(spark, bucket_db):
    left = spark.createDataFrame(
        [(i % 50, f"l{i}") for i in range(1000)], "k int, lv string"
    )
    right = spark.createDataFrame(
        [(i % 50, f"r{i}") for i in range(500)], "k int, rv string"
    )
    left.write.bucketBy(8, "k").sortBy("k").mode("overwrite").saveAsTable("bt.left_b")
    right.write.bucketBy(8, "k").sortBy("k").mode("overwrite").saveAsTable("bt.right_b")

    lb, rb = spark.table("bt.left_b"), spark.table("bt.right_b")
    with_broadcast_off = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = lb.join(rb, "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan[:1500]
        # and the join is still correct
        assert joined.count() == sum(20 * 10 for _ in range(50))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", with_broadcast_off)


def test_unbucketed_join_needs_exchange(spark):
    """Control: the same join over plain frames shuffles both sides."""
    left = spark.createDataFrame([(i % 50, i) for i in range(1000)], "k int, v int")
    right = spark.createDataFrame([(i % 50, i) for i in range(500)], "k int, w int")
    off = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = left.join(right, "k")._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", off)
