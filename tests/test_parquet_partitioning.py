"""Partitioned parquet sink + partition pruning — the layout that makes
date-ranged reads O(touched partitions) at 100 TB (sinks.py scale note)."""

from __future__ import annotations

from pyspark.sql import functions as F

from vacancy_gpt_etl_pipeline_spark.sources.sinks import write_parquet


def test_partitioned_write_prunes_on_read(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, f"2024-{(i % 3) + 1:02d}", float(i)) for i in range(300)],
        "id int, month string, v double",
    )
    out = str(tmp_path / "by_month")
    write_parquet(df, out, partition_by=["month"])

    back = spark.read.parquet(out)
    one_month = back.where(F.col("month") == "2024-02")
    assert one_month.count() == 100

    plan = one_month._jdf.queryExecution().executedPlan().toString()
    # partition pruning: the month predicate must be a PartitionFilter on the
    # scan, not a post-scan Filter over all partitions
    assert "PartitionFilters: [isnotnull(month" in plan, plan[:800]
    assert "(month = 2024-02)" in plan or "month#" in plan


def test_partitioned_write_roundtrips_values(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5)], "id int, part string, v double"
    )
    out = str(tmp_path / "rt")
    write_parquet(df, out, partition_by=["part"])
    back = spark.read.parquet(out).select("id", "part", "v")
    assert sorted(map(tuple, back.collect())) == [(1, "a", 1.5), (2, "b", 2.5)]
