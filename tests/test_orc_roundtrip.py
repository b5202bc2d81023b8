"""ORC source/sink: lossless roundtrip, partitioned layout, and the same
pushdown/pruning behavior the parquet scan gets."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from vacancy_gpt_etl_pipeline_spark.sources.sinks import read_orc, write_orc


def test_orc_roundtrip_lossless(spark, sf_dir, tmp_path):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    path = str(tmp_path / "orders_orc")
    write_orc(orders, path)
    back = read_orc(spark, path)
    assert back.schema == orders.schema
    assert back.count() == orders.count()
    a = {r["o_orderkey"]: r for r in orders.collect()}
    b = {r["o_orderkey"]: r for r in back.collect()}
    assert a == b


def test_orc_partitioned_write_prunes(spark, sf_dir, tmp_path):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").withColumn(
        "status", F.col("o_orderstatus")
    )
    path = str(tmp_path / "orders_part")
    write_orc(orders, path, partition_by=["status"])
    # directory-per-status layout on disk
    dirs = {d for d in os.listdir(path) if d.startswith("status=")}
    assert len(dirs) >= 2
    # partition pruning: the filtered scan reads only one directory
    back = read_orc(spark, path).where(F.col("status") == "F")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(status" in plan
    assert back.select("status").distinct().collect()[0]["status"] == "F"


def test_orc_scan_pushes_filters_and_prunes_columns(spark, sf_dir, tmp_path):
    path = str(tmp_path / "orders_orc2")
    write_orc(spark.read.parquet(f"{sf_dir}/orders.parquet"), path)
    q = read_orc(spark, path).where(F.col("o_totalprice") > 100000.0).select(
        "o_orderkey", "o_totalprice"
    )
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(o_totalprice), GreaterThan(o_totalprice" in plan
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "o_orderdate" not in read_schema
