"""Small-file-controlled parquet sink + compaction (sources/sinks.py) and
latest-wins merge upsert (operators/relational.py)."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from vacancy_gpt_etl_pipeline_spark.operators.relational import merge_upsert
from vacancy_gpt_etl_pipeline_spark.sources.sinks import (
    compact_parquet,
    write_parquet_sized,
)


def _parquet_files(root):
    return [
        p
        for p in glob.glob(os.path.join(root, "**", "*.parquet"), recursive=True)
        if os.path.basename(p).startswith("part-")
    ]


def test_sized_write_bounds_files_per_partition(spark, tmp_path):
    # 3 partition values spread over MANY input partitions — the naive
    # write would emit ~(tasks × 3) files; sized write emits
    # ceil(rows_per_dir / max_records) per dir
    df = (
        spark.range(3000)
        .repartition(24)
        .select(
            F.col("id"),
            (F.col("id") % 3).cast("string").alias("part"),
            (F.col("id") * 2).alias("v"),
        )
    )
    out = str(tmp_path / "sized")
    write_parquet_sized(
        df, out, partition_by=["part"], max_records_per_file=600
    )
    for p in ("0", "1", "2"):
        files = _parquet_files(os.path.join(out, f"part={p}"))
        # 1000 rows/dir at 600/file → 2 files (AQE may split, allow ≤4)
        assert 1 <= len(files) <= 4, files
    back = spark.read.parquet(out)
    assert back.count() == 3000


def test_sorted_write_narrows_rowgroup_stats(spark, tmp_path):
    df = spark.range(10000).select(
        F.col("id"), (F.col("id") % 100).alias("k")
    )
    out = str(tmp_path / "sorted")
    write_parquet_sized(df, out, max_records_per_file=100000, sort_by=["id"])
    back = spark.read.parquet(out).where(F.col("id") < 10)
    assert back.count() == 10


def test_compact_reduces_file_count(spark, tmp_path):
    src = str(tmp_path / "fragmented")
    spark.range(2000).repartition(50).write.parquet(src)
    assert len(_parquet_files(src)) >= 40
    dst = str(tmp_path / "compacted")
    compact_parquet(spark, src, dst, max_records_per_file=100000)
    assert len(_parquet_files(dst)) <= 8
    assert spark.read.parquet(dst).count() == 2000


def _merge_frames(spark):
    snap = spark.createDataFrame(
        [(1, "a", 0), (2, "b", 0), (3, "c", 0)], "k long, v string, version int"
    )
    upd = spark.createDataFrame(
        [(2, "B", 1), (4, "D", 1)], "k long, v string, version int"
    )
    return snap, upd


def test_upsert_updates_inserts_keeps(spark):
    snap, upd = _merge_frames(spark)
    out = {
        r["k"]: (r["v"], r["version"])
        for r in merge_upsert(snap, upd, ["k"], "version").collect()
    }
    assert out == {
        1: ("a", 0),  # untouched survives
        2: ("B", 1),  # updated wins
        3: ("c", 0),
        4: ("D", 1),  # insert
    }


def test_upsert_equal_version_prefers_updates(spark):
    snap = spark.createDataFrame([(1, "old", 5)], "k long, v string, version int")
    upd = spark.createDataFrame([(1, "new", 5)], "k long, v string, version int")
    rows = merge_upsert(snap, upd, ["k"], "version").collect()
    assert rows[0]["v"] == "new"


def test_upsert_is_idempotent(spark):
    snap, upd = _merge_frames(spark)
    once = merge_upsert(snap, upd, ["k"], "version")
    twice = merge_upsert(once, upd, ["k"], "version")
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))
