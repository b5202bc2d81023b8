"""Parquet sources for the driver's testdata star schema (TESTDATA.md).

Parquet is the engine's internal format: min/max row-group pruning, predicate
pushdown, and column pruning all reach the scan (``.explain`` shows
``PushedFilters`` / ``ReadSchema``) — none of which the reference's CSV
round-trip (dag/vacancy_pipline_gpt_rerty.py:827-849) can do.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vacancy_gpt_etl_pipeline_spark.schemas import TESTDATA_TABLES
from vacancy_gpt_etl_pipeline_spark.session import configure_session


def widen_scan(df: DataFrame, raw_scan: bool = False) -> DataFrame:
    """Round-robin a narrow scan up to executor width — use below
    CPU-DENSE map work (tokenize/md5/regex/rolling-hash/vector math), and
    only there.

    A parquet scan with fewer splits than executor slots leaves every
    core but one idle for all map-side work above it, and single-row-group
    files cannot be split by ``maxPartitionBytes``. On a 100 TB cluster
    scans carry thousands of row-group splits and this is a no-op;
    locally it is one round-robin pass of a small table that unlocks the
    full executor width. Catalyst pushes filters and column pruning
    THROUGH Repartition into the scan (asserted by
    tests/test_plan_shapes.py), so pushdown is unaffected, and the
    explicit partition count is exempt from AQE coalescing.

    Deliberately NOT applied to every read (measured at sf0.1): scans
    feeding cheap relational work (joins/aggregates/windows) gain nothing
    — their first shuffle already re-partitions — and pay an extra
    exchange per scan branch (merge_upsert 0.9 s → 2.2 s); Arrow/Python
    boundaries (mapInPandas) pay a per-partition worker+batch setup that
    dwarfs small inputs (multimodal decode 0.6 s → 4.9 s at 32
    partitions). The CPU-dense text/embedding operators, by contrast,
    drop 4-20× (winnowing 53.6 s → 2.4 s, simhash 25.6 s → 6.1 s,
    BM25 28.5 s → 11.5 s, IVF 16.7 s → 4.7 s).
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    # Fast path, ONLY valid for a frame that is a bare file scan (the
    # read_table caller): there each file contributes ≥1 split, so a
    # file count ≥ target proves the scan is wide WITHOUT the
    # df.rdd.getNumPartitions() call (which forces physical planning
    # plus a Python-RDD conversion — pure driver overhead). The general
    # case cannot use the listing: a post-scan coalesce/repartition (or
    # small-file bin-packing under non-default file confs) changes the
    # partition count while inputFiles() stays the same, so arbitrary
    # frames fall through to the exact .rdd check. Callers that widen a
    # raw scan pass raw_scan=True; at cluster scale tables carry
    # thousands of files and hot reads take the free path.
    if raw_scan and len(df.inputFiles()) >= target:
        return df
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def read_table(
    spark: SparkSession, sf_dir: str, name: str, widen: bool = False
) -> DataFrame:
    configure_session(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if widen:
        df = widen_scan(df, raw_scan=True)
    # nanosAsLong surfaces TIMESTAMP(NANOS) columns as bigint; restore a
    # proper µs TimestampType column (the fixtures carry no sub-µs parts).
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn(
            "ts", F.timestamp_micros((F.col("ts") / 1000).cast("long"))
        )
    return df


def load_tables(
    spark: SparkSession,
    sf_dir: str,
    names: tuple[str, ...] = TESTDATA_TABLES,
    register_views: bool = True,
) -> dict[str, DataFrame]:
    """Load testdata tables; optionally register temp views for the SQL surface."""
    configure_session(spark)
    out: dict[str, DataFrame] = {}
    for name in names:
        df = read_table(spark, sf_dir, name)
        if register_views:
            df.createOrReplaceTempView(name)
        out[name] = df
    return out
