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


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    configure_session(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
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
