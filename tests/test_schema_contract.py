"""validate_schema (sources/contracts): all-problems-at-once drift
diagnostics, metadata-only."""

from __future__ import annotations

import pytest
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from vacancy_gpt_etl_pipeline_spark.sources.contracts import (
    SchemaContractError,
    validate_schema,
)

CONTRACT = StructType(
    [
        StructField("id", LongType()),
        StructField("name", StringType()),
        StructField("score", DoubleType()),
    ]
)


def test_conforming_frame_passes_through(spark):
    df = spark.createDataFrame([(1, "a", 0.5)], "id long, name string, score double")
    assert validate_schema(df, CONTRACT) is df


def test_all_problems_reported_at_once(spark):
    # missing `score`, wrong-typed `id`, extra `junk`: one error, 3 diagnostics
    df = spark.createDataFrame([("1", "a", True)], "id string, name string, junk boolean")
    with pytest.raises(SchemaContractError) as e:
        validate_schema(df, CONTRACT)
    problems = e.value.problems
    assert len(problems) == 3
    assert any("missing column: score" in p for p in problems)
    assert any("type mismatch: id" in p for p in problems)
    assert any("unexpected column: junk" in p for p in problems)


def test_allow_extra_tolerates_new_columns(spark):
    df = spark.createDataFrame(
        [(1, "a", 0.5, "later")], "id long, name string, score double, added string"
    )
    assert validate_schema(df, CONTRACT, allow_extra=True) is df
    with pytest.raises(SchemaContractError):
        validate_schema(df, CONTRACT)


def test_real_table_contract(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    # contract derived from the actual schema passes; a drifted one fails
    assert validate_schema(orders, orders.schema) is orders
    drifted = StructType(
        [StructField("o_orderkey", StringType())]  # wrong type + missing rest
    )
    with pytest.raises(SchemaContractError) as e:
        validate_schema(orders, drifted)
    assert any("type mismatch: o_orderkey" in p for p in e.value.problems)
