"""l2_normalize (operators/similarity): closed-form vectors, zero-norm
safety, and unit-length invariant."""

from __future__ import annotations

import math

from pyspark.sql import Row

from vacancy_gpt_etl_pipeline_spark.operators.similarity import l2_normalize


def test_closed_form_and_zero_vector(spark):
    df = spark.createDataFrame(
        [
            Row(vec_id=1, embedding=[3.0, 4.0]),
            Row(vec_id=2, embedding=[0.0, 0.0]),
        ]
    )
    out = {r["vec_id"]: r for r in l2_normalize(df).collect()}
    assert out[1]["l2_norm"] == 5.0
    assert out[1]["embedding_unit"] == [0.6, 0.8]
    # zero vector: norm 0, unit NULL (never ±inf components)
    assert out[2]["l2_norm"] == 0.0 and out[2]["embedding_unit"] is None


def test_output_is_unit_length(spark):
    df = spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(i), float(i * 2), 1.5]) for i in range(1, 6)]
    )
    for r in l2_normalize(df).collect():
        assert math.isclose(
            sum(x * x for x in r["embedding_unit"]), 1.0, rel_tol=1e-12
        )
