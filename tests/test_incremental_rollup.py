"""Incremental aggregate maintenance (operators/relational.incremental_rollup).

The registry entry `incr_rollup` hash-matches a direct full-history
rollup; these tests pin the merge semantics the mirror can't isolate:
pass-through of keys absent from the delta, new-key insertion, empty
delta identity, and multi-step chaining (rollup is associative over
arbitrary splits).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from vacancy_gpt_etl_pipeline_spark.operators.relational import incremental_rollup

def _aggs():
    # built lazily — Column expressions need an active session
    return {
        "n": (F.count(F.lit(1)), F.sum("n")),
        "tot": (F.sum("v"), F.sum("tot")),
    }


def _direct(df):
    return {
        (r["k"],): (r["n"], r["tot"])
        for r in df.groupBy("k").agg(
            F.count(F.lit(1)).alias("n"), F.sum("v").alias("tot")
        ).collect()
    }


def _as_dict(df):
    return {(r["k"],): (r["n"], r["tot"]) for r in df.collect()}


def test_merge_equals_direct_with_passthrough_and_new_keys(spark):
    # history has keys a,b; delta touches b and introduces c —
    # a must pass through untouched, c must appear
    hist = spark.createDataFrame([("a", 1), ("a", 2), ("b", 10)], "k string, v long")
    delta = spark.createDataFrame([("b", 5), ("c", 7)], "k string, v long")
    prev = hist.groupBy("k").agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("tot"))
    got = _as_dict(incremental_rollup(prev, delta, ["k"], _aggs()))
    assert got == _direct(hist.unionByName(delta))
    assert got[("a",)] == (2, 3)  # untouched
    assert got[("c",)] == (1, 7)  # inserted


def test_empty_delta_is_identity(spark):
    hist = spark.createDataFrame([("a", 1), ("b", 2)], "k string, v long")
    prev = hist.groupBy("k").agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("tot"))
    empty = spark.createDataFrame([], "k string, v long")
    got = _as_dict(incremental_rollup(prev, empty, ["k"], _aggs()))
    assert got == _direct(hist)


def test_chained_increments_associative(spark):
    """rollup(rollup(d0 + d1) + d2) == direct(d0 ∪ d1 ∪ d2) for any split."""
    d0 = spark.createDataFrame([("x", 1), ("y", 2)], "k string, v long")
    d1 = spark.createDataFrame([("x", 3)], "k string, v long")
    d2 = spark.createDataFrame([("y", 4), ("z", 5)], "k string, v long")
    prev = d0.groupBy("k").agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("tot"))
    step1 = incremental_rollup(prev, d1, ["k"], _aggs())
    step2 = incremental_rollup(step1, d2, ["k"], _aggs())
    assert _as_dict(step2) == _direct(d0.unionByName(d1).unionByName(d2))
