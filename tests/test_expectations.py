"""Single-pass expectation suite (operators/expectations.py).

The registry entry `expectations` hash-matches independent per-rule SQL
aggregates; these tests pin semantics on planted data (known fractions,
threshold boundaries, null handling) and the one-pass plan claim.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from vacancy_gpt_etl_pipeline_spark.operators.expectations import (
    expect_between,
    expect_in_set,
    expect_matches,
    expect_not_null,
    expect_unique,
    run_expectations,
)


def _results(df, suite):
    return {
        r["expectation"]: (r["fraction"], r["passed"])
        for r in run_expectations(df, suite).collect()
    }


def test_known_fractions(spark):
    # 10 rows: 2 null ids, 1 duplicate value, 3 out-of-range, 5 bad codes
    rows = [
        (1, 5.0, "A"), (2, 15.0, "A"), (3, 25.0, "B"), (4, 150.0, "B"),
        (5, 250.0, "C"), (6, 350.0, "X"), (7, 5.0, "X"), (8, 5.0, "X"),
        (None, 5.0, "X"), (None, 5.0, "X"),
    ]
    df = spark.createDataFrame(rows, "id long, v double, code string")
    got = _results(df, [
        expect_not_null("id", threshold=0.8),
        expect_between("v", 0.0, 100.0, threshold=0.5),
        expect_in_set("code", ["A", "B", "C"], threshold=0.6),
    ])
    assert got["not_null:id"] == (0.8, True)
    assert got["between:v"] == (0.7, True)
    assert got["in_set:code"] == (0.5, False)


def test_unique_counts_nulls_in_denominator(spark):
    df = spark.createDataFrame(
        [(1,), (2,), (2,), (None,)], "k long"
    )
    got = _results(df, [expect_unique("k", threshold=0.9)])
    # 2 distinct non-null / 4 rows = 0.5 — nulls don't vacuously pass
    assert got["unique:k"] == (0.5, False)


def test_threshold_boundary_is_inclusive(spark):
    df = spark.createDataFrame([(1,), (None,)], "k long")
    got = _results(df, [expect_not_null("k", threshold=0.5)])
    assert got["not_null:k"] == (0.5, True)


def test_matches_regex(spark):
    df = spark.createDataFrame(
        [("1-URGENT",), ("9-BOGUS",), ("junk",)], "p string"
    )
    got = _results(df, [expect_matches("p", "^[1-5]-", threshold=0.3)])
    assert got["matches:p"] == (1 / 3, True)


def test_suite_is_one_aggregate_pass(spark):
    """Without a distinct check the whole suite must plan as ONE
    HashAggregate pair over one scan — no joins, no extra exchanges."""
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 7).cast("double").alias("v")
    )
    out = run_expectations(df, [
        expect_not_null("id"),
        expect_between("v", 0.0, 3.0, threshold=0.4),
        expect_matches("v", "^[0-9]"),
    ])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    # one partial+final aggregate pair, nothing else
    assert plan.count("HashAggregate") == 2


def test_profile_columns(spark):
    from vacancy_gpt_etl_pipeline_spark.operators.expectations import (
        profile_columns,
    )

    df = spark.createDataFrame(
        [(1, "b"), (2, None), (2, "a"), (None, "a")], "k long, s string"
    )
    got = {
        r["column"]: (
            r["n_rows"], r["n_nulls"], r["n_distinct"], r["min_value"], r["max_value"]
        )
        for r in profile_columns(df, ["k", "s"]).collect()
    }
    assert got["k"] == (4, 1, 2, "1", "2")
    assert got["s"] == (4, 1, 2, "a", "b")
