"""winsorize (operators/winsorize): exact interpolated bounds and
clipping semantics on analytically-known data."""

from __future__ import annotations

from pyspark.sql import Row

from vacancy_gpt_etl_pipeline_spark.operators.winsorize import winsorize


def test_median_bounds_and_clip(spark):
    # values 1..5: q=0.5 -> rank 3 -> bound 3.0 exactly; clip to [3,3]
    df = spark.createDataFrame([Row(g="a", v=float(i)) for i in (1, 2, 3, 4, 5)])
    out = winsorize(df, "v", ["g"], lower=0.5, upper=0.5).collect()
    assert all(r["q_lower"] == 3.0 and r["q_upper"] == 3.0 for r in out)
    assert sorted(r["v_clipped"] for r in out) == [3.0] * 5


def test_interpolated_quantile(spark):
    # values 0,10: q=0.25 -> rank 1.25 -> 0 + 0.25*(10-0) = 2.5
    df = spark.createDataFrame([Row(g="a", v=0.0), Row(g="a", v=10.0)])
    out = winsorize(df, "v", ["g"], lower=0.25, upper=0.75).collect()
    assert out[0]["q_lower"] == 2.5 and out[0]["q_upper"] == 7.5
    assert sorted(r["v_clipped"] for r in out) == [2.5, 7.5]


def test_groups_get_independent_bounds(spark):
    rows = [Row(g="lo", v=float(i)) for i in range(1, 6)] + [
        Row(g="hi", v=float(i * 100)) for i in range(1, 6)
    ]
    df = spark.createDataFrame(rows)
    out = winsorize(df, "v", ["g"], lower=0.0, upper=1.0).collect()
    by_g = {}
    for r in out:
        by_g.setdefault(r["g"], r)
    assert by_g["lo"]["q_upper"] == 5.0
    assert by_g["hi"]["q_upper"] == 500.0
    # identity band: nothing clipped
    assert all(r["v_clipped"] == r["v"] for r in out)
