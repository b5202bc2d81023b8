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


def test_mad_outliers_closed_form(spark):
    from vacancy_gpt_etl_pipeline_spark.operators.winsorize import mad_outliers

    # values 1..7 plus a wild 100: median of 8 values (1..7,100) = 4.5,
    # |dev| = 3.5,2.5,1.5,.5,.5,1.5,2.5,95.5 -> sorted .5,.5,1.5,1.5,
    # 2.5,2.5,3.5,95.5 -> MAD = (1.5+2.5)/2 = 2.0; k=3 -> band 6.0:
    # only 100 is flagged
    vals = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 100.0]
    df = spark.createDataFrame([("g", v) for v in vals], ["g", "v"])
    out = mad_outliers(df, "v", ["g"], k=3.0).collect()
    assert all(r["median"] == 4.5 and r["mad"] == 2.0 for r in out)
    flagged = sorted(r["v"] for r in out if r["is_outlier"])
    assert flagged == [100.0]


def test_mad_outliers_constant_group_flags_nothing(spark):
    from vacancy_gpt_etl_pipeline_spark.operators.winsorize import mad_outliers

    df = spark.createDataFrame([("g", 5.0)] * 6, ["g", "v"])
    out = mad_outliers(df, "v", ["g"]).collect()
    assert all(not r["is_outlier"] and r["mad"] == 0.0 for r in out)


def test_null_values_excluded_from_ranks_and_output(spark):
    """ADVICE r6: NULLs must not shift quantile rank positions (Spark
    sorts them first) nor appear in the output; NULL group keys drop at
    the join back."""
    from vacancy_gpt_etl_pipeline_spark.operators.winsorize import mad_outliers

    rows = [("g", None), ("g", 1.0), ("g", 2.0), ("g", 3.0), (None, 9.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = winsorize(df, "v", ["g"], lower=0.0, upper=1.0).collect()
    # bounds from the 3 non-null values only; null value and null key gone
    assert sorted(r["v"] for r in out) == [1.0, 2.0, 3.0]
    assert all(r["q_lower"] == 1.0 and r["q_upper"] == 3.0 for r in out)

    mad = mad_outliers(df, "v", ["g"]).collect()
    assert sorted(r["v"] for r in mad) == [1.0, 2.0, 3.0]
    assert all(r["median"] == 2.0 for r in mad)


def test_global_winsorize_via_ranking_tier(spark):
    """Empty group_cols = whole-frame band, computed WITHOUT an
    unpartitioned window (asserted on the plan) and equal to the
    grouped implementation run with a constant group."""
    from vacancy_gpt_etl_pipeline_spark.operators.winsorize import mad_outliers

    vals = [float(v) for v in (5, 1, 9, 3, 7, 2, 8, 100)]
    df = spark.createDataFrame([("g", v) for v in vals], ["g", "v"])
    out_global = winsorize(df.select("v"), "v", [], lower=0.25, upper=0.75)
    plan = out_global._jdf.queryExecution().executedPlan().toString()
    import re

    for spec in re.findall(r"windowspecdefinition\(([^)]*)", plan):
        head = spec.split(",")[0].strip()
        assert not head.startswith("specifiedwindowframe"), spec
        assert " ASC" not in head and " DESC" not in head, spec
    grouped = {
        (r["v"], r["q_lower"], r["q_upper"], r["v_clipped"])
        for r in winsorize(df, "v", ["g"], lower=0.25, upper=0.75).collect()
    }
    global_set = {
        (r["v"], r["q_lower"], r["q_upper"], r["v_clipped"])
        for r in out_global.collect()
    }
    assert global_set == grouped
    spark.catalog.clearCache()

    mad_global = {
        (r["v"], r["median"], r["mad"], r["is_outlier"])
        for r in mad_outliers(df.select("v"), "v", []).collect()
    }
    mad_grouped = {
        (r["v"], r["median"], r["mad"], r["is_outlier"])
        for r in mad_outliers(df, "v", ["g"]).collect()
    }
    assert mad_global == mad_grouped
    spark.catalog.clearCache()
