"""feature_scale (operators/scaling): closed-form scaling values and
degenerate-group NULL safety."""

from __future__ import annotations

import math

from pyspark.sql import Row

from vacancy_gpt_etl_pipeline_spark.operators.scaling import feature_scale


def test_closed_form_minmax_z_and_rank(spark):
    # group values 0, 5, 10: mean 5, pop-var 50/3, minmax 0/.5/1,
    # pct_rank 0/.5/1
    df = spark.createDataFrame(
        [Row(g="a", v=0.0), Row(g="a", v=5.0), Row(g="a", v=10.0)]
    )
    out = sorted(feature_scale(df, "v", ["g"]).collect(), key=lambda r: r["v"])
    assert [r["minmax_scaled"] for r in out] == [0.0, 0.5, 1.0]
    assert [r["pct_rank"] for r in out] == [0.0, 0.5, 1.0]
    std = math.sqrt(50.0 / 3.0)
    for r, v in zip(out, (0.0, 5.0, 10.0)):
        assert math.isclose(r["z_score"], (v - 5.0) / std, rel_tol=1e-12)


def test_constant_group_is_null_safe(spark):
    df = spark.createDataFrame([Row(g="c", v=7.0)] * 4)
    out = feature_scale(df, "v", ["g"]).collect()
    # no 0/0: constant group -> NULL minmax and z, rank all 0
    assert all(r["minmax_scaled"] is None and r["z_score"] is None for r in out)
    assert all(r["pct_rank"] == 0.0 for r in out)


def test_groups_scale_independently(spark):
    df = spark.createDataFrame(
        [Row(g="a", v=0.0), Row(g="a", v=1.0), Row(g="b", v=100.0), Row(g="b", v=200.0)]
    )
    out = {(r["g"], r["v"]): r for r in feature_scale(df, "v", ["g"]).collect()}
    assert out[("a", 1.0)]["minmax_scaled"] == 1.0
    assert out[("b", 100.0)]["minmax_scaled"] == 0.0
    assert out[("b", 200.0)]["pct_rank"] == 1.0
