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


def test_decimal_scale_parameter_controls_moment_precision(spark):
    """ADVICE r6: the 2-decimal moment quantization is now an explicit
    parameter — at decimal_scale=6 a 3-decimal input's z-scores use the
    exact values instead of silently rounding them to 2dp."""
    vals = [1.125, 2.375, 3.625]
    df = spark.createDataFrame([("g", v) for v in vals], ["g", "v"])
    out = {r["v"]: r["z_score"] for r in feature_scale(df, "v", ["g"], decimal_scale=6).collect()}
    mean = sum(vals) / 3
    var = sum(v * v for v in vals) / 3 - mean * mean
    std = math.sqrt(var)
    for v in vals:
        assert abs(out[v] - (v - mean) / std) < 1e-12
    # default scale=2 rounds 1.125 -> 1.12/1.13 in the moments: the
    # closed form above no longer matches exactly
    out2 = {r["v"]: r["z_score"] for r in feature_scale(df, "v", ["g"]).collect()}
    assert out2[1.125] != out[1.125]


def test_decimal_scale_out_of_range_raises(spark):
    import pytest

    df = spark.createDataFrame([("g", 1.0)], ["g", "v"])
    with pytest.raises(ValueError, match="decimal_scale"):
        feature_scale(df, "v", ["g"], decimal_scale=13)
