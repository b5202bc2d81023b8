"""trajectory_signatures (operators/trajectory): closed-form signatures
and similarity sanity."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import Row

from vacancy_gpt_etl_pipeline_spark.operators.trajectory import (
    REF_GRID,
    trajectory_signatures,
)


def _ts(s):
    return datetime.fromisoformat(s)


def test_corner_trajectory_zeroes_its_reference(spark):
    # user A sits at the (0,0) corner of the normalized square, user B at
    # (1,1): each zeroes the distance to its own corner reference point
    df = spark.createDataFrame(
        [
            Row(user_id=1, ts=_ts("2024-01-01T00:00:00"), value=0.0),
            Row(user_id=2, ts=_ts("2024-01-31T00:00:00"), value=10.0),
        ]
    )
    sigs = {r["user_id"]: r["signature"] for r in trajectory_signatures(df).collect()}
    i00 = REF_GRID.index((0.0, 0.0))
    i11 = REF_GRID.index((1.0, 1.0))
    assert sigs[1][i00] == 0.0 and sigs[1][i11] == 2.0  # (1-0)^2+(1-0)^2
    assert sigs[2][i11] == 0.0 and sigs[2][i00] == 2.0


def test_min_over_points_not_sum(spark):
    # a trajectory touching both corners zeroes BOTH corner slots —
    # the signature takes the min over points, order-free
    df = spark.createDataFrame(
        [
            Row(user_id=1, ts=_ts("2024-01-01T00:00:00"), value=0.0),
            Row(user_id=1, ts=_ts("2024-01-31T00:00:00"), value=10.0),
            Row(user_id=2, ts=_ts("2024-01-16T00:00:00"), value=5.0),
        ]
    )
    sigs = {r["user_id"]: r["signature"] for r in trajectory_signatures(df).collect()}
    i00 = REF_GRID.index((0.0, 0.0))
    i11 = REF_GRID.index((1.0, 1.0))
    assert sigs[1][i00] == 0.0 and sigs[1][i11] == 0.0
    assert all(s > 0 for s in sigs[2])  # mid-point user zeroes nothing
    assert len(sigs[1]) == len(REF_GRID) == 8


def test_degenerate_span_pins_to_center_not_nan(spark):
    import math

    # all events share one timestamp AND one value: both axes pin to
    # 0.5 rather than NaN-poisoning every signature slot
    df = spark.createDataFrame(
        [Row(user_id=u, ts=_ts("2024-01-01T00:00:00"), value=5.0) for u in (1, 2)]
    )
    sigs = {r["user_id"]: r["signature"] for r in trajectory_signatures(df).collect()}
    for sig in sigs.values():
        assert all(not math.isnan(s) for s in sig)
    # distance from (0.5, 0.5) to corner (0,0) is 0.5
    i00 = REF_GRID.index((0.0, 0.0))
    assert sigs[1][i00] == 0.5
