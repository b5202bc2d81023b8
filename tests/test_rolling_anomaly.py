"""Closed-form verification of rolling_anomaly_events — hand-computed
integer arithmetic (independent of the shared Spark/DuckDB formula), the
warm-up guard, leakage-freedom of the trailing frame, and the zero-
variance guard."""

from __future__ import annotations

import datetime as dt
import math

import pytest
from pyspark.sql import functions as F

from vacancy_gpt_etl_pipeline_spark.queries import rolling_anomaly_events


def _write_events(spark, tmp_path, values, user_id=1):
    rows = [
        (
            i,
            dt.datetime(2001, 1, 1, 0, 0, i),
            user_id,
            "view",
            float(v),
            "{}",
        )
        for i, v in enumerate(values)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id: long, ts: timestamp, user_id: long, "
        "event_type: string, value: double, props: string",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    return str(tmp_path)


def test_hand_computed_z_and_warmup(spark, tmp_path):
    # priors [8,12,8,12]: n=4, s=40, q=416 -> mean=10, var=(416-400)/3
    # spike 20 -> z = 10 / sqrt(16/3) ≈ 4.330 — flagged
    sf = _write_events(spark, tmp_path, [8, 12, 8, 12, 20])
    got = rolling_anomaly_events(spark, sf).collect()
    assert len(got) == 1
    r = got[0]
    assert (r.event_id, r.n_prior, r.value) == (4, 4, 20.0)
    assert r.rolling_mean == 10.0
    assert r.zscore == 10.0 / math.sqrt((416.0 - 40.0 * 40.0 / 4) / 3)


def test_warmup_under_four_priors_never_flags(spark, tmp_path):
    # the same spike with only 3 priors: below warm-up, no flag
    sf = _write_events(spark, tmp_path, [8, 12, 8, 1000])
    assert rolling_anomaly_events(spark, sf).count() == 0


def test_zero_variance_baseline_guarded(spark, tmp_path):
    # constant priors -> var == 0 -> excluded rather than inf/NaN z
    sf = _write_events(spark, tmp_path, [10, 10, 10, 10, 10, 999])
    assert rolling_anomaly_events(spark, sf).count() == 0


def test_trailing_frame_is_leakage_free(spark, tmp_path):
    # the spike must NOT suppress its own z by inflating the baseline:
    # with frame ...AND CURRENT ROW the variance would include the 500
    # and z would collapse below 3; the 1 PRECEDING frame flags it
    sf = _write_events(spark, tmp_path, [8, 12, 8, 12, 500])
    got = rolling_anomaly_events(spark, sf).collect()
    assert [r.event_id for r in got] == [4]
    # and the NEXT event is judged against a baseline that now contains
    # the spike (var huge) -> an ordinary value is not flagged
    sf2 = _write_events(spark, tmp_path, [8, 12, 8, 12, 500, 13])
    got2 = rolling_anomaly_events(spark, sf2).collect()
    assert [r.event_id for r in got2] == [4]


def test_users_are_independent(spark, tmp_path):
    rows = []
    for uid, vals in ((1, [8, 12, 8, 12, 20]), (2, [8, 12, 8, 12, 10])):
        rows += [
            (
                uid * 100 + i,
                dt.datetime(2001, 1, 1, 0, 0, i),
                uid,
                "view",
                float(v),
                "{}",
            )
            for i, v in enumerate(vals)
        ]
    df = spark.createDataFrame(
        rows,
        "event_id: long, ts: timestamp, user_id: long, "
        "event_type: string, value: double, props: string",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    got = rolling_anomaly_events(spark, str(tmp_path)).collect()
    assert [(r.user_id, r.event_id) for r in got] == [(1, 104)]
