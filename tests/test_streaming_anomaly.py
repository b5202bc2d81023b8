"""Streaming rolling-anomaly (streaming/anomaly.py): bit-parity with the
batch registry query over the same fixture, and cross-run state carry
through the checkpoint (the priors arrive in run 1, the spike in run 2)."""

from __future__ import annotations

import datetime as dt

import pandas as pd
from pyspark.sql import functions as F

from vacancy_gpt_etl_pipeline_spark.queries import rolling_anomaly_events
from vacancy_gpt_etl_pipeline_spark.streaming.anomaly import (
    rolling_anomaly_stream,
)


def _events_rows(values, user_id=1, id0=0, t0=0):
    return [
        {
            "event_id": id0 + i,
            "ts": dt.datetime(2001, 1, 1, 0, 0, t0 + i),
            "user_id": user_id,
            "event_type": "view",
            "value": float(v),
            "props": "{}",
        }
        for i, v in enumerate(values)
    ]


def _write_pd(path, rows):
    pd.DataFrame(rows).astype({"ts": "datetime64[us]"}).to_parquet(
        path, index=False
    )


def _run_stream(spark, src_dir, ckpt, out):
    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double, props string"
        )
        .parquet(str(src_dir))
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    flagged = rolling_anomaly_stream(stream)
    q = (
        flagged.writeStream.foreachBatch(
            lambda b, _id: b.write.mode("append").parquet(str(out))
        )
        .outputMode("append")
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_stream_flags_match_batch_bit_exactly(spark, tmp_path):
    # two users, mixed calm + spiky series
    rows = (
        _events_rows([8, 12, 8, 12, 20, 9, 11, 10, 9, 60], user_id=1)
        + _events_rows([5, 5.5, 5, 5.5, 5.2, 40, 5, 5.1], user_id=2, id0=100)
    )
    src = tmp_path / "events"
    src.mkdir()
    _write_pd(src / "events.parquet", rows)

    # batch query reads <sf_dir>/events.parquet
    batch_dir = tmp_path / "batch"
    batch_dir.mkdir()
    _write_pd(batch_dir / "events.parquet", rows)
    want = {
        (r.user_id, r.event_id): (r.n_prior, r.value, r.rolling_mean, r.zscore)
        for r in rolling_anomaly_events(spark, str(batch_dir)).collect()
    }
    assert want  # fixture actually flags something

    out = tmp_path / "out"
    _run_stream(spark, src, tmp_path / "ckpt", out)
    got = {
        (r.user_id, r.event_id): (r.n_prior, r.value, r.rolling_mean, r.zscore)
        for r in spark.read.parquet(str(out)).collect()
    }
    assert got == want  # bit-exact: cents ints replay the decimal sums


def test_state_carries_across_availablenow_runs(spark, tmp_path):
    src = tmp_path / "events"
    src.mkdir()
    ckpt = tmp_path / "ckpt"
    # run 1: only the warm-up priors — nothing flaggable yet
    _write_pd(src / "a_batch1.parquet", _events_rows([8, 12, 8, 12]))
    out1 = tmp_path / "out1"
    _run_stream(spark, src, ckpt, out1)
    assert not list(out1.glob("*.parquet")) or spark.read.parquet(
        str(out1)
    ).count() == 0
    # run 2: the spike alone — only run-1 state can supply its baseline
    _write_pd(
        src / "b_batch2.parquet", _events_rows([20], id0=4, t0=4)
    )
    out2 = tmp_path / "out2"
    _run_stream(spark, src, ckpt, out2)
    got = spark.read.parquet(str(out2)).collect()
    assert [(r.user_id, r.event_id, r.n_prior) for r in got] == [(1, 4, 4)]
    import math

    assert got[0].zscore == 10.0 / math.sqrt((416.0 - 40.0 * 40.0 / 4) / 3)


def test_window_truncates_state_to_last_n(spark, tmp_path):
    """The 8th+ prior must age out: after 9 calm values the baseline is
    the LAST 7 only — verified via a spike whose z differs if the old
    values were retained."""
    # first two values are extreme; if they stayed in state the variance
    # would be huge and the spike would NOT flag
    vals = [1000, 1000, 10, 12, 10, 12, 10, 12, 10, 30]
    src = tmp_path / "events"
    src.mkdir()
    _write_pd(src / "events.parquet", _events_rows(vals))
    out = tmp_path / "out"
    _run_stream(spark, src, tmp_path / "ckpt", out)
    got = spark.read.parquet(str(out)).collect()
    assert [(r.event_id, r.n_prior) for r in got] == [(9, 7)]
