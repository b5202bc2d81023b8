"""Streaming count-min sketch maintenance (streaming/windows.windowed_cms_agg).

The registry entry `windowed_cms` hash-matches the batch execution; this
file asserts the STREAMING contract: running the same operator as a
watermarked AvailableNow stream over a file source produces exactly the
batch sketch (window close-out loses nothing), and the per-window
sketches merge to the global sketch (the rollup-without-rescan point).
"""

from __future__ import annotations

import datetime as dt

import pandas as pd
from pyspark.sql import functions as F

from vacancy_gpt_etl_pipeline_spark.operators.sketches import cms_build, cms_merge
from vacancy_gpt_etl_pipeline_spark.streaming.windows import windowed_cms_agg


def _write_events(path, n=200):
    base = dt.datetime(2024, 1, 1)
    rows = [
        {
            "user_id": i % 17,
            "ts": base + dt.timedelta(hours=(i * 5) % 72),
        }
        for i in range(n)
    ]
    # µs precision: the session reads TIMESTAMP(NANOS) as bigint
    # (nanosAsLong, see session.py), which F.window can't consume
    pd.DataFrame(rows).astype({"ts": "datetime64[us]"}).to_parquet(
        path, index=False
    )


def _sketch_dict(df):
    return {
        (r["window_start"], r["row"], r["bucket"]): r["counter"]
        for r in df.collect()
    }


def test_stream_matches_batch(spark, tmp_path):
    src = tmp_path / "events.parquet"
    _write_events(str(src))
    # watermarks need TIMESTAMP (ltz); parquet µs infers NTZ — cast both
    batch_df = spark.read.parquet(str(src)).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    want = _sketch_dict(windowed_cms_agg(batch_df, "user_id", "ts", "1 day"))

    stream = (
        spark.readStream.schema(batch_df.schema)
        .parquet(str(tmp_path))
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    agg = windowed_cms_agg(
        stream, "user_id", "ts", "1 day", watermark="1 hour"
    )
    out = str(tmp_path / "out")
    q = (
        agg.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = _sketch_dict(spark.read.parquet(out))
    # append mode emits only CLOSED windows; all but the final day close
    # under the watermark once the source drains
    final_day = max(k[0] for k in want)
    closed_want = {k: v for k, v in want.items() if k[0] < final_day}
    assert got == closed_want


def test_daily_sketches_merge_to_global(spark, tmp_path):
    src = tmp_path / "events.parquet"
    _write_events(str(src))
    df = spark.read.parquet(str(src))
    daily = windowed_cms_agg(df, "user_id", "ts", "1 day")
    merged = cms_merge(daily.select("row", "bucket", "counter"))
    direct = cms_build(df, "user_id")
    m = {(r["row"], r["bucket"]): r["counter"] for r in merged.collect()}
    d = {(r["row"], r["bucket"]): r["counter"] for r in direct.collect()}
    assert m == d
