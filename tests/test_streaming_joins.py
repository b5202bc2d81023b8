"""Stream-stream interval join + stream-static enrichment
(streaming/joins.py): batch runs pin the join semantics deterministically;
streaming runs verify the state-store path accepts the watermarked plan
and produces the same rows."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest

from vacancy_gpt_etl_pipeline_spark.streaming.joins import (
    stream_static_enrich,
    stream_stream_interval_join,
)


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, minute // 60, minute % 60, 0)


def _pairs(rows):
    return sorted((r.l_event_id, r.r_event_id) for r in rows)


def _click_purchase_frames(spark):
    clicks = spark.createDataFrame(
        [
            (1, 10, _ts(0)),
            (2, 10, _ts(50)),
            (3, 20, _ts(0)),
        ],
        "event_id int, user_id int, ts timestamp",
    )
    purchases = spark.createDataFrame(
        [
            (100, 10, _ts(45)),   # joins click 1 (45m ≤ 1h) — not click 2 (before it)
            (101, 10, _ts(70)),   # joins click 2 (20m); click 1 is 70m > 1h away
            (102, 30, _ts(30)),   # no same-key click
        ],
        "event_id int, user_id int, ts timestamp",
    )
    return clicks, purchases


def test_interval_join_batch_semantics(spark):
    clicks, purchases = _click_purchase_frames(spark)
    out = stream_stream_interval_join(
        clicks, purchases, on="user_id", within="1 hour"
    )
    # click 1 (:00) captures purchase 100 (:45) but not 101 (:70 > 1h);
    # click 2 (:50) captures 101 (:70) but not 100 (precedes it);
    # click 3 / purchase 102 have no same-key partner
    assert _pairs(out.collect()) == [(1, 100), (2, 101)]


def test_interval_join_bound_is_inclusive(spark):
    left = spark.createDataFrame(
        [(1, 1, _ts(0))], "event_id int, user_id int, ts timestamp"
    )
    right = spark.createDataFrame(
        [(10, 1, _ts(60)), (11, 1, _ts(61))],
        "event_id int, user_id int, ts timestamp",
    )
    out = stream_stream_interval_join(left, right, on="user_id", within="1 hour")
    # exactly-at-bound matches (≤), one past does not
    assert _pairs(out.collect()) == [(1, 10)]


def test_interval_join_streaming_matches_batch(spark, tmp_path):
    clicks, purchases = _click_purchase_frames(spark)
    ldir, rdir = str(tmp_path / "l"), str(tmp_path / "r")
    clicks.write.parquet(ldir)
    purchases.write.parquet(rdir)
    ls = spark.readStream.schema(clicks.schema).parquet(ldir)
    rs = spark.readStream.schema(purchases.schema).parquet(rdir)
    joined = stream_stream_interval_join(ls, rs, on="user_id", within="1 hour")
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    (
        joined.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
        .awaitTermination(120)
    )
    got = _pairs(spark.read.parquet(out_dir).collect())
    want = _pairs(
        stream_stream_interval_join(
            clicks, purchases, on="user_id", within="1 hour"
        ).collect()
    )
    assert got == want and len(got) > 0


def test_stream_static_enrich_left_join(spark, tmp_path):
    facts = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "zz")], "id int, dim_key string"
    )
    dim = spark.createDataFrame(
        [("a", "Alpha"), ("b", "Beta")], "dim_key string, dim_name string"
    )
    fdir = str(tmp_path / "facts")
    facts.write.parquet(fdir)
    fs = spark.readStream.schema(facts.schema).parquet(fdir)
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    (
        stream_static_enrich(fs, dim, on="dim_key")
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
        .awaitTermination(120)
    )
    rows = {r.id: r.dim_name for r in spark.read.parquet(out_dir).collect()}
    assert rows == {1: "Alpha", 2: "Beta", 3: None}


def test_stream_static_rejects_right_join(spark):
    df = spark.createDataFrame([(1, "a")], "id int, dim_key string")
    with pytest.raises(ValueError, match="left/inner"):
        stream_static_enrich(df, df, on="dim_key", how="right")
