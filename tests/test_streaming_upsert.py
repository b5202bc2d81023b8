"""Streaming upsert sink (streaming/upsert.py): append-log exactly-once
across runs, latest-wins merge-on-read, immutable snapshot compaction."""

from __future__ import annotations

import os

import pandas as pd

from vacancy_gpt_etl_pipeline_spark.streaming.upsert import (
    compact_upsert_log,
    latest_snapshot,
    read_upserted,
    write_stream_upsert_log,
)

SCHEMA = "id string, status string, version int"


def _csv(path, rows):
    pd.DataFrame(rows, columns=["id", "status", "version"]).to_csv(
        path, index=False
    )


def _drain(spark, src, log, ckpt):
    stream = (
        spark.readStream.schema(SCHEMA).option("header", True).csv(str(src))
    )
    write_stream_upsert_log(stream, str(log), str(ckpt))


def test_upsert_log_latest_wins_across_runs(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    log, ckpt = tmp_path / "log", tmp_path / "ckpt"

    _csv(src / "b1.csv", [["a", "new", 1], ["b", "new", 1]])
    _drain(spark, src, log, ckpt)
    v1 = {
        r.id: (r.status, r.version)
        for r in read_upserted(spark, str(log), ["id"], "version").collect()
    }
    assert v1 == {"a": ("new", 1), "b": ("new", 1)}

    # run 2: update a, insert c; b1.csv is NOT reprocessed (checkpoint)
    _csv(src / "b2.csv", [["a", "done", 2], ["c", "new", 1]])
    _drain(spark, src, log, ckpt)
    v2 = {
        r.id: (r.status, r.version)
        for r in read_upserted(spark, str(log), ["id"], "version").collect()
    }
    assert v2 == {"a": ("done", 2), "b": ("new", 1), "c": ("new", 1)}
    # the log retains full history (2 versions of a)
    assert spark.read.parquet(str(log)).where("id = 'a'").count() == 2


def test_compaction_snapshots_are_immutable_and_versioned(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    log, ckpt, snaps = tmp_path / "log", tmp_path / "ckpt", tmp_path / "snaps"

    _csv(src / "b1.csv", [["a", "new", 1]])
    _drain(spark, src, log, ckpt)
    s0 = compact_upsert_log(spark, str(log), str(snaps), ["id"], "version")
    assert s0.endswith("snap=0")
    assert latest_snapshot(str(snaps)) == s0

    _csv(src / "b2.csv", [["a", "done", 2]])
    _drain(spark, src, log, ckpt)
    s1 = compact_upsert_log(spark, str(log), str(snaps), ["id"], "version")
    assert s1.endswith("snap=1")
    assert latest_snapshot(str(snaps)) == s1
    # older snapshot untouched (immutability): still readable, old value
    old = spark.read.parquet(s0).collect()
    assert [(r.id, r.status) for r in old] == [("a", "new")]
    new = spark.read.parquet(latest_snapshot(str(snaps))).collect()
    assert [(r.id, r.status) for r in new] == [("a", "done")]


def test_merge_on_read_matches_batch_merge_upsert(spark, tmp_path):
    """The MOR view must equal relational.merge_upsert over the same
    snapshot/update frames — one semantics, two access paths."""
    from vacancy_gpt_etl_pipeline_spark.operators.relational import (
        merge_upsert,
    )

    src = tmp_path / "in"
    src.mkdir()
    log, ckpt = tmp_path / "log", tmp_path / "ckpt"
    _csv(src / "b1.csv", [["a", "s1", 1], ["b", "s1", 1], ["c", "s1", 1]])
    _drain(spark, src, log, ckpt)
    _csv(src / "b2.csv", [["b", "s2", 2], ["d", "s2", 2]])
    _drain(spark, src, log, ckpt)

    mor = {
        (r.id, r.status, r.version)
        for r in read_upserted(spark, str(log), ["id"], "version").collect()
    }
    snap = spark.createDataFrame(
        [("a", "s1", 1), ("b", "s1", 1), ("c", "s1", 1)], SCHEMA
    )
    upd = spark.createDataFrame([("b", "s2", 2), ("d", "s2", 2)], SCHEMA)
    batch = {
        (r.id, r.status, r.version)
        for r in merge_upsert(snap, upd, ["id"], "version").collect()
    }
    assert mor == batch
