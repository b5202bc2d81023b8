"""Streaming CDC changelog sink (streaming/cdc.py): per-batch diffs
against the maintained snapshot, exactly-once across runs, idempotent
changelog reads."""

from __future__ import annotations

import pandas as pd

from vacancy_gpt_etl_pipeline_spark.streaming.cdc import (
    read_changelog,
    write_stream_changelog,
)
from vacancy_gpt_etl_pipeline_spark.streaming.upsert import latest_snapshot

SCHEMA = "id string, status string, price double"


def _csv(path, rows):
    pd.DataFrame(rows, columns=["id", "status", "price"]).to_csv(
        path, index=False
    )


def _drain(spark, src, state, log, ckpt):
    stream = (
        spark.readStream.schema(SCHEMA).option("header", True).csv(str(src))
    )
    write_stream_changelog(
        stream, str(state), str(log), str(ckpt), ["id"], ["status", "price"]
    )


def test_changelog_captures_adds_then_changes(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    state, log, ckpt = tmp_path / "state", tmp_path / "log", tmp_path / "ckpt"

    _csv(src / "b1.csv", [["a", "new", 1.0], ["b", "new", 2.0]])
    _drain(spark, src, state, log, ckpt)
    c1 = read_changelog(spark, str(log), ["id"]).collect()
    assert {(r["id"], r["change_type"]) for r in c1} == {
        ("a", "added"),
        ("b", "added"),
    }

    # run 2: modify a, insert c; b untouched -> NO changelog row for b
    _csv(src / "b2.csv", [["a", "done", 1.5], ["c", "new", 3.0]])
    _drain(spark, src, state, log, ckpt)
    c2 = {
        (r["id"], r["_batch_id"]): r
        for r in read_changelog(spark, str(log), ["id"]).collect()
    }
    assert len(c2) == 4  # 2 adds from batch 0, change+add from batch 1
    chg = c2[("a", 1)]
    assert chg["change_type"] == "changed"
    assert (chg["old_status"], chg["new_status"]) == ("new", "done")
    assert (chg["old_price"], chg["new_price"]) == (1.0, 1.5)
    assert c2[("c", 1)]["change_type"] == "added"
    assert ("b", 1) not in c2

    # the maintained snapshot is the fully-applied state
    snap = spark.read.parquet(latest_snapshot(str(state)))
    got = {r["id"]: (r["status"], r["price"]) for r in snap.collect()}
    assert got == {"a": ("done", 1.5), "b": ("new", 2.0), "c": ("new", 3.0)}


def test_rerun_without_new_data_emits_nothing(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    state, log, ckpt = tmp_path / "state", tmp_path / "log", tmp_path / "ckpt"
    _csv(src / "b1.csv", [["a", "new", 1.0]])
    _drain(spark, src, state, log, ckpt)
    n1 = read_changelog(spark, str(log), ["id"]).count()
    # re-drain with no new files: checkpoint skips everything
    _drain(spark, src, state, log, ckpt)
    assert read_changelog(spark, str(log), ["id"]).count() == n1


def test_intra_batch_conflicts_resolve_deterministically(spark, tmp_path):
    # one batch carries two rows for the same key: latest-wins by the
    # order_col, not by partition-scan luck
    src = tmp_path / "in"
    src.mkdir()
    state, log, ckpt = tmp_path / "state", tmp_path / "log", tmp_path / "ckpt"
    _csv(src / "b1.csv", [["a", "new", 1.0], ["a", "done", 2.0]])
    stream = (
        spark.readStream.schema(SCHEMA).option("header", True).csv(str(src))
    )
    write_stream_changelog(
        stream, str(state), str(log), str(ckpt), ["id"],
        ["status", "price"], order_col="price",
    )
    snap = spark.read.parquet(latest_snapshot(str(state))).collect()
    assert len(snap) == 1
    assert (snap[0]["status"], snap[0]["price"]) == ("done", 2.0)
    chg = read_changelog(spark, str(log), ["id"]).collect()
    assert len(chg) == 1 and chg[0]["new_price"] == 2.0
