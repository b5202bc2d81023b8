"""Custom stateful operator (applyInPandasWithState) + multimodal frame
sampling — the remaining north-star plumbing pieces."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from vacancy_gpt_etl_pipeline_spark.operators.multimodal import (
    attach_text_payload,
    sample_frames,
)
from vacancy_gpt_etl_pipeline_spark.streaming.stateful import running_totals


def _write_events_csv(path, rows):
    pd.DataFrame(rows, columns=["user_id", "value"]).to_csv(path, index=False)


def test_running_totals_accumulates_across_micro_batches(spark, tmp_path):
    """Two AvailableNow runs over a file stream: run 2 must see run 1's
    state through the checkpoint (count/sum continue, not restart)."""
    src = tmp_path / "events"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")

    out1, out2 = str(tmp_path / "out1"), str(tmp_path / "out2")

    def _run(out):
        stream = (
            spark.readStream.schema("user_id int, value double")
            .option("header", True)
            .csv(str(src))
        )
        totals = running_totals(stream, "user_id", "value")
        q = (
            totals.writeStream.foreachBatch(
                lambda batch, _id: batch.write.mode("append").parquet(out)
            )
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return {r["key"]: r for r in spark.read.parquet(out).collect()}

    _write_events_csv(src / "batch1.csv", [[1, 10.0], [1, 5.0], [2, 1.0]])
    first = _run(out1)
    assert first["1"]["total_events"] == 2 and first["1"]["total_value"] == 15.0
    assert first["2"]["total_events"] == 1

    _write_events_csv(src / "batch2.csv", [[1, 100.0], [3, 7.0]])
    second = _run(out2)
    # key 1 continued from state (2+1 events, 15+100), key 3 is fresh;
    # key 2 had no new rows → not re-emitted in update mode
    assert second["1"]["total_events"] == 3
    assert second["1"]["total_value"] == 115.0
    assert second["1"]["batch_events"] == 1
    assert second["3"]["total_events"] == 1
    assert "2" not in second


def test_sample_frames_expands_payload(spark):
    df = spark.createDataFrame(
        [(1, "x" * 130), (2, "y" * 10)], "asset_id long, text string"
    )
    assets = attach_text_payload(df, "text", "video")
    frames = sample_frames(assets, every_n_bytes=64)
    rows = sorted(
        (r["asset_id"], r["frame_idx"], len(r["frame_bytes"])) for r in frames.collect()
    )
    # 130 bytes → frames of 64, 64, 2; 10 bytes → one 10-byte frame
    assert rows == [(1, 0, 64), (1, 1, 64), (1, 2, 2), (2, 0, 10)]


def test_sample_frames_without_stub_raises_for_compressed_only(spark):
    df = spark.createDataFrame([(1, "abc")], "asset_id long, text string")
    assets = attach_text_payload(df, "text", "video")
    with pytest.raises(Exception, match="ffmpeg"):
        sample_frames(assets, decode_stub=False).collect()


def test_sample_frames_decodes_real_y4m_frames(spark):
    """The former stub now delegates to the real Y4M frame walk: every
    sampled frame's bytes must equal the closed-form plane bytes the
    fixture was synthesized from, and decode_stub=False must NOT raise
    for Y4M payloads."""
    from vacancy_gpt_etl_pipeline_spark.operators.multimodal import (
        synthesize_y4m_payload,
    )

    ids = spark.range(3, 7).select(F.col("id").cast("long").alias("doc_id"))
    assets = synthesize_y4m_payload(ids)
    frames = sample_frames(assets, decode_stub=False).collect()
    got = {(r["asset_id"], r["frame_idx"]): bytes(r["frame_bytes"]) for r in frames}
    for i in range(3, 7):
        w, h, nf = i % 8 + 2, i % 4 + 2, i % 5 + 1
        for f in range(nf):
            expect = bytes(
                (i * 37 + f * 11 + j * 5) % 256 for j in range(w * h * 3)
            )
            assert got[(i, f)] == expect
    assert len(got) == sum(i % 5 + 1 for i in range(3, 7))


def test_sample_frames_every_nth_frame(spark):
    from vacancy_gpt_etl_pipeline_spark.operators.multimodal import (
        synthesize_y4m_payload,
    )

    # doc_id=4 → 5 frames; stride 2 keeps frames 0, 2, 4
    ids = spark.range(4, 5).select(F.col("id").cast("long").alias("doc_id"))
    frames = sample_frames(
        synthesize_y4m_payload(ids), decode_stub=False, every_nth_frame=2
    ).collect()
    assert sorted(r["frame_idx"] for r in frames) == [0, 2, 4]
