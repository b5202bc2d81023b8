"""Streaming enrichment twin (streaming/enrich.py): bit-exact parity
with the batch operator, exactly-once across runs via checkpoint, and
the once-per-distinct-key-per-micro-batch cost contract."""

from __future__ import annotations

import pandas as pd
from mock_enrichers import CallCountingEnricher, FlakyEnricher

from vacancy_gpt_etl_pipeline_spark.operators.enrichment import enrich_column
from vacancy_gpt_etl_pipeline_spark.streaming.enrich import (
    BATCH_COL,
    write_stream_enriched,
)

_SCHEMA = "id long, title string"


def _drop_file(src, i: int, rows: list[tuple[int, str]]) -> None:
    pd.DataFrame(rows, columns=["id", "title"]).to_parquet(
        src / f"f{i}.parquet", index=False
    )


def _stream(spark, src):
    return (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )


def _rows(df):
    return sorted(tuple(r) for r in df.select("id", "title", "normalized_title").collect())


def test_streaming_parity_and_exactly_once(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    # keys containing '3' fail on attempt 0 → the retry-residue path
    # is live inside the streaming run, not just the happy path
    _drop_file(src, 0, [(1, "alpha"), (2, "bravo3"), (3, "charlie")])
    _drop_file(src, 1, [(4, "delta"), (5, "echo3")])

    write_stream_enriched(
        _stream(spark, src), "title", FlakyEnricher(), out, ckpt,
        batch_size=2,
    )
    got = spark.read.parquet(out)
    # maxFilesPerTrigger=1 → one micro-batch per file
    assert got.select(BATCH_COL).distinct().count() == 2

    batch_twin = enrich_column(
        spark.read.schema(_SCHEMA).parquet(str(src)),
        "title", FlakyEnricher(), batch_size=2,
    )
    assert _rows(got) == _rows(batch_twin)

    # run 2, unchanged source: committed batches are not re-handed to
    # foreachBatch — nothing appends
    write_stream_enriched(
        _stream(spark, src), "title", FlakyEnricher(), out, ckpt,
        batch_size=2,
    )
    assert spark.read.parquet(out).count() == 5

    # run 3, one new file: ONLY its rows are enriched and appended
    _drop_file(src, 2, [(6, "fox3")])
    write_stream_enriched(
        _stream(spark, src), "title", FlakyEnricher(), out, ckpt,
        batch_size=2,
    )
    after = spark.read.parquet(out)
    assert after.count() == 6
    new = after.where(f"id = 6").collect()
    assert [(r.title, r.normalized_title) for r in new] == [
        ("fox3", "T:fox3")
    ]
    # the new rows landed in a LATER micro-batch than the first run's
    assert new[0][BATCH_COL] >= 2


def test_streaming_enricher_called_once_per_distinct_key_per_batch(
    spark, tmp_path
):
    src = tmp_path / "in"
    src.mkdir()
    markers = tmp_path / "markers"
    markers.mkdir()
    # 'b' recurs across files: per-batch distinct → 2 + 2 keys sent,
    # not 3 (global distinct) and not 4 per file (no dedup at all)
    _drop_file(src, 0, [(1, "a"), (2, "b"), (3, "b")])
    _drop_file(src, 1, [(4, "b"), (5, "c")])
    write_stream_enriched(
        _stream(spark, src), "title", CallCountingEnricher(str(markers)),
        str(tmp_path / "out2"), str(tmp_path / "ckpt2"),
    )
    sizes = sorted(
        int(p.read_text()) for p in markers.glob("*.call")
    )
    assert sizes == [2, 2]
