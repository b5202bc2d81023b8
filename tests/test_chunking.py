"""chunk_documents edge cases (the oracle covers the bulk semantics)."""

from __future__ import annotations

import pytest

from vacancy_gpt_etl_pipeline_spark.operators.chunking import chunk_documents


def _chunks(spark, text, chunk_tokens=4, stride=2):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    return sorted(
        (r["chunk_idx"], r["chunk_text"], r["n_tokens"])
        for r in chunk_documents(
            df, chunk_tokens=chunk_tokens, stride=stride
        ).collect()
    )


def test_short_doc_single_chunk(spark):
    assert _chunks(spark, "a b") == [(0, "a b", 2)]


def test_exact_window_no_tail(spark):
    assert _chunks(spark, "a b c d") == [(0, "a b c d", 4)]


def test_overlapping_windows_cover_all_tokens(spark):
    got = _chunks(spark, "a b c d e f g")
    # starts 0,2,4: [a b c d], [c d e f], [e f g]
    assert got == [(0, "a b c d", 4), (1, "c d e f", 4), (2, "e f g", 3)]
    covered = set()
    for _, text, _ in got:
        covered.update(text.split())
    assert covered == {"a", "b", "c", "d", "e", "f", "g"}


def test_non_overlapping_stride(spark):
    got = _chunks(spark, "a b c d e f", chunk_tokens=3, stride=3)
    assert got == [(0, "a b c", 3), (1, "d e f", 3)]


def test_invalid_stride_raises(spark):
    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(df, stride=0)
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=4, stride=5)
