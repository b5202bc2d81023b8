"""Closed-form tests for the round-9 training-pipeline additions:
BPE merge-pair counting and temperature-based source mixing."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_bpe_pair_counts_closed_form(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from vacancy_gpt_etl_pipeline_spark.queries import REGISTRY

    # corpus: "abab ab abab" -> word freqs: abab:2, ab:1
    # pairs: abab -> ab,ba,ab (x2 freq); ab -> ab (x1)
    # counts: ab = 2*2 + 1 = 5, ba = 2
    tbl = pa.table(
        {
            "doc_id": pa.array([1], type=pa.int64()),
            "text": pa.array(["abab ab abab"]),
            "lang": pa.array(["en"]),
            "source": pa.array(["s0"]),
            "n_chars": pa.array([12], type=pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    out = REGISTRY["bpe_pair_counts"].spark(spark, str(tmp_path)).collect()
    got = {r["pair"]: r["pair_count"] for r in out}
    assert got == {"ab": 5, "ba": 2}


def test_bpe_pair_counts_single_char_words_drop(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from vacancy_gpt_etl_pipeline_spark.queries import REGISTRY

    tbl = pa.table(
        {
            "doc_id": pa.array([1], type=pa.int64()),
            "text": pa.array(["a b c xy"]),
            "lang": pa.array(["en"]),
            "source": pa.array(["s0"]),
            "n_chars": pa.array([8], type=pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    out = REGISTRY["bpe_pair_counts"].spark(spark, str(tmp_path)).collect()
    got = {r["pair"]: r["pair_count"] for r in out}
    # 1-char words contribute no pairs; only "xy" survives
    assert got == {"xy": 1}


def test_temperature_mix_flattens_distribution(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from vacancy_gpt_etl_pipeline_spark.queries import REGISTRY

    # 90/10 split at alpha=0.7: the rare source's share must exceed its
    # raw proportion, the common source's must shrink, shares sum to 1
    n_a, n_b = 90, 10
    tbl = pa.table(
        {
            "doc_id": pa.array(range(100), type=pa.int64()),
            "text": pa.array(["x"] * 100),
            "lang": pa.array(["en"] * 100),
            "source": pa.array(["big"] * n_a + ["small"] * n_b),
            "n_chars": pa.array([1] * 100, type=pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    rows = {
        r["source"]: r
        for r in REGISTRY["temperature_mix_docs"].spark(spark, str(tmp_path)).collect()
    }
    assert rows["big"]["n_docs"] == 90 and rows["small"]["n_docs"] == 10
    assert rows["small"]["share"] > 0.10  # up-sampled vs raw 10%
    assert rows["big"]["share"] < 0.90  # down-sampled vs raw 90%
    assert rows["big"]["share"] + rows["small"]["share"] == pytest.approx(1.0)
    # closed form: weights are round(n^0.7 * 1e6)
    wa = round(math.pow(90, 0.7) * 1e6)
    wb = round(math.pow(10, 0.7) * 1e6)
    assert rows["big"]["weight_q"] == wa and rows["small"]["weight_q"] == wb
    assert rows["big"]["share"] == pytest.approx(wa / (wa + wb), abs=1e-12)
    # expected_docs scales shares by the budget constant
    assert rows["small"]["expected_docs"] == pytest.approx(
        300 * wb / (wa + wb), abs=1e-9
    )


# ------------------------------------------------------------------------
# exact_substring_dedup properties: a pure-Python reference replay over
# random mini-corpora (hypothesis drives the corpus shape; Spark must
# agree exactly)
# ------------------------------------------------------------------------


def _esd_reference(texts: dict[int, str], k: int):
    """Pure-Python replay of the operator's contract."""
    blocks: dict[int, list[str]] = {}
    for doc_id, text in texts.items():
        toks = text.split(" ")
        blocks[doc_id] = [
            " ".join(toks[i : i + k]) for i in range(0, len(toks), k)
        ]
    seen: set[str] = set()
    out = {}
    for doc_id in sorted(texts):
        kept = []
        for b in blocks[doc_id]:
            if b not in seen:
                seen.add(b)
                kept.append(b)
        out[doc_id] = (len(blocks[doc_id]), len(kept), " ".join(kept))
    return out


def test_exact_substring_dedup_matches_python_reference(spark):
    import random

    from vacancy_gpt_etl_pipeline_spark.operators.dedup import (
        exact_substring_dedup,
    )

    rng = random.Random(13)
    vocab = ["aa", "bb", "cc", "dd"]
    texts = {
        i: " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 17)))
        for i in range(40)
    }
    ref = _esd_reference(texts, k=3)
    docs = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_blocks"], r["n_kept"], r["text_dedup"])
        for r in exact_substring_dedup(docs, block_tokens=3).collect()
    }
    assert got == ref
    # invariant: total kept == number of distinct blocks in the corpus
    total_kept = sum(v[1] for v in got.values())
    all_blocks = set()
    for t in texts.values():
        toks = t.split(" ")
        all_blocks |= {
            " ".join(toks[i : i + 3]) for i in range(0, len(toks), 3)
        }
    assert total_kept == len(all_blocks)
