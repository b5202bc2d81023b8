"""Closed-form tests for the hashed-feature quality classifier and the
per-source unigram KL-divergence audit."""

from __future__ import annotations

import hashlib
import math

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write_docs(tmp_path, texts, sources):
    n = len(texts)
    tbl = pa.table(
        {
            "doc_id": pa.array(range(n), type=pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * n),
            "source": pa.array(sources),
            "n_chars": pa.array([len(t) for t in texts], type=pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))


def _h28(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:7], 16)


def _weight(word: str, buckets: int = 1024) -> int:
    bucket = _h28(word) % buckets
    return _h28(f"w{bucket}") % 2001 - 1000


def test_quality_classifier_closed_form(spark, tmp_path):
    from vacancy_gpt_etl_pipeline_spark.queries import REGISTRY

    texts = ["table scan table", "agg", "", "merge join filter sort"]
    _write_docs(tmp_path, texts, ["s0"] * 4)
    rows = {
        r["doc_id"]: r
        for r in REGISTRY["quality_classifier_scores"]
        .spark(spark, str(tmp_path))
        .collect()
    }
    assert set(rows) == {0, 1, 3}  # empty doc omitted (documented)
    for doc_id, text in [(0, texts[0]), (1, texts[1]), (3, texts[3])]:
        words = [w for w in text.split(" ") if w]
        want_q = sum(_weight(w) for w in words)
        r = rows[doc_id]
        assert r["n_words"] == len(words)
        assert r["logit_q"] == want_q
        assert r["logit"] == pytest.approx(want_q / (1000.0 * len(words)))
        assert r["keep_quality"] == (want_q > 0)


def test_source_kl_divergence_closed_form(spark, tmp_path):
    from vacancy_gpt_etl_pipeline_spark.queries import REGISTRY

    # source "same" mirrors the corpus word mix it dominates; source
    # "skew" is concentrated on one word -> strictly positive KL
    texts = ["a b", "a b", "a a a a"]
    sources = ["same", "same", "skew"]
    _write_docs(tmp_path, texts, sources)
    rows = {
        r["source"]: r
        for r in REGISTRY["source_kl_divergence"]
        .spark(spark, str(tmp_path))
        .collect()
    }
    assert rows["same"]["n_words"] == 4 and rows["skew"]["n_words"] == 4
    # corpus: a=6, b=2, N=8. same: a=2,b=2,n=4. skew: a=4,n=4.
    def kl(counts, n_s, corpus, n):
        return sum(
            (c / n_s) * math.log((c * n) / (n_s * corpus[w]))
            for w, c in counts.items()
        )

    want_same = kl({"a": 2, "b": 2}, 4, {"a": 6, "b": 2}, 8)
    want_skew = kl({"a": 4}, 4, {"a": 6, "b": 2}, 8)
    assert rows["same"]["kl_divergence"] == pytest.approx(want_same, abs=1e-9)
    assert rows["skew"]["kl_divergence"] == pytest.approx(want_skew, abs=1e-9)
    assert rows["skew"]["kl_divergence"] > 0


def test_source_kl_identical_distribution_is_zero(spark, tmp_path):
    from vacancy_gpt_etl_pipeline_spark.queries import REGISTRY

    # every source has the same word distribution -> every term is
    # ln(1) = 0 EXACTLY, so the quantized-decimal sum is exactly 0.0
    _write_docs(
        tmp_path, ["x y", "x y", "x y"], ["s0", "s1", "s2"]
    )
    for r in (
        REGISTRY["source_kl_divergence"].spark(spark, str(tmp_path)).collect()
    ):
        assert r["kl_divergence"] == 0.0
