"""Unit tests for the n-gram contamination audit and bigram LM scoring.
Oracle parity runs in tests/test_oracle.py; these pin semantics on
hand-computable fixtures."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from vacancy_gpt_etl_pipeline_spark.operators.curation import (
    ngram_contamination,
)
from vacancy_gpt_etl_pipeline_spark.operators.lm_score import bigram_lm_scores


def test_contamination_detects_embedded_passage(spark):
    # test doc 100 embeds a 4-token passage of train doc 1 → with n=3,
    # the 2 trigrams of that passage hit; the rest don't
    train = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta")],
        "doc_id int, text string",
    )
    test = spark.createDataFrame(
        [
            (100, "x y alpha beta gamma delta q r"),
            (101, "totally unrelated words here now"),
            (102, "na"),  # shorter than n → 0 grams
        ],
        "doc_id int, text string",
    )
    got = {
        r.doc_id: r for r in ngram_contamination(train, test, n=3).collect()
    }
    # doc 100: 6 trigrams, hits = "alpha beta gamma", "beta gamma delta"
    assert got[100].n_grams == 6
    assert got[100].n_contaminated == 2
    assert got[100].contaminated_frac == round(2 / 6, 6)
    assert got[101].n_contaminated == 0
    assert (got[102].n_grams, got[102].contaminated_frac) == (0, 0.0)


def test_contamination_full_copy_is_total(spark):
    doc = "one two three four five six seven"
    train = spark.createDataFrame([(1, doc)], "doc_id int, text string")
    test = spark.createDataFrame([(2, doc)], "doc_id int, text string")
    r = ngram_contamination(train, test, n=3).collect()[0]
    assert r.contaminated_frac == 1.0


def test_bigram_lm_hand_values(spark):
    # corpus: "a b" ×2 and "a c" ×1 → c(a b)=2, c(a c)=1, c(a ·)=3,
    # V = |{a,b,c}| = 3, k=0.5:
    #   P(b|a) = 2.5/4.5, P(c|a) = 1.5/4.5
    docs = spark.createDataFrame(
        [(1, "a b"), (2, "a b"), (3, "a c")], "doc_id int, text string"
    )
    got = {r.doc_id: r for r in bigram_lm_scores(docs).collect()}
    assert got[1].n_bigrams == 1
    assert got[1].avg_logprob == round(math.log(2.5 / 4.5), 6)
    assert got[3].avg_logprob == round(math.log(1.5 / 4.5), 6)
    # higher-probability bigram scores higher
    assert got[1].avg_logprob > got[3].avg_logprob


def test_bigram_lm_skips_short_docs(spark):
    docs = spark.createDataFrame(
        [(1, "solo"), (2, "two words")], "doc_id int, text string"
    )
    out = bigram_lm_scores(docs).collect()
    assert [r.doc_id for r in out] == [2]


def test_bigram_lm_repetitive_doc_scores_higher(spark):
    # a doc made of the corpus's dominant bigram outscores a doc of rare
    # transitions — the perplexity-filter signal direction
    rows = [(i, "the cat sat") for i in range(5)] + [(99, "cat the sat the")]
    docs = spark.createDataFrame(rows, "doc_id int, text string")
    got = {r.doc_id: r.avg_logprob for r in bigram_lm_scores(docs).collect()}
    assert got[0] > got[99]
