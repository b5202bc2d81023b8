"""Planted-violation tests for gopher_quality_rules: the corpus fixture
passes every rule (clean synthetic text), so each threshold's bite is
proven here with one crafted violator per rule."""

from __future__ import annotations

import pandas as pd

from vacancy_gpt_etl_pipeline_spark.queries import gopher_quality_rules


def _write_docs(tmp_path, texts):
    rows = [
        {
            "doc_id": i,
            "text": t,
            "lang": "en",
            "source": "s",
            "n_chars": len(t),
        }
        for i, t in enumerate(texts)
    ]
    pd.DataFrame(rows).to_parquet(
        str(tmp_path / "documents.parquet"), index=False
    )
    return str(tmp_path)


def test_each_rule_bites_exactly_once(spark, tmp_path):
    ok = "the quick brown foxes jumped over several lazy sleeping dogs today"
    texts = [
        ok,                                   # 0: passes everything
        "too few words here",                 # 1: n_words < 10
        " ".join(["ab"] * 12),                # 2: mean word len 2 < 3
        " ".join(["extraordinarily"] * 12),   # 3: mean word len 15 > 10
        " ".join(["123"] * 8 + ["ok", "yes"]),  # 4: alpha frac 0.2 < 0.7
        ok + " # # # # # # # #",              # 5: symbol ratio > 0.1
    ]
    sf = _write_docs(tmp_path, texts)
    got = {r.doc_id: r for r in gopher_quality_rules(spark, sf).collect()}
    assert len(got) == 6
    assert got[0].passes
    for bad in (1, 2, 3, 4, 5):
        assert not got[bad].passes, bad
    # signal spot checks
    assert got[1].n_words == 4
    assert got[2].mean_word_len == 2.0
    assert got[3].mean_word_len == 15.0
    assert got[4].alpha_word_frac == 0.2
    assert got[5].symbol_ratio > 0.1


def test_ellipsis_counts_as_symbol_and_triples_only(spark, tmp_path):
    # 11 words, one '...' run of 4 dots = ONE triple (floor(4/3)); ratio
    # 1/11 < 0.1 -> still passes; with two triples it fails
    base = "words one two three four five six seven eight nine ten"
    sf = _write_docs(
        tmp_path, [base + " ....", base + " ... ... ..."]
    )
    got = {r.doc_id: r for r in gopher_quality_rules(spark, sf).collect()}
    assert got[0].passes and abs(got[0].symbol_ratio - 1 / 12) < 1e-12
    assert not got[1].passes  # 3 triples over 14 words > 0.1


def test_empty_and_whitespace_docs_are_excluded(spark, tmp_path):
    sf = _write_docs(tmp_path, ["solid text with enough good words here to pass easily now", ""])
    got = gopher_quality_rules(spark, sf).collect()
    # the empty doc's split yields [''], len 1 with a 0-length word —
    # n_words>0 keeps it but it fails the word-count rule
    by_id = {r.doc_id: r for r in got}
    assert by_id[0].passes
    assert 1 not in by_id or not by_id[1].passes
