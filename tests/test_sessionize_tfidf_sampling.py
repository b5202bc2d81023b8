"""Unit tests for the round-5 operators: gap sessionization, repetition
signals, TF-IDF keywords, weighted sampling. Oracle parity is covered by
tests/test_oracle.py; these pin the SEMANTICS on hand-computable inputs."""

from __future__ import annotations

import datetime as dt
import hashlib
import math

from pyspark.sql import functions as F

from vacancy_gpt_etl_pipeline_spark.operators.repetition import (
    repetition_signals,
)
from vacancy_gpt_etl_pipeline_spark.operators.sampling import weighted_sample
from vacancy_gpt_etl_pipeline_spark.operators.sessionize import (
    session_summary,
    sessionize,
)
from vacancy_gpt_etl_pipeline_spark.operators.text_search import tfidf_keywords


def _ts(minute: int, second: int = 0):
    return dt.datetime(2024, 1, 1, minute // 60, minute % 60, second)


# ---------------------------------------------------------------- sessionize


def test_sessionize_gap_boundaries(spark):
    # gaps: 10 min (same session), exactly 30 min (same — strict >), 30:01
    # (new session), then a second user interleaved
    rows = [
        (1, _ts(0)),
        (1, _ts(10)),
        (1, _ts(40)),          # 30:00 gap — NOT a boundary
        (1, _ts(70, 1)),       # 30:01 gap — boundary
        (2, _ts(5)),
    ]
    df = spark.createDataFrame(rows, "user_id int, ts timestamp")
    got = {
        (r.user_id, r.ts): r.session_seq
        for r in sessionize(df, gap_seconds=1800.0).collect()
    }
    assert got == {
        (1, _ts(0)): 1,
        (1, _ts(10)): 1,
        (1, _ts(40)): 1,
        (1, _ts(70, 1)): 2,
        (2, _ts(5)): 1,
    }


def test_session_summary_rollup(spark):
    rows = [(1, _ts(0)), (1, _ts(10)), (1, _ts(70, 1))]
    df = spark.createDataFrame(rows, "user_id int, ts timestamp")
    out = {
        r.session_seq: r
        for r in session_summary(df, gap_seconds=1800.0).collect()
    }
    assert out[1].n_events == 2
    assert out[1].duration_sec == 600.0
    assert out[1].session_start == _ts(0)
    assert out[2].n_events == 1
    assert out[2].duration_sec == 0.0


def test_sessionize_single_shuffle_plan(spark):
    df = spark.createDataFrame([(1, _ts(0))], "user_id int, ts timestamp")
    plan = session_summary(df)._jdf.queryExecution().executedPlan().toString()
    # lag + running sum + (user, session) groupBy must share ONE exchange
    assert plan.count("Exchange") == 1, plan


# ---------------------------------------------------------------- repetition


def test_repetition_signals_hand_values(spark):
    # doc 1: "x y x y x y" → 2-grams: "x y"(3) "y x"(2); mass = 3·3+2·3=15
    #   top2 = 9/15 = 0.6; 3-grams: "x y x"(2) "y x y"(2) → all dup → 1.0
    # doc 2: all-distinct tokens → top2 = 1/4 each gram... mass 4 grams
    #   of len 3, all cnt 1 → top2 = 3/12 = 0.25, dup3 = 0.0
    # doc 3: too short for 3-grams → dup3 coalesces to 0.0
    rows = [(1, "x y x y x y"), (2, "a b c d e"), (3, "a b")]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {r.doc_id: r for r in repetition_signals(df).collect()}
    assert got[1].top2gram_char_frac == 0.6
    assert got[1].dup3gram_char_frac == 1.0
    assert got[2].top2gram_char_frac == 0.25
    assert got[2].dup3gram_char_frac == 0.0
    assert got[3].top2gram_char_frac == 1.0  # single 2-gram covers all mass
    assert got[3].dup3gram_char_frac == 0.0


def test_repetition_short_doc_zero(spark):
    df = spark.createDataFrame([(1, "solo")], "doc_id int, text string")
    r = repetition_signals(df).collect()[0]
    assert (r.top2gram_char_frac, r.dup3gram_char_frac) == (0.0, 0.0)


# ---------------------------------------------------------------- tf-idf


def test_tfidf_keywords_ranking(spark):
    # "rare" (tf=2, df=1 → idf ln(2)+1) outscores "common" (tf=1, idf
    # floor ln(1)+1 = 1) in doc 1; "common" is every doc's term so its
    # idf is the floor
    rows = [
        (1, "common rare rare"),
        (2, "common common common"),
        (3, "common other other"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = tfidf_keywords(df, k=2)
    top1 = {r.doc_id: r.term for r in out.where(F.col("rank") == 1).collect()}
    assert top1[1] == "rare"
    assert top1[2] == "common"
    assert top1[3] == "other"
    # doc 2's only term: tf=3, df("common")=3, N=3 → score 3·(ln(4/4)+1)=3
    s = out.where((F.col("doc_id") == 2) & (F.col("term") == "common"))
    assert s.collect()[0].score == 3.0


def test_tfidf_respects_k_and_min_len(spark):
    df = spark.createDataFrame(
        [(1, "aa bb cc longword longword")], "doc_id int, text string"
    )
    out = tfidf_keywords(df, k=3, min_token_len=3).collect()
    assert [r.term for r in out] == ["longword"]  # 2-char tokens dropped


# ---------------------------------------------------------------- sampling


def _es_key(doc_id: int, weight: float) -> float:
    u = (int(hashlib.md5(str(doc_id).encode()).hexdigest()[:7], 16) + 1) / float(
        1 << 28
    )
    return math.log(u) / weight


def test_weighted_sample_matches_reference_formula(spark):
    rows = [(i, float(10 + i)) for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id int, w double")
    got = sorted(
        r.doc_id
        for r in weighted_sample(df, F.col("w"), "doc_id", k=10).collect()
    )
    want = sorted(
        sorted(rows, key=lambda r: (-_es_key(r[0], r[1]), r[0]))[:10]
    )
    assert got == [r[0] for r in sorted(want)]


def test_weighted_sample_partitioning_invariant(spark):
    rows = [(i, 1.0 + (i % 7)) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id int, w double")
    a = {r.doc_id for r in weighted_sample(df, F.col("w"), "doc_id", 20).collect()}
    b = {
        r.doc_id
        for r in weighted_sample(
            df.repartition(13), F.col("w"), "doc_id", 20
        ).collect()
    }
    assert a == b


def test_weighted_sample_drops_nonpositive_weights(spark):
    df = spark.createDataFrame(
        [(1, 0.0), (2, -3.0), (3, 5.0)], "doc_id int, w double"
    )
    got = [r.doc_id for r in weighted_sample(df, F.col("w"), "doc_id", 10).collect()]
    assert got == [3]


# ---------------------------------------------------------------- budget mix


def _mix(spark, budgets, rows=None):
    from vacancy_gpt_etl_pipeline_spark.operators.sampling import budget_mix

    rows = rows or [
        (i, "a" if i % 2 == 0 else "b", 100) for i in range(20)
    ]
    df = spark.createDataFrame(rows, "doc_id int, source string, n_chars int")
    return budget_mix(df, "source", budgets, "n_chars", "doc_id"), df


def test_budget_mix_meets_budget_including_crossing_doc(spark):
    out, _ = _mix(spark, {"a": 250})
    got = out.collect()
    # uniform 100-char docs against a 250 budget: cum_before < 250 keeps
    # exactly 3 docs (0, 100, 200) → total 300 ≥ budget, crossing doc in
    assert len(got) == 3
    assert sum(r.n_chars for r in got) == 300
    assert all(r.source == "a" for r in got)


def test_budget_mix_full_stratum_when_budget_exceeds_mass(spark):
    out, df = _mix(spark, {"b": 10_000})
    assert out.count() == df.where("source = 'b'").count()


def test_budget_mix_drops_unbudgeted_strata(spark):
    out, _ = _mix(spark, {"a": 10_000})
    assert {r.source for r in out.collect()} == {"a"}


def test_budget_mix_partitioning_invariant(spark):
    out1, df = _mix(spark, {"a": 300, "b": 500})
    from vacancy_gpt_etl_pipeline_spark.operators.sampling import budget_mix

    out2 = budget_mix(
        df.repartition(7), "source", {"a": 300, "b": 500}, "n_chars", "doc_id"
    )
    assert sorted(r.doc_id for r in out1.collect()) == sorted(
        r.doc_id for r in out2.collect()
    )
