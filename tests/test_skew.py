"""Salted-aggregation skew helpers + the frequent-shingle cap actually
biting (round-1 ADVICE: the capped ngram path was never exercised where the
cap changes the result)."""

from __future__ import annotations

from pyspark.sql import functions as F

from vacancy_gpt_etl_pipeline_spark.operators.dedup import ngram_jaccard_pairs
from vacancy_gpt_etl_pipeline_spark.operators.skew import (
    salted_agg,
    salted_collect_set,
)


def test_salted_agg_matches_plain_groupby(spark):
    rows = [(k % 3, float(k)) for k in range(1000)] + [(0, 1.0)] * 500  # hot key 0
    df = spark.createDataFrame(rows, "k int, v double")
    got = {
        r["k"]: (r["cnt"], r["tot"])
        for r in salted_agg(
            df,
            ["k"],
            {"cnt": (F.count("*"), F.sum("cnt")), "tot": (F.sum("v"), F.sum("tot"))},
            buckets=8,
        ).collect()
    }
    want = {
        r["k"]: (r["cnt"], r["tot"])
        for r in df.groupBy("k")
        .agg(F.count("*").alias("cnt"), F.sum("v").alias("tot"))
        .collect()
    }
    assert got == want


def test_salted_collect_set_matches_plain(spark):
    rows = [(k % 2, f"v{k % 50}") for k in range(2000)]
    df = spark.createDataFrame(rows, "k int, v string")
    got = {
        r["k"]: sorted(r["values"])
        for r in salted_collect_set(df, ["k"], "v", buckets=8).collect()
    }
    want = {
        r["k"]: sorted(r["s"])
        for r in df.groupBy("k").agg(F.collect_set("v").alias("s")).collect()
    }
    assert got == want


def test_salted_agg_stage1_groups_by_salt(spark):
    """The salted plan must contain a (key, salt) aggregate — i.e. the hot
    key really is split across buckets before the final merge."""
    df = spark.createDataFrame([(1, 1.0)], "k int, v double")
    out = salted_agg(df, ["k"], {"cnt": (F.count("*"), F.sum("cnt"))}, buckets=4)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "_salt" in plan


def test_ngram_cap_actually_bites(spark):
    """Docs sharing ONLY a ubiquitous boilerplate shingle must pair without
    the cap and not pair with it (the cap removes the degenerate signal);
    sizes must be post-filter so genuinely similar docs keep a full-strength
    jaccard even when boilerplate is stripped."""
    boiler = "copyright acme corp"
    docs = [(i, f"unique{i}a unique{i}b {boiler}") for i in range(30)]
    # two genuinely similar docs sharing real content AND the boilerplate
    docs += [(100, f"alpha beta gamma delta {boiler}"), (101, f"alpha beta gamma delta {boiler} extra")]
    df = spark.createDataFrame(docs, "doc_id long, text string")

    uncapped = ngram_jaccard_pairs(df, threshold=0.19, max_shingle_freq=None)
    # every doc contains the boiler shingle → lots of boilerplate-only pairs
    assert uncapped.count() > 100

    capped = ngram_jaccard_pairs(df, threshold=0.19, max_shingle_freq=10)
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in capped.collect()}
    # boilerplate-only pairs are gone; the genuinely-similar pair survives
    assert (100, 101) in got
    assert all(a in (100,) or a >= 100 for a, b in got), f"boiler pairs leaked: {got}"
    # post-filter sizes: doc100 has 4 post-cap shingles ('alpha beta gamma',
    # 'beta gamma delta', + 2 with boiler words dropped... compute from data)
    assert got[(100, 101)] > 0.3  # strong score despite boilerplate removal