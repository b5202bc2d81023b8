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

def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_salted_join_matches_plain_inner(spark):
    from vacancy_gpt_etl_pipeline_spark.operators.skew import salted_join

    big = spark.createDataFrame(
        [(i, "hot" if i % 10 else "cold", float(i)) for i in range(2000)],
        "id long, k string, v double",
    )
    dim = spark.createDataFrame([("hot", 1), ("cold", 2)], "k string, w int")
    got = salted_join(big, dim, ["k"], buckets=8, salt_cols=["id"])
    want = big.join(dim, ["k"])
    assert _rows(got.select("id", "k", "v", "w")) == _rows(
        want.select("id", "k", "v", "w")
    )


def test_salted_join_left_unmatched_survive_once(spark):
    from vacancy_gpt_etl_pipeline_spark.operators.skew import salted_join

    big = spark.createDataFrame(
        [(i, "a" if i % 2 else "orphan") for i in range(100)], "id long, k string"
    )
    dim = spark.createDataFrame([("a", 10)], "k string, w int")
    got = salted_join(big, dim, ["k"], buckets=4, how="left", salt_cols=["id"])
    want = big.join(dim, ["k"], "left")
    assert _rows(got.select("id", "k", "w")) == _rows(want.select("id", "k", "w"))
    # every orphan row exactly once, null weight
    assert got.where(F.col("k") == "orphan").count() == 50


def test_salted_join_spreads_hot_key_across_buckets(spark):
    """The point of the rewrite: one hot key's rows must carry >1 distinct
    salt (so >1 reducer), while results stay identical."""
    from vacancy_gpt_etl_pipeline_spark.operators.skew import salted_join, with_salt

    big = spark.createDataFrame(
        [(i, "hot") for i in range(1000)], "id long, k string"
    )
    n_salts = (
        with_salt(big, 8, salt_cols=["id"]).select("_salt").distinct().count()
    )
    assert n_salts == 8
    dim = spark.createDataFrame([("hot", 1)], "k string, w int")
    assert salted_join(big, dim, ["k"], buckets=8, salt_cols=["id"]).count() == 1000


def test_salted_join_rejects_unsupported_how(spark):
    import pytest as _pytest

    from vacancy_gpt_etl_pipeline_spark.operators.skew import salted_join

    df = spark.createDataFrame([(1, "a")], "id long, k string")
    with _pytest.raises(ValueError):
        salted_join(df, df, ["k"], how="full")
