"""Stratified sampling determinism (operators/sampling.py) and sequence
packing invariants (operators/packing.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from vacancy_gpt_etl_pipeline_spark.operators.packing import (
    pack_sequences,
    pack_summary,
)
from vacancy_gpt_etl_pipeline_spark.operators.sampling import (
    hash_permille,
    stratified_sample,
)


def _docs(spark, n=1000):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 3 == 0, "en").otherwise("de").alias("lang"),
    )


def test_sample_is_deterministic_and_repartition_stable(spark):
    docs = _docs(spark)
    rates = {"en": 0.5, "de": 0.1}
    a = {r["doc_id"] for r in stratified_sample(docs, "lang", rates, "doc_id").collect()}
    b = {
        r["doc_id"]
        for r in stratified_sample(
            docs.repartition(13), "lang", rates, "doc_id"
        ).collect()
    }
    assert a == b  # partitioning must not change the kept set
    assert len(a) > 0


def test_sample_rates_approximate_fractions(spark):
    docs = _docs(spark, 3000)
    out = (
        stratified_sample(docs, "lang", {"en": 0.5, "de": 0.1}, "doc_id")
        .groupBy("lang")
        .count()
        .collect()
    )
    got = {r["lang"]: r["count"] for r in out}
    # md5 is uniform: expect ~500/1000 en and ~200/2000 de, generous bounds
    assert 400 <= got["en"] <= 600
    assert 120 <= got["de"] <= 280


def test_sample_default_rate_drops_unlisted_strata(spark):
    docs = _docs(spark)
    out = stratified_sample(docs, "lang", {"en": 1.0}, "doc_id")
    langs = {r["lang"] for r in out.select("lang").distinct().collect()}
    assert langs == {"en"}
    assert out.count() == docs.where(F.col("lang") == "en").count()  # 100% kept


def test_hash_permille_range(spark):
    vals = (
        spark.range(500)
        .select(hash_permille(F.col("id")).alias("p"))
        .agg(F.min("p"), F.max("p"))
        .first()
    )
    assert 0 <= vals[0] and vals[1] < 1000


def _packdocs(spark):
    rows = [(f"s{i % 2}", i, "tok " * (10 * (1 + i % 3))) for i in range(40)]
    return spark.createDataFrame(rows, "source string, doc_id long, text string")


def test_packing_totality_and_budget(spark):
    docs = _packdocs(spark)
    packed = pack_sequences(docs, target_tokens=50, by="source")
    assert packed.count() == docs.count()  # every doc in exactly one pack
    summary = pack_summary(packed, "source").collect()
    for r in summary:
        # offset-bin rule: a pack holds docs whose START offset is inside
        # the bin, so pack_tokens < target + max_doc_tokens (here 30+1)
        assert r["pack_tokens"] < 50 + 31
    # pack ids are dense from 0 per stratum
    for src in ("s0", "s1"):
        ids = sorted(
            r["pack_id"] for r in summary if r["source"] == src
        )
        assert ids == list(range(len(ids)))


def test_packing_deterministic_under_repartition(spark):
    docs = _packdocs(spark)
    a = {(r["doc_id"], r["pack_id"]) for r in pack_sequences(docs, 50, "source").collect()}
    b = {
        (r["doc_id"], r["pack_id"])
        for r in pack_sequences(docs.repartition(7), 50, "source").collect()
    }
    assert a == b


# ---------------------------------------------------------------------------
# deterministic shuffle-shard manifest
# ---------------------------------------------------------------------------


def test_shuffle_shards_total_dense_and_repartition_stable(spark):
    from pyspark.sql import functions as F

    from vacancy_gpt_etl_pipeline_spark.operators.sampling import (
        shuffle_shards,
    )

    df = spark.createDataFrame([(i,) for i in range(200)], "doc_id long")
    out = {
        r["doc_id"]: (r["shard_id"], r["pos_in_shard"])
        for r in shuffle_shards(df, "doc_id", num_shards=8).collect()
    }
    # totality: every doc exactly once
    assert len(out) == 200
    # density: positions per shard are exactly 1..size
    per_shard = {}
    for shard, pos in out.values():
        per_shard.setdefault(shard, []).append(pos)
    assert set(per_shard) <= set(range(8))
    for shard, poss in per_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1))
    # determinism: identical manifest from a differently-partitioned input
    re = {
        r["doc_id"]: (r["shard_id"], r["pos_in_shard"])
        for r in shuffle_shards(
            df.repartition(7), "doc_id", num_shards=8
        ).collect()
    }
    assert re == out


def test_shuffle_shards_salt_reshuffles(spark):
    from vacancy_gpt_etl_pipeline_spark.operators.sampling import (
        shuffle_shards,
    )

    df = spark.createDataFrame([(i,) for i in range(100)], "doc_id long")
    a = {
        r["doc_id"]: (r["shard_id"], r["pos_in_shard"])
        for r in shuffle_shards(df, "doc_id", salt="epoch0").collect()
    }
    b = {
        r["doc_id"]: (r["shard_id"], r["pos_in_shard"])
        for r in shuffle_shards(df, "doc_id", salt="epoch1").collect()
    }
    assert a != b  # a new salt is a new global order
    assert set(a) == set(b)  # but the same total doc set


def test_kfold_disjoint_exhaustive_balanced(spark):
    from pyspark.sql import Row
    from vacancy_gpt_etl_pipeline_spark.operators.sampling import kfold_assign

    df = spark.createDataFrame([Row(k=i) for i in range(1000)])
    out = kfold_assign(df, "k", k=5).collect()
    # exhaustive: every row gets exactly one fold in [0, 5)
    assert len(out) == 1000 and all(0 <= r["fold"] < 5 for r in out)
    sizes = {}
    for r in out:
        sizes[r["fold"]] = sizes.get(r["fold"], 0) + 1
    # md5 residues are near-uniform: every fold within 2x of ideal 200
    assert set(sizes) == {0, 1, 2, 3, 4}
    assert all(100 <= s <= 400 for s in sizes.values()), sizes
    # reproducible, and salt decorrelates
    again = {r["k"]: r["fold"] for r in kfold_assign(df, "k", k=5).collect()}
    other = {r["k"]: r["fold"] for r in kfold_assign(df, "k", k=5, salt="x").collect()}
    first = {r["k"]: r["fold"] for r in out}
    assert again == first and other != first
