"""Quality assertions for the probabilistic near-dup/ANN operators
(VERDICT round-1 items 7-8: the docstrings used to claim these tests
existed — now they do).

Fixture: seeded corpus of random-token docs plus planted near-duplicates
(every 5th doc gets a copy with ~10% of tokens replaced). Ground truth is
the EXACT trigram-Jaccard operator (itself DuckDB-oracle-verified), so the
probabilistic operators are measured against a trusted baseline.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from vacancy_gpt_etl_pipeline_spark.operators.dedup import (
    minhash_near_duplicates,
    ngram_jaccard_pairs,
    simhash_near_duplicates,
)
from vacancy_gpt_etl_pipeline_spark.operators.similarity import (
    knn_brute_force,
    knn_lsh,
)

VOCAB = [f"tok{i:03d}" for i in range(500)]

# planted tiers: (id offset, expected trigram-jaccard ballpark)
TIGHT = {(i, i + 10000) for i in range(0, 120, 5)}     # 2 tokens replaced, j≈0.8
NEAR_IDENTICAL = {(i, i + 20000) for i in range(0, 120, 10)}  # 1 token appended, j≈0.95


def _make_docs():
    rng = random.Random(42)
    docs = []
    for i in range(120):
        toks = [rng.choice(VOCAB) for _ in range(60)]
        docs.append((i, " ".join(toks)))
        if i % 5 == 0:  # tight near-dup: replace 2 of 60 tokens
            mutated = list(toks)
            for _ in range(2):
                mutated[rng.randrange(len(mutated))] = rng.choice(VOCAB)
            docs.append((i + 10000, " ".join(mutated)))
        if i % 10 == 0:  # near-identical: one appended token
            docs.append((i + 20000, " ".join(toks + [rng.choice(VOCAB)])))
    return docs


@pytest.fixture(scope="module")
def corpus(spark):
    df = spark.createDataFrame(_make_docs(), "doc_id long, text string")
    df.cache().count()
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def exact_pairs(corpus):
    """Ground truth: exact trigram Jaccard ≥ 0.5, no frequency cap."""
    rows = ngram_jaccard_pairs(
        corpus, "text", "doc_id", n=3, threshold=0.5, max_shingle_freq=None
    ).collect()
    return {(r["id_a"], r["id_b"]): r["jaccard"] for r in rows}


def test_fixture_plants_real_near_dups(exact_pairs):
    assert TIGHT <= set(exact_pairs), "tight near-dups must score >= 0.5"
    assert NEAR_IDENTICAL <= set(exact_pairs)
    for p in TIGHT:
        assert exact_pairs[p] >= 0.7


def test_minhash_recall_and_precision(corpus, exact_pairs):
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in minhash_near_duplicates(
            corpus, "text", "doc_id", jaccard_threshold=0.5
        ).collect()
    }
    # precision is exact by construction: candidates are verified with true
    # Jaccard before thresholding, so every emitted pair IS an exact pair
    assert set(got) <= set(exact_pairs)
    for pair, j in got.items():
        assert abs(j - exact_pairs[pair]) < 1e-6
    # banded LSH at 16 bands × 4 rows has its S-curve midpoint at
    # (1/16)^(1/4) = 0.5, so recall is only ~50% AT the threshold; assert
    # where the theory is sharp: P(candidate | j=0.7) = 1-(1-0.7^4)^16 ≈ 0.99
    high = {p for p, j in exact_pairs.items() if j >= 0.7}
    recall_high = len(set(got) & high) / len(high)
    assert recall_high >= 0.9, f"minhash recall {recall_high:.2f} on j>=0.7 pairs"


def test_minhash_max_bucket_guard_drops_degenerate_buckets(spark):
    # 80 IDENTICAL docs: every band bucket has 80 members; max_bucket=10
    # must drop them all (degenerate template, not near-dup signal)
    df = spark.createDataFrame(
        [(i, "the same exact text repeated here forever and ever amen") for i in range(80)],
        "doc_id long, text string",
    )
    guarded = minhash_near_duplicates(df, "text", "doc_id", max_bucket=10)
    assert guarded.count() == 0
    unguarded = minhash_near_duplicates(df, "text", "doc_id", max_bucket=None)
    assert unguarded.count() == 80 * 79 // 2


def test_simhash_finds_near_identical_without_pair_bomb(corpus, exact_pairs):
    got = {
        (r["id_a"], r["id_b"])
        for r in simhash_near_duplicates(corpus, "text", "doc_id").collect()
    }
    n_docs = corpus.count()
    all_pairs = n_docs * (n_docs - 1) // 2
    # sanity: not a pair bomb (round-1 emitted ~6% of all pairs)
    assert len(got) < 0.01 * all_pairs
    # hamming <= 3 at 64 bits targets near-IDENTICAL docs (boilerplate dedup,
    # Manku-style); whatever it emits must be a genuine exact near-dup
    assert got <= set(exact_pairs)
    # ...and it must catch most of the near-identical tier (j ≈ 0.95);
    # the j≈0.8 tier legitimately exceeds hamming 3 and is minhash's job
    found = got & NEAR_IDENTICAL
    assert len(found) >= len(NEAR_IDENTICAL) * 0.7, (
        f"simhash found {len(found)}/{len(NEAR_IDENTICAL)} near-identical dups"
    )


def test_simhash_rejects_unsound_hamming_budget(corpus):
    with pytest.raises(ValueError, match="pigeonhole"):
        simhash_near_duplicates(corpus, "text", "doc_id", max_hamming=8, n_tables=4)


def _embeddings(spark, n=200, dim=32):
    rng = random.Random(7)
    rows = []
    for i in range(n):
        rows.append((i, [rng.gauss(0, 1) for _ in range(dim)]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_ann_lsh_recall_vs_brute_force(spark):
    from vacancy_gpt_etl_pipeline_spark.queries import _pseudo_tables

    emb = _embeddings(spark)
    emb.cache().count()
    queries = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    tables = _pseudo_tables(8, 4, dim=32)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in knn_brute_force(emb, queries, k=10).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in knn_lsh(emb, queries, tables, k=10).collect()
    }
    recall = len(exact & approx) / len(exact)
    # 8 tables × 4 planes on gaussian data: expected recall ≈ 0.5-0.8 for
    # random near-orthogonal neighbors; must be far above the ~6% a single
    # 6-plane table gives (the round-1 design)
    assert recall >= 0.35, f"ann_lsh recall {recall:.2f}"
    emb.unpersist()


def test_ann_ivf_exhaustive_probe_equals_brute_force(spark):
    """nprobe = n_cells must degenerate to exact search — the IVF recall
    dial's boundary condition."""
    from vacancy_gpt_etl_pipeline_spark.operators.similarity import (
        knn_ivf,
        sampled_centroids,
    )

    emb = _embeddings(spark)
    emb.cache().count()
    queries = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    cents = sampled_centroids(emb, 8, 23)
    exact = {
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in knn_brute_force(emb, queries, k=10).collect()
    }
    full_probe = {
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in knn_ivf(emb, queries, cents, k=10, nprobe=8).collect()
    }
    assert full_probe == exact
    emb.unpersist()


def test_ann_ivf_partial_probe_recall(spark):
    from vacancy_gpt_etl_pipeline_spark.operators.similarity import (
        knn_ivf,
        sampled_centroids,
    )

    emb = _embeddings(spark)
    emb.cache().count()
    queries = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    cents = sampled_centroids(emb, 8, 23)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in knn_brute_force(emb, queries, k=10).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in knn_ivf(emb, queries, cents, k=10, nprobe=3).collect()
    }
    recall = len(exact & approx) / len(exact)
    # probing 3/8 cells of gaussian data: recall must beat the ~3/8
    # random-cell floor (centroid-directed probing is the whole point)
    assert recall >= 0.35, f"ann_ivf recall {recall:.2f}"
    emb.unpersist()


def test_lloyd_refine_descends_inertia_and_preserves_k(spark):
    from vacancy_gpt_etl_pipeline_spark.operators.similarity import (
        ivf_inertia,
        lloyd_refine,
        sampled_centroids,
    )

    emb = _embeddings(spark, n=150)
    emb.cache().count()
    seeds = sampled_centroids(emb, 6, 17)
    before = ivf_inertia(emb, seeds)
    refined = lloyd_refine(emb, seeds, iters=2)
    assert refined.count() == 6, "Lloyd must never lose a cell"
    after = ivf_inertia(emb, refined)
    assert after <= before + 1e-9, f"inertia rose: {before:.4f} -> {after:.4f}"
    emb.unpersist()


def test_ann_lsh_is_exact_for_near_identical_vectors(spark):
    from vacancy_gpt_etl_pipeline_spark.queries import _pseudo_tables

    emb = _embeddings(spark, n=100)
    # plant a near-identical copy of each query vector
    planted = emb.where(F.col("vec_id") < 5).select(
        (F.col("vec_id") + 1000).alias("vec_id"),
        F.transform("embedding", lambda x: x * F.lit(1.001)).alias("embedding"),
    )
    full = emb.unionByName(planted)
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = knn_lsh(full, queries, _pseudo_tables(8, 4, dim=32), k=1).collect()
    # the scaled twin (cosine 1.0) must be every query's top-1
    assert {(r["query_id"], r["neighbor_id"]) for r in got} == {
        (i, i + 1000) for i in range(5)
    }


# --- winnowing (rolling-hash) fingerprints ---------------------------------


def test_winnowing_guarantee_catches_planted_near_dups(spark, corpus):
    """The winnowing guarantee: any shared substring of length >= w+k-1
    chars yields a shared fingerprint. Planted near-dups share long runs of
    identical tokens, so every planted pair must surface as a candidate."""
    from vacancy_gpt_etl_pipeline_spark.operators.dedup import winnowing_pairs

    got = {
        (r["id_a"], r["id_b"])
        for r in winnowing_pairs(
            corpus, "text", "doc_id", k=16, w=16, min_shared=5, max_fp_freq=None
        ).collect()
    }
    assert TIGHT <= got
    assert NEAR_IDENTICAL <= got


def test_winnowing_density_is_about_two_over_w_plus_one(spark, corpus):
    """Winnowing keeps ~2/(w+1) of the gram hashes (SIGMOD'03 density bound
    for random input). Check the measured ratio lands near the theoretical
    density — this is the w/2x posting-volume reduction the operator exists
    for."""
    from vacancy_gpt_etl_pipeline_spark.operators.dedup import winnow_fingerprints

    k, w = 16, 16
    n_fps = winnow_fingerprints(corpus, "text", "doc_id", k=k, w=w).count()
    n_grams = (
        corpus.select(
            (
                F.length(F.regexp_replace(F.lower("text"), "[^a-z0-9]", "")) - k + 1
            ).alias("g")
        )
        .agg(F.sum(F.greatest("g", F.lit(0))))
        .collect()[0][0]
    )
    density = n_fps / n_grams
    expected = 2 / (w + 1)
    # distinct-collapse pushes the ratio slightly below 2/(w+1)
    assert 0.5 * expected < density < 1.5 * expected, (density, expected)


def test_winnowing_short_docs_produce_no_fingerprints(spark):
    from vacancy_gpt_etl_pipeline_spark.operators.dedup import winnow_fingerprints

    df = spark.createDataFrame(
        [(1, "tiny doc"), (2, "x" * 40)], "doc_id long, text string"
    )
    out = winnow_fingerprints(df, "text", "doc_id", k=16, w=16).collect()
    # doc 1 has < k+w-1=31 normalized chars -> nothing; doc 2 qualifies
    assert {r["doc_id"] for r in out} == {2}


def test_winnowing_fp_freq_cap_drops_ubiquitous_spans(spark):
    """A span shared by MANY docs is a stop-gram, not near-dup signal: with
    the cap at 20, a 30-doc common prefix contributes no candidates."""
    from vacancy_gpt_etl_pipeline_spark.operators.dedup import winnowing_pairs

    common = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(i, common + f" unique tail {i} " + "z" * i) for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    capped = winnowing_pairs(
        df, "text", "doc_id", k=16, w=16, min_shared=1, max_fp_freq=20
    ).count()
    uncapped = winnowing_pairs(
        df, "text", "doc_id", k=16, w=16, min_shared=1, max_fp_freq=None
    ).count()
    assert uncapped > 0
    assert capped < uncapped


def test_adaptive_ivf_recall_bounds(spark, sf_dir):
    from pyspark.sql import functions as F
    from vacancy_gpt_etl_pipeline_spark.operators.similarity import (
        knn_brute_force,
        knn_ivf,
        knn_ivf_adaptive,
        sampled_centroids,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = sampled_centroids(emb, 8, 61)
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )

    def pairs(df):
        return {(r["query_id"], r["neighbor_id"]) for r in df.collect()}

    truth = pairs(knn_brute_force(emb, queries, k=10, dim=64))
    lo = pairs(knn_ivf(emb, queries, cents, k=10, nprobe=1, dim=64))
    adapt = pairs(
        knn_ivf_adaptive(
            emb, queries, cents, k=10, nprobe_lo=1, nprobe_hi=4,
            min_kth_cosine=0.25, dim=64,
        )
    )
    # escalation can only help: adaptive recall >= cheap-pass recall
    assert len(adapt & truth) >= len(lo & truth)
    # tau >= 1: every query escalates -> identical to plain nprobe_hi
    all_hi = pairs(knn_ivf(emb, queries, cents, k=10, nprobe=4, dim=64))
    forced = pairs(
        knn_ivf_adaptive(
            emb, queries, cents, k=10, nprobe_lo=1, nprobe_hi=4,
            min_kth_cosine=1.0, dim=64,
        )
    )
    assert forced == all_hi


def test_adaptive_ivf_escalates_zero_result_queries(spark):
    # a query alone in its probed cell (self-match excluded) gets ZERO
    # lo rows; it must still escalate and match plain nprobe_hi —
    # judging weakness from the lo RESULT set would lose it entirely
    from pyspark.sql import Row
    from vacancy_gpt_etl_pipeline_spark.operators.similarity import (
        knn_ivf,
        knn_ivf_adaptive,
    )

    emb = spark.createDataFrame(
        [
            Row(vec_id=0, embedding=[1.0, 0.0]),   # query, isolated cell
            Row(vec_id=1, embedding=[-1.0, 0.05]),
            Row(vec_id=2, embedding=[-1.0, 0.1]),
            Row(vec_id=3, embedding=[-1.0, 0.2]),
        ]
    )
    cents = spark.createDataFrame(
        [Row(cell=0, centroid=[1.0, 0.0]), Row(cell=1, centroid=[-1.0, 0.0])]
    )
    queries = emb.where("vec_id = 0").selectExpr("vec_id AS query_id", "embedding")
    plain_hi = knn_ivf(emb, queries, cents, k=3, nprobe=2, dim=2)
    adapt = knn_ivf_adaptive(
        emb, queries, cents, k=3, nprobe_lo=1, nprobe_hi=2,
        min_kth_cosine=0.0, dim=2,
    )
    assert sorted(map(tuple, adapt.collect())) == sorted(map(tuple, plain_hi.collect()))
    assert adapt.count() == 3  # not empty


def test_embedding_near_dup_lsh_recall_vs_exact(spark):
    """VERDICT r6 item 5 family: an algorithm-independent quality bound
    for the LSH-bucketed embedding near-dup detector. Ground truth is
    the EXACT all-pairs variant (planes=None) on the same vectors; the
    bucketed detector must recover ≥90% of true pairs (16 planes ×
    near-identical vectors — a bucket split is possible but rare) at
    perfect precision (its scored pairs are a subset of candidates,
    same cosine threshold)."""
    import math
    import random as _r

    from vacancy_gpt_etl_pipeline_spark.operators.similarity import (
        embedding_near_duplicates,
    )
    from vacancy_gpt_etl_pipeline_spark.queries import _pseudo_tables

    rng = _r.Random(7)
    dim = 16
    vecs = []
    for i in range(40):
        v = [rng.gauss(0, 1) for _ in range(dim)]
        n = math.sqrt(sum(x * x for x in v))
        vecs.append((i, [x / n for x in v]))
        # planted twin: tiny perturbation → cosine ≈ 1
        vecs.append((i + 1000, [x / n + 0.001 * rng.gauss(0, 1) for x in v]))
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    planes = _pseudo_tables(1, 12, dim=dim)[0]
    exact = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_duplicates(df, threshold=0.95, dim=dim).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_duplicates(
            df, threshold=0.95, planes=planes, dim=dim
        ).collect()
    }
    assert exact, "fixture must plant true near-dup pairs"
    assert lsh <= exact  # precision 1: same threshold, fewer candidates
    assert len(lsh) / len(exact) >= 0.9


def test_ann_ivf_int8_recall_vs_full_precision(spark):
    """The int8 tier's quantization cost, isolated: same cells, same
    probes, so any top-k difference vs knn_ivf comes ONLY from int8
    rounding. Unit-normalized 32-dim gaussians quantized at 1/127
    granularity perturb cosines by ~1e-2 — neighbor-set overlap must
    stay near-perfect, and end-to-end recall vs brute force must match
    the full-precision tier's bound."""
    from vacancy_gpt_etl_pipeline_spark.operators.similarity import (
        knn_ivf,
        knn_ivf_int8,
        sampled_centroids,
    )

    emb = _embeddings(spark)
    emb.cache().count()
    queries = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    cents = sampled_centroids(emb, 8, 23)
    full = {
        (r["query_id"], r["neighbor_id"])
        for r in knn_ivf(emb, queries, cents, k=10, nprobe=3, dim=32).collect()
    }
    q8 = {
        (r["query_id"], r["neighbor_id"])
        for r in knn_ivf_int8(
            emb, queries, cents, k=10, nprobe=3, dim=32
        ).collect()
    }
    overlap = len(full & q8) / len(full)
    assert overlap >= 0.9, f"int8-vs-float top-k overlap {overlap:.2f}"
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in knn_brute_force(emb, queries, k=10).collect()
    }
    recall = len(exact & q8) / len(exact)
    assert recall >= 0.35, f"ann_ivf_int8 recall {recall:.2f}"
    emb.unpersist()


def test_ann_ivf_int8_candidate_frame_is_tinyint(spark):
    """The 100 TB point of the tier: the frame entering the probe join
    carries array<tinyint> (1 B/component), never the float vectors."""
    from vacancy_gpt_etl_pipeline_spark.operators.similarity import (
        quantize_unit_int8,
    )

    emb = _embeddings(spark, n=20)
    q = quantize_unit_int8(emb, "embedding", dim=32, out_col="qvec")
    assert dict(q.dtypes)["qvec"] == "array<tinyint>"
    assert "embedding" not in q.columns
    row = q.where(F.col("vec_id") == 0).collect()[0]
    assert all(-127 <= v <= 127 for v in row["qvec"])
    # unit-normalized: sum of squares of q/127 ≈ 1
    ss = sum((v / 127.0) ** 2 for v in row["qvec"])
    assert 0.9 <= ss <= 1.1, ss


def test_ann_ivf_pq_rescore_recovers_recall(spark):
    """IVFPQ+refine contract: plain ADC over 16 codewords is lossy on
    structure-free gaussians (the PQ worst case), but re-ranking the
    ADC top-4k short-list by exact cosine must recover recall to
    near-IVF (same cells, same probes) — the canonical two-stage
    recipe. Also pins the ADC-only floor so a codebook/LUT regression
    can't hide behind the refine stage."""
    from vacancy_gpt_etl_pipeline_spark.operators.similarity import (
        knn_ivf,
        knn_ivf_pq,
        sampled_centroids,
    )

    emb = _embeddings(spark)
    emb.cache().count()
    queries = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    cents = sampled_centroids(emb, 8, 23)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in knn_brute_force(emb, queries, k=10).collect()
    }
    ivf = {
        (r["query_id"], r["neighbor_id"])
        for r in knn_ivf(emb, queries, cents, k=10, nprobe=3, dim=32).collect()
    }
    adc = {
        (r["query_id"], r["neighbor_id"])
        for r in knn_ivf_pq(
            emb, queries, cents, k=10, nprobe=3, m=8, n_codes=16,
            code_stride=11, dim=32,
        ).collect()
    }
    refined = {
        (r["query_id"], r["neighbor_id"])
        for r in knn_ivf_pq(
            emb, queries, cents, k=10, nprobe=3, m=8, n_codes=16,
            code_stride=11, dim=32, rescore_mult=4,
        ).collect()
    }
    adc_recall = len(exact & adc) / len(exact)
    refined_recall = len(exact & refined) / len(exact)
    ivf_recall = len(exact & ivf) / len(exact)
    # ADC floor: well above the random-10-of-200 baseline (0.05)
    assert adc_recall >= 0.2, f"ADC recall {adc_recall:.2f}"
    # refine recovers near-IVF recall (measured 0.61 vs 0.63)
    assert refined_recall >= ivf_recall - 0.1, (
        f"refined {refined_recall:.2f} vs ivf {ivf_recall:.2f}"
    )
    overlap = len(ivf & refined) / len(ivf)
    assert overlap >= 0.8, f"refined-vs-ivf overlap {overlap:.2f}"
    emb.unpersist()


def test_pq_encode_codes_are_tinyint_and_in_range(spark):
    """The 100 TB claim: candidates shuffle m tinyint codes (8 B at
    m=8), never vectors."""
    from vacancy_gpt_etl_pipeline_spark.operators.similarity import (
        pq_codebook,
        pq_encode,
    )

    emb = _embeddings(spark, n=60)
    cb = pq_codebook(emb, n_codes=16, stride=3)
    enc = pq_encode(emb.select("vec_id", "embedding"), cb, m=8, sub=4)
    dts = dict(enc.dtypes)
    assert [dts[f"code_{s}"] for s in range(8)] == ["tinyint"] * 8
    assert "embedding" not in enc.columns
    rows = enc.collect()
    assert len(rows) == 60
    for r in rows:
        for s in range(8):
            assert 0 <= r[f"code_{s}"] < 16
