"""Closed-form tests for the corpus-audit queries: n-gram novelty,
source n-gram overlap, and curriculum ordering."""

from __future__ import annotations

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


def test_ngram_novelty_closed_form(spark, tmp_path):
    from vacancy_gpt_etl_pipeline_spark.queries import REGISTRY

    # doc0 grams: {a b c, b c d}; doc1 grams: {a b c, b c x}
    # df: "a b c"->2, "b c d"->1, "b c x"->1
    # doc2 is too short for any 3-gram
    texts = ["a b c d", "a b c x", "a b"]
    _write_docs(tmp_path, texts, ["s"] * 3)
    rows = {
        r["doc_id"]: r
        for r in REGISTRY["ngram_novelty"].spark(spark, str(tmp_path)).collect()
    }
    assert (rows[0]["n_grams"], rows[0]["n_unique"]) == (2, 1)
    assert rows[0]["novelty"] == 0.5
    assert (rows[1]["n_grams"], rows[1]["n_unique"]) == (2, 1)
    assert (rows[2]["n_grams"], rows[2]["n_unique"]) == (0, 0)
    assert rows[2]["novelty"] == 0.0


def test_ngram_novelty_repeated_gram_within_doc_counts_once(spark, tmp_path):
    from vacancy_gpt_etl_pipeline_spark.queries import REGISTRY

    # "a b a b a" has grams [a b a, b a b, a b a] -> distinct {a b a, b a b}
    _write_docs(tmp_path, ["a b a b a"], ["s"])
    (r,) = REGISTRY["ngram_novelty"].spark(spark, str(tmp_path)).collect()
    assert (r["n_grams"], r["n_unique"], r["novelty"]) == (2, 2, 1.0)


def test_source_ngram_overlap_closed_form(spark, tmp_path):
    from vacancy_gpt_etl_pipeline_spark.queries import REGISTRY

    # sA: {a b c, b c d} ; sB: {a b c} ; sC: {x y z}
    texts = ["a b c d", "a b c", "x y z"]
    _write_docs(tmp_path, texts, ["sA", "sB", "sC"])
    rows = {
        (r["source_a"], r["source_b"]): r
        for r in REGISTRY["source_ngram_overlap"]
        .spark(spark, str(tmp_path))
        .collect()
    }
    # disjoint pairs produce no row (inner join on shared grams)
    assert set(rows) == {("sA", "sB")}
    r = rows[("sA", "sB")]
    assert r["n_shared"] == 1
    assert r["jaccard"] == pytest.approx(1 / 2)  # 1 / (2 + 1 - 1)


def test_curriculum_order_phases(spark, tmp_path):
    from vacancy_gpt_etl_pipeline_spark.queries import REGISTRY

    # 8 docs in one source: ranks 1..8 -> phases 0,0,1,1,2,2,3,3
    texts = ["word " * (10 * (i + 1)) for i in range(8)]
    _write_docs(tmp_path, texts, ["s0"] * 8)
    rows = (
        REGISTRY["curriculum_order_docs"].spark(spark, str(tmp_path)).collect()
    )
    assert [r["phase"] for r in rows] == [0, 0, 1, 1, 2, 2, 3, 3]
    assert [r["rank_in_source"] for r in rows] == list(range(1, 9))
    # ranks descend by quality, ties impossible here; phases partition
    qualities = [r["quality"] for r in rows]
    assert qualities == sorted(qualities, reverse=True)


def test_curriculum_order_tie_break_on_doc_id(spark, tmp_path):
    from vacancy_gpt_etl_pipeline_spark.queries import REGISTRY

    # identical texts -> identical quality; rank must follow doc_id
    _write_docs(tmp_path, ["same text here ok"] * 4, ["s0"] * 4)
    rows = (
        REGISTRY["curriculum_order_docs"].spark(spark, str(tmp_path)).collect()
    )
    assert [r["doc_id"] for r in rows] == [0, 1, 2, 3]
    assert [r["rank_in_source"] for r in rows] == [1, 2, 3, 4]


def test_training_mix_e2e_invariants(spark, tmp_path):
    """Pipeline composition invariants: dedup really removed the clone,
    the quality gate matches the classifier query's keep flags, and
    shares sum to 1."""
    from vacancy_gpt_etl_pipeline_spark.queries import REGISTRY

    texts = [
        "table scan merge join filter",
        "table scan merge join filter",  # exact dup of doc 0
        "agg window sort batch",
        "value part hash key",
        "small big fast slow",
    ]
    _write_docs(tmp_path, texts, ["sA", "sB", "sA", "sB", "sA"])
    mix = {
        r["source"]: r
        for r in REGISTRY["training_mix_e2e"].spark(spark, str(tmp_path)).collect()
    }
    qc = {
        r["doc_id"]: r["keep_quality"]
        for r in REGISTRY["quality_classifier_scores"]
        .spark(spark, str(tmp_path))
        .collect()
    }
    # doc 1 deduped away (doc 0 keeps the fingerprint); survivors are
    # the quality-kept among {0, 2, 3, 4}
    kept = [d for d in (0, 2, 3, 4) if qc[d]]
    want_by_src = {}
    for d in kept:
        src = ["sA", "sB", "sA", "sB", "sA"][d]
        want_by_src[src] = want_by_src.get(src, 0) + 1
    assert {s: r["n_docs"] for s, r in mix.items()} == want_by_src
    assert sum(r["share"] for r in mix.values()) == pytest.approx(1.0)
    # every source's packs cover its docs: n_packs >= 1, <= n_docs
    for r in mix.values():
        assert 1 <= r["n_packs"] <= r["n_docs"]


def test_cluster_cohesion_closed_form(spark, tmp_path):
    """|sum of units|^2 identity on hand vectors: label 0 has two
    identical unit vectors (mean pairwise cos = 1), label 1 has two
    orthogonal ones (cos = 0), label 2 has opposite ones (cos = -1);
    a singleton label is excluded (no pairs)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from vacancy_gpt_etl_pipeline_spark.queries import REGISTRY

    vecs = [
        (0, [1.0, 0.0]), (1, [1.0, 0.0]),          # label 0: identical
        (2, [1.0, 0.0]), (3, [0.0, 1.0]),          # label 1: orthogonal
        (4, [1.0, 0.0]), (5, [-1.0, 0.0]),         # label 2: opposite
        (6, [0.5, 0.5]),                           # label 3: singleton
    ]
    labels = [0, 0, 1, 1, 2, 2, 3]
    tbl = pa.table(
        {
            "vec_id": pa.array([v[0] for v in vecs], type=pa.int64()),
            "embedding": pa.array(
                [v[1] for v in vecs], type=pa.list_(pa.float32())
            ),
            "label": pa.array(labels, type=pa.int32()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))
    rows = {
        r["label"]: r
        for r in REGISTRY["cluster_cohesion_embeddings"]
        .spark(spark, str(tmp_path))
        .collect()
    }
    assert set(rows) == {0, 1, 2}  # singleton label 3 excluded
    assert rows[0]["mean_pairwise_cos"] == pytest.approx(1.0, abs=1e-9)
    assert rows[1]["mean_pairwise_cos"] == pytest.approx(0.0, abs=1e-9)
    assert rows[2]["mean_pairwise_cos"] == pytest.approx(-1.0, abs=1e-9)


def test_cluster_cohesion_matches_brute_force(spark, tmp_path):
    """Identity check against the O(n^2) definition on random vectors:
    quantization at 1e9 bounds the cosine error near 1e-7."""
    import math
    import random

    import pyarrow as pa
    import pyarrow.parquet as pq

    from vacancy_gpt_etl_pipeline_spark.queries import REGISTRY

    rng = random.Random(41)
    dim, per_label = 16, 9
    vecs, labels = [], []
    for lbl in range(3):
        for _ in range(per_label):
            vecs.append([rng.gauss(0, 1) for _ in range(dim)])
            labels.append(lbl)
    tbl = pa.table(
        {
            "vec_id": pa.array(range(len(vecs)), type=pa.int64()),
            "embedding": pa.array(vecs, type=pa.list_(pa.float32())),
            "label": pa.array(labels, type=pa.int32()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))
    rows = {
        r["label"]: r["mean_pairwise_cos"]
        for r in REGISTRY["cluster_cohesion_embeddings"]
        .spark(spark, str(tmp_path))
        .collect()
    }

    # brute force from the float32 values (what the operator reads)
    import numpy as np

    f32 = np.array(vecs, dtype=np.float32).astype(np.float64)
    for lbl in range(3):
        xs = f32[np.array(labels) == lbl]
        units = xs / np.linalg.norm(xs, axis=1, keepdims=True)
        n = len(units)
        total = 0.0
        for i in range(n):
            for j in range(n):
                if i != j:
                    total += float(units[i] @ units[j])
        want = total / (n * (n - 1))
        assert rows[lbl] == pytest.approx(want, abs=1e-6), lbl
