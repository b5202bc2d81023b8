"""Batch-vs-corpus near-dup gate (operators/dedup.incremental_neardup):
perturbation recall, novel-doc precision, corpus-defined ubiquity cap,
best-match ranking."""

from __future__ import annotations

from vacancy_gpt_etl_pipeline_spark.operators.dedup import incremental_neardup


def _run(spark, batch_rows, hist_rows, **kw):
    b = spark.createDataFrame(batch_rows, "doc_id long, text string")
    h = spark.createDataFrame(hist_rows, "doc_id long, text string")
    return {
        r["batch_id"]: (r["matched_id"], r["jaccard"])
        for r in incremental_neardup(b, h, **kw).collect()
    }


HIST = [
    (1, "the quick brown fox jumps over the lazy dog tonight"),
    (2, "pack my box with five dozen fresh liquor jugs today"),
    (3, "completely unrelated corpus document about sparkling rivers"),
]


def test_perturbed_refetch_matches_its_source(spark):
    batch = [(100, HIST[0][1] + " updated footer line")]
    out = _run(spark, batch, HIST, threshold=0.5)
    assert 100 in out and out[100][0] == 1
    assert out[100][1] >= 0.5


def test_novel_docs_pass_unmatched(spark):
    batch = [(200, "an entirely new submission with nothing shared")]
    out = _run(spark, batch, HIST, threshold=0.5)
    assert out == {}


def test_exact_copy_scores_one(spark):
    out = _run(spark, [(300, HIST[1][1])], HIST, threshold=0.5)
    assert out[300] == (2, 1.0)


def test_best_match_prefers_higher_jaccard_then_lower_id(spark):
    # two identical history docs: tie on jaccard -> min id wins
    hist = HIST + [(0, HIST[0][1])]
    out = _run(spark, [(400, HIST[0][1])], hist, threshold=0.5)
    assert out[400] == (0, 1.0)


def test_corpus_ubiquity_cap_drops_shared_boilerplate(spark):
    # every history doc shares the same trigram chain; with the cap at 2
    # those shingles vanish from BOTH sides, so a batch doc made of only
    # the ubiquitous chain has nothing to match on
    chain = "all rights reserved worldwide"
    hist = [(i, f"{chain} body{i} filler{i} unique{i}") for i in range(4)]
    out = _run(spark, [(500, chain)], hist, threshold=0.1, max_shingle_freq=2)
    assert out == {}
