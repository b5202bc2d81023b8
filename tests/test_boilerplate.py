"""Corpus-frequency boilerplate removal
(operators/curation.remove_boilerplate_ngrams): hand-computed coverage,
reassembly order, short-doc totality, threshold edge."""

from __future__ import annotations

from vacancy_gpt_etl_pipeline_spark.operators.curation import (
    remove_boilerplate_ngrams,
)


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {
        r["doc_id"]: r
        for r in remove_boilerplate_ngrams(df, **kw).collect()
    }


def test_planted_banner_stripped_from_every_doc(spark):
    banner = "accept all cookies now"
    bodies = [
        "alpha beta gamma delta epsilon",
        "zeta eta theta iota kappa",
        "lam mu nu xi omicron",
    ]
    rows = [(i, f"{banner} {b}") for i, b in enumerate(bodies)]
    out = _run(spark, rows, n=3, min_doc_frequency=3)
    for i, b in enumerate(bodies):
        r = out[i]
        # banner trigrams appear in all 3 docs -> df 3 -> all 4 banner
        # tokens covered; body trigrams are unique -> untouched
        assert r["cleaned_text"] == b
        assert r["n_tokens"] == 4 + 5 and r["n_kept"] == 5
        assert abs(r["boilerplate_frac"] - 4 / 9) < 1e-6


def test_threshold_edge_df_below_min_keeps_text(spark):
    banner = "accept all cookies now"
    rows = [
        (1, f"{banner} alpha beta gamma"),
        (2, f"{banner} delta epsilon zeta"),
    ]
    out = _run(spark, rows, n=3, min_doc_frequency=3)  # df=2 < 3
    assert out[1]["cleaned_text"] == f"{banner} alpha beta gamma"
    assert out[1]["n_kept"] == out[1]["n_tokens"]
    assert out[1]["boilerplate_frac"] == 0.0


def test_reassembly_preserves_interior_gap_order(spark):
    # boilerplate in the MIDDLE: surviving prefix+suffix must rejoin in
    # original order
    shared = "one two three"
    rows = [(i, f"head{i} {shared} tail{i}") for i in range(5)]
    out = _run(spark, rows, n=3, min_doc_frequency=5)
    for i in range(5):
        assert out[i]["cleaned_text"] == f"head{i} tail{i}"
        assert out[i]["n_kept"] == 2


def test_docs_shorter_than_n_pass_through(spark):
    rows = [(1, "just two"), (2, "one"), (3, "a b c d e")]
    out = _run(spark, rows, n=3, min_doc_frequency=2)
    assert out[1]["cleaned_text"] == "just two"
    assert out[2]["cleaned_text"] == "one"
    assert out[3]["cleaned_text"] == "a b c d e"
    assert all(out[k]["boilerplate_frac"] == 0.0 for k in out)


def test_overlapping_boilerplate_positions_counted_once(spark):
    # "x x x x" in every doc: overlapping trigram occurrences cover
    # positions 1-4 once each — frac is 4/6, not inflated by overlap
    rows = [(i, f"x x x x uniq{i} tail{i}") for i in range(4)]
    out = _run(spark, rows, n=3, min_doc_frequency=4)
    for i in range(4):
        assert out[i]["cleaned_text"] == f"uniq{i} tail{i}"
        assert out[i]["n_tokens"] == 6 and out[i]["n_kept"] == 2


def test_adaptive_quality_floor_matches_python_rank_math(spark):
    """Floor per stratum == smallest q with ceil(0.25*n) docs scoring <= q,
    recomputed independently in Python from the profiled qualities."""
    import math

    from vacancy_gpt_etl_pipeline_spark.operators.curation import (
        adaptive_quality_floor,
        profile_for_curation,
    )

    rows = [
        (i, lang, f"{'word ' * (5 + (i * 7) % 40)}doc {lang} {i}")
        for i, lang in enumerate(
            ["en"] * 11 + ["de"] * 7 + ["zh"] * 1  # odd sizes + singleton
        )
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")

    quals = {}
    for r in profile_for_curation(df).join(
        df.select("doc_id", "lang"), "doc_id"
    ).collect():
        quals.setdefault(r["lang"], []).append(r["quality"])
    expected_floor = {
        lang: sorted(q)[math.ceil(0.25 * len(q)) - 1]
        for lang, q in quals.items()
    }

    out = adaptive_quality_floor(df, stratum_col="lang").collect()
    got_floor = {r["lang"]: r["lang_floor"] for r in out}
    assert got_floor == expected_floor
    # every surviving doc clears its stratum floor; the dropped count is
    # below ceil(0.25*n) (ties at the floor survive by design)
    for r in out:
        assert r["quality"] >= got_floor[r["lang"]]
    kept = {}
    for r in out:
        kept[r["lang"]] = kept.get(r["lang"], 0) + 1
    for lang, q in quals.items():
        assert kept[lang] >= len(q) - math.ceil(0.25 * len(q)) + 1
    # singleton stratum keeps its only doc (floor == its own quality)
    assert kept["zh"] == 1


def test_vocab_oov_rate_planted(spark):
    from pyspark.sql import Row
    from vacancy_gpt_etl_pipeline_spark.operators.curation import vocab_oov_rate

    # vocab_size=2 -> vocab {"the","cat"} (counts 4 and 3); "zyx" is OOV
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="the cat the cat"),
            Row(doc_id=2, text="THE cat zyx"),
            Row(doc_id=3, text="zyx zyx the dog"),
        ]
    )
    out = {r["doc_id"]: r for r in vocab_oov_rate(docs, vocab_size=2).collect()}
    assert out[1]["oov_rate"] == 0.0
    assert out[2]["n_tokens"] == 3 and out[2]["n_in_vocab"] == 2
    assert out[3]["n_in_vocab"] == 1  # only "the"; dog and zyx are OOV
    assert out[3]["oov_rate"] == 1.0 - 1.0 / 4.0
