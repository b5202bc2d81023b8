"""Unicode normalization (functions/text.unicode_normalize_udf): golden
composition, pass-through, idempotence, null safety, NFKC variant."""

from __future__ import annotations

from pyspark.sql import functions as F

from vacancy_gpt_etl_pipeline_spark.functions.text import unicode_normalize_udf


def _norm(spark, rows, form="NFC"):
    df = spark.createDataFrame(rows, "id long, t string")
    udf = unicode_normalize_udf(form)
    return {r["id"]: r["n"] for r in df.select("id", udf("t").alias("n")).collect()}


def test_nfc_composes_combining_marks(spark):
    out = _norm(spark, [(1, "cafe\u0301"), (2, "fiance\u0301e")])
    assert out[1] == "caf\u00e9"
    assert out[2] == "fianc\u00e9e"


def test_nfc_leaves_composed_and_ascii_untouched(spark):
    out = _norm(spark, [(1, "caf\u00e9"), (2, "plain ascii text")])
    assert out[1] == "caf\u00e9"
    assert out[2] == "plain ascii text"


def test_nfc_is_idempotent_and_null_safe(spark):
    rows = [(1, "no\u0308el"), (2, None)]
    once = _norm(spark, rows)
    twice = _norm(spark, [(k, v) for k, v in once.items()])
    assert twice == once
    assert once[2] is None


def test_nfkc_folds_compatibility_forms(spark):
    # U+FB01 LATIN SMALL LIGATURE FI -> "fi" under NFKC, untouched by NFC
    out_nfc = _norm(spark, [(1, "\ufb01le")], form="NFC")
    out_nfkc = _norm(spark, [(1, "\ufb01le")], form="NFKC")
    assert out_nfc[1] == "\ufb01le"
    assert out_nfkc[1] == "file"


def test_char_diversity_known_values(spark):
    from pyspark.sql import Row
    from vacancy_gpt_etl_pipeline_spark.functions.text import (
        char_diversity_profile,
    )

    df = spark.createDataFrame(
        [Row(doc_id=1, text="aaaa"), Row(doc_id=2, text="abcd")]
    )
    out = {r["doc_id"]: r for r in char_diversity_profile(df).collect()}
    mono, uni = out[1], out[2]
    # "aaaa": one char repeated -> collision prob 1, zero bits, ratio 1
    assert mono["n_chars"] == 4 and mono["distinct_chars"] == 1
    assert mono["simpson_index"] == 1.0 and mono["renyi2_bits"] == 0.0
    assert mono["top_char_ratio"] == 1.0
    # "abcd": uniform over 4 chars -> Σp² = 1/4, exactly 2 bits
    assert uni["distinct_chars"] == 4
    assert uni["simpson_index"] == 0.25 and uni["renyi2_bits"] == 2.0
    assert uni["top_char_ratio"] == 0.25


def test_sentiment_score_closed_form(spark):
    from pyspark.sql import Row
    from vacancy_gpt_etl_pipeline_spark.functions.text import sentiment_score

    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="fast big value"),         # all positive -> 1
            Row(doc_id=2, text="slow slow dup"),          # all negative -> -1
            Row(doc_id=3, text="FAST slow"),              # balanced -> 0 (case-folded)
            Row(doc_id=4, text="join table merge"),       # no hits -> 0
            Row(doc_id=5, text="fast fast slow"),         # (2-1)/3
        ]
    )
    out = {r["doc_id"]: r["p"] for r in df.select("doc_id", sentiment_score("text").alias("p")).collect()}
    assert out[1] == 1.0 and out[2] == -1.0
    assert out[3] == 0.0 and out[4] == 0.0
    assert out[5] == round(1.0 / 3.0, 6)


def test_char_diversity_empty_doc_emits_no_row(spark):
    from pyspark.sql import Row
    from vacancy_gpt_etl_pipeline_spark.functions.text import (
        char_diversity_profile,
    )

    df = spark.createDataFrame([Row(doc_id=1, text=""), Row(doc_id=2, text="ab")])
    out = {r["doc_id"]: r for r in char_diversity_profile(df).collect()}
    # empty doc: NO profile row (it must not score like keyboard-mash)
    assert set(out) == {2}
    assert out[2]["n_chars"] == 2
