"""Language-ID evaluation entry: confusion-matrix shape and
per-language fraction conservation."""

from __future__ import annotations


def test_langid_confusion_shape(spark, sf001_dir):
    from vacancy_gpt_etl_pipeline_spark.queries import langid_confusion

    rows = langid_confusion(spark, sf001_dir).collect()
    # fractions per true language sum to 1 (exact counts, one division)
    from collections import defaultdict

    tot = defaultdict(float)
    for r in rows:
        tot[r["lang"]] += r["frac_of_lang"]
        assert r["correct"] == (r["lang"] == r["lang_pred"])
    for lang, s in tot.items():
        assert abs(s - 1.0) < 1e-12, lang
