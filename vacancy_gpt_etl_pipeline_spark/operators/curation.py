"""Training-corpus curation: the composed quality-filter + exact-dedup pass
an LLM data pipeline runs before anything expensive (north-star extension;
composes functions/text.py stats with operators/dedup.py survivors).

Plan shape, chosen for 100 TB:

    profile (narrow, codegen) → quality/token FILTERS → fingerprint
    keep-first dedup (one hash shuffle)

Filters run BEFORE the dedup shuffle on purpose: quality and token stats
are pure functions of the content, so every copy of a duplicate passes or
fails together — filtering first shrinks the only shuffle without changing
the surviving set. The filters themselves are whole-stage-codegen column
expressions; nothing here leaves the JVM.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vacancy_gpt_etl_pipeline_spark.functions.text import (
    fingerprint,
    quality_score,
    token_count,
)
from vacancy_gpt_etl_pipeline_spark.operators.dedup import dedup_keep_first


def profile_for_curation(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    return df.select(
        F.col(id_col),
        token_count(text_col).alias("n_tokens"),
        quality_score(text_col).alias("quality"),
        fingerprint(text_col).alias("fingerprint"),
    )


def quality_filter(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_quality: float = 0.5,
    min_tokens: int = 20,
    max_tokens: int = 200,
) -> DataFrame:
    """C4/Gopher-style rule filter: quality score + token-count band."""
    prof = profile_for_curation(df, text_col, id_col)
    return prof.where(
        (F.col("quality") >= min_quality)
        & F.col("n_tokens").between(min_tokens, max_tokens)
    )


def curate_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_quality: float = 0.5,
    min_tokens: int = 20,
    max_tokens: int = 200,
) -> DataFrame:
    """Filter → exact-dedup (keep lowest id per fingerprint). Returns the
    surviving (id, n_tokens, quality, fingerprint) rows — the manifest a
    downstream tokenization job joins back against the raw corpus."""
    filtered = quality_filter(df, text_col, id_col, min_quality, min_tokens, max_tokens)
    return dedup_keep_first(filtered, ["fingerprint"], [F.asc(id_col)])


def ngram_contamination(
    train: DataFrame,
    test: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 13,
) -> DataFrame:
    """Per-test-document n-gram contamination audit — the standard
    eval-decontamination check (GPT-3 appendix C / PaLM-style 13-gram
    overlap): for every test document, the fraction of its distinct word
    ``n``-grams that appear anywhere in the training corpus.

    Complements the exact content-hash audit (split_contamination): hash
    overlap only catches verbatim documents; n-gram overlap catches test
    PASSAGES embedded in training documents.

    Scale shape: both sides explode to distinct n-grams keyed by md5 (a
    16-byte shuffle key instead of a ~100-char string; md5 keeps the key
    portable for the oracle). The train side deduplicates map-side-combined
    to one row per distinct gram, the test side left-joins against it, and
    the verdict aggregates per test doc — everything is O(corpus grams)
    with no self-join. Docs shorter than ``n`` tokens report 0 grams /
    0.0 fraction (nothing to leak).
    """
    from vacancy_gpt_etl_pipeline_spark.operators.dedup import _shingled

    # persisted (operators/dedup._shingled default): an UNPERSISTED
    # explode re-evaluates the inline shingle-array expression per
    # emitted element — measured 70 s vs 2 s at sf0.1 for the 13-gram
    # audit. Each side is read once but EXPLODED many-to-one, which is
    # exactly the case the materialization boundary exists for.
    tr = (
        _shingled(train, text_col, id_col, n)
        .select(F.explode("_sh").alias("_g"))
        .select(F.md5("_g").alias("_gh"))
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    te = _shingled(test, text_col, id_col, n).select(
        "_id", F.explode("_sh").alias("_g")
    ).select("_id", F.md5("_g").alias("_gh"))
    per_doc = (
        te.join(tr, "_gh", "left")
        .groupBy("_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.coalesce(F.sum("_hit"), F.lit(0)).alias("n_contaminated"),
        )
    )
    ids = test.select(F.col(id_col).alias("_id"))
    return (
        ids.join(per_doc, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
            F.coalesce("n_contaminated", F.lit(0))
            .cast("long")
            .alias("n_contaminated"),
            F.round(
                F.coalesce(
                    F.col("n_contaminated") / F.col("n_grams"), F.lit(0.0)
                ),
                6,
            ).alias("contaminated_frac"),
        )
    )
