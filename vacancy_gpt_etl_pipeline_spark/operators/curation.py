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
