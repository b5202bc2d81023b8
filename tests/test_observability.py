"""Observability surface (SURVEY.md §2.11; VERDICT round-1 gap #5)."""

from __future__ import annotations

import pandas as pd
import pytest

from vacancy_gpt_etl_pipeline_spark.operators.enrichment import (
    UNDEFINED,
    KeywordRule,
    MockKeywordEnricher,
)
from vacancy_gpt_etl_pipeline_spark.plans.observability import (
    PipelineObserver,
    classification_report,
    format_report,
)
from vacancy_gpt_etl_pipeline_spark.plans.pipeline import run_pipeline


def test_observer_counts_stages_in_one_pass(spark, tmp_path):
    pd.DataFrame(
        [
            ["1", "Аналитик данных", "айти", 100, "2024-01-10"],
            ["1", "Аналитик данных", "айти", 100, "2024-01-10"],  # exact dup
            ["2", "Разработчик", "айти", 200, "2024-01-10"],
        ],
        columns=["id", "title", "ai_field_of_activity", "salary_to", "created_at"],
    ).to_csv(tmp_path / "vacancies_20240101_000000.csv", index=False, encoding="utf-8-sig")

    te = MockKeywordEnricher(
        rules=[KeywordRule("аналитик", {"normalized_title": "Аналитик данных"})],
        outputs=("normalized_title",),
    )
    fe = MockKeywordEnricher(
        rules=[KeywordRule("айти", {"category": "IT", "specialization": "Backend"})],
        outputs=("category", "specialization"),
        defaults={"category": UNDEFINED, "specialization": UNDEFINED},
    )
    obs = PipelineObserver()
    out = run_pipeline(spark, str(tmp_path), te, fe, max_retries=0, observer=obs)
    assert out.count() == 2  # the single action that evaluates observations
    assert obs.row_counts() == {"ingest": 3, "deduped": 2}


def test_observer_rejects_duplicate_stage(spark):
    obs = PipelineObserver()
    df = spark.range(3)
    obs.stage(df, "s")
    with pytest.raises(ValueError, match="duplicate"):
        obs.stage(df, "s")


@pytest.fixture(scope="module")
def classified(spark):
    rows = [(i, f"title {i}", "Аналитик данных" if i % 3 == 0 else ("Разработчик" if i % 3 == 1 else UNDEFINED)) for i in range(30)]
    df = spark.createDataFrame(rows, "id int, title string, normalized_title string")
    df.cache().count()
    yield df
    df.unpersist()


def test_classification_report_matches_reference_semantics(classified):
    rep = classification_report(
        classified,
        "normalized_title",
        failure_values=(UNDEFINED,),
        source_col="title",
        top_k=5,
        sample_k=3,
    )
    assert rep.total == 30
    assert rep.successes == 20
    assert rep.success_rate_pct == 66.7
    assert rep.top_distribution == [
        ("Аналитик данных", 10, 33.3),
        ("Разработчик", 10, 33.3),
    ]
    assert len(rep.failure_samples) == 3
    assert all(s.startswith("title ") for s in rep.failure_samples)


def test_format_report_renders(classified):
    rep = classification_report(
        classified, "normalized_title", failure_values=(UNDEFINED,), source_col="title"
    )
    text = format_report(rep)
    assert "rate: 66.7%" in text
    assert "Аналитик данных: 10 (33.3%)" in text
    assert "unclassified samples:" in text


def test_report_long_titles_truncated(spark):
    df = spark.createDataFrame(
        [(1, "x" * 80, UNDEFINED)], "id int, title string, normalized_title string"
    )
    rep = classification_report(
        df, "normalized_title", failure_values=(UNDEFINED,), source_col="title"
    )
    assert rep.failure_samples == ["x" * 50 + "..."]
