"""The Column-expression JSON path (F6-F8 as DataFrame ops): parse_llm_json
over a response column — the declarative twin of safe_json_parse_text
(VERDICT round-1: 'parse_llm_json column path untested')."""

from __future__ import annotations

from pyspark.sql import functions as F

from vacancy_gpt_etl_pipeline_spark.functions.json_parse import parse_llm_json
from vacancy_gpt_etl_pipeline_spark.schemas import TITLE_RESPONSE


def _parse(spark, raw: str):
    df = spark.createDataFrame([(raw,)], "resp string")
    return df.select(parse_llm_json("resp", TITLE_RESPONSE).alias("p")).collect()[0]["p"]


def test_clean_json_column(spark):
    out = _parse(spark, '[{"original": "a", "normalized_title": "X"}]')
    assert [(r["original"], r["normalized_title"]) for r in out] == [("a", "X")]


def test_fenced_json_column(spark):
    out = _parse(spark, '```json\n[{"original": "a", "normalized_title": "X"}]\n```')
    assert out is not None and out[0]["original"] == "a"


def test_prose_wrapped_json_column_uses_dotall_extract(spark):
    raw = 'Вот ответ:\n[{"original": "a",\n  "normalized_title": "X"}]\nГотово.'
    out = _parse(spark, raw)
    assert out is not None and out[0]["normalized_title"] == "X"


def test_garbage_column_yields_null(spark):
    assert _parse(spark, "no json at all") is None
    assert _parse(spark, '[{"original": "a", truncated') is None


def test_explode_to_mapping_rows(spark):
    """The full F8 shape: response column → from_json → explode → mapping."""
    df = spark.createDataFrame(
        [
            (1, '```json\n[{"original": "a", "normalized_title": "X"}, {"original": "b", "normalized_title": "Y"}]\n```'),
            (2, "garbage"),
        ],
        "batch_id int, resp string",
    )
    exploded = (
        df.select("batch_id", F.explode(parse_llm_json("resp", TITLE_RESPONSE)).alias("m"))
        .select("batch_id", "m.original", "m.normalized_title")
    )
    rows = sorted(map(tuple, exploded.collect()))
    assert rows == [(1, "a", "X"), (1, "b", "Y")]  # garbage row drops out
