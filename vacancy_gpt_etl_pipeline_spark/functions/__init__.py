from vacancy_gpt_etl_pipeline_spark.functions.json_parse import (
    parse_llm_json,
    safe_json_parse_text,
)
from vacancy_gpt_etl_pipeline_spark.functions.scalars import (
    non_empty,
    pct_of,
    truncate_with_ellipsis,
)

__all__ = [
    "parse_llm_json",
    "safe_json_parse_text",
    "non_empty",
    "pct_of",
    "truncate_with_ellipsis",
]
