from vacancy_gpt_etl_pipeline_spark.streaming.ingest import read_vacancies_stream
from vacancy_gpt_etl_pipeline_spark.streaming.stateful import running_totals
from vacancy_gpt_etl_pipeline_spark.streaming.windows import (
    session_window_agg,
    sliding_window_agg,
    tumbling_window_agg,
)

__all__ = [
    "read_vacancies_stream",
    "running_totals",
    "session_window_agg",
    "sliding_window_agg",
    "tumbling_window_agg",
]
