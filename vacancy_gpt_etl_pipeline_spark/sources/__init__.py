from vacancy_gpt_etl_pipeline_spark.sources.csv_source import (
    latest_k_paths,
    list_csv_files,
    read_vacancies_csv,
)
from vacancy_gpt_etl_pipeline_spark.sources.parquet_source import load_tables, read_table
from vacancy_gpt_etl_pipeline_spark.sources.sinks import (
    write_normalized_csv,
    write_parquet,
)

__all__ = [
    "latest_k_paths",
    "list_csv_files",
    "read_vacancies_csv",
    "load_tables",
    "read_table",
    "write_normalized_csv",
    "write_parquet",
]
