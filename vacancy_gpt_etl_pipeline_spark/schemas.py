"""Canonical explicit schemas.

The reference infers everything via ``pd.read_csv`` (dag/vacancy_pipline_gpt_rerty.py:107)
and appends columns ad-hoc. At 100 TB schema inference means a full extra pass
over the data, so every source here declares its schema up front
(SURVEY.md §1.3). The one *declared* schema in the reference is the Datalens
DDL (datalens_dashboard/README.md:30-42), mirrored by NORMALIZED_VACANCIES.
"""

from __future__ import annotations

from pyspark.sql import types as T

# Pipeline input CSV: config/CONFIGURATION.md:33-39 (+ salary_to used by
# datalens_dashboard/sql_queries/vacancy_analysis.sql:14).
VACANCIES_RAW = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("ai_field_of_activity", T.StringType()),
        T.StructField("salary_to", T.DecimalType(12, 2)),
        T.StructField("created_at", T.DateType()),
    ]
)

# Pipeline output / SQL-surface view: datalens_dashboard/README.md:30-42.
NORMALIZED_VACANCIES = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("normalized_title", T.StringType()),
        T.StructField("ai_field_of_activity", T.StringType()),
        T.StructField("category", T.StringType()),
        T.StructField("specialization", T.StringType()),
        T.StructField("salary_to", T.DecimalType(12, 2)),
        T.StructField("created_at", T.DateType()),
        T.StructField("_processing_date", T.StringType()),
        T.StructField("_processing_timestamp", T.TimestampType()),
    ]
)

# Transient LLM-response shapes (dag/vacancy_pipline_gpt_rerty.py:217-219, :526-529):
# parsed with from_json(ArrayType(...)) + explode, or Python-side json.loads in
# the enrichment UDF.
TITLE_RESPONSE = T.ArrayType(
    T.StructType(
        [
            T.StructField("original", T.StringType()),
            T.StructField("normalized_title", T.StringType()),
        ]
    )
)

FIELD_RESPONSE = T.ArrayType(
    T.StructType(
        [
            T.StructField("original", T.StringType()),
            T.StructField("category", T.StringType()),
            T.StructField("specialization", T.StringType()),
        ]
    )
)

# Multimodal extension: opaque binary payload + typed metadata (SURVEY north star).
MULTIMODAL_ASSET = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("modality", T.StringType()),  # image | audio | video
        T.StructField("content", T.BinaryType()),
        T.StructField("mime_type", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
