"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference ETL pipeline (Protsenko-Igor/vacancy-gpt-etl-pipeline),
re-expressed Spark-first and extended with LLM-training-data-pipeline operators
(dedup, similarity search, multimodal columns, text analysis).

Layout
------
- ``session``    : SparkSession factory with scale-aware defaults (AQE, Arrow, UTC).
- ``schemas``    : canonical explicit schemas (no ``inferSchema`` at scale).
- ``sources``    : CSV/parquet readers with path filtering + latest-k selection; sinks.
- ``functions``  : scalar-function surface (trim/truncate/JSON-parse/text stats).
- ``operators``  : dedup, enrichment (the LLM operator), similarity, relational helpers.
- ``plans``      : the assembled reference pipeline + its SQL analytics surface.
- ``streaming``  : Structured Streaming ingest + windowed aggregation helpers.

Design notes are in each module docstring; reference parity is cited as
``dag/vacancy_pipline_gpt_rerty.py:<line>`` (file lives at /root/reference/).
"""

from vacancy_gpt_etl_pipeline_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
