"""Streaming ingest — the idiomatic replacement for the reference's
"sort filenames, take newest 4" incremental pickup (dag/...py:90-92).

A checkpointed file source gives exactly-once file tracking: every CSV that
lands under the prefix is processed exactly once across daily runs, with no
filename-ordering assumptions. ``Trigger.AvailableNow`` preserves the batch
cadence (run, drain everything new, stop) while keeping streaming semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from vacancy_gpt_etl_pipeline_spark.schemas import VACANCIES_RAW


def read_vacancies_stream(
    spark: SparkSession,
    path: str,
    schema: T.StructType = VACANCIES_RAW,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    reader = (
        spark.readStream.schema(schema)
        .option("header", True)
        .option("pathGlobFilter", "*.csv")
        .option("encoding", "UTF-8")
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.csv(path).withColumn("_input_file", F.input_file_name())


def dedup_stream(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str = "created_at",
    watermark: str = "7 days",
) -> DataFrame:
    """Streaming analogue of A1/A2: state-bounded exactly-once-per-key via
    dropDuplicatesWithinWatermark — duplicate keys arriving within the
    watermark horizon are suppressed; state is evicted past it (unbounded
    state is the failure mode of naive streaming dedup at scale)."""
    df = df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(key_cols)


def write_available_now(
    df: DataFrame, path: str, checkpoint: str, fmt: str = "parquet"
) -> None:
    """Drain everything new then stop (the @daily batch cadence,
    dag/...py:865, with streaming exactly-once bookkeeping)."""
    (
        df.writeStream.format(fmt)
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
