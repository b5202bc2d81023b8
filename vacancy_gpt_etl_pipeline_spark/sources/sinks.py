"""Sinks.

S3 CSV sink parity (dag/vacancy_pipline_gpt_rerty.py:827-849): UTF-8, header,
quoting + escape, timestamped object name
``processed/normalized/vacancies_normalized_{yyyyMMdd_HHMMSS}.csv``.

Scale note: the reference serializes ONE csv string on the driver
(``df.to_csv`` → ``put_object``) — an O(data) driver materialization that
dies long before 100 TB. Here executors write shards directly to the object
store; ``coalesce(1)`` is available only as an explicit opt-in for the
small-output compatibility case. Parquet is the preferred internal sink.
"""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import DataFrame


def timestamped_path(base: str, prefix: str = "vacancies_normalized", now: datetime | None = None) -> str:
    ts = (now or datetime.now(timezone.utc)).strftime("%Y%m%d_%H%M%S")
    return f"{base.rstrip('/')}/{prefix}_{ts}.csv"


def write_normalized_csv(
    df: DataFrame,
    path: str,
    single_file: bool = False,
    mode: str = "overwrite",
) -> None:
    """CSV sink with the reference's encoding/quoting options (S3)."""
    out = df.coalesce(1) if single_file else df
    (
        out.write.mode(mode)
        .option("header", True)
        .option("encoding", "UTF-8")
        .option("quote", '"')
        .option("escape", "\\")
        .csv(path)
    )


def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Parquet sink; ``partition_by`` date columns at scale so downstream
    readers get partition pruning (e.g. ``created_at`` month)."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
