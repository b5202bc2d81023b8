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
from pyspark.sql import functions as F


def timestamped_path(base: str, prefix: str = "vacancies_normalized", now: datetime | None = None) -> str:
    ts = (now or datetime.now(timezone.utc)).strftime("%Y%m%d_%H%M%S")
    return f"{base.rstrip('/')}/{prefix}_{ts}.csv"


def write_normalized_csv(
    df: DataFrame,
    path: str,
    single_file: bool = False,
    mode: str = "overwrite",
    bom: bool = False,
) -> None:
    """CSV sink with the reference's encoding/quoting options (S3).

    Quoting follows RFC-4180 doubled quotes (escape='"'), matching what the
    reference's pandas ``to_csv`` emits (dag/...py:827-830) so our own
    :func:`read_vacancies_csv` and pandas both round-trip the output.

    ``single_file=True`` reproduces the reference's exact sink contract: ONE
    CSV object at ``path`` (not a directory of shards), optionally prefixed
    with a UTF-8 BOM (``bom=True`` ≙ the reference's ``encoding='utf-8-sig'``,
    dag/...py:830, which Excel-facing consumers rely on). The shard is still
    written by an executor; only the O(files) rename/concat step runs on the
    driver — never O(data) like the reference's ``df.to_csv`` string build.
    The ``mode`` contract holds in both branches: ``error`` raises if the
    destination object exists, ``overwrite`` replaces it; ``append``/
    ``ignore`` are rejected for a single object (appending to one CSV would
    interleave headers, and DataFrame writers have no single-object append).
    """
    writer_opts = dict(header=True, encoding="UTF-8", quote='"', escape='"')
    if not single_file:
        w = df.write.mode(mode)
        for k, v in writer_opts.items():
            w = w.option(k, v)
        w.csv(path)
        return

    if mode not in ("overwrite", "error", "errorifexists"):
        raise ValueError(
            f"single_file=True supports mode='overwrite' or 'error', got "
            f"{mode!r}"
        )
    spark = df.sparkSession
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    dst = jvm.org.apache.hadoop.fs.Path(path)
    fs = dst.getFileSystem(conf)
    if mode in ("error", "errorifexists") and fs.exists(dst):
        raise FileExistsError(f"destination already exists: {path}")

    tmp = path.rstrip("/") + "__tmp"
    w = df.coalesce(1).write.mode("overwrite")
    for k, v in writer_opts.items():
        w = w.option(k, v)
    w.csv(tmp)

    tmp_path = jvm.org.apache.hadoop.fs.Path(tmp)
    part = next(
        s.getPath()
        for s in fs.listStatus(tmp_path)
        if s.getPath().getName().startswith("part-")
    )
    if fs.exists(dst):
        fs.delete(dst, True)
    out = fs.create(dst)
    try:
        if bom:
            out.write(bytearray(b"\xef\xbb\xbf"))
        src = fs.open(part)
        try:
            jvm.org.apache.hadoop.io.IOUtils.copyBytes(src, out, 65536, False)
        finally:
            src.close()
    finally:
        out.close()
    fs.delete(tmp_path, True)


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


def write_parquet_sized(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    max_records_per_file: int = 1_000_000,
    sort_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Parquet sink with small-file control — the writer a 1000-executor
    job needs.

    A naive ``partitionBy`` write has EVERY task open a file in EVERY
    partition directory it touches: 1000 tasks × 365 days = 365 000 tiny
    files per load. Repartitioning by the partition columns first routes
    each directory's rows to one task (AQE may split skewed ones), and
    ``maxRecordsPerFile`` re-splits oversized outputs — so file count is
    ~``ceil(rows_per_dir / max_records)``, independent of task count.

    ``sort_by`` sorts within the write tasks so parquet row-group min/max
    stats become selective — the cheap half of Z-ordering, enough for
    range predicates on one column to skip row groups at read time.
    """
    if partition_by:
        df = df.repartition(*[F.col(c) for c in partition_by])
    if sort_by:
        df = df.sortWithinPartitions(*sort_by)
    writer = df.write.mode(mode).option("maxRecordsPerFile", max_records_per_file)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def compact_parquet(
    spark,
    src_path: str,
    dst_path: str,
    partition_by: list[str] | None = None,
    max_records_per_file: int = 1_000_000,
    sort_by: list[str] | None = None,
) -> None:
    """Rewrite a small-files dataset into right-sized files (the scheduled
    compaction job every streaming/incremental sink eventually needs —
    AvailableNow micro-batches append a few files per trigger and read
    amplification grows until compacted)."""
    write_parquet_sized(
        spark.read.parquet(src_path),
        dst_path,
        partition_by=partition_by,
        max_records_per_file=max_records_per_file,
        sort_by=sort_by,
    )


def write_orc(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """ORC sink — same contract as :func:`write_parquet` for consumers
    standardized on the ORC/Hive toolchain. ORC carries the same
    columnar statistics (min/max per stripe), so predicate pushdown and
    column pruning work identically; zlib stripe compression is the
    Spark default."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)


def read_orc(spark, path: str) -> DataFrame:
    """ORC source with the engine's session defaults applied (the ORC
    reader honors pushed filters and pruned schemas exactly like the
    parquet scan — asserted in tests/test_orc_roundtrip)."""
    return spark.read.orc(path)
