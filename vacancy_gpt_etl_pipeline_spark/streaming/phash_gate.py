"""Streaming twin of the incremental pHash gate
(operators/phash.phash_incremental) — the multimodal member of the
streaming-twin family (streaming/anomaly.py sets the pattern,
streaming/enrich.py is the §2.10 twin).

``foreachBatch`` is again the right bridge: the batch gate's contract
(hash → keep-first within batch → exact anti-join vs history → band-LSH
near gate) is already the per-micro-batch shape, so the streaming path
runs the IDENTICAL operator code and parity is by construction, proven
bit-exact in tests/test_streaming_phash.py.

The streaming-specific part is the STATE: the history fingerprint
index is a persisted parquet table that every micro-batch reads,
gates against, and appends its survivors' fingerprints to — the
O(distinct-content) structure an ingest keeps hot. Delivery class:
a committed micro-batch is never replayed (checkpoint), so re-running
over an unchanged source appends nothing; within a failed-and-retried
batch the parquet appends are at-least-once — and the gate is
IDEMPOTENT under that: duplicate fingerprints in the index cannot
change any later gate decision (the exact gate anti-joins DISTINCT
hashes and the near gate dedups band buckets), so a retried batch's
double-appended index rows are harmless to correctness, only to index
size; compact with the log-compaction pattern of streaming/upsert.py
when that matters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vacancy_gpt_etl_pipeline_spark.operators.phash import (
    PHASH_SCHEMA,
    phash_bmp,
    phash_incremental,
)
from vacancy_gpt_etl_pipeline_spark.streaming.upsert import BATCH_COL


def _read_index(spark, index_path: str) -> DataFrame:
    """The persisted fingerprint index, or an empty frame with the
    hash schema before the first batch commits. ONLY the missing-path
    case is caught — a corrupt or unreadable index must FAIL the batch
    (gating against a silently-empty history would re-admit every
    duplicate ever ingested)."""
    from pyspark.errors import AnalysisException

    try:
        return spark.read.parquet(index_path)
    except AnalysisException as e:
        if "PATH_NOT_FOUND" in str(e) or "Path does not exist" in str(e):
            return spark.createDataFrame([], PHASH_SCHEMA)
        raise


def write_stream_phash_gate(
    stream: DataFrame,
    out_path: str,
    index_path: str,
    checkpoint: str,
    max_hamming: int = 2,
    max_bucket: int = 10_000,
) -> None:
    """Drain a binary-asset ``stream`` (AvailableNow; rows of
    ``(asset_id, content)``), gating every micro-batch with the BATCH
    operator verbatim against the persisted fingerprint index:
    survivors (tagged with their micro-batch id) append to
    ``out_path``, and their fingerprints append to ``index_path`` so
    later micro-batches gate against them."""

    def _batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        hashes = phash_bmp(batch_df)
        hist = _read_index(spark, index_path)
        # localCheckpoint severs lineage: both sinks below reuse the
        # materialized survivors, and the index append must not re-read
        # the index being written. DataFrame.unpersist() does NOT free
        # localCheckpoint blocks — release them by id-diffing
        # getPersistentRDDs (the operators/tokenize.py trainer pattern),
        # or a long drain strands one pinned RDD per micro-batch.
        jsc = spark.sparkContext._jsc
        before = set(jsc.getPersistentRDDs().keySet().toArray())
        survivors = phash_incremental(
            hashes, hist, max_hamming=max_hamming, max_bucket=max_bucket
        ).localCheckpoint()
        new_ids = set(jsc.getPersistentRDDs().keySet().toArray()) - before
        try:
            (
                survivors.withColumn(BATCH_COL, F.lit(batch_id))
                .write.mode("append")
                .parquet(out_path)
            )
            survivors.select(
                "asset_id", "b0", "b1", "b2", "b3", "hash_hex"
            ).write.mode("append").parquet(index_path)
        finally:
            m = jsc.getPersistentRDDs()
            for rid in new_ids:
                rdd = m.get(rid)
                if rdd is not None:
                    rdd.unpersist(False)

    (
        stream.writeStream.foreachBatch(_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
