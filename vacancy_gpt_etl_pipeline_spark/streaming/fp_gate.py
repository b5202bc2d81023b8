"""Streaming twins of the AUDIO and VIDEO incremental dedup gates
(operators/audio_fp.audio_fp_incremental /
operators/phash.video_phash_incremental) — the last two members of the
streaming-gate family (text: streaming/neardup_gate.py; image:
streaming/phash_gate.py; embedding: streaming/semdedup_gate.py). With
these, every modality has the batch + incremental + streaming triple
(r13 verdict item 5).

``foreachBatch`` bridges identically: each micro-batch decodes its
payloads with the REAL fingerprinter (WAV spectral fingerprint / Y4M
frame-pHash sequence), replays the batch gate verbatim against the
persisted fingerprint index, and parity with the batch operator is by
construction. Because both fingerprints are invariance-collapsed
strings, the gate is EXACT-only — one anti-join, no near tier, no band
index — so the state is the simplest of the family:

- **fingerprint index**: one row per surviving asset,
  ``(fp, asset_id, _batch_id)``, partitioned by ``pb`` =
  ``xxhash64(fp) mod 256``. A batch reads only the partitions its own
  fingerprints hash into (the prune-key collect is metadata-sized:
  ≤ 256 ints), and a fingerprint's full posting set lives in its one
  partition, so pruning is lossless for the exact gate.

Delivery class mirrors streaming/phash_gate.py exactly: checkpointed
micro-batches never replay; a retried batch overwrites its own
``_batch_id`` output partition (dynamic partition overwrite) and
excludes its own batch id from the index read, so either crash order
(output-then-index or index-then-output) converges on retry. Retry
duplicates within a committed batch id are harmless to the exact gate
(anti-join semantics ignore multiplicity) and are collapsed by
:func:`compact_fp_index`.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from vacancy_gpt_etl_pipeline_spark.streaming.upsert import BATCH_COL


def _index_schema(key_col: str) -> T.StructType:
    return T.StructType(
        [
            T.StructField(key_col, T.StringType()),
            T.StructField("asset_id", T.LongType()),
            T.StructField(BATCH_COL, T.LongType()),
            T.StructField("pb", T.IntegerType()),
        ]
    )


def _read_or_empty(
    spark: SparkSession, path: str, schema: T.StructType
) -> DataFrame:
    """Persisted index or an empty schema frame before the first batch
    commits. ONLY the missing-path case is caught — a corrupt index
    must FAIL the batch (an empty history re-admits every duplicate)."""
    from pyspark.errors import AnalysisException

    try:
        return spark.read.parquet(path)
    except AnalysisException as e:
        if "PATH_NOT_FOUND" in str(e) or "Path does not exist" in str(e):
            return spark.createDataFrame([], schema)
        raise


def apply_fp_gate_batch(
    batch_df: DataFrame,
    batch_id: int,
    out_path: str,
    index_path: str,
    fingerprinter: Callable[[DataFrame], DataFrame],
    gate: Callable[[DataFrame, DataFrame], DataFrame],
    key_col: str,
) -> None:
    """One micro-batch of an exact-fingerprint gate — a plain function
    so retry idempotence is testable without a streaming harness.
    ``batch_df`` is ``(asset_id, content)``; ``fingerprinter`` maps it
    to fingerprint rows (carrying ``asset_id`` and ``key_col``);
    ``gate`` is the BATCH incremental operator (parity by
    construction). Survivors land in this batch's partition of
    ``out_path`` (content column dropped — the sink is the decision
    record; payloads stay in the source) and their fingerprints append
    to the index."""
    spark = batch_df.sparkSession
    jsc = spark.sparkContext._jsc
    before = set(jsc.getPersistentRDDs().keySet().toArray())
    # the fingerprint frame feeds the prune collect AND the gate — the
    # checkpoint keeps the Arrow decode single-pass; blocks are freed
    # by id-diffing getPersistentRDDs (the phash_gate pattern:
    # unpersist() does not free localCheckpoint blocks)
    fps = fingerprinter(batch_df).localCheckpoint()
    pb_expr = F.pmod(F.xxhash64(F.col(key_col)), F.lit(256)).cast("int")
    pbs = [
        r["pb"]
        for r in fps.where(F.col(key_col).isNotNull())
        .select(pb_expr.alias("pb"))
        .distinct()
        .collect()
    ]
    idx = _read_or_empty(spark, index_path, _index_schema(key_col))
    idx = idx.where(F.col("pb").isin(pbs) if pbs else F.lit(False))
    hist = idx.where(F.col(BATCH_COL) != F.lit(batch_id))
    survivors = gate(fps, hist).localCheckpoint()
    new_ids = set(jsc.getPersistentRDDs().keySet().toArray()) - before

    prev_mode = spark.conf.get(
        "spark.sql.sources.partitionOverwriteMode", "static"
    )
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            survivors.withColumn(BATCH_COL, F.lit(batch_id).cast("long"))
            .write.mode("overwrite")
            .partitionBy(BATCH_COL)
            .parquet(out_path)
        )
        (
            survivors.select(
                key_col,
                "asset_id",
                F.lit(batch_id).cast("long").alias(BATCH_COL),
                pb_expr.alias("pb"),
            )
            .write.mode("append")
            .partitionBy("pb")
            .parquet(index_path)
        )
    finally:
        spark.conf.set(
            "spark.sql.sources.partitionOverwriteMode", prev_mode
        )
        m = jsc.getPersistentRDDs()
        for rid in new_ids:
            rdd = m.get(rid)
            if rdd is not None:
                rdd.unpersist(False)


def _drain(
    stream: DataFrame,
    checkpoint: str,
    batch_fn: Callable[[DataFrame, int], None],
) -> None:
    (
        stream.writeStream.foreachBatch(batch_fn)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def write_stream_audio_fp_gate(
    stream: DataFrame,
    out_path: str,
    index_path: str,
    checkpoint: str,
) -> None:
    """Drain a WAV-asset ``stream`` (AvailableNow; rows of
    ``(asset_id, content)``) through the incremental audio gate:
    each micro-batch is fingerprinted (operators/audio_fp) and
    exact-gated against the persisted fingerprint index."""
    from vacancy_gpt_etl_pipeline_spark.operators.audio_fp import (
        audio_fp_incremental,
        fingerprint_wav,
    )

    def _batch(batch_df: DataFrame, batch_id: int) -> None:
        apply_fp_gate_batch(
            batch_df,
            batch_id,
            out_path,
            index_path,
            fingerprint_wav,
            audio_fp_incremental,
            "fingerprint",
        )

    _drain(stream, checkpoint, _batch)


def write_stream_video_fp_gate(
    stream: DataFrame,
    out_path: str,
    index_path: str,
    checkpoint: str,
) -> None:
    """Drain a Y4M-asset ``stream`` through the incremental video gate
    (operators/phash.phash_y4m frame-hash sequences, exact anti-join
    vs the persisted index)."""
    from vacancy_gpt_etl_pipeline_spark.operators.phash import (
        phash_y4m,
        video_phash_incremental,
    )

    def _batch(batch_df: DataFrame, batch_id: int) -> None:
        apply_fp_gate_batch(
            batch_df,
            batch_id,
            out_path,
            index_path,
            phash_y4m,
            video_phash_incremental,
            "video_fp",
        )

    _drain(stream, checkpoint, _batch)


def compact_fp_index(
    spark: SparkSession,
    index_path: str,
    dest_path: str,
    key_col: str,
) -> None:
    """Log-compaction (the family contract: new immutable directory,
    same ``pb`` partitioning, no concurrent writer): one row per
    fingerprint, MIN asset_id so the keep-first survivor is unchanged,
    MAX batch id so own-batch exclusion can never re-fire for
    checkpoint-committed batches."""
    (
        _read_or_empty(spark, index_path, _index_schema(key_col))
        .groupBy("pb", key_col)
        .agg(
            F.min("asset_id").alias("asset_id"),
            F.max(BATCH_COL).alias(BATCH_COL),
        )
        .select(key_col, "asset_id", BATCH_COL, "pb")
        .write.mode("error")
        .partitionBy("pb")
        .parquet(dest_path)
    )
