"""Streaming incremental pHash gate (streaming/phash_gate.py):
bit-exact parity with the batch operator, a growing persisted
fingerprint index, exactly-once across runs via checkpoint, and
idempotent gating under duplicate index rows."""

from __future__ import annotations

from pyspark.sql import functions as F

from vacancy_gpt_etl_pipeline_spark.operators.multimodal import (
    synthesize_bmp_payload,
)
from vacancy_gpt_etl_pipeline_spark.operators.phash import (
    phash_bmp,
    phash_incremental,
)
from vacancy_gpt_etl_pipeline_spark.streaming.phash_gate import (
    BATCH_COL,
    _read_index,
    write_stream_phash_gate,
)

_SCHEMA = "asset_id long, content binary"


def _drop_assets(spark, docs, src, name: str, relabel: int = 0):
    assets = synthesize_bmp_payload(docs, "doc_id").select(
        (F.col("asset_id") + relabel).alias("asset_id"), "content"
    )
    assets.write.mode("overwrite").parquet(str(src / name))


def _stream(spark, src):
    # one subdirectory per drop; the glob picks up new drops across runs
    return (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", 1000)
        .parquet(str(src) + "/*")
    )


def _survivor_set(df):
    return sorted(
        (r["asset_id"], r["hash_hex"])
        for r in df.select("asset_id", "hash_hex").collect()
    )


def test_streaming_gate_parity_and_exactly_once(spark, sf_dir, tmp_path):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    src = tmp_path / "in"
    src.mkdir()
    out = str(tmp_path / "out")
    index = str(tmp_path / "index")
    ckpt = str(tmp_path / "ckpt")

    # run 1: history load — docs < 250 arrive as the first drop
    _drop_assets(spark, docs.where("doc_id < 250"), src, "a")
    write_stream_phash_gate(_stream(spark, src), out, index, ckpt)
    idx1 = spark.read.parquet(index)
    run1 = spark.read.parquet(out)
    # empty-history gate = keep-first reps of the batch
    direct1 = phash_incremental(
        phash_bmp(synthesize_bmp_payload(docs.where("doc_id < 250"), "doc_id")),
        _read_index(spark, str(tmp_path / "nowhere")),
    )
    assert _survivor_set(run1) == _survivor_set(direct1)
    assert idx1.count() == run1.count()

    # run 2: docs >= 250 plus planted byte-copies of history assets
    _drop_assets(spark, docs.where("doc_id >= 250"), src, "b")
    _drop_assets(spark, docs.where("doc_id < 50"), src, "c", relabel=900000)
    write_stream_phash_gate(_stream(spark, src), out, index, ckpt)
    run2 = spark.read.parquet(out).where(f"{BATCH_COL} > 0")
    # parity: the batch operator over the same batch vs run-1's index
    batch_assets = synthesize_bmp_payload(
        docs.where("doc_id >= 250"), "doc_id"
    ).unionByName(
        synthesize_bmp_payload(docs.where("doc_id < 50"), "doc_id")
        .withColumn("asset_id", F.col("asset_id") + 900000)
    )
    direct2 = phash_incremental(phash_bmp(batch_assets), idx1)
    assert _survivor_set(run2) == _survivor_set(direct2)
    # plants are byte-copies of history → never survive
    assert run2.where("asset_id >= 900000").count() == 0
    # the index grew by exactly run 2's survivors
    assert spark.read.parquet(index).count() == idx1.count() + run2.count()

    # run 3: no new files → exactly-once appends nothing
    before = spark.read.parquet(out).count()
    write_stream_phash_gate(_stream(spark, src), out, index, ckpt)
    assert spark.read.parquet(out).count() == before


def test_gate_idempotent_under_duplicate_index_rows(spark, sf_dir):
    """At-least-once index appends (a retried micro-batch) must not
    change any gate decision: duplicating every history row leaves the
    survivor set identical."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    hist = phash_bmp(
        synthesize_bmp_payload(docs.where("doc_id < 250"), "doc_id")
    )
    batch = phash_bmp(
        synthesize_bmp_payload(docs.where("doc_id >= 250"), "doc_id")
    )
    once = _survivor_set(phash_incremental(batch, hist))
    doubled = _survivor_set(phash_incremental(batch, hist.unionAll(hist)))
    assert once == doubled
