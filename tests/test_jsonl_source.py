"""JSONL source/sink: declared-schema read, corrupt-line quarantine,
round-trip, partitioned layout."""

from __future__ import annotations

import glob
import gzip
import json
import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from vacancy_gpt_etl_pipeline_spark.sources.jsonl_source import (
    read_jsonl,
    write_jsonl,
)

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
    ]
)


def test_read_quarantines_corrupt_lines(spark, tmp_path):
    p = tmp_path / "docs.jsonl"
    p.write_text(
        "\n".join(
            [
                json.dumps({"doc_id": 1, "text": "good one", "lang": "en"}),
                '{"doc_id": 2, "text": "broken',  # truncated JSON
                json.dumps({"doc_id": 3, "text": "also good", "lang": "de"}),
                "not json at all",
            ]
        )
    )
    good, quarantine = read_jsonl(spark, str(p), SCHEMA)
    assert sorted(r.doc_id for r in good.collect()) == [1, 3]
    assert good.columns == ["doc_id", "text", "lang"]
    bad = [r[0] for r in quarantine.collect()]
    assert len(bad) == 2
    assert any("broken" in b for b in bad)


def test_declared_schema_beats_inference_drift(spark, tmp_path):
    # a dirty row would flip doc_id to string under inference; with the
    # declared schema the row quarantines and the type holds
    p = tmp_path / "drift.jsonl"
    p.write_text(
        "\n".join(
            [
                json.dumps({"doc_id": 1, "text": "a", "lang": "en"}),
                json.dumps({"doc_id": "n/a", "text": "b", "lang": "en"}),
            ]
        )
    )
    good, quarantine = read_jsonl(spark, str(p), SCHEMA)
    assert dict(good.dtypes)["doc_id"] == "bigint"
    assert [r.doc_id for r in good.collect()] == [1]
    assert quarantine.count() == 1


def test_roundtrip_and_partitioned_layout(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "hello", "en"), (2, "hallo", "de"), (3, "welt", "de")],
        SCHEMA,
    )
    out = str(tmp_path / "out")
    write_jsonl(df, out, partition_cols=["lang"], compression=None)
    assert os.path.isdir(os.path.join(out, "lang=de"))
    back, quarantine = read_jsonl(
        spark,
        out,
        T.StructType([f for f in SCHEMA.fields if f.name != "lang"]),
    )
    assert sorted(r.doc_id for r in back.collect()) == [1, 2, 3]
    assert quarantine.count() == 0


def test_gzip_shards_are_line_delimited(spark, tmp_path):
    df = spark.createDataFrame([(1, "a", "en"), (2, "b", "en")], SCHEMA)
    out = str(tmp_path / "gz")
    write_jsonl(df, out, compression="gzip")
    shards = glob.glob(os.path.join(out, "*.json.gz"))
    assert shards
    lines = []
    for s in shards:
        with gzip.open(s, "rt") as f:
            lines += [json.loads(line) for line in f if line.strip()]
    assert sorted(d["doc_id"] for d in lines) == [1, 2]
