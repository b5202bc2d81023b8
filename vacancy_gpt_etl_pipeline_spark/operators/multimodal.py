"""Multimodal column plumbing (north-star extension).

Image/audio/video payloads are opaque ``binary`` columns + typed metadata
(schemas.MULTIMODAL_ASSET). The Spark-side plumbing — schema, partition
sizing, Arrow batch shape, UDF signatures — is real and tested; the actual
codec work is STUBBED (this container ships no image/audio libraries):
``decode_stub=True`` produces a deterministic fake decode, ``False`` raises
NotImplementedError where a real decoder (PIL/ffmpeg) would be called.

Scale notes: binary payloads dominate row size, so ``mapInPandas`` with a
small ``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds executor
memory; feature extraction emits small fixed-width columns, so the payload
is dropped as early as the plan allows (select pruning keeps parquet from
even reading it when only metadata is touched).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def attach_text_payload(df: DataFrame, text_col: str = "text", modality: str = "image") -> DataFrame:
    """Build a multimodal-shaped table from a text table: utf-8 bytes stand in
    for an encoded media payload. Used by tests and the sf fixtures (the
    container has no real media)."""
    return df.select(
        "*",
        F.encode(F.col(text_col), "UTF-8").alias("content"),
        F.lit(modality).alias("modality"),
        F.lit(f"application/x-fake-{modality}").alias("mime_type"),
    )


DECODED_IMAGE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("mean_luma", T.DoubleType()),
    ]
)


def decode_images(
    df: DataFrame,
    id_col: str = "asset_id",
    content_col: str = "content",
    decode_stub: bool = True,
) -> DataFrame:
    """Decode image payloads to (width, height, mean_luma) features.

    Arrow-batched ``mapInPandas``; the stub derives deterministic dimensions
    from the byte length and a luma from the byte mean, exercising the full
    distributed plumbing without a codec.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real image decode requires PIL/opencv — not available in "
                    "this container; pass decode_stub=True"
                )
            n_bytes = pdf[content_col].map(len).astype("int64")
            # deterministic fake: square-ish dims from payload size
            width = np.sqrt(n_bytes).astype("int32") + 1
            height = (n_bytes // width.clip(lower=1)).astype("int32") + 1
            luma = pdf[content_col].map(
                lambda b: float(np.frombuffer(b, dtype=np.uint8).mean()) if len(b) else 0.0
            )
            yield pd.DataFrame(
                {
                    "asset_id": pdf[id_col].astype("int64"),
                    "width": width,
                    "height": height,
                    "n_bytes": n_bytes,
                    "mean_luma": luma.round(6),
                }
            )

    return df.select(id_col, content_col).mapInPandas(run, DECODED_IMAGE_SCHEMA)


FRAME_SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_bytes", T.BinaryType()),
    ]
)


def sample_frames(
    df: DataFrame,
    every_n_bytes: int = 64,
    id_col: str = "asset_id",
    content_col: str = "content",
    decode_stub: bool = True,
) -> DataFrame:
    """Video frame sampling stub: emits one 'frame' per ``every_n_bytes``
    slice of the payload (1→N row expansion through mapInPandas — the real
    shape of a frame sampler, minus the codec)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError("real frame sampling requires ffmpeg")
            rows = {"asset_id": [], "frame_idx": [], "frame_bytes": []}
            for aid, content in zip(pdf[id_col], pdf[content_col]):
                for i, off in enumerate(range(0, len(content), every_n_bytes)):
                    rows["asset_id"].append(int(aid))
                    rows["frame_idx"].append(i)
                    rows["frame_bytes"].append(bytes(content[off : off + every_n_bytes]))
            yield pd.DataFrame(rows)

    return df.select(id_col, content_col).mapInPandas(run, FRAME_SAMPLE_SCHEMA)
