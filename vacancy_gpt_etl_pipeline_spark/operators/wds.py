"""WebDataset tar-shard ingestion — the container tier a large-scale
multimodal training pipeline actually reads (LAION-style corpora ship
as POSIX-tar shards whose members are ``{key}.{ext}`` files; samples
are member groups sharing a key; shards are the parallelism granule).

Shape: shards arrive as rows ``(shard_id, content binary)`` — on a
cluster each task parses whole shards independently, exactly how a
WebDataset reader scales to 100 TB (no intra-shard parallelism needed;
shard count >> executor count). The member walk is a hand-written
POSIX ustar parser (512-byte header blocks: 100-byte name, octal size,
checksum over the header with the checksum field blanked, typeflag,
``ustar`` magic; data padded to 512; archive ends at two zero blocks)
— stdlib ``tarfile`` is used only to SYNTHESIZE the deterministic
fixture, mirroring operators/epub.py's zipfile-for-synthesis pattern.
Malformed shards (bad magic, checksum mismatch, size overrun)
quarantine per shard; a malformed HEADER mid-walk stops that shard's
walk at the last valid member (documented: tar has no resync point —
unlike MP3 frame sync, a corrupt header poisons everything after it).
"""

from __future__ import annotations

import io
import tarfile
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEMBER_SCHEMA = T.StructType(
    [
        T.StructField("shard_id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("key", T.StringType()),
        T.StructField("ext", T.StringType()),
        T.StructField("size", T.LongType()),
        T.StructField("offset", T.LongType()),
        T.StructField("typeflag", T.StringType()),
        T.StructField("content", T.BinaryType()),
    ]
)


def _parse_ustar(b: bytes):
    """Yield ``(name, size, offset, typeflag, payload)`` per member, or
    raise ValueError on a malformed header (bad magic / checksum /
    size overrun). ``offset`` is the member's HEADER block offset."""
    i = 0
    while i + 512 <= len(b):
        hdr = b[i : i + 512]
        if hdr == b"\x00" * 512:
            return  # end-of-archive marker
        if hdr[257:262] != b"ustar":
            raise ValueError(f"bad magic at {i}")
        stored = int(hdr[148:156].split(b"\x00")[0].strip() or b"0", 8)
        summed = sum(hdr[:148]) + 8 * 0x20 + sum(hdr[156:])
        if stored != summed:
            raise ValueError(f"checksum mismatch at {i}")
        name = hdr[0:100].split(b"\x00")[0].decode("utf-8", "replace")
        size = int(hdr[124:136].split(b"\x00")[0].strip() or b"0", 8)
        typeflag = chr(hdr[156]) if hdr[156] else "0"
        data_start = i + 512
        if data_start + size > len(b):
            raise ValueError(f"member overruns shard at {i}")
        yield name, size, i, typeflag, b[data_start : data_start + size]
        i = data_start + ((size + 511) // 512) * 512


def tar_members(
    df: DataFrame,
    id_col: str = "shard_id",
    content_col: str = "content",
) -> DataFrame:
    """Explode tar shards into member rows (Arrow ``mapInPandas``; one
    task parses whole shards — the WebDataset granule). ``key``/``ext``
    split WebDataset-style on the FIRST dot of the basename. Malformed
    shards contribute a single quarantine row (name NULL) so corrupt
    inputs are observable, not silently absent."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {f.name: [] for f in MEMBER_SCHEMA}

            def add(sid, name, key, ext, size, offset, tf, content):
                rows["shard_id"].append(sid)
                rows["name"].append(name)
                rows["key"].append(key)
                rows["ext"].append(ext)
                rows["size"].append(size)
                rows["offset"].append(offset)
                rows["typeflag"].append(tf)
                rows["content"].append(content)

            for sid, content in zip(pdf[id_col], pdf[content_col]):
                b = bytes(content) if content is not None else b""
                sid = int(sid)
                try:
                    for name, size, off, tf, payload in _parse_ustar(b):
                        base = name.rsplit("/", 1)[-1]
                        dot = base.find(".")
                        key = base[:dot] if dot >= 0 else base
                        ext = base[dot + 1 :] if dot >= 0 else ""
                        add(sid, name, key, ext, size, off, tf, payload)
                except ValueError:
                    add(sid, None, None, None, None, None, None, None)
            yield pd.DataFrame(rows)

    return df.select(id_col, content_col).mapInPandas(run, MEMBER_SCHEMA)


def wds_samples(members: DataFrame) -> DataFrame:
    """Group member rows into WebDataset samples: one row per
    (shard_id, key) with an ext→content map — the unit a training
    loader consumes. One shuffle on the composite key; map_from_entries
    keeps the pivot JVM-side."""
    return (
        members.where(F.col("name").isNotNull())
        .groupBy("shard_id", "key")
        .agg(
            F.map_from_entries(
                F.sort_array(
                    F.collect_list(F.struct("ext", "content"))
                )
            ).alias("parts"),
            F.count(F.lit(1)).alias("n_parts"),
        )
    )


def synthesize_wds_shards(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    docs_per_shard: int = 16,
    binary_col: str | None = None,
    binary_ext: str = "bmp",
) -> DataFrame:
    """Deterministic WebDataset fixture: documents grouped into shards
    of ``docs_per_shard`` by ``id // docs_per_shard``; each document
    contributes ``{id:09d}.txt`` (UTF-8 text — skipped when NULL, as a
    real pipeline skips a missing modality) and ``{id:09d}.cls``
    (label ``id % 10``) — plus ``{id:09d}.{binary_ext}`` when
    ``binary_col`` names a binary column (the multimodal sample shape:
    image + caption + label per key). Members in id order, POSIX
    ustar, zeroed mtime/uid/gid — byte-deterministic, closed-form
    replayable (member sizes are octet lengths; offsets are 512-block
    cumulative sums)."""

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col)
        buf = io.BytesIO()
        with tarfile.open(
            fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT
        ) as tf:
            for _, row in pdf.iterrows():
                i = int(row[id_col])
                parts = []
                if row[text_col] is not None:
                    parts.append((f"{i:09d}.txt", str(row[text_col]).encode()))
                parts.append((f"{i:09d}.cls", str(i % 10).encode()))
                if binary_col is not None and row[binary_col] is not None:
                    parts.append(
                        (f"{i:09d}.{binary_ext}", bytes(row[binary_col]))
                    )
                for name, data in parts:
                    info = tarfile.TarInfo(name)
                    info.size = len(data)
                    info.mtime = 0
                    info.mode = 0o644
                    tf.addfile(info, io.BytesIO(data))
        return pd.DataFrame(
            {
                "shard_id": [int(pdf["_shard"].iloc[0])],
                "content": [buf.getvalue()],
            }
        )

    cols = [id_col, text_col] + ([binary_col] if binary_col else [])
    shard = (F.col(id_col) / docs_per_shard).cast("long")
    return (
        df.select(*cols)
        .withColumn("_shard", shard)
        .groupBy("_shard")
        .applyInPandas(
            build, "shard_id long, content binary"
        )
    )
