"""Blocked fuzzy matching — the entity-resolution join.

Naive fuzzy matching is the textbook scale-killer: levenshtein across all
pairs is O(n²) comparisons of an O(L²) dynamic program. The standard fix
(record-linkage practice since Fellegi-Sunter; same shape Dedupe/Splink
use) is BLOCK → VERIFY:

1. **Blocking**: a cheap deterministic key (here: normalized prefix +
   length bucket) partitions the corpus; only same-block pairs are
   candidates. The equi-join on the block key is a plain shuffled hash
   join — no cross product anywhere.
2. **Verification**: exact ``levenshtein`` (JVM built-in) on candidate
   pairs only, filtered to ``max_distance``.

Precision is EXACT (every emitted pair satisfies the distance bound);
recall is the blocking scheme's — a pair whose edits change the prefix
or cross a length-bucket boundary is missed. That trade is inherent to
single-pass blocking and documented per the standard practice: run
multiple passes with different keys (prefix, suffix, phonetic) and union
when higher recall is needed. ``max_block`` caps degenerate blocks (the
skew guard every candidate-generation operator here carries).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _norm(col):
    return F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")


def fuzzy_self_join(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_distance: int = 2,
    prefix_len: int = 3,
    length_bucket: int = 4,
    max_block: int | None = 1000,
) -> DataFrame:
    """Near-match pairs ``(id_a, id_b, distance)`` with
    ``levenshtein(norm_a, norm_b) <= max_distance``, candidates blocked on
    (normalized ``prefix_len``-char prefix, length ÷ ``length_bucket``).

    Pairs straddling a length-bucket edge are kept recall-safe: each row
    lands in its own bucket AND the next one when its length is within
    ``max_distance`` of the boundary, so a ≤``max_distance`` length
    difference can never separate a pair. (Prefix edits remain the
    documented recall limit of a single pass.)
    """
    base = (
        df.select(F.col(id_col).alias("_id"), _norm(F.col(text_col)).alias("_t"))
        .where(F.length("_t") >= prefix_len)
        .select(
            "_id",
            "_t",
            F.substring("_t", 1, prefix_len).alias("_pfx"),
            F.floor(F.length("_t") / length_bucket).alias("_lb"),
            (F.length("_t") % length_bucket).alias("_lr"),
        )
    )
    # straddle duplication: a row near the TOP of its bucket also posts to
    # the next bucket, so pairs split by the boundary still co-block
    spill = base.where(
        F.col("_lr") >= F.lit(length_bucket - max_distance)
    ).withColumn("_lb", F.col("_lb") + 1)
    blocked = base.unionByName(spill)
    if max_block is not None:
        w = Window.partitionBy("_pfx", "_lb")
        blocked = (
            blocked.withColumn("_bc", F.count("*").over(w))
            .where(F.col("_bc") <= max_block)
            .drop("_bc")
        )
    l, r = blocked.alias("l"), blocked.alias("r")
    pairs = (
        l.join(
            r,
            (F.col("l._pfx") == F.col("r._pfx"))
            & (F.col("l._lb") == F.col("r._lb"))
            & (F.col("l._id") < F.col("r._id")),
        )
        .select(
            F.col("l._id").alias("id_a"),
            F.col("r._id").alias("id_b"),
            F.levenshtein(F.col("l._t"), F.col("r._t")).alias("distance"),
        )
        # distance filter BEFORE dropDuplicates: map-side in the join
        # stage, so the dedup shuffle carries only true matches (straddle
        # duplication can emit a pair in two buckets)
        .where(F.col("distance") <= max_distance)
        .dropDuplicates(["id_a", "id_b"])
    )
    return pairs
