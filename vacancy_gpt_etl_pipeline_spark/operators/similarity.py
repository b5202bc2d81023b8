"""Similarity search over embedding columns (``array<float>``).

Scale extension (north star). Two tiers:

- :func:`knn_brute_force` — exact cosine top-k. O(queries × corpus); right
  answer for bounded query sets (the query side is broadcast, the corpus is
  streamed through one narrow stage — no shuffle of the corpus).
- :func:`knn_lsh` — random-hyperplane LSH buckets prune the corpus before
  scoring, the standard recall/cost knob at 100 TB (see PAPERS.md: REPOSE
  ICDE'21 partitions by sign-random-projection the same way).
- :func:`embedding_near_duplicates` — cosine near-dup pairs via the same
  bucketing, the embedding analogue of MinHash dedup.

Dot products stay JVM-side (``zip_with`` + ``aggregate`` higher-order
functions) — no Python in the hot path; cosines are computed on
unit-normalized vectors so the pair score is a single dot product.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a, b) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a) -> Column:
    return F.sqrt(_dot(a, a))


def cosine_similarity_col(a, b, ndigits: int | None = 6) -> Column:
    cos = _dot(a, b) / (_norm(a) * _norm(b))
    return F.round(cos, ndigits) if ndigits is not None else cos


def unit_normalize(df: DataFrame, vec_col: str, out_col: str = "_unit") -> DataFrame:
    n = _norm(vec_col)
    return df.withColumn(
        out_col,
        F.transform(F.col(vec_col), lambda x: x.cast("double") / n),
    )


def knn_brute_force(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    exclude_self: bool = True,
) -> DataFrame:
    """Exact cosine top-k per query. Plan: broadcast(queries) ⨯ corpus →
    per-query TakeOrdered via row_number window partitioned by query.

    The window shuffles only (query_id, corpus_id, cosine) triples — never
    the vectors; at 1000 executors the crossJoin stage is embarrassingly
    parallel over corpus partitions.
    """
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"))
    scored = c.crossJoin(F.broadcast(q)).select(
        "query_id",
        "neighbor_id",
        cosine_similarity_col("_qv", "_cv").alias("cosine"),
    )
    if exclude_self:
        scored = scored.where(F.col("query_id") != F.col("neighbor_id"))
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def _rhp_bucket(vec_col: str, planes: list[list[float]]) -> Column:
    """Random-hyperplane LSH bucket id: sign bits of <v, p_i> packed into a
    long. Hyperplanes are tiny literal arrays → pure JVM expression."""
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        bit = (_dot(F.col(vec_col), plane) > 0).cast("long")
        bucket = bucket + F.shiftleft(bit, i)
    return bucket


def knn_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    tables: list[list[list[float]]],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k via MULTI-TABLE random-hyperplane LSH: a corpus
    vector is a candidate if it shares a bucket with the query in ANY table.

    ``tables`` is a list of hyperplane sets; recall for a neighbor at angle
    θ is ``1-(1-p^b)^T`` with ``p = 1-θ/π``, ``b`` planes/table, ``T``
    tables — fewer planes per table and more tables trade cost for recall
    (the standard IVF/LSH knob; PAPERS.md REPOSE partitions the same way).

    Scale shape: the corpus is exploded ×T into fixed-width (table, bucket)
    rows, joined against broadcast queries, candidates deduped on
    (query, neighbor) before scoring — per-candidate cosine is computed
    once even when a pair collides in several tables.
    """
    c_bkts = F.posexplode(
        F.array(*[_rhp_bucket(vec_col, planes) for planes in tables])
    ).alias("_tbl", "_bkt")
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"), c_bkts
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("_qv"), c_bkts
    ).select("query_id", "_qv", "_tbl", "_bkt")
    cand = (
        c.join(F.broadcast(q), ["_tbl", "_bkt"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cand.select(
        "query_id",
        "neighbor_id",
        cosine_similarity_col("_qv", "_cv").alias("cosine"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def embedding_near_duplicates(
    df: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: list[list[float]] | None = None,
) -> DataFrame:
    """Cosine near-duplicate pairs (id_a < id_b, cosine ≥ threshold).

    With ``planes`` given, candidates are confined to equal LSH buckets
    (approximate, scales linearly); without, an all-pairs self-join (exact,
    quadratic — small corpora / verification only).
    """
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"))
    if planes is not None:
        a = a.withColumn("_bkt", _rhp_bucket("_va", planes))
        b = b.withColumn("_bkt", _rhp_bucket("_vb", planes))
        pairs = a.join(b, "_bkt").where(F.col("id_a") < F.col("id_b"))
    else:
        pairs = a.crossJoin(b).where(F.col("id_a") < F.col("id_b"))
    return (
        pairs.withColumn("cosine", cosine_similarity_col("_va", "_vb"))
        .where(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )
