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


def sampled_centroids(
    corpus: DataFrame,
    n_centroids: int,
    stride: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic IVF coarse quantizer: the first ``n_centroids`` corpus
    vectors whose id is a multiple of ``stride``, ordered by id.

    Determinism (vs k-means++ style random init) is deliberate: the exact
    same centroid set is reproducible in plain SQL, so the whole IVF path —
    assignment, probing, scoring — can be hash-verified against an oracle.
    :func:`lloyd_refine` upgrades these seeds to proper k-means centroids
    when recall matters more than oracle parity.
    """
    return (
        corpus.where((F.col(id_col) % stride) == 0)
        .orderBy(id_col)
        .limit(n_centroids)
        .select(F.col(id_col).alias("cell"), F.col(vec_col).alias("centroid"))
    )


def _cell_scores(df: DataFrame, vec_col: str, centroids: DataFrame) -> DataFrame:
    """Cross every vector with the (broadcast, tiny) centroid set and score.

    Cosines are rounded to 6 digits BEFORE any argmax/rank so assignment
    tie-breaking is bit-identical to an oracle that rounds the same way.
    """
    c = centroids.select("cell", F.col("centroid").alias("_cent"))
    return df.crossJoin(F.broadcast(c)).withColumn(
        "_ccos", cosine_similarity_col(vec_col, "_cent")
    )


def ivf_assign(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign every corpus vector to its nearest centroid cell.

    Scale shape: centroids broadcast (bounded by contract); the ×C
    score expansion collapses map-side via ``max_by`` partial aggregation —
    the only shuffle carries one (id, vector, cell) row per corpus vector,
    never the ×C expansion. Ties break to the lowest cell id
    (max on (cosine, -cell)), matching ``ORDER BY cos DESC, cell`` in SQL.
    """
    scored = _cell_scores(
        corpus.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v")),
        "_v",
        centroids,
    )
    return (
        scored.groupBy("_id")
        .agg(
            F.max_by(
                "cell", F.struct(F.col("_ccos"), (-F.col("cell")).alias("_neg"))
            ).alias("cell"),
            F.first("_v").alias("_v"),
        )
        .select(F.col("_id").alias(id_col), F.col("_v").alias(vec_col), "cell")
    )


def knn_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k via IVF (inverted-file) search: corpus vectors are
    bucketed into centroid cells once; each query exhaustively scores only
    the ``nprobe`` cells nearest to it.

    ``nprobe`` is the recall/cost dial — probing all cells degenerates to
    exact search (asserted in tests/test_neardup_quality.py). Scale shape:
    cell assignment is one map-side-combined aggregation; the probe join is
    broadcast (query side bounded); scoring touches ~nprobe/C of the corpus
    per query and the top-k window shuffles only (query, neighbor, cosine)
    triples.
    """
    assigned = ivf_assign(corpus, centroids, id_col=id_col, vec_col=vec_col)
    q_scored = _cell_scores(
        queries.select(
            F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("_qv")
        ),
        "_qv",
        centroids,
    )
    from pyspark.sql import Window

    pw = Window.partitionBy("query_id").orderBy(F.desc("_ccos"), F.asc("cell"))
    probes = (
        q_scored.withColumn("_crank", F.row_number().over(pw))
        .where(F.col("_crank") <= nprobe)
        .select("query_id", "_qv", "cell")
    )
    scored = (
        assigned.join(F.broadcast(probes), "cell")
        .where(F.col("query_id") != F.col(id_col))
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            cosine_similarity_col("_qv", vec_col).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def lloyd_refine(
    corpus: DataFrame,
    centroids: DataFrame,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Distributed Lloyd (k-means) refinement of an IVF centroid set.

    Each iteration: assign (map-side-combined argmax) → elementwise mean per
    cell via posexplode + groupBy(cell, dim) — the mean never leaves the
    cluster, no driver collect. Cells that lose every member keep their old
    centroid (anti-join + union) so k never shrinks. Iterative refinement is
    inherently non-SQL-expressible, so this path is pytest-verified
    (inertia monotonicity) rather than oracle-verified.
    """
    for _ in range(iters):
        assigned = ivf_assign(corpus, centroids, id_col=id_col, vec_col=vec_col)
        means = (
            assigned.select("cell", F.posexplode(vec_col).alias("_dim", "_x"))
            .groupBy("cell", "_dim")
            .agg(F.avg("_x").alias("_m"))
            .groupBy("cell")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("_dim", "_m"))),
                    lambda s: s["_m"].cast("float"),
                ).alias("centroid")
            )
        )
        kept = centroids.join(means.select("cell"), "cell", "left_anti")
        centroids = means.unionByName(kept)
    return centroids


def ivf_inertia(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> float:
    """Mean cosine distance (1 - cos) of each vector to its assigned
    centroid — the quantity :func:`lloyd_refine` descends."""
    assigned = ivf_assign(corpus, centroids, id_col=id_col, vec_col=vec_col)
    scored = assigned.join(F.broadcast(centroids), "cell").select(
        (F.lit(1.0) - cosine_similarity_col(vec_col, "centroid")).alias("_d")
    )
    return scored.agg(F.avg("_d")).first()[0]


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
