"""Skew-handling helpers (SURVEY north star: 'skewed keys hurt — salting
for skew').

AQE's skew-join splitting handles JOIN skew automatically
(``spark.sql.adaptive.skewJoin.enabled``, on in session.py). What AQE does
NOT fix is single-key AGGREGATION skew with high-cardinality per-key state
(``collect_list``/``collect_set``-style aggregates, where one hot key's
buffer exceeds an executor): for those, two-stage salted aggregation is the
standard rewrite, expressed here for the decomposable aggregates
(count / sum — anything where partial results merge associatively).

For plain count/sum Spark's partial aggregation already combines map-side,
so salting buys nothing — use these helpers when the aggregate is
buffer-heavy or when upstream partial aggregation is defeated (e.g. after
an explode whose output feeds a single hot group).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(
    df: DataFrame,
    buckets: int,
    col_name: str = "_salt",
    salt_cols: list[str] | None = None,
) -> DataFrame:
    """Uniform salt in [0, buckets), DETERMINISTIC per row content:
    ``pmod(xxhash64(salt_cols or all columns), buckets)``.

    Determinism is a correctness requirement, not a nicety: a
    position-based salt (monotonically_increasing_id, rand) is
    nondeterministic across task re-execution, so on shuffle-fetch
    failure a recomputed map task can assign rows different salts than
    the attempt other reducers already fetched — double-counting or
    dropping rows in the downstream aggregate, precisely in the at-scale
    failure scenario salting targets. A content hash reproduces
    identically on every replay.

    Trade-off: EXACT duplicate rows share a salt. Pass ``salt_cols``
    (e.g. a unique id) when the input carries one; otherwise all columns
    are hashed and residual duplicate-row skew is bounded by the
    duplication factor, not the key's row count."""
    cols = [F.col(c) for c in (salt_cols or df.columns)]
    return df.withColumn(
        col_name, F.pmod(F.xxhash64(*cols), F.lit(buckets)).cast("int")
    )


def salted_agg(
    df: DataFrame,
    group_cols: list[str],
    aggs: dict[str, tuple[Column, Column]],
    buckets: int = 16,
    salt_cols: list[str] | None = None,
) -> DataFrame:
    """Two-stage salted aggregation for associative aggregates.

    ``aggs`` maps output column name → (stage-1 aggregate over raw rows,
    stage-2 merge over stage-1 partials). Example — count and sum::

        salted_agg(df, ["k"], {
            "cnt": (F.count("*"),       F.sum("cnt")),
            "tot": (F.sum("v"),         F.sum("tot")),
        }, buckets=32)

    Stage 1 groups on (key, salt) — a hot key fans out across ``buckets``
    reducers; stage 2 merges the ≤ buckets partial rows per key. The second
    shuffle moves one row per (key, salt), so its cost is O(keys × buckets),
    independent of row skew.
    """
    stage1_exprs = [expr.alias(name) for name, (expr, _) in aggs.items()]
    stage2_exprs = [merge.alias(name) for name, (_, merge) in aggs.items()]
    salted = with_salt(df, buckets, salt_cols=salt_cols)
    partial = salted.groupBy(*group_cols, "_salt").agg(*stage1_exprs)
    return partial.groupBy(*group_cols).agg(*stage2_exprs)


def salted_collect_set(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    buckets: int = 16,
    out_col: str = "values",
    salt_cols: list[str] | None = None,
) -> DataFrame:
    """Skew-safe ``collect_set``: per-(key, salt) sets are built in parallel
    (each ≤ 1/buckets of a hot key's values), then unioned with
    ``array_distinct(flatten(...))`` in the small second stage."""
    salted = with_salt(df, buckets, salt_cols=salt_cols)
    partial = salted.groupBy(*group_cols, "_salt").agg(
        F.collect_set(value_col).alias("_part")
    )
    return partial.groupBy(*group_cols).agg(
        F.array_distinct(F.flatten(F.collect_list("_part"))).alias(out_col)
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    buckets: int = 16,
    how: str = "inner",
    salt_cols: list[str] | None = None,
) -> DataFrame:
    """Skew-safe equi-join by salting: the BIG (skewed) side gets a
    content-hash salt in [0, buckets); the SMALL side is replicated
    ``buckets`` times (one copy per salt value); the join runs on
    ``on + [_salt]``, so one hot key's rows spread across ``buckets``
    reducers instead of landing on one.

    When to reach for this instead of the built-ins, in order:
    1. ``F.broadcast(small)`` — if small fits in memory, broadcast and
       skew is moot. Salting is for a small side too big to broadcast.
    2. AQE skew-join splitting (on in session.py) — handles sort-merge
       skew automatically, but only AFTER a stage materializes oversized
       partitions; it also can't help a shuffled hash join whose single
       hot partition OOMs before AQE sees stats. Explicit salting shapes
       the shuffle correctly up front — the belt to AQE's suspenders on
       a join you KNOW is skewed (power-law keys in web/event data).

    Row multiplication is on the small side only (buckets × |small|
    shuffled); the big side is shuffled once, unduplicated. ``how``
    supports 'inner' and 'left' (left rows with unmatched keys survive
    exactly once, since their single salt copy finds no match). The salt
    is content-deterministic (with_salt) so task retries replay
    identically.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salted_big = with_salt(big, buckets, salt_cols=salt_cols)
    replicated = small.withColumn(
        "_salt",
        F.explode(F.array(*[F.lit(i).cast("int") for i in range(buckets)])),
    )
    return salted_big.join(replicated, on + ["_salt"], how).drop("_salt")
