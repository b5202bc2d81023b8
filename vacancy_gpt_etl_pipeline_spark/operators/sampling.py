"""Deterministic stratified sampling — training-mix curation.

Scale extension (north star): corpus mixing ("keep 30% of web, 100% of
books, 5% of logs") needs a sample that is (a) per-stratum exact in
expectation, (b) DETERMINISTIC — re-running the pipeline, or running it
incrementally on new partitions, must keep/drop the same rows — and (c)
joinable: two tables sampled on the same key agree, so lineage survives.
``df.sample()`` gives none of these (seeded per-partition RNG changes with
partitioning); hash-gating on a stable key gives all three.

The hash is the first 8 hex chars of md5(key) — chosen over xxhash64
because every engine in the stack (Spark, DuckDB, Python) computes the
same md5, so the decision is portable and oracle-verifiable. Keep rule:
``md5_int(key) % 1000 < permille(stratum)``.

Scale shape: the predicate is a map-side filter (pure projection math);
per-stratum rates join in as a broadcast of the (tiny, bounded) strata
table. No shuffle at all.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def hash_permille(key: Column) -> Column:
    """Stable uniform [0, 1000) bucket from any key column: first 32 bits
    of md5(key) mod 1000. Identical in DuckDB as
    ``CAST(concat('0x', substr(md5(key), 1, 8)) AS BIGINT) % 1000``."""
    return F.pmod(
        F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10).cast("bigint"),
        F.lit(1000),
    )


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    rates: dict[str, float],
    key_col: str,
    default_rate: float = 0.0,
) -> DataFrame:
    """Keep each row with its stratum's probability, deterministically in
    ``key_col``. ``rates`` maps stratum value → fraction (resolution 1/1000,
    exact at that granularity); strata not listed keep ``default_rate``.
    """
    strata = df.sparkSession.createDataFrame(
        [(k, int(round(v * 1000))) for k, v in rates.items()],
        f"{stratum_col} string, _permille int",
    )
    return (
        df.join(F.broadcast(strata), stratum_col, "left")
        .withColumn(
            "_permille",
            F.coalesce(F.col("_permille"), F.lit(int(round(default_rate * 1000)))),
        )
        .where(hash_permille(F.col(key_col)) < F.col("_permille"))
        .drop("_permille")
    )


def weighted_sample(
    df: DataFrame,
    weight: Column,
    key_col: str,
    k: int,
) -> DataFrame:
    """Deterministic weighted sampling without replacement — top-``k`` rows
    by the Efraimidis–Spirakis exponential key ``ln(u)/w`` (maximizing
    ``u^(1/w)``; Efraimidis & Spirakis, IPL 97(5), 2006, "Weighted random
    sampling with a reservoir").

    ``u`` derives from md5(key) — the same portable-hash source as
    :func:`hash_permille` — so the sample is reproducible across runs,
    partitionings, and engines: u = (first 28 md5 bits)/2^28 ∈ (0,1],
    +1 so u is never 0 (ln(0) = -inf would make weights irrelevant).

    Scale shape: the key is map-side projection math; the global top-k is
    a TakeOrderedAndProject (per-partition heaps + driver merge of k·P
    rows), NOT a full sort — the canonical distributed reservoir
    equivalent. Rows with weight ≤ 0 are dropped (never sampled).
    """
    u = (
        F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 7), 16, 10)
        .cast("bigint")
        + F.lit(1)
    ) / F.lit(float(1 << 28))
    es_key = F.log(u) / weight
    return (
        df.where(weight > F.lit(0))
        .withColumn("_es_key", es_key)
        # key tie-break: identical (u, weight) pairs produce identical keys
        # in every engine, so the cutoff row must be pinned or the sample
        # set itself becomes engine/partitioning-dependent
        .orderBy(F.desc("_es_key"), F.col(key_col))
        .limit(k)
        .drop("_es_key")
    )


def budget_mix(
    df: DataFrame,
    stratum_col: str,
    budgets: dict[str, int],
    weight_col: str,
    key_col: str,
) -> DataFrame:
    """Token-budget corpus mixing: per stratum, keep documents in
    deterministic md5-of-key order until the stratum's ``weight_col``
    budget is exhausted (the crossing document is INCLUDED, so every
    stratum with any data meets or exceeds its budget — training mixes
    under-run is worse than slight over-run).

    The budget-based dual of :func:`stratified_sample` (rate-based):
    "2 M tokens of web, 500 k of code" instead of "30% of web". The
    md5 order makes the selected set reproducible across runs,
    partitionings, and engines, and stable under corpus APPENDS in the
    sense that re-runs re-rank consistently (an append can only displace
    docs ranked after the new doc's hash position).

    Scale shape: ONE shuffle — the cumulative-sum window partitioned by
    stratum. Parallelism = #strata (same contract as sequence packing:
    the stratum must be a real partition key, never a constant). Strata
    without a budget entry are dropped map-side BEFORE the window, so
    the sort only sees participating rows.
    """
    spark = df.sparkSession
    b = spark.createDataFrame(
        [(k, int(v)) for k, v in budgets.items()],
        f"{stratum_col} string, _budget long",
    )
    hashed = df.join(F.broadcast(b), stratum_col).withColumn(
        "_h", F.md5(F.col(key_col).cast("string"))
    )
    w = (
        Window.partitionBy(stratum_col)
        .orderBy("_h", key_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum(weight_col).over(w), F.lit(0))
    return (
        hashed.withColumn("_cum_before", cum_before)
        .where(F.col("_cum_before") < F.col("_budget"))
        .drop("_h", "_cum_before", "_budget")
    )


def shuffle_shards(
    df: DataFrame,
    key_col: str,
    num_shards: int = 16,
    salt: str = "shuffle",
) -> DataFrame:
    """Deterministic global-shuffle manifest: ``(…, shard_id,
    pos_in_shard)`` — the reproducible corpus shuffle a pretraining run
    needs ("epoch order must be the same on every re-run and on the
    re-run after a crash") without a global sort.

    The row's md5(salt ‖ key) splits into independent bit fields: the
    first 16 bits pick the shard (map-side, no shuffle), the remaining
    hex orders rows WITHIN the shard (one row_number window per shard —
    parallelism = ``num_shards``, so pick num_shards ≥ cluster width; a
    1000-shard manifest at 100 TB gives every reducer ~one shard).
    Changing ``salt`` reshuffles globally; keys tie-break so duplicate
    hashes stay deterministic. Both fields are lowercase-hex md5 math,
    so the manifest is engine-portable and oracle-verifiable.
    """
    h = F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string")))
    shard = F.pmod(
        F.conv(F.substring(h, 1, 4), 16, 10).cast("bigint"),
        F.lit(num_shards),
    )
    order_bits = F.substring(h, 5, 28)
    w = Window.partitionBy("shard_id").orderBy("_ord", key_col)
    return (
        df.withColumn("shard_id", shard)
        .withColumn("_ord", order_bits)
        .withColumn("pos_in_shard", F.row_number().over(w).cast("bigint"))
        .drop("_ord")
    )


def kfold_assign(
    df: DataFrame, key_col: str, k: int = 5, salt: str = "fold"
) -> DataFrame:
    """Deterministic k-fold assignment: ``fold = md5(salt:key) % k``.

    The cross-validation splitter: folds are disjoint and exhaustive BY
    CONSTRUCTION (every key hashes to exactly one residue), reproducible
    across runs/engines (same portable md5 source as
    :func:`hash_permille`), and require NO shuffle — the fold column is
    a map-side projection, so fold membership never moves data; training
    jobs filter ``fold != i`` with a pushed predicate. ``salt`` decouples
    this hash from any other md5-gated decision on the same key (reusing
    one hash for split AND sampling would correlate the two)."""
    h = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(":", F.lit(salt), F.col(key_col).cast("string"))
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("bigint")
    return df.withColumn("fold", (h % k).cast("int"))
