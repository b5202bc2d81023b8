"""Mergeable-sketch aggregates — the 100 TB pre-aggregation pattern.

Scale extension (north star; no reference counterpart — the reference
recomputes every aggregate from raw CSV, dag/vacancy_pipline_gpt_rerty.py's
analysis step rescans the full sink each run).

The pattern: persist a SKETCH TABLE at fine granularity (e.g. one
DataSketches HLL per (dimension, day)), then answer coarse-granularity
distinct-count questions by MERGING sketches instead of rescanning raw
rows. HLL union is associative and lossless w.r.t. the sketch state, so
``estimate(merge(daily))`` equals ``estimate(direct)`` exactly — asserted
in tests/test_sketches.py, not just within-error. A dashboard over 100 TB
of events then touches kilobytes of sketches, and incremental days append
without recomputation.

Everything here is a built-in JVM aggregate (``hll_sketch_agg`` /
``hll_union_agg`` / ``percentile_approx`` are DataSketches-backed Catalyst
expressions with map-side partial aggregation) — no Python, no shuffle
beyond the one groupBy each call declares.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hll_sketch_table(
    df: DataFrame,
    fine_cols: list[str],
    value_col: str,
    lgk: int = 12,
) -> DataFrame:
    """Pre-aggregate: one HLL sketch of ``value_col`` per ``fine_cols``
    group. This is the frame you'd persist (parquet binary column) as the
    incremental rollup source; ~2^lgk bytes per group regardless of row
    count underneath."""
    return df.groupBy(*fine_cols).agg(
        F.hll_sketch_agg(value_col, F.lit(lgk)).alias("ndv_sketch")
    )


def hll_rollup(
    sketches: DataFrame,
    coarse_cols: list[str],
    sketch_col: str = "ndv_sketch",
) -> DataFrame:
    """Merge fine-granularity sketches up to ``coarse_cols`` and estimate.

    The merge is the whole point: answering "distinct users per event_type
    this quarter" from daily sketches shuffles one ~4 KB sketch per
    (event_type, day) — never the raw rows."""
    return sketches.groupBy(*coarse_cols).agg(
        F.hll_sketch_estimate(F.hll_union_agg(sketch_col)).alias("ndv_estimate")
    )


def distinct_count_rollup(
    df: DataFrame,
    fine_cols: list[str],
    coarse_cols: list[str],
    value_col: str,
    lgk: int = 12,
) -> DataFrame:
    """End-to-end: build the fine sketch table, roll it up to coarse.

    ``coarse_cols`` must be a prefix/subset of ``fine_cols`` — the fine
    table must be at least as granular as the question."""
    missing = set(coarse_cols) - set(fine_cols)
    if missing:
        raise ValueError(f"coarse_cols {sorted(missing)} not in fine_cols")
    return hll_rollup(
        hll_sketch_table(df, fine_cols, value_col, lgk=lgk), coarse_cols
    )


def approx_quantiles_per_group(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    probabilities: list[float],
    accuracy: int = 10000,
) -> DataFrame:
    """Grouped quantiles via ``percentile_approx`` (Greenwald-Khanna style
    summary, mergeable, map-side combined). Rank error is bounded by
    ``n / accuracy`` per group — tests/test_sketches.py pins it against the
    exact ``percentile`` aggregate. The exact form sorts every group; the
    sketch form streams, which is the difference between feasible and not
    on a 100 TB fact table."""
    probs = F.array(*[F.lit(float(p)) for p in probabilities])
    return df.groupBy(*group_cols).agg(
        F.percentile_approx(value_col, probs, F.lit(accuracy)).alias("quantiles")
    )


def sketch_rse(lgk: int) -> float:
    """HLL relative standard error: 1.04 / sqrt(2^lgk). Exposed so callers
    (and tests) size ``lgk`` from their accuracy target rather than
    guessing."""
    return 1.04 / (2**lgk) ** 0.5


def _cms_bucket(key: Column, row: int, width: int) -> Column:
    """Row-``row`` bucket of ``key``: the portable-md5 idiom shared with
    the MinHash family (operators/dedup.py) — 28 bits of md5('row:key')
    mod width. Engine-portable: DuckDB computes the identical bucket as
    ``('0x' || substr(md5(row || ':' || key), 1, 7))::BIGINT % width``,
    so sketch construction (not just estimates) is hash-verifiable."""
    h = F.md5(F.concat(F.lit(f"{row}:"), key.cast("string")))
    return F.conv(F.substring(h, 1, 7), 16, 10).cast("long") % width


def cms_build(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
    weight_col: str | None = None,
) -> DataFrame:
    """Build a count-min sketch of ``key_col`` frequencies as a
    ``(row, bucket, counter)`` frame — at most depth×width rows
    REGARDLESS of input size, the streaming-frequency primitive for
    heavy-hitter and frequency questions over 100 TB event logs.

    Scale shape: the depth-way expansion is a map-side ``explode`` over a
    literal array; the ONE shuffle is the (row, bucket) groupBy, which
    map-side combines down to ≤ depth×width rows per task before it moves.
    Sketches are MERGEABLE by construction: cms_merge(sketch(A),
    sketch(B)) equals cms_build(A ∪ B) exactly (asserted in
    tests/test_sketches.py), so per-day sketch tables roll up to any
    range without rescanning raw rows — the HLL pattern above, for
    frequencies instead of cardinalities.
    """
    k = F.col(key_col)
    weight = F.col(weight_col) if weight_col else F.lit(1)
    rows = F.array(*[
        F.struct(F.lit(r).alias("row"), _cms_bucket(k, r, width).alias("bucket"))
        for r in range(depth)
    ])
    return (
        df.select(F.explode(rows).alias("rb"), weight.alias("_w"))
        .groupBy(F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket"))
        .agg(F.sum("_w").cast("long").alias("counter"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge count-min sketches built with identical (depth, width):
    element-wise counter sum. Associative and exact w.r.t. sketch state."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("row", "bucket").agg(
        F.sum("counter").alias("counter")
    )


def cms_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Point-estimate frequencies for ``probes[key_col]``: min over the
    depth rows of the probed counters. Estimates are always ≥ the true
    count (one-sided error ≤ e·N/width with probability 1 − e^-depth).

    Scale shape: the sketch is ≤ depth×width rows — broadcast it; the
    probe side never shuffles. Missing (row, bucket) cells mean zero
    observations, hence the left join + coalesce(0) BEFORE the min.
    """
    k = F.col(key_col)
    rows = F.array(*[
        F.struct(F.lit(r).alias("row"), _cms_bucket(k, r, width).alias("bucket"))
        for r in range(depth)
    ])
    probed = probes.select(k.alias(key_col), F.explode(rows).alias("rb")).select(
        key_col, F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket")
    )
    joined = probed.join(F.broadcast(sketch), ["row", "bucket"], "left")
    return joined.groupBy(key_col).agg(
        F.min(F.coalesce(F.col("counter"), F.lit(0))).alias("estimate")
    )
