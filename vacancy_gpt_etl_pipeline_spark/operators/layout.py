"""Z-order (Morton curve) data layout — multi-dimensional clustering for
scan pruning.

At 100 TB the cheapest query is the one that never reads the file: parquet
row-group min/max statistics prune scans, but only along the ONE column the
data happens to be sorted by. Interleaving the bits of two key columns
into a Morton z-value and range-partitioning on it bounds BOTH columns'
min/max within every output bucket, so predicates on either dimension
prune (the technique behind Delta/Iceberg ``OPTIMIZE ZORDER BY``).

Everything here is closed-form column arithmetic — no UDFs, no shuffle to
COMPUTE z-values (one 1-row stats aggregate broadcast for normalization;
the bit interleave is a map-side expression that whole-stage codegen
flattens):

- :func:`zvalue` normalizes each dimension to ``bits``-bit integer rank
  space via the broadcast (min, max) and interleaves bits x-even / y-odd.
- :func:`zorder_manifest` buckets rows by the top ``bucket_bits`` of the
  z-value and reports per-bucket row counts and min/max of BOTH
  dimensions — the exact statistics a file-level pruner would consult,
  making layout quality directly measurable (and oracle-able: the same
  arithmetic is expressible in ANSI SQL).
- :func:`zorder_repartition` is the production write path:
  ``repartitionByRange`` on the z-value then sort-within-partitions, so
  every output file covers a tight z-range (range exchange samples the
  z-distribution — balanced files even under skew).

Normalization divides by the GLOBAL (min, max) in double precision; both
engines evaluate the identical IEEE expression ``floor((v - min) * scale
/ (max - min))``, so bucket assignment is engine-stable.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _normalize(v: Column, vmin: Column, vmax: Column, bits: int) -> Column:
    """Map v ∈ [vmin, vmax] onto integer [0, 2^bits - 1] (degenerate
    single-value dimension maps to 0)."""
    top = F.lit(float((1 << bits) - 1))
    spread = (vmax - vmin).cast("double")
    scaled = F.floor(
        (v - vmin).cast("double") * top / spread
    )
    return F.when(spread > 0, scaled).otherwise(F.lit(0)).cast("bigint")


def _interleave(zx: Column, zy: Column, bits: int) -> Column:
    """Bit-interleave two ``bits``-bit integers: x at even positions, y
    odd. Unrolled into 2·bits shift/mask terms OR-reduced — a flat
    codegen expression, same style as the unrolled minhash signatures."""
    terms = []
    for k in range(bits):
        terms.append(F.shiftleft(F.shiftright(zx, k).bitwiseAND(F.lit(1)), 2 * k))
        terms.append(
            F.shiftleft(F.shiftright(zy, k).bitwiseAND(F.lit(1)), 2 * k + 1)
        )
    return reduce(lambda a, b: a.bitwiseOR(b), terms)


def zvalue(
    df: DataFrame, x_col: str, y_col: str, bits: int = 16
) -> DataFrame:
    """Append a ``z`` column: the Morton code of (x_col, y_col) after
    rank-normalizing each dimension into ``bits`` bits using broadcast
    global (min, max) stats."""
    stats = df.select(
        F.min(x_col).alias("_xmin"),
        F.max(x_col).alias("_xmax"),
        F.min(y_col).alias("_ymin"),
        F.max(y_col).alias("_ymax"),
    )
    zx = _normalize(F.col(x_col), F.col("_xmin"), F.col("_xmax"), bits)
    zy = _normalize(F.col(y_col), F.col("_ymin"), F.col("_ymax"), bits)
    return (
        df.crossJoin(F.broadcast(stats))
        .withColumn("z", _interleave(zx, zy, bits))
        .drop("_xmin", "_xmax", "_ymin", "_ymax")
    )


def zorder_manifest(
    df: DataFrame,
    x_col: str,
    y_col: str,
    bits: int = 16,
    bucket_bits: int = 8,
) -> DataFrame:
    """Per-bucket layout statistics after z-ordering: bucket id (top
    ``bucket_bits`` of the z-value — what range partitioning would make a
    file), row count, and min/max of both dimensions. Tight per-bucket
    ranges on BOTH columns = effective two-dimensional pruning."""
    z = zvalue(df, x_col, y_col, bits)
    bucket = F.shiftright(F.col("z"), 2 * bits - bucket_bits).cast("int")
    return (
        z.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min(x_col).alias("x_min"),
            F.max(x_col).alias("x_max"),
            F.min(y_col).alias("y_min"),
            F.max(y_col).alias("y_max"),
        )
        .orderBy("bucket")
    )


def zorder_repartition(
    df: DataFrame,
    x_col: str,
    y_col: str,
    bits: int = 16,
    num_partitions: int | None = None,
) -> DataFrame:
    """Production write path: range-partition on the z-value (sampled
    range exchange → balanced partitions even with skewed keys) and sort
    within partitions so parquet row-group stats are tight. Write the
    result with ``df.write.parquet(...)`` to get a 2-D-prunable table."""
    z = zvalue(df, x_col, y_col, bits)
    parts = num_partitions or z.sparkSession.sparkContext.defaultParallelism
    return z.repartitionByRange(parts, "z").sortWithinPartitions("z")


def duckdb_norm_sql(v: str, lo: str, hi: str, bits: int = 16) -> str:
    """ANSI-SQL twin of :func:`_normalize` (same IEEE expression order:
    subtract → multiply by the float top → divide by the float spread →
    floor), for embedding in a DuckDB oracle."""
    top = float((1 << bits) - 1)
    return (
        f"CASE WHEN CAST({hi} - {lo} AS DOUBLE) > 0 THEN "
        f"CAST(floor(CAST({v} - {lo} AS DOUBLE) * {top} / "
        f"CAST({hi} - {lo} AS DOUBLE)) AS BIGINT) ELSE 0 END"
    )


def duckdb_interleave_sql(zx: str, zy: str, bits: int = 16) -> str:
    """ANSI-SQL twin of :func:`_interleave`, generated by the same loop
    so Spark and the DuckDB oracle share one definition of the curve
    (the ``_survivor_sql()`` pattern). ``zx``/``zy`` are column names of
    already-normalized integers."""
    terms = []
    for k in range(bits):
        terms.append(f"((({zx} >> {k}) & 1) << {2 * k})")
        terms.append(f"((({zy} >> {k}) & 1) << {2 * k + 1})")
    return " | ".join(terms)


__all__ = [
    "zvalue",
    "zorder_manifest",
    "zorder_repartition",
    "duckdb_norm_sql",
    "duckdb_interleave_sql",
]
