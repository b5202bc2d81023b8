"""Single-pass data-quality expectation suite (deequ/Great-Expectations
style, re-expressed Spark-first).

An ETL pipeline that loads 100 TB a day needs its quality gates to cost
ONE scan, not one scan per check. Every expectation here compiles to a
plain aggregate expression, so an arbitrary suite evaluates as a single
map-side-combined ``agg`` over one pass of the data — the 1-row result
is then unpivoted to one row per expectation with ``stack`` (a narrow
projection, no shuffle).

Uniqueness is the one exception to "any number of checks, one cheap
pass": each ``expect_unique`` adds a ``count_distinct``, and Spark plans
2+ distinct aggregates in one ``agg`` via Expand (input duplicated per
distinct) — fine for a handful, but budget one distinct-heavy suite
rather than twenty. The expression stays exact; the cost model is the
caller's dial.

The reference pipeline's only gate is row-count > 0 before load
(dag/vacancy_pipline_gpt_rerty.py's empty-frame early exit); this
generalizes that to declarative per-column contracts.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Expectation:
    """One named check: ``metric`` is an aggregate expression evaluating
    to a DOUBLE in [0, 1] (fraction of rows satisfying the contract,
    exact integer-ratio arithmetic so a SQL oracle matches bit-for-bit);
    ``threshold`` is the minimum fraction that counts as a pass."""

    name: str
    metric: Column
    threshold: float = 1.0


def _fraction(pred: Column) -> Column:
    # exact: both counts are BIGINTs < 2^53, the single division is
    # correctly rounded IEEE — identical in any engine
    return F.sum(pred.cast("long")) / F.count(F.lit(1))


def expect_not_null(col: str, threshold: float = 1.0) -> Expectation:
    return Expectation(
        f"not_null:{col}", _fraction(F.col(col).isNotNull()), threshold
    )


def expect_unique(col: str, threshold: float = 1.0) -> Expectation:
    """Fraction = distinct/total (1.0 ⇔ fully unique). Nulls count into
    the total but not the distinct set — a null-heavy key column fails
    uniqueness rather than vacuously passing."""
    return Expectation(
        f"unique:{col}",
        F.count_distinct(F.col(col)) / F.count(F.lit(1)),
        threshold,
    )


def expect_between(
    col: str, lo: float, hi: float, threshold: float = 1.0
) -> Expectation:
    return Expectation(
        f"between:{col}",
        _fraction(F.col(col).isNotNull() & F.col(col).between(lo, hi)),
        threshold,
    )


def expect_in_set(
    col: str, values: list[str], threshold: float = 1.0
) -> Expectation:
    return Expectation(
        f"in_set:{col}", _fraction(F.col(col).isin(values)), threshold
    )


def expect_matches(
    col: str, pattern: str, threshold: float = 1.0
) -> Expectation:
    """POSIX-portable regex recommended — the pattern is evaluated by
    Spark here and verbatim by any SQL oracle."""
    return Expectation(
        f"matches:{col}", _fraction(F.col(col).rlike(pattern)), threshold
    )


def run_expectations(
    df: DataFrame, expectations: list[Expectation]
) -> DataFrame:
    """Evaluate the whole suite in ONE aggregation pass; returns one row
    per expectation: (expectation, fraction, threshold, passed).

    Scale shape: a single global ``agg`` — partial aggregation combines
    map-side, the final reduce touches one row per check. The unpivot is
    a projection of the 1-row frame (no shuffle, no second scan)."""
    aggs = [e.metric.cast("double").alias(e.name) for e in expectations]
    one_row = df.agg(*aggs)
    pairs = ", ".join(f"'{e.name}', `{e.name}`" for e in expectations)
    unpivoted = one_row.selectExpr(
        f"stack({len(expectations)}, {pairs}) AS (expectation, fraction)"
    )
    thresholds = F.create_map(
        *[x for e in expectations for x in (F.lit(e.name), F.lit(float(e.threshold)))]
    )
    return unpivoted.select(
        "expectation",
        "fraction",
        thresholds[F.col("expectation")].alias("threshold"),
        (F.col("fraction") >= thresholds[F.col("expectation")]).alias("passed"),
    )


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """One-pass column profiler: (column, n_rows, n_nulls, n_distinct,
    min_value, max_value) per requested column — the discovery
    counterpart to the contract checks above (profile first, then pin
    what you learned as expectations).

    min/max are emitted as STRINGS (exact cast, no formatting) so one
    schema serves every column type. Each profiled column adds a
    ``count_distinct``; 2+ profiled columns plan through Expand (input
    row per distinct aggregate) — one pass of the data, ``len(cols)``×
    map-side width. Profile the columns you care about, not SELECT *.
    """
    aggs: list[Column] = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"_nulls_{c}"),
            F.count_distinct(F.col(c)).alias(f"_ndv_{c}"),
            F.min(F.col(c)).cast("string").alias(f"_min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"_max_{c}"),
        ]
    one = df.agg(*aggs)
    pairs = ", ".join(
        f"'{c}', _n, `_nulls_{c}`, `_ndv_{c}`, `_min_{c}`, `_max_{c}`"
        for c in cols
    )
    return one.selectExpr(
        f"stack({len(cols)}, {pairs}) AS "
        "(column, n_rows, n_nulls, n_distinct, min_value, max_value)"
    )
