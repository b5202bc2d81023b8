"""Pipeline observability (SURVEY.md §2.11).

The reference prints per-stage record counts, classification success rates
and top-k label distributions as it runs (dag/vacancy_pipline_gpt_rerty.py
:402-434 titles, :763-799 fields, :118-129 ingest counts). Spark-first
re-expression:

- **Stage row counts** ride on ``df.observe()`` (`pyspark.sql.Observation`):
  metrics are accumulated DURING the single pass of the real action — no
  extra count() jobs, no second scan. This is the only scale-sane way to
  count 100 TB stages.
- **Distribution reports** (success rate, top-k, undefined samples) reuse
  the engine's own aggregate operators (A4 frequency, A6 conditional
  counts, A7 ratio, T2 top-k, T4 truncated sample) over the final frame —
  aggregated data is tiny, so these are cheap follow-up jobs on a cached
  result.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from vacancy_gpt_etl_pipeline_spark.functions.scalars import truncate_with_ellipsis


@dataclass
class PipelineObserver:
    """Collects named ``Observation`` handles attached along a lineage.

    Usage::

        obs = PipelineObserver()
        df = obs.stage(raw, "ingest")
        ... transforms ...
        df.write...          # ONE action evaluates every observation
        obs.row_counts()     # {'ingest': 12345, ...}
    """

    observations: dict[str, Observation] = field(default_factory=dict)

    def stage(self, df: DataFrame, name: str) -> DataFrame:
        if name in self.observations:
            raise ValueError(f"duplicate stage name {name!r}")
        ob = Observation(name)
        self.observations[name] = ob
        return df.observe(ob, F.count(F.lit(1)).alias("rows"))

    def row_counts(self) -> dict[str, int]:
        """Metric values; blocks until the observed plan has run an action."""
        return {name: ob.get["rows"] for name, ob in self.observations.items()}


@dataclass
class ClassificationReport:
    """The reference's post-enrichment report (dag/...py:402-434): totals,
    success rate, top-k distribution with shares, truncated failure samples."""

    column: str
    total: int
    successes: int
    success_rate_pct: float
    top_distribution: list[tuple[str, int, float]]  # (label, count, pct)
    failure_samples: list[str]


def classification_report(
    df: DataFrame,
    col: str,
    failure_values: tuple[str, ...],
    source_col: str | None = None,
    top_k: int = 15,
    sample_k: int = 10,
    sample_chars: int = 50,
) -> ClassificationReport:
    """Compute the report with TWO jobs over ``df`` (one agg, one sample) —
    cache ``df`` first if it is expensive to recompute.

    A6 conditional counts + A4/T2 frequency top-k + A7 ratio + T4 truncated
    samples, composed from the registry operators.
    """
    dist_rows = (
        df.groupBy(F.col(col).alias("label"))
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("label"))
        .limit(max(top_k, len(failure_values) + top_k))
        .collect()
    )
    # totals from the grouped frame (group cardinality ≪ rows; exact)
    totals = df.agg(
        F.count("*").alias("total"),
        F.sum(
            F.when(~F.col(col).isin(*failure_values), 1).otherwise(0)
        ).alias("successes"),
    ).collect()[0]
    total, successes = totals["total"], int(totals["successes"] or 0)
    rate = round(100.0 * successes / total, 1) if total else 0.0

    top = [
        (r["label"], r["cnt"], round(100.0 * r["cnt"] / total, 1))
        for r in dist_rows
        if r["label"] not in failure_values
    ][:top_k]

    sample_src = source_col or col
    samples = [
        r["sample"]
        for r in (
            df.where(F.col(col).isin(*failure_values))
            .select(truncate_with_ellipsis(sample_src, sample_chars).alias("sample"))
            .limit(sample_k)
            .collect()
        )
    ]
    return ClassificationReport(
        column=col,
        total=total,
        successes=successes,
        success_rate_pct=rate,
        top_distribution=top,
        failure_samples=samples,
    )


def format_report(report: ClassificationReport) -> str:
    """Human-readable block mirroring the reference's log output."""
    lines = [
        f"=== {report.column} ===",
        f"total: {report.total}  successes: {report.successes}"
        f"  rate: {report.success_rate_pct}%",
        "top distribution:",
    ]
    for label, cnt, pct in report.top_distribution:
        lines.append(f"  {label}: {cnt} ({pct}%)")
    if report.failure_samples:
        lines.append("unclassified samples:")
        for s in report.failure_samples:
            lines.append(f"  - {s}")
    return "\n".join(lines)
