"""Snapshot diff: classify rows as added / removed / changed between two
keyed snapshots of the same table.

The core ETL reconciliation primitive (change-data-capture without a log):
given yesterday's and today's extracts, emit exactly the rows a downstream
consumer must act on. Shape for 100 TB:

- ONE full-outer shuffle join on the key columns — the same shuffle a
  bucketed layout on the key would make zero-copy. Nothing else moves.
- Change detection is a fold of null-safe ``<=>`` comparisons over the
  compare columns, evaluated inside the join's whole-stage-codegen
  projection — no row hashing, so no string-formatting of doubles (which
  engines disagree on) and no second pass.
- Unchanged rows — the overwhelming majority of a daily diff — are
  dropped by the post-join filter before anything downstream sees them.

Reference parity: the reference pipeline re-extracts and overwrites its
CSV outputs wholesale (dag/vacancy_pipline_gpt_rerty.py writes full
snapshots); this operator is the incremental complement a 100 TB corpus
needs instead of full rewrites.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["snapshot_diff"]


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Full-outer join ``old`` vs ``new`` on ``key_cols`` and classify.

    Returns one row per key that differs, with columns:
    ``key_cols…, change_type ('added'|'removed'|'changed'),
    old_<c>, new_<c>`` for every compare column. Keys present and equal
    in both snapshots produce no output.
    """
    # presence is tracked with literal markers, and keys join NULL-SAFE
    # (<=>): deriving presence from key.isNotNull() would misclassify a
    # NULL-keyed old row as 'added', and a plain == join would split a
    # NULL-keyed row present in both snapshots into two phantom rows
    o = old.select(
        *[F.col(k).alias(f"_ok_{k}") for k in key_cols],
        *[F.col(c).alias(f"old_{c}") for c in compare_cols],
        F.lit(1).alias("_in_old"),
    )
    n = new.select(
        *[F.col(k).alias(f"_nk_{k}") for k in key_cols],
        *[F.col(c).alias(f"new_{c}") for c in compare_cols],
        F.lit(1).alias("_in_new"),
    )
    cond = reduce(
        lambda a, b: a & b,
        [F.col(f"_ok_{k}").eqNullSafe(F.col(f"_nk_{k}")) for k in key_cols],
    )
    joined = o.join(n, cond, "full_outer")

    in_old = F.col("_in_old").isNotNull()
    in_new = F.col("_in_new").isNotNull()
    same = reduce(
        lambda a, b: a & b,
        [
            F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
            for c in compare_cols
        ],
    )
    change_type = (
        F.when(~in_old, F.lit("added"))
        .when(~in_new, F.lit("removed"))
        .when(~same, F.lit("changed"))
    )
    out_keys = [
        F.coalesce(F.col(f"_ok_{k}"), F.col(f"_nk_{k}")).alias(k)
        for k in key_cols
    ]
    return (
        joined.withColumn("change_type", change_type)
        .where(F.col("change_type").isNotNull())
        .select(
            *out_keys,
            "change_type",
            *[f"old_{c}" for c in compare_cols],
            *[f"new_{c}" for c in compare_cols],
        )
    )
