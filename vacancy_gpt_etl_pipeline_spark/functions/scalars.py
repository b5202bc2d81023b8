"""Scalar-function surface (SURVEY.md §2.8, F1-F12).

Everything here is built-in ``pyspark.sql.functions`` composition — JVM-side,
inside whole-stage codegen. No Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def non_empty(c: Column | str) -> Column:
    """P3 non-empty predicate (dag/vacancy_pipline_gpt_rerty.py:153, :457)."""
    col = F.col(c) if isinstance(c, str) else c
    return col.isNotNull() & (F.trim(col) != F.lit(""))


def truncate_with_ellipsis(c: Column | str, max_len: int = 50) -> Column:
    """T4 sample truncation ``title[:50] + '...'`` (dag/...py:429, :794)."""
    col = F.col(c) if isinstance(c, str) else c
    return F.when(
        F.length(col) > max_len, F.concat(F.substring(col, 1, max_len), F.lit("..."))
    ).otherwise(col)


def pct_of(count_col: Column | str, total_col: Column, ndigits: int = 1) -> Column:
    """F11 percentage arithmetic (dag/...py:410; vacancy_analysis.sql:27)."""
    col = F.col(count_col) if isinstance(count_col, str) else count_col
    return F.round(col * 100.0 / total_col, ndigits)
