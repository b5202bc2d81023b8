"""Schema contracts: fail-fast, precisely-diagnosed validation of a
DataFrame against a declared StructType.

The reference pipeline trusts pandas inference end-to-end (SURVEY §1.3)
— a silently-widened column or a renamed header surfaces as a wrong
dashboard weeks later. At 100 TB the failure mode is worse: a drifted
upstream schema burns a full cluster pass before anything notices. A
contract check is metadata-only — it reads ZERO rows — so it runs
before every expensive stage for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.types import StructType

__all__ = ["SchemaContractError", "validate_schema"]


class SchemaContractError(ValueError):
    """Schema drift, with per-column diagnostics in ``problems``."""

    def __init__(self, problems: list[str]):
        self.problems = problems
        super().__init__(
            "schema contract violated:\n  " + "\n  ".join(problems)
        )


def validate_schema(
    df: DataFrame,
    expected: StructType,
    allow_extra: bool = False,
    check_nullability: bool = False,
) -> DataFrame:
    """Return ``df`` unchanged if it satisfies ``expected``; otherwise
    raise :class:`SchemaContractError` naming every missing column,
    unexpected column (unless ``allow_extra``), and dtype mismatch —
    ALL problems in one failure, not first-mismatch-wins."""
    actual = {f.name: f for f in df.schema.fields}
    problems: list[str] = []
    for f in expected.fields:
        got = actual.get(f.name)
        if got is None:
            problems.append(f"missing column: {f.name} ({f.dataType.simpleString()})")
        elif got.dataType != f.dataType:
            problems.append(
                f"type mismatch: {f.name} expected "
                f"{f.dataType.simpleString()} got {got.dataType.simpleString()}"
            )
        elif check_nullability and got.nullable and not f.nullable:
            problems.append(f"nullability: {f.name} must be NOT NULL")
    if not allow_extra:
        declared = {f.name for f in expected.fields}
        for name in actual:
            if name not in declared:
                problems.append(f"unexpected column: {name}")
    if problems:
        raise SchemaContractError(problems)
    return df
