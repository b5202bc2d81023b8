"""Custom stateful streaming operators via ``applyInPandasWithState``
(north-star extension: the escape hatch for semantics Spark's built-in
windowed/dedup state can't express).

The example operator here is a per-key running aggregate with processing-time
timeout — the shape every custom stateful op shares: Arrow-batched input per
key, an explicit GroupState holding a small fixed-width tuple, watermark/
timeout-driven eviction so state stays bounded (unbounded keyed state is the
canonical streaming OOM at scale).
"""

from __future__ import annotations

import re
from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_TOTALS_OUTPUT = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("total_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("batch_events", T.LongType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("count", T.LongType()),
        T.StructField("sum", T.DoubleType()),
    ]
)

# What GroupState.setTimeoutDuration accepts: a bare millisecond count or
# "<n> <unit>" in Spark's CalendarInterval vocabulary.
_TIMEOUT_RE = re.compile(
    r"^\d+(\s+(ms|millisecond|milliseconds|s|second|seconds|"
    r"min|minute|minutes|h|hour|hours|d|day|days))?$"
)


def _make_update_fn(
    timeout: str | None,
) -> Callable[[tuple, Iterator[pd.DataFrame], GroupState], Iterator[pd.DataFrame]]:
    """Build the per-key update function, closing over the timeout duration.

    The duration must be re-armed via ``state.setTimeoutDuration`` on EVERY
    update — Spark has no standing per-key timer; a key whose state is
    updated without re-arming never times out, which silently disables the
    bounded-state guarantee."""

    def _update_running_totals(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        """Pure function of (key batch, prior state) → idempotent per
        micro-batch under task retries (Spark replays the whole batch on
        failure)."""
        if state.hasTimedOut:
            state.remove()
            return
        count, total = state.get if state.exists else (0, 0.0)
        batch_n = 0
        for pdf in pdfs:
            batch_n += len(pdf)
            count += len(pdf)
            total += float(pdf["value"].sum())
        state.update((count, total))
        if timeout is not None:
            state.setTimeoutDuration(timeout)
        yield pd.DataFrame(
            {
                "key": [key[0]],
                "total_events": [count],
                "total_value": [round(total, 6)],
                "batch_events": [batch_n],
            }
        )

    return _update_running_totals


def running_totals(
    df: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
    timeout: str = "NoTimeout",
) -> DataFrame:
    """Per-key running (count, sum) across micro-batches.

    State is one (long, double) pair per live key — fixed width, so state
    size is O(distinct keys), and the optional processing-time timeout
    (``timeout`` = e.g. ``"30 minutes"`` or a bare millisecond count)
    evicts idle keys: each update re-arms ``setTimeoutDuration``, so a key
    that stops receiving batches is removed one duration later and total
    state stays bounded by the live-key count. Works on batch DataFrames
    too (single "micro-batch"), which is how the unit tests pin semantics
    without a streaming harness.
    """
    from pyspark.sql import functions as F

    keyed = df.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(value_col).cast("double").alias("value"),
    )
    if timeout != "NoTimeout":
        if not _TIMEOUT_RE.match(timeout.strip()):
            raise ValueError(
                f"invalid timeout duration {timeout!r}: expected 'NoTimeout', "
                "a millisecond count, or '<n> <unit>' (ms/seconds/minutes/"
                "hours/days)"
            )
        timeout_conf = GroupStateTimeout.ProcessingTimeTimeout
        update_fn = _make_update_fn(timeout.strip())
    else:
        timeout_conf = GroupStateTimeout.NoTimeout
        update_fn = _make_update_fn(None)
    return keyed.groupBy("key").applyInPandasWithState(
        update_fn,
        RUNNING_TOTALS_OUTPUT,
        _STATE_SCHEMA,
        "update",
        timeout_conf,
    )
