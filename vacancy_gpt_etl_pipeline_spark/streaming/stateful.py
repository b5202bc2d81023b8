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

from typing import Iterator

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


def _update_running_totals(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Pure function of (key batch, prior state) → idempotent per micro-batch
    under task retries (Spark replays the whole batch on failure)."""
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
    yield pd.DataFrame(
        {
            "key": [key[0]],
            "total_events": [count],
            "total_value": [round(total, 6)],
            "batch_events": [batch_n],
        }
    )


def running_totals(
    df: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
    timeout: str = "NoTimeout",
) -> DataFrame:
    """Per-key running (count, sum) across micro-batches.

    State is one (long, double) pair per live key — fixed width, so state
    size is O(distinct keys), and the optional processing-time timeout
    evicts idle keys. Works on batch DataFrames too (single "micro-batch"),
    which is how the unit tests pin semantics without a streaming harness.
    """
    from pyspark.sql import functions as F

    keyed = df.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(value_col).cast("double").alias("value"),
    )
    timeout_conf = (
        GroupStateTimeout.ProcessingTimeTimeout
        if timeout != "NoTimeout"
        else GroupStateTimeout.NoTimeout
    )
    return keyed.groupBy("key").applyInPandasWithState(
        _update_running_totals,
        RUNNING_TOTALS_OUTPUT,
        _STATE_SCHEMA,
        "update",
        timeout_conf,
    )
