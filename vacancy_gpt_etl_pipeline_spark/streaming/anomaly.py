"""Streaming twin of the batch rolling-anomaly query
(queries.rolling_anomaly_events): per-user trailing z-score flags over
an unbounded event stream via ``applyInPandasWithState``.

Why stateful-custom and not a window: Spark Structured Streaming has no
streaming ROWS-frame window functions — the trailing "last 7 events"
baseline is exactly the small-fixed-state shape the
``applyInPandasWithState`` escape hatch exists for. State per user is
ONE array of ≤ ``window`` cent-quantized values — bounded by
construction, with an optional processing-time timeout evicting idle
users (the same re-arm-on-every-update contract as
streaming/stateful.running_totals).

Bit-parity with the batch query: the batch plan accumulates the
count/sum/sum-of-squares as exact DECIMAL and derives mean/var/z in
doubles. Here values quantize to integer CENTS (exact for the 2-decimal
event values), the integer sums replay the same exact accumulation, and
``s/100`` / ``q/10000`` are correctly-rounded IEEE divisions — the same
doubles Spark's decimal→double casts produce — so every emitted z-score
is bit-identical to the batch query's (asserted in
tests/test_streaming_anomaly.py).

Ordering contract: events are scored in (ts, event_id) order WITHIN a
micro-batch (the update function sorts its Arrow batches), and state
carries across batches in arrival order — so end-to-end parity holds
when the source delivers each user's events in event-time order across
batches (time-partitioned file drops, per-key ordered logs). A source
that reorders across batches needs an upstream watermark buffer; that
trade-off is inherent to sequential stateful scoring, not this
implementation.
"""

from __future__ import annotations

import math
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

ANOMALY_OUTPUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("n_prior", T.LongType()),
        T.StructField("rolling_mean", T.DoubleType()),
        T.StructField("zscore", T.DoubleType()),
    ]
)

# state: the last ≤ window values as exact integer cents, oldest first
_STATE_SCHEMA = T.StructType(
    [T.StructField("cents", T.ArrayType(T.LongType()))]
)


def _score(cents: list[int], v_cents: int, min_prior: int, z_thresh: float):
    """(n_prior, rolling_mean, z) for one value against the trailing
    baseline, or None when the warm-up / variance guard rejects it.
    Integer sums are exact; the divisions are the same IEEE ops as the
    batch plan's decimal→double casts."""
    n = len(cents)
    if n < min_prior:
        return None
    s = sum(cents) / 100.0
    q = sum(c * c for c in cents) / 10000.0
    mean = s / n
    var = (q - s * s / n) / (n - 1)
    if not var > 0:
        return None
    z = (v_cents / 100.0 - mean) / math.sqrt(var)
    return (n, mean, z) if z > z_thresh else None


def rolling_anomaly_stream(
    events: DataFrame,
    user_col: str = "user_id",
    id_col: str = "event_id",
    ts_col: str = "ts",
    value_col: str = "value",
    window: int = 7,
    min_prior: int = 4,
    z_thresh: float = 3.0,
    timeout: str | None = None,
) -> DataFrame:
    """Flagged anomalies (schema ``ANOMALY_OUTPUT``) from a streaming
    events frame — same rule as the batch query: z > ``z_thresh``
    against the trailing ≤ ``window`` values, ≥ ``min_prior`` warm-up,
    leakage-free (a value never enters its own baseline).

    ``timeout`` (e.g. ``"30 minutes"``) evicts idle users' state via
    processing-time timeout; ``None`` keeps state until the query ends
    (fine for AvailableNow replays, not for a perpetual service)."""

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        cents: list[int] = list(state.get[0]) if state.exists else []
        rows: list[tuple] = []
        chunks = list(pdfs)
        if not chunks:  # timeout-only invocation with no new data
            if timeout is not None:
                state.setTimeoutDuration(timeout)
            return
        pdf = pd.concat(chunks)
        for _, r in pdf.sort_values([ts_col, id_col]).iterrows():
            if pd.isna(r[value_col]):
                # NULL values are never scored and never enter the
                # baseline. (The batch window differs slightly: there a
                # NULL still OCCUPIES one of the 7 frame slots while
                # contributing nothing — a documented divergence that
                # only matters for null-bearing streams.)
                continue
            v = float(r[value_col])
            v_cents = round(v * 100)
            hit = _score(cents, v_cents, min_prior, z_thresh)
            if hit is not None:
                n, mean, z = hit
                rows.append((key[0], int(r[id_col]), v, n, mean, z))
            cents.append(v_cents)
            if len(cents) > window:
                cents.pop(0)
        state.update((cents,))
        if timeout is not None:
            state.setTimeoutDuration(timeout)
        if rows:
            yield pd.DataFrame(rows, columns=[f.name for f in ANOMALY_OUTPUT])

    keyed = events.select(
        F.col(user_col).cast("long").alias("user_id"),
        F.col(id_col).cast("long").alias(id_col),
        F.col(ts_col).alias(ts_col),
        F.col(value_col).cast("double").alias(value_col),
    )
    return keyed.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=ANOMALY_OUTPUT,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if timeout is not None
            else GroupStateTimeout.NoTimeout
        ),
    )
