"""Stream-stream and stream-static joins (extension surface; SURVEY §2.9).

Structured Streaming's inner stream-stream join requires event-time
constraints on BOTH sides so the state store can expire rows: each side
carries a watermark, and the join condition bounds how far the two event
times may drift apart. Without the time bound, state grows forever — the
planner rejects the query. (Spark Structured Streaming programming guide,
"Stream-stream Joins".)

The helpers build the canonical shapes:

- :func:`stream_stream_interval_join` — click-to-purchase style: left
  events match right events for the same key within
  ``[left.ts, left.ts + within]``. State per key is bounded by
  ``watermark + within``.
- :func:`stream_static_enrich` — a streaming fact joined to a static
  (batch) dimension; no watermark needed on the static side, Spark
  re-plans the broadcast per micro-batch.

Both compose on batch DataFrames identically (event-time joins are not
streaming-only), which is how the deterministic tests pin their
semantics; streaming tests run them under ``trigger(availableNow=True)``
to verify the state-store path accepts the plan and produces the same
rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    within: str = "1 hour",
    left_watermark: str = "2 hours",
    right_watermark: str = "2 hours",
    extra_cond: Column | None = None,
) -> DataFrame:
    """Inner join: right rows in ``[left_ts, left_ts + within]`` per key.

    Column names are prefixed ``l_`` / ``r_`` (except the join key) so the
    output schema is collision-free and stable for sinks. Watermarks are
    applied only to STREAMING inputs — batch runs of the same composition
    skip them (withWatermark is a no-op/unsupported mix on batch frames),
    keeping one code path for both the oracle test and the stream.
    """
    if left.isStreaming:
        left = left.withWatermark(left_ts, left_watermark)
    if right.isStreaming:
        right = right.withWatermark(right_ts, right_watermark)
    lsel = left.select(
        F.col(on),
        *[
            F.col(c).alias(f"l_{c}")
            for c in left.columns
            if c != on
        ],
    )
    rsel = right.select(
        F.col(on).alias(f"_r_{on}"),
        *[
            F.col(c).alias(f"r_{c}")
            for c in right.columns
            if c != on
        ],
    )
    cond = (
        (F.col(on) == F.col(f"_r_{on}"))
        & (F.col(f"r_{right_ts}") >= F.col(f"l_{left_ts}"))
        & (
            F.col(f"r_{right_ts}")
            <= F.col(f"l_{left_ts}") + F.expr(f"INTERVAL {within}")
        )
    )
    if extra_cond is not None:
        cond = cond & extra_cond
    return lsel.join(rsel, cond, "inner").drop(f"_r_{on}")


def stream_static_enrich(
    stream: DataFrame,
    static_dim: DataFrame,
    on: str,
    how: str = "left",
) -> DataFrame:
    """Streaming fact × static dimension. The static side is re-read per
    micro-batch (so slowly-changing dims pick up updates between
    batches) and broadcast when small — the planner handles both; this
    helper exists to pin the supported join types (left/inner from the
    stream side) and give the pattern a tested name."""
    if how not in ("left", "inner"):
        raise ValueError(
            f"stream-static join from the stream side supports left/inner, "
            f"got {how!r}"
        )
    return stream.join(F.broadcast(static_dim), on, how)
