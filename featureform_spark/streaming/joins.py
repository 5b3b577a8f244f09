"""Stream-stream joins with watermark-bounded state.

The attribution pattern (join each conversion to the click that
preceded it within a time bound) as a Structured Streaming
stream-stream join: both sides carry event-time watermarks and the join
condition carries the time-range bound, so Spark can expire join state
— without both, stream-stream state grows forever (the documented
requirement in the Structured Streaming guide).

A replay of the two streams equals the batch interval join of the same
inputs (asserted in tests/test_stream_join.py), which is the semantics
contract: streaming is an incremental execution of the same relational
op, not a different operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    within_seconds: float,
    watermark_delay: str = "10 minutes",
    join_type: str = "inner",
) -> DataFrame:
    """Join right-side events to left-side events of the same ``key``
    where ``left_ts <= right_ts <= left_ts + within_seconds``.

    Both inputs may be streaming or batch DataFrames — the same plan
    works for both (batch ignores watermarks), which is what makes the
    streaming-equals-batch test meaningful. State bound: left rows
    expire once the right watermark passes ``left_ts + within + delay``;
    right rows once the left watermark passes ``right_ts + delay``.
    """
    l_stream = left.isStreaming
    lw = (
        left.withWatermark(left_ts, watermark_delay) if l_stream else left
    )
    rw = (
        right.withWatermark(right_ts, watermark_delay)
        if right.isStreaming
        else right
    )
    l = lw.alias("l")
    r = rw.alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}"))
        & (
            F.col(f"r.{right_ts}")
            <= F.col(f"l.{left_ts}")
            + F.expr(f"INTERVAL {int(within_seconds)} SECONDS")
        )
    )
    out_cols = [F.col(f"l.{key}").alias(key)] + [
        F.col(f"l.{c}").alias(f"l_{c}") for c in left.columns if c != key
    ] + [F.col(f"r.{c}").alias(f"r_{c}") for c in right.columns if c != key]
    return l.join(r, cond, join_type).select(*out_cols)
