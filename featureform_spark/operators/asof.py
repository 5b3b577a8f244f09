"""General-purpose as-of join and sessionization operators.

``asof_join`` generalizes the PIT machinery into the standard
time-series operator (pandas ``merge_asof`` / DuckDB ``ASOF JOIN``
surface): backward or forward match, optional tolerance, composite
``by`` keys. Same scale shape as the training-set join — union + ONE
window pass, no inequality join.

``sessionize`` assigns session ids by inactivity gap: two windows over
one shuffle (lag + running count), the classic formulation — and the
batch twin of Structured Streaming's ``session_window``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str] | str,
    value_cols: list[str] | None = None,
    direction: str = "backward",
    tolerance_seconds: float | None = None,
    right_on: str | None = None,
    right_order_col: str | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """For each left row, the nearest right row at-or-before (backward)
    or at-or-after (forward) its ``on`` time, matching on ``by`` keys.

    Ties (equal right ``on``) resolve to the last-written right row —
    pass ``right_order_col`` (an ingestion index) to make that fully
    deterministic across runs/partitionings; otherwise file order is
    used. With ``tolerance_seconds`` matches further than the tolerance
    are nulled out. Output = left columns + matched ``value_cols``
    (suffixed on collision) + ``<on><suffix>`` matched ts.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    by = [by] if isinstance(by, str) else list(by)
    right_on = right_on or on
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in by and c != right_on]

    out_cols = [
        (c, f"{c}{suffix}" if c in left.columns else c) for c in value_cols
    ]
    matched_ts = f"{on}{suffix}"

    lpart = left.select(
        *[F.col(c) for c in left.columns],
        F.col(on).cast("timestamp").alias("_t"),
        F.lit(1).alias("_is_left"),
        F.lit(None).cast("long").alias("_ord"),
        F.lit(None).cast(
            right.select(
                F.struct(
                    *[F.col(c).alias(oc) for c, oc in out_cols],
                    F.col(right_on).cast("timestamp").alias(matched_ts),
                ).alias("_payload")
            ).schema["_payload"].dataType
        ).alias("_payload"),
    )
    rpart = right.select(
        *[F.col(c) for c in by],
        *[F.lit(None).cast(lpart.schema[c].dataType).alias(c)
          for c in left.columns if c not in by],
        F.col(right_on).cast("timestamp").alias("_t"),
        F.lit(0).alias("_is_left"),
        (
            F.col(right_order_col).cast("long")
            if right_order_col
            else F.monotonically_increasing_id()
        ).alias("_ord"),
        F.struct(
            *[F.col(c).alias(oc) for c, oc in out_cols],
            F.col(right_on).cast("timestamp").alias(matched_ts),
        ).alias("_payload"),
    )
    unioned = lpart.unionByName(rpart)

    if direction == "backward":
        order = [F.col("_t").asc_nulls_last(), F.col("_is_left").asc(), F.col("_ord").asc()]
    else:
        # forward: walk time descending so "last seen" = nearest later
        # row; among equal-ts right rows keep the last written (ord asc
        # in descending walk means higher ord seen later)
        order = [F.col("_t").desc_nulls_last(), F.col("_is_left").asc(), F.col("_ord").asc()]
    w = (
        Window.partitionBy(*[F.col(c) for c in by])
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.withColumn("_m", F.last("_payload", ignorenulls=True).over(w)).filter(
        F.col("_is_left") == 1
    )

    if tolerance_seconds is not None:
        delta = (
            F.col("_t").cast("double") - F.col(f"_m.{matched_ts}").cast("double")
            if direction == "backward"
            else F.col(f"_m.{matched_ts}").cast("double") - F.col("_t").cast("double")
        )
        filled = filled.withColumn(
            "_m", F.when(delta <= tolerance_seconds, F.col("_m"))
        )

    return filled.select(
        *[F.col(c) for c in left.columns],
        *[F.col(f"_m.{oc}").alias(oc) for _, oc in out_cols],
        F.col(f"_m.{matched_ts}").alias(matched_ts),
    )


def sessionize(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    gap_seconds: float = 1800.0,
    session_col: str = "session_id",
    order_col: str | None = None,
) -> DataFrame:
    """Inactivity-gap sessionization: a new session starts when the gap
    from the previous event of the same entity exceeds ``gap_seconds``.

    ``session_id`` = "<entity>#<n>" with n counting sessions per entity
    from 1 in time order. One shuffle (both windows share the
    partitioning); ties ordered by ``order_col`` for determinism.
    """
    order = [F.col(ts_col).asc()] + (
        [F.col(order_col).asc()] if order_col else []
    )
    w = Window.partitionBy(entity_col).orderBy(*order)
    prev_ts = F.lag(F.col(ts_col)).over(w)
    # integer microsecond arithmetic: exact, and engine-portable (a
    # double-seconds cast rounds at µs granularity)
    gap_us = int(gap_seconds * 1_000_000)
    # cast("timestamp") first: NTZ-safe (unix_micros rejects TIMESTAMP_NTZ;
    # with a UTC session tz the cast is value-preserving), no-op otherwise
    ts_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    prev_us = F.unix_micros(prev_ts.cast("timestamp"))
    new_session = (
        prev_ts.isNull() | ((ts_us - prev_us) > gap_us)
    ).cast("long")
    running = F.sum(new_session).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(
        session_col,
        F.concat(F.col(entity_col).cast("string"), F.lit("#"), running.cast("string")),
    )
