"""Custom stateful streaming operators via applyInPandasWithState.

Batch sessionization (operators/asof.py:sessionize) has a streaming twin
here: per-entity state = (last event time, session counter), carried
across micro-batches, with a processing-time timeout that finalizes idle
sessions. This is the `applyInPandasWithState` pattern the task calls
out for custom stateful operators; Spark keeps the state in its state
store (RocksDB/HDFS-backed on a cluster), so it scales per-key.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("entity", T.StringType()),
        T.StructField("session_id", T.StringType()),
        T.StructField("event_count", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("closed", T.BooleanType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("session_n", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("start_us", T.LongType()),
        T.StructField("count", T.LongType()),
    ]
)


def streaming_sessionize(
    stream_df: DataFrame,
    entity_col: str,
    ts_col: str,
    gap_seconds: float = 1800.0,
    queryName: str = "sessions",
):
    """Continuous sessionization: emits one row per (entity, session)
    update; ``closed`` marks sessions finalized by the inactivity gap.

    Within a micro-batch events are processed in time order; sessions
    split when the gap between consecutive events exceeds
    ``gap_seconds`` — the same rule as batch ``sessionize``, so a replay
    of the stream equals the batch computation.
    """
    gap_us = int(gap_seconds * 1_000_000)

    def update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        (entity,) = key
        if state.exists:
            session_n, last_us, start_us, count = state.get
        else:
            session_n, last_us, start_us, count = 0, None, None, 0

        rows = []
        for pdf in pdfs:
            ts = pd.to_datetime(pdf[ts_col]).sort_values()
            for t in ts:
                t_us = t.value // 1000
                if last_us is None or t_us - last_us > gap_us:
                    if last_us is not None:
                        rows.append(
                            (entity, f"{entity}#{session_n}", count,
                             pd.Timestamp(start_us * 1000),
                             pd.Timestamp(last_us * 1000), True)
                        )
                    session_n += 1
                    start_us, count = t_us, 0
                count += 1
                last_us = t_us
        state.update((session_n, last_us, start_us, count))
        rows.append(
            (entity, f"{entity}#{session_n}", count,
             pd.Timestamp(start_us * 1000), pd.Timestamp(last_us * 1000), False)
        )
        yield pd.DataFrame(
            rows,
            columns=["entity", "session_id", "event_count",
                     "session_start", "session_end", "closed"],
        )

    grouped = stream_df.select(
        F.col(entity_col).cast("string").alias("entity"), F.col(ts_col)
    ).groupBy("entity")
    out = grouped.applyInPandasWithState(
        update,
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName(queryName)
        .trigger(availableNow=True)
        .start()
    )


SCD2_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("entity", T.StringType()),
        T.StructField("state_value", T.StringType()),
        T.StructField("valid_from", T.TimestampType()),
        T.StructField("valid_to", T.TimestampType()),
        T.StructField("is_current", T.BooleanType()),
    ]
)

SCD2_STATE_SCHEMA = T.StructType(
    [
        T.StructField("cur_value", T.StringType()),
        T.StructField("from_us", T.LongType()),
    ]
)


def streaming_scd2(
    stream_df: DataFrame,
    entity_col: str,
    ts_col: str,
    attr_col: str,
    queryName: str = "scd2",
):
    """Streaming twin of operators/temporal.scd2 for a single tracked
    attribute: per-entity state = (current value, valid_from), carried
    across micro-batches. Each change emits the CLOSED prior interval
    (valid_to = the change's timestamp, the same half-open chain as
    batch) plus the new open one, so a downstream MERGE keeps a live
    SCD2 dimension current as CDC arrives. Within a batch events
    process in (ts, value) order — the batch operator's tiebreak — so
    replaying the stream equals the batch computation
    (test_streaming_scd2_matches_batch pins the parity).

    Scale: applyInPandasWithState keeps one tiny tuple per entity in
    the state store; emitted rows are change-count-sized, never
    event-count-sized."""

    def update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        (entity,) = key
        if state.exists:
            cur_value, from_us = state.get
        else:
            cur_value, from_us = None, None

        rows = []
        events = []
        for pdf in pdfs:
            for t, v in zip(pd.to_datetime(pdf[ts_col]), pdf[attr_col]):
                events.append((t.value // 1000, v))
        events.sort(key=lambda e: (e[0], str(e[1])))
        for t_us, v in events:
            if v is None or v == cur_value:
                continue
            if cur_value is not None:
                rows.append(
                    (entity, cur_value,
                     pd.Timestamp(from_us * 1000),
                     pd.Timestamp(t_us * 1000), False)
                )
            cur_value, from_us = v, t_us
        state.update((cur_value, from_us))
        if cur_value is not None:
            rows.append(
                (entity, cur_value, pd.Timestamp(from_us * 1000),
                 None, True)
            )
        yield pd.DataFrame(
            rows,
            columns=["entity", "state_value", "valid_from",
                     "valid_to", "is_current"],
        )

    grouped = stream_df.select(
        F.col(entity_col).cast("string").alias("entity"),
        F.col(ts_col),
        F.col(attr_col).cast("string").alias(attr_col),
    ).groupBy("entity")
    out = grouped.applyInPandasWithState(
        update,
        outputStructType=SCD2_OUTPUT_SCHEMA,
        stateStructType=SCD2_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName(queryName)
        .trigger(availableNow=True)
        .start()
    )


def streaming_funnel(
    stream_df: DataFrame,
    entity_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
    queryName: str = "funnel",
):
    """Streaming twin of operators/temporal.funnel: per-entity state is
    the step-timestamp vector (one long per step, micros), carried
    across micro-batches; each batch emits the entity's updated row —
    a downstream MERGE keeps a live conversion table current as events
    arrive. Within a batch events process in (ts, type) order and steps
    fill with the same strictly-after rule as batch, so replaying the
    stream equals the batch computation
    (test_streaming_funnel_matches_batch pins the parity).

    State is k longs per entity — change-bounded, never
    event-count-bounded."""
    if len(steps) < 2 or len(set(steps)) != len(steps):
        raise ValueError("funnel needs >=2 distinct steps")
    k = len(steps)
    out_schema = T.StructType(
        [T.StructField("entity", T.StringType())]
        + [
            T.StructField(f"step_{i + 1}_ts", T.TimestampType())
            for i in range(k)
        ]
        + [
            T.StructField("steps_completed", T.IntegerType()),
            T.StructField("converted", T.BooleanType()),
        ]
    )
    state_schema = T.StructType(
        [T.StructField(f"t{i}", T.LongType()) for i in range(k)]
    )
    step_idx = {sname: i for i, sname in enumerate(steps)}

    def update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        (entity,) = key
        ts_us = list(state.get) if state.exists else [None] * k

        events = []
        for pdf in pdfs:
            for t, tp in zip(pd.to_datetime(pdf[ts_col]), pdf[type_col]):
                if tp in step_idx:
                    events.append((t.value // 1000, str(tp)))
        events.sort()
        for t_us, tp in events:
            i = step_idx[tp]
            if ts_us[i] is not None:
                continue
            if i == 0:
                ts_us[0] = t_us
            elif ts_us[i - 1] is not None and t_us > ts_us[i - 1]:
                ts_us[i] = t_us
        state.update(tuple(ts_us))
        done = sum(1 for t in ts_us if t is not None)
        yield pd.DataFrame(
            [
                (entity,
                 *[
                     pd.Timestamp(t * 1000) if t is not None else None
                     for t in ts_us
                 ],
                 done, ts_us[k - 1] is not None)
            ],
            columns=["entity"]
            + [f"step_{i + 1}_ts" for i in range(k)]
            + ["steps_completed", "converted"],
        )

    grouped = (
        stream_df.where(F.col(type_col).isin(steps))  # batch parity:
        # entities with only non-step events never appear
        .select(
            F.col(entity_col).cast("string").alias("entity"),
            F.col(ts_col),
            F.col(type_col).cast("string").alias(type_col),
        )
        .groupBy("entity")
    )
    out = grouped.applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName(queryName)
        .trigger(availableNow=True)
        .start()
    )


DECAY_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("entity", T.StringType()),
        T.StructField("decayed_count", T.DoubleType()),
        T.StructField("decayed_sum", T.DoubleType()),
        T.StructField("as_of", T.TimestampType()),
    ]
)

DECAY_STATE_SCHEMA = T.StructType(
    [
        T.StructField("count", T.DoubleType()),
        T.StructField("vsum", T.DoubleType()),
        T.StructField("last_us", T.LongType()),
    ]
)


def streaming_decayed_counts(
    stream_df: DataFrame,
    entity_col: str,
    ts_col: str,
    value_col: str,
    half_life_seconds: float = 3600.0,
    queryName: str = "decay",
):
    """Real-time half-life-decayed counters (the fraud/recsys velocity
    feature): per-entity state is (decayed_count, decayed_sum, last
    event time); each event first decays the carried state by
    ``2^(-Δt/half_life)`` then adds itself — the O(1)-state streaming
    form of operators/decay.decayed_features(smooth=True), exact for
    any event spacing because exponential decay composes
    multiplicatively (``2^-(a+b) = 2^-a · 2^-b``; the batch-parity
    test pins stream == batch at the last event time). Emitted rows
    carry ``as_of`` (the state's timestamp) so consumers can decay
    forward to serve time themselves — the store holds the anchor, not
    a staleness lie."""

    def update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        (entity,) = key
        if state.exists:
            count, vsum, last_us = state.get
        else:
            count, vsum, last_us = 0.0, 0.0, None
        events = []
        for pdf in pdfs:
            for t, v in zip(
                pd.to_datetime(pdf[ts_col]), pdf[value_col]
            ):
                events.append((t.value // 1000, float(v)))
        events.sort()
        for t_us, v in events:
            if last_us is not None:
                if t_us < last_us:
                    # late event: fold it decayed TO the carried
                    # anchor instead of rewinding state (the standard
                    # approximation for out-of-order velocity counters)
                    w = 2.0 ** (
                        -(last_us - t_us) / (half_life_seconds * 1e6)
                    )
                    count += w
                    vsum += v * w
                    continue
                decay = 2.0 ** (
                    -(t_us - last_us) / (half_life_seconds * 1e6)
                )
                count *= decay
                vsum *= decay
            count += 1.0
            vsum += v
            last_us = t_us
        state.update((count, vsum, last_us))
        yield pd.DataFrame(
            [
                (entity, count, vsum,
                 pd.Timestamp(last_us * 1000)
                 if last_us is not None else None)
            ],
            columns=["entity", "decayed_count", "decayed_sum", "as_of"],
        )

    grouped = stream_df.select(
        F.col(entity_col).cast("string").alias("entity"),
        F.col(ts_col),
        F.col(value_col).cast("double").alias(value_col),
    ).groupBy("entity")
    out = grouped.applyInPandasWithState(
        update,
        outputStructType=DECAY_OUTPUT_SCHEMA,
        stateStructType=DECAY_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName(queryName)
        .trigger(availableNow=True)
        .start()
    )
