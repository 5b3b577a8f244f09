"""Streaming point-in-time training sets.

The batch ``point_in_time_join`` (operators/training_set.py) has a
streaming twin here: the label stream joins against per-entity feature
HISTORY maintained in the state store, so a replay of both streams
produces rows equal to the batch PIT join over the same data — the one
generated pattern that previously had no streaming counterpart
(reference training sets materialize in batch,
provider/offline_store_spark_runner.py; this keeps them fresh from
streams).

Why state holds a history and not just the latest value
(``stream_to_online``-style): within a micro-batch, a feature update
with ts AFTER a label must not leak backward into that label's row —
latest-value state would answer with the future. Keeping the (ts,
value) history per entity answers every label with the exact
at-or-before value, so within-batch disorder is handled precisely and
only a feature arriving in a LATER micro-batch than an already-emitted
label (a fundamentally un-retractable case in append streams) can
differ from batch replay.

Scale shape: state is per-entity in Spark's state store
(RocksDB-backed on a cluster), sized by ``retain_seconds`` — history
older than the entity's newest event beyond that horizon is pruned
every batch, so state is bounded by update rate x horizon, not stream
length.
"""

from __future__ import annotations

from bisect import bisect_right
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

PIT_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("entity", T.StringType()),
        T.StructField("label_ts", T.TimestampType()),
        T.StructField("label", T.DoubleType()),
        T.StructField("feature", T.DoubleType()),
    ]
)

# per-entity feature history: parallel arrays sorted by ts
PIT_STATE_SCHEMA = T.StructType(
    [
        T.StructField("ts_us", T.ArrayType(T.LongType())),
        T.StructField("vals", T.ArrayType(T.DoubleType())),
    ]
)

_FEATURE, _LABEL = 0, 1


def streaming_point_in_time(
    labels: DataFrame,
    features: DataFrame,
    entity_col: str = "entity",
    ts_col: str = "ts",
    label_value_col: str = "value",
    feature_value_col: str = "value",
    retain_seconds: float | None = None,
):
    """As-of join a label STREAM to a feature STREAM.

    Both inputs are streaming DataFrames; they union into one keyed
    stream (features sort before labels at equal ts — the batch join's
    at-or-before rule) and ``applyInPandasWithState`` keeps each
    entity's feature history. Every label row emits
    ``(entity, label_ts, label, feature)`` where ``feature`` is the
    latest feature value with ``ts <= label_ts`` (last arrival wins on
    equal feature ts, matching the batch ``_ord`` tiebreak), or NULL if
    no feature preceded the label.

    Returns the unstarted output DataFrame — attach your own sink
    (memory/parquet/foreachBatch).
    """
    retain_us = (
        int(retain_seconds * 1_000_000)
        if retain_seconds is not None  # 0 = maximal pruning, not "off"
        else None
    )

    def _tag(df: DataFrame, kind: int, vcol: str) -> DataFrame:
        return df.select(
            F.col(entity_col).cast("string").alias("entity"),
            F.col(ts_col).cast("timestamp").alias("ts"),
            F.lit(kind).alias("kind"),
            F.col(vcol).cast("double").alias("val"),
        )

    unioned = _tag(features, _FEATURE, feature_value_col).unionByName(
        _tag(labels, _LABEL, label_value_col)
    )

    def update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        (entity,) = key
        if state.exists:
            ts_us, vals = state.get
            ts_us, vals = list(ts_us), list(vals)
        else:
            ts_us, vals = [], []

        events: list[tuple[int, int, int, float]] = []  # ts, kind, seq, val
        seq = 0
        for pdf in pdfs:
            t_us = (pd.to_datetime(pdf["ts"]).astype("int64") // 1000).tolist()
            for t, kind, val in zip(t_us, pdf["kind"].tolist(), pdf["val"].tolist()):
                events.append((t, int(kind), seq, val))
                seq += 1
        # event-time order; features before labels at equal ts
        # (at-or-before); arrival order breaks remaining ties so a
        # same-batch duplicate feature resolves last-write-wins
        events.sort(key=lambda e: (e[0], e[1], e[2]))

        rows = []
        for t, kind, _s, val in events:
            if kind == _FEATURE:
                # append keeping ts order; equal-ts later arrival goes
                # AFTER existing entries so it wins the as-of lookup
                i = bisect_right(ts_us, t)
                ts_us.insert(i, t)
                vals.insert(i, val)
            else:
                i = bisect_right(ts_us, t)
                fval = vals[i - 1] if i > 0 else None
                rows.append(
                    (entity, pd.Timestamp(t * 1000), val, fval)
                )
        if retain_us is not None and ts_us:
            horizon = ts_us[-1] - retain_us
            cut = bisect_right(ts_us, horizon)
            if cut > 1:
                # keep one value at-or-before the horizon so labels just
                # inside it still resolve
                ts_us, vals = ts_us[cut - 1 :], vals[cut - 1 :]
        state.update((ts_us, vals))
        yield pd.DataFrame(
            rows, columns=["entity", "label_ts", "label", "feature"]
        )

    return unioned.groupBy("entity").applyInPandasWithState(
        update,
        outputStructType=PIT_OUTPUT_SCHEMA,
        stateStructType=PIT_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
