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

from featureform_spark.operators.training_set import lag_interval

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
    lag_seconds: float = 0.0,
    n_salts: int = 1,
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

    ``lag_seconds`` is the streaming twin of the batch
    ``FeatureInput.lag_seconds`` (J6, provider/spark.go:152-207): the
    feature's effective time shifts forward by the lag BEFORE entering
    the state history, so a label only sees feature values with
    ``feature_ts + lag <= label_ts`` — bound-shift in state lookup,
    identical to the batch ``INTERVAL`` shift.

    ``n_salts`` is the streaming twin of the batch join's
    ``time_bucket`` skew variant (r10 verdict #6). The batch fix —
    partition a hot entity's history by (entity, time bucket) with a
    carry-in join — has no streaming analogue: state keys cannot read
    each other, so a bucket key could never see earlier buckets'
    finals. The streaming-native fix is salt-and-replicate: the
    feature stream REPLICATES into every (entity, salt) state history
    while each label routes to exactly one salt (md5 of its ts+value
    — deterministic under replay), so a hot entity's label traffic
    fans across ``n_salts`` state-store tasks and every salt still
    answers from the full history — results are bit-identical to
    ``n_salts=1`` (parity-pinned under a hot-entity fixture). Cost:
    feature-history state and feature ingest work scale x n_salts for
    every entity, so size it to the hot-label rate (labels/sec per
    entity / per-task budget), not "just in case". Changing n_salts
    changes the state key space — restart from a fresh checkpoint.

    Returns the unstarted output DataFrame — attach your own sink
    (memory/parquet/foreachBatch).
    """
    if n_salts < 1:
        raise ValueError(f"n_salts must be >= 1, got {n_salts}")
    retain_us = (
        int(retain_seconds * 1_000_000)
        if retain_seconds is not None  # 0 = maximal pruning, not "off"
        else None
    )

    def _tag(
        df: DataFrame, kind: int, vcol: str, lag: float = 0.0
    ) -> DataFrame:
        ts = F.col(ts_col).cast("timestamp")
        if lag:
            # same expression as the batch join's lag shift
            ts = ts + lag_interval(lag)
        return df.select(
            F.col(entity_col).cast("string").alias("entity"),
            ts.alias("ts"),
            F.lit(kind).alias("kind"),
            F.col(vcol).cast("double").alias("val"),
        )

    f_tagged = _tag(features, _FEATURE, feature_value_col, lag_seconds)
    l_tagged = _tag(labels, _LABEL, label_value_col)
    if n_salts > 1:
        f_tagged, l_tagged = _salt_streams(f_tagged, l_tagged, n_salts)
        group_cols = ["entity", "_salt"]
    else:
        group_cols = ["entity"]
    unioned = f_tagged.unionByName(l_tagged)

    def update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        entity = key[0]
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

    return unioned.groupBy(*group_cols).applyInPandasWithState(
        update,
        outputStructType=PIT_OUTPUT_SCHEMA,
        stateStructType=PIT_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def _salt_streams(
    f_tagged: DataFrame, l_tagged: DataFrame, n_salts: int
) -> tuple[DataFrame, DataFrame]:
    """Skew salting for streaming PIT: features replicate into every
    salt (each (entity, salt) state keeps the FULL history), labels
    route to one deterministic salt — md5 of (ts, val), stable under
    replay and engine-independent, so checkpointed restarts re-route
    identically."""
    from featureform_spark.operators.mixing import md5_u32

    f = f_tagged.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("_salt", F.col("_salt").cast("int"))
    # epoch micros, NOT a string cast: rendering a timestamp as a
    # string goes through spark.sql.session.timeZone, which would
    # re-route replayed labels after a timezone change — the epoch is
    # the instant itself
    lbl_key = F.concat_ws(
        "|",
        F.unix_micros(F.col("ts")).cast("string"),
        F.col("val").cast("string"),
    )
    lbl = l_tagged.withColumn(
        "_salt", F.pmod(md5_u32(lbl_key), F.lit(n_salts)).cast("int")
    )
    return f, lbl


MULTI_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("entity", T.StringType()),
        T.StructField("label_ts", T.TimestampType()),
        T.StructField("label", T.DoubleType()),
        T.StructField(
            "features", T.MapType(T.StringType(), T.DoubleType())
        ),
    ]
)

# per-entity histories for N features: parallel arrays keyed by the
# feature NAME — a positional index would silently remap histories if
# the feature set changes across a checkpointed restart
MULTI_STATE_SCHEMA = T.StructType(
    [
        T.StructField("fname", T.ArrayType(T.StringType())),
        T.StructField("ts_us", T.ArrayType(T.LongType())),
        T.StructField("vals", T.ArrayType(T.DoubleType())),
    ]
)


def streaming_point_in_time_multi(
    labels: DataFrame,
    features: dict[str, DataFrame],
    entity_col: str = "entity",
    ts_col: str = "ts",
    label_value_col: str = "value",
    feature_value_col: str = "value",
    retain_seconds: float | None = None,
    lags: dict[str, float] | None = None,
    n_salts: int = 1,
):
    """N-feature streaming PIT: every label row emits
    ``(entity, label_ts, label, features)`` where ``features`` maps
    each feature name to its at-or-before value (NULL-absent names
    simply missing from the map when no value preceded the label).
    Same at-or-before / last-arrival-wins semantics as the
    single-feature form, one state store entry per entity covering all
    features — the batch twin is ``point_in_time_join`` with one
    ``FeatureInput`` per name. ``lags`` maps feature names to their
    ``lag_seconds`` (the batch J6 bound shift): those features'
    effective times move forward by the lag before entering state.
    ``n_salts`` is the hot-entity skew knob — same salt-and-replicate
    semantics and cost trade as the single-feature form (see
    :func:`streaming_point_in_time`).
    """
    if n_salts < 1:
        raise ValueError(f"n_salts must be >= 1, got {n_salts}")
    names = sorted(features)
    lags = lags or {}
    unknown = set(lags) - set(names)
    if unknown:
        raise ValueError(f"lags for unregistered features: {sorted(unknown)}")
    retain_us = (
        int(retain_seconds * 1_000_000)
        if retain_seconds is not None
        else None
    )

    _LABEL_TAG = ""  # feature names are non-empty by construction

    def _tag(
        df: DataFrame, fname: str, vcol: str, lag: float = 0.0
    ) -> DataFrame:
        ts = F.col(ts_col).cast("timestamp")
        if lag:
            ts = ts + lag_interval(lag)
        return df.select(
            F.col(entity_col).cast("string").alias("entity"),
            ts.alias("ts"),
            F.lit(fname).alias("fname"),
            F.col(vcol).cast("double").alias("val"),
        )

    if any(not n for n in names):
        raise ValueError("feature names must be non-empty strings")
    l_tagged = _tag(labels, _LABEL_TAG, label_value_col)
    f_tagged = None
    for name in names:
        part = _tag(
            features[name],
            name,
            feature_value_col,
            float(lags.get(name, 0.0)),
        )
        f_tagged = part if f_tagged is None else f_tagged.unionByName(part)
    if n_salts > 1 and f_tagged is not None:
        f_tagged, l_tagged = _salt_streams(f_tagged, l_tagged, n_salts)
        group_cols = ["entity", "_salt"]
    else:
        group_cols = ["entity"]
    unioned = (
        l_tagged if f_tagged is None else f_tagged.unionByName(l_tagged)
    )

    def update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        entity = key[0]
        hist: dict[str, tuple[list, list]] = {n: ([], []) for n in names}
        if state.exists:
            fnames, ts_us, vals = state.get
            for f, t, v in zip(fnames, ts_us, vals):
                # a feature removed across a checkpointed restart drops
                # its history; names never misattribute
                got = hist.get(f)
                if got is not None:
                    got[0].append(t)
                    got[1].append(v)

        events: list[tuple[int, int, int, str, float]] = []
        seq = 0
        for pdf in pdfs:
            t_us = (pd.to_datetime(pdf["ts"]).astype("int64") // 1000).tolist()
            for t, fname, val in zip(
                t_us, pdf["fname"].tolist(), pdf["val"].tolist()
            ):
                # features sort before labels at equal ts — encode the
                # at-or-before rule in the sort key
                events.append(
                    (t, 0 if fname != _LABEL_TAG else 1, seq, fname, val)
                )
                seq += 1
        events.sort(key=lambda e: (e[0], e[1], e[2]))

        rows = []
        for t, _k, _s, fname, val in events:
            if fname != _LABEL_TAG:
                ts_l, v_l = hist[fname]
                i = bisect_right(ts_l, t)
                ts_l.insert(i, t)
                v_l.insert(i, val)
            else:
                fmap = {}
                for name in names:
                    ts_l, v_l = hist[name]
                    i = bisect_right(ts_l, t)
                    if i > 0:
                        fmap[name] = v_l[i - 1]
                rows.append(
                    (entity, pd.Timestamp(t * 1000), val, fmap)
                )
        if retain_us is not None:
            hi = max(
                (ts_l[-1] for ts_l, _ in hist.values() if ts_l),
                default=None,
            )
            if hi is not None:
                horizon = hi - retain_us
                for name in hist:
                    ts_l, v_l = hist[name]
                    cut = bisect_right(ts_l, horizon)
                    if cut > 1:
                        hist[name] = (ts_l[cut - 1 :], v_l[cut - 1 :])
        fnames_out: list[str] = []
        ts_out: list[int] = []
        vals_out: list[float] = []
        for name in sorted(hist):
            ts_l, v_l = hist[name]
            fnames_out += [name] * len(ts_l)
            ts_out += ts_l
            vals_out += v_l
        state.update((fnames_out, ts_out, vals_out))
        yield pd.DataFrame(
            rows, columns=["entity", "label_ts", "label", "features"]
        )

    return unioned.groupBy(*group_cols).applyInPandasWithState(
        update,
        outputStructType=MULTI_OUTPUT_SCHEMA,
        stateStructType=MULTI_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
