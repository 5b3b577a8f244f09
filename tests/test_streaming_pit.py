"""Streaming PIT training sets: replaying the label + feature streams
through streaming_point_in_time equals the batch point_in_time_join
over the same data (the test_stream_join.py pattern applied to the
training-set generator)."""

import datetime as dt

import pytest

from pyspark.sql import functions as F

from featureform_spark.operators.training_set import (
    FeatureInput,
    point_in_time_join,
)
from featureform_spark.streaming.pit import streaming_point_in_time

SCHEMA_F = "user long, ts timestamp, value double, ord long"
SCHEMA_L = "user long, ts timestamp, value double"

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _mins(m):
    return T0 + dt.timedelta(minutes=m)


# ord = arrival order (the batch join's last-write-wins tiebreak)
FEATURES = [
    (1, _mins(0), 10.0, 0),
    (1, _mins(20), 11.0, 1),
    (1, _mins(20), 12.0, 2),   # same-ts rewrite: later arrival wins
    (2, _mins(30), 20.0, 3),
    (3, _mins(90), 30.0, 4),   # after entity 3's only label
]
LABELS = [
    (1, _mins(5), 100.0),      # sees 10.0
    (1, _mins(20), 101.0),     # at-or-before: sees the 12.0 rewrite
    (1, _mins(60), 102.0),     # sees 12.0
    (2, _mins(25), 200.0),     # before entity 2's feature: NULL
    (2, _mins(45), 201.0),     # sees 20.0
    (3, _mins(50), 300.0),     # feature arrives later in event time: NULL
]


def _batch_expected(spark):
    fdf = spark.createDataFrame(FEATURES, SCHEMA_F)
    ldf = spark.createDataFrame(LABELS, SCHEMA_L)
    out = point_in_time_join(
        ldf,
        [FeatureInput(name="feature", df=fdf, entity_col="user",
                      value_col="value", ts_col="ts", order_col="ord")],
        label_entity_col="user",
        label_value_col="value",
        label_ts_col="ts",
    )
    return sorted(
        (r["entity"], r["label_ts"], r["label"], r["feature"])
        for r in out.collect()
    )


def _run_stream(spark, tmp_path, chunks):
    """Replay (features, labels) chunks one availableNow pass each,
    sharing a checkpoint — each pass is its own micro-batch set with
    per-entity state carried across restarts."""
    fdir, ldir = tmp_path / "f", tmp_path / "l"
    all_rows = []

    def sink(batch, _bid):
        all_rows.extend(batch.collect())

    for fc, lc in chunks:
        spark.createDataFrame(fc, SCHEMA_F).coalesce(1).write.mode(
            "append"
        ).parquet(str(fdir))
        spark.createDataFrame(lc, SCHEMA_L).coalesce(1).write.mode(
            "append"
        ).parquet(str(ldir))
        out = streaming_point_in_time(
            spark.readStream.schema(SCHEMA_L).parquet(str(ldir)),
            spark.readStream.schema(SCHEMA_F).parquet(str(fdir)),
            entity_col="user",
            ts_col="ts",
        )
        q = (
            out.writeStream.foreachBatch(sink)
            .option("checkpointLocation", str(tmp_path / "cp"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    return sorted(
        (int(r["entity"]), r["label_ts"], r["label"], r["feature"])
        for r in all_rows
    )


def test_streaming_pit_parity_single_replay(spark, tmp_path):
    got = _run_stream(spark, tmp_path, [(FEATURES, LABELS)])
    assert got == _batch_expected(spark)


def test_streaming_pit_parity_ordered_chunks(spark, tmp_path):
    """Two event-time-ordered arrival chunks (everything <= 25 min,
    then the rest): per-entity state carries across micro-batches and
    the replay still equals batch."""
    cut = _mins(25)
    chunk1 = (
        [f for f in FEATURES if f[1] <= cut],
        [l for l in LABELS if l[1] <= cut],
    )
    chunk2 = (
        [f for f in FEATURES if f[1] > cut],
        [l for l in LABELS if l[1] > cut],
    )
    got = _run_stream(spark, tmp_path, [chunk1, chunk2])
    assert got == _batch_expected(spark)


def test_streaming_pit_multi_feature_parity(spark, tmp_path):
    """Two feature streams: the map-valued multi output must equal the
    batch point_in_time_join with two FeatureInputs."""
    from featureform_spark.streaming.pit import streaming_point_in_time_multi

    f2 = [
        (1, _mins(2), 7.0, 10),
        (1, _mins(30), 8.0, 11),
        (2, _mins(40), 9.0, 12),
    ]
    fdf = spark.createDataFrame(FEATURES, SCHEMA_F)
    f2df = spark.createDataFrame(f2, SCHEMA_F)
    ldf = spark.createDataFrame(LABELS, SCHEMA_L)
    batch = point_in_time_join(
        ldf,
        [
            FeatureInput(name="fa", df=fdf, entity_col="user",
                         value_col="value", ts_col="ts", order_col="ord"),
            FeatureInput(name="fb", df=f2df, entity_col="user",
                         value_col="value", ts_col="ts", order_col="ord"),
        ],
        label_entity_col="user", label_value_col="value",
        label_ts_col="ts",
    )
    expected = sorted(
        (r["entity"], r["label_ts"], r["label"], r["fa"], r["fb"])
        for r in batch.collect()
    )

    for sub, rows in (("fa", FEATURES), ("fb", f2), ("l", LABELS)):
        schema = SCHEMA_L if sub == "l" else SCHEMA_F
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            str(tmp_path / sub)
        )
    out = streaming_point_in_time_multi(
        spark.readStream.schema(SCHEMA_L).parquet(str(tmp_path / "l")),
        {
            "fa": spark.readStream.schema(SCHEMA_F).parquet(str(tmp_path / "fa")),
            "fb": spark.readStream.schema(SCHEMA_F).parquet(str(tmp_path / "fb")),
        },
        entity_col="user", ts_col="ts",
    )
    q = (
        out.writeStream.format("memory").queryName("pit_multi")
        .option("checkpointLocation", str(tmp_path / "cp"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = sorted(
        (int(r["entity"]), r["label_ts"], r["label"],
         (r["features"] or {}).get("fa"), (r["features"] or {}).get("fb"))
        for r in spark.sql("SELECT * FROM pit_multi").collect()
    )
    assert got == expected


def test_streaming_pit_state_pruning(spark, tmp_path):
    """retain_seconds bounds state: old history is pruned but one
    at-or-before value is kept so in-horizon labels still resolve."""
    feats = [(1, _mins(0), 1.0, 0), (1, _mins(5), 2.0, 1),
             (1, _mins(60), 3.0, 2)]
    labels = [(1, _mins(62), 9.0)]
    spark.createDataFrame(feats, SCHEMA_F).coalesce(1).write.parquet(
        str(tmp_path / "f")
    )
    spark.createDataFrame(labels, SCHEMA_L).coalesce(1).write.parquet(
        str(tmp_path / "l")
    )
    out = streaming_point_in_time(
        spark.readStream.schema(SCHEMA_L).parquet(str(tmp_path / "l")),
        spark.readStream.schema(SCHEMA_F).parquet(str(tmp_path / "f")),
        entity_col="user",
        ts_col="ts",
        retain_seconds=600.0,
    )
    q = (
        out.writeStream.format("memory")
        .queryName("pit_prune")
        .option("checkpointLocation", str(tmp_path / "cp"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM pit_prune").collect()
    assert len(rows) == 1 and rows[0]["feature"] == 3.0


def test_streaming_pit_lag_parity(spark, tmp_path):
    """J6's streaming twin: lag_seconds shifts the as-of bound in the
    state lookup (feature visible only once label_ts >= ts + lag), and
    a checkpointed chunked replay stays row-equal to the batch
    point_in_time_join with the same LagFeature."""
    lag = 600.0  # 10 minutes

    fdf = spark.createDataFrame(FEATURES, SCHEMA_F)
    ldf = spark.createDataFrame(LABELS, SCHEMA_L)
    batch = point_in_time_join(
        ldf,
        [FeatureInput(name="feature", df=fdf, entity_col="user",
                      value_col="value", ts_col="ts", order_col="ord",
                      lag_seconds=lag)],
        label_entity_col="user", label_value_col="value",
        label_ts_col="ts",
    )
    expected = sorted(
        (r["entity"], r["label_ts"], r["label"], r["feature"])
        for r in batch.collect()
    )
    # the lag must actually change the answer on this fixture (the
    # label at minute 5 no longer sees the minute-0 feature, etc.)
    assert expected != _batch_expected(spark)

    fdir, ldir = tmp_path / "f", tmp_path / "l"
    all_rows = []

    def sink(batch_df, _bid):
        all_rows.extend(batch_df.collect())

    cut = _mins(25)
    chunks = [
        ([f for f in FEATURES if f[1] <= cut],
         [l for l in LABELS if l[1] <= cut]),
        ([f for f in FEATURES if f[1] > cut],
         [l for l in LABELS if l[1] > cut]),
    ]
    for fc, lc in chunks:
        spark.createDataFrame(fc, SCHEMA_F).coalesce(1).write.mode(
            "append"
        ).parquet(str(fdir))
        spark.createDataFrame(lc, SCHEMA_L).coalesce(1).write.mode(
            "append"
        ).parquet(str(ldir))
        out = streaming_point_in_time(
            spark.readStream.schema(SCHEMA_L).parquet(str(ldir)),
            spark.readStream.schema(SCHEMA_F).parquet(str(fdir)),
            entity_col="user",
            ts_col="ts",
            lag_seconds=lag,
        )
        q = (
            out.writeStream.foreachBatch(sink)
            .option("checkpointLocation", str(tmp_path / "cp"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    got = sorted(
        (int(r["entity"]), r["label_ts"], r["label"], r["feature"])
        for r in all_rows
    )
    assert got == expected


def test_streaming_pit_multi_lag_parity(spark, tmp_path):
    """Per-feature lags in the multi form: one lagged + one unlagged
    stream equals batch with matching per-FeatureInput lag_seconds."""
    from featureform_spark.streaming.pit import streaming_point_in_time_multi

    lag = 900.0
    f2 = [
        (1, _mins(2), 7.0, 10),
        (1, _mins(30), 8.0, 11),
        (2, _mins(40), 9.0, 12),
    ]
    fdf = spark.createDataFrame(FEATURES, SCHEMA_F)
    f2df = spark.createDataFrame(f2, SCHEMA_F)
    ldf = spark.createDataFrame(LABELS, SCHEMA_L)
    batch = point_in_time_join(
        ldf,
        [
            FeatureInput(name="fa", df=fdf, entity_col="user",
                         value_col="value", ts_col="ts", order_col="ord",
                         lag_seconds=lag),
            FeatureInput(name="fb", df=f2df, entity_col="user",
                         value_col="value", ts_col="ts", order_col="ord"),
        ],
        label_entity_col="user", label_value_col="value",
        label_ts_col="ts",
    )
    expected = sorted(
        (r["entity"], r["label_ts"], r["label"], r["fa"], r["fb"])
        for r in batch.collect()
    )

    for sub, rows in (("fa", FEATURES), ("fb", f2), ("l", LABELS)):
        schema = SCHEMA_L if sub == "l" else SCHEMA_F
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            str(tmp_path / sub)
        )
    out = streaming_point_in_time_multi(
        spark.readStream.schema(SCHEMA_L).parquet(str(tmp_path / "l")),
        {
            "fa": spark.readStream.schema(SCHEMA_F).parquet(str(tmp_path / "fa")),
            "fb": spark.readStream.schema(SCHEMA_F).parquet(str(tmp_path / "fb")),
        },
        entity_col="user", ts_col="ts",
        lags={"fa": lag},
    )
    q = (
        out.writeStream.format("memory").queryName("pit_multi_lag")
        .option("checkpointLocation", str(tmp_path / "cp"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = sorted(
        (int(r["entity"]), r["label_ts"], r["label"],
         (r["features"] or {}).get("fa"), (r["features"] or {}).get("fb"))
        for r in spark.sql("SELECT * FROM pit_multi_lag").collect()
    )
    assert got == expected


def test_streaming_pit_multi_rejects_unknown_lag(spark):
    from featureform_spark.streaming.pit import streaming_point_in_time_multi

    ldf = spark.readStream.format("rate").load()
    with pytest.raises(ValueError, match="unregistered"):
        streaming_point_in_time_multi(ldf, {"fa": ldf}, lags={"zz": 1.0})


# ------------------------------------------------- skew salting (r11 #6)


def _hot_entity_data():
    """One hot entity (0) holding ~80% of labels plus same-ts rewrite
    and NULL-feature edge cases across a few cold entities."""
    features, labels = [], []
    ordn = 0
    for m in range(0, 120, 10):  # hot entity history
        features.append((0, _mins(m), 1000.0 + m, ordn)); ordn += 1
    features.append((0, _mins(50), 9999.0, ordn)); ordn += 1  # rewrite
    for e in (1, 2, 3):
        features.append((e, _mins(30 * e), float(e), ordn)); ordn += 1
    for m in range(0, 160, 2):  # 80 hot labels
        labels.append((0, _mins(m), float(m)))
    labels += [(1, _mins(10), 10.0), (2, _mins(70), 70.0),
               (3, _mins(100), 101.0), (4, _mins(5), 5.0)]
    return features, labels


def _batch_expected_for(spark, features, labels):
    fdf = spark.createDataFrame(features, SCHEMA_F)
    ldf = spark.createDataFrame(labels, SCHEMA_L)
    out = point_in_time_join(
        ldf,
        [FeatureInput(name="feature", df=fdf, entity_col="user",
                      value_col="value", ts_col="ts", order_col="ord")],
        label_entity_col="user",
        label_value_col="value",
        label_ts_col="ts",
    )
    return sorted(
        (int(r["entity"]), r["label_ts"], r["label"], r["feature"])
        for r in out.collect()
    )


def _run_stream_salted(spark, tmp_path, features, labels, n_salts):
    fdir, ldir = tmp_path / "f", tmp_path / "l"
    spark.createDataFrame(features, SCHEMA_F).coalesce(1).write.mode(
        "append"
    ).parquet(str(fdir))
    spark.createDataFrame(labels, SCHEMA_L).coalesce(1).write.mode(
        "append"
    ).parquet(str(ldir))
    all_rows = []

    def sink(batch, _bid):
        all_rows.extend(batch.collect())

    out = streaming_point_in_time(
        spark.readStream.schema(SCHEMA_L).parquet(str(ldir)),
        spark.readStream.schema(SCHEMA_F).parquet(str(fdir)),
        entity_col="user",
        ts_col="ts",
        n_salts=n_salts,
    )
    q = (
        out.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / f"cp{n_salts}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return sorted(
        (int(r["entity"]), r["label_ts"], r["label"], r["feature"])
        for r in all_rows
    )


def test_streaming_pit_salted_parity_hot_entity(spark, tmp_path):
    """The r10 verdict #6 done-criterion: the skew-salted streaming
    path equals both the unsalted stream AND the batch join under a
    hot-entity fixture (labels fan across salts, every salt answers
    from the full replicated history)."""
    features, labels = _hot_entity_data()
    want = _batch_expected_for(spark, features, labels)
    salted = _run_stream_salted(spark, tmp_path, features, labels, 8)
    assert salted == want
    plain = _run_stream_salted(
        spark, tmp_path / "plain", features, labels, 1
    )
    assert plain == want


def test_streaming_pit_salted_rejects_bad_n(spark):
    with pytest.raises(ValueError, match="n_salts"):
        streaming_point_in_time(
            spark.range(1), spark.range(1), n_salts=0
        )
