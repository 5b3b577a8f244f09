"""PIT training-set truth tables from the reference
(provider/offline_test.go:1010-1240, :3840-4080; correctness_test.go
4-way ts-configuration matrix — FIXTURES.md §3b)."""

from datetime import datetime

from featureform_spark.operators.training_set import FeatureInput, point_in_time_join


def t(day, hour=0):
    return datetime(2021, 1, day, hour)


def fi(spark, name, data, ts=True, lag=0.0):
    schema = "entity string, value string, ts timestamp, ord long"
    df = spark.createDataFrame(data, schema)
    return FeatureInput(
        name=name,
        df=df,
        entity_col="entity",
        value_col="value",
        ts_col="ts" if ts else None,
        order_col="ord",
        lag_seconds=lag,
    )


def out_rows(df, cols):
    return {tuple(r[c] for c in cols) for r in df.collect()}


def test_simple_join_no_ts(spark):
    """SimpleJoin: two ts-less features + ts-less label → plain equi join."""
    f1 = fi(spark, "f1", [("a", "1", None, 0), ("b", "2", None, 1), ("c", "3", None, 2)], ts=False)
    f2 = fi(spark, "f2", [("a", "red", None, 0), ("b", "green", None, 1), ("c", "blue", None, 2)], ts=False)
    label = spark.createDataFrame(
        [("a", "true", None, 0), ("b", "false", None, 1), ("c", "true", None, 2)],
        "entity string, value string, ts timestamp, ord long",
    )
    out = point_in_time_join(label, [f1, f2], "entity", "value", None)
    assert out_rows(out, ["f1", "f2", "label"]) == {
        ("1", "red", "true"),
        ("2", "green", "false"),
        ("3", "blue", "true"),
    }


def test_complex_join_pit_semantics(spark):
    """ComplexJoin edges: future feature excluded; equal-ts duplicate →
    later write wins; as-of picks latest feature.ts <= label.ts."""
    feat = fi(
        spark,
        "f1",
        [
            ("a", "old", t(1), 0),
            ("a", "mid", t(5), 1),
            ("a", "future", t(11), 2),   # after label ts → excluded
            ("b", "real value first", t(5), 3),
            ("b", "real value second", t(5), 4),  # same ts, later write wins
        ],
    )
    label = spark.createDataFrame(
        [("a", "La", t(10), 0), ("b", "Lb", t(5), 1), ("c", "Lc", t(5), 2)],
        "entity string, value string, ts timestamp, ord long",
    )
    out = point_in_time_join(label, [feat], "entity", "value", "ts")
    assert out_rows(out, ["entity", "f1", "label"]) == {
        ("a", "mid", "La"),
        ("b", "real value second", "Lb"),
        ("c", None, "Lc"),
    }


def test_equal_ts_feature_included(spark):
    """feature.ts == label.ts → included (<= bound)."""
    feat = fi(spark, "f1", [("a", "x", t(5), 0)])
    label = spark.createDataFrame(
        [("a", "L", t(5), 0)], "entity string, value string, ts timestamp, ord long"
    )
    out = point_in_time_join(label, [feat], "entity", "value", "ts")
    assert out_rows(out, ["f1"]) == {("x",)}


def test_label_no_ts_uses_latest_feature(spark):
    """FeaturesTSLabelNoTS: label w/o ts sees each entity's latest value."""
    feat = fi(spark, "f1", [("a", "v1", t(1), 0), ("a", "v2", t(9), 1), ("b", "w", t(2), 2)])
    label = spark.createDataFrame(
        [("a", "La", None, 0), ("b", "Lb", None, 1)],
        "entity string, value string, ts timestamp, ord long",
    )
    out = point_in_time_join(label, [feat], "entity", "value", None)
    assert out_rows(out, ["entity", "f1", "label"]) == {
        ("a", "v2", "La"),
        ("b", "w", "Lb"),
    }


def test_feature_no_ts_label_ts(spark):
    """FeaturesNoTSLabelTS: ts-less feature always visible (epoch 0)."""
    feat = fi(spark, "f1", [("a", "v1", None, 0), ("a", "v2", None, 1)], ts=False)
    label = spark.createDataFrame(
        [("a", "L", t(1), 0)], "entity string, value string, ts timestamp, ord long"
    )
    out = point_in_time_join(label, [feat], "entity", "value", "ts")
    # last-write-wins between the two ts-less rows
    assert out_rows(out, ["f1"]) == {("v2",)}


def test_lag_feature_shifts_bound(spark):
    """Lag: feature.ts + lag <= label.ts (offline_test.go:3840-4080)."""
    day = 86400.0
    base = [("a", "d1", t(1), 0), ("a", "d2", t(2), 1), ("a", "d3", t(3), 2)]
    feat = fi(spark, "f", base)
    lag1 = fi(spark, "f_lag1d", base, lag=day)
    label = spark.createDataFrame(
        [("a", "L", t(3), 0)], "entity string, value string, ts timestamp, ord long"
    )
    out = point_in_time_join(label, [feat, lag1], "entity", "value", "ts")
    # as-of t3: current = d3; lagged by 1 day = value as of t2 = d2
    assert out_rows(out, ["f", "f_lag1d"]) == {("d3", "d2")}


def test_multi_entity_label(spark):
    """J10: features join on different label columns."""
    fu = fi(spark, "user_feat", [("u1", "fu", t(1), 0)])
    fm = FeatureInput(
        name="merch_feat",
        df=spark.createDataFrame(
            [("m1", "fm", t(1), 0)], "entity string, value string, ts timestamp, ord long"
        ),
        entity_col="entity",
        value_col="value",
        ts_col="ts",
        order_col="ord",
        label_entity_col="merchant",
    )
    label = spark.createDataFrame(
        [("u1", "m1", "L", t(2))], "user string, merchant string, value string, ts timestamp"
    )
    out = point_in_time_join(
        label, [fu, fm], label_entity_col="user", label_value_col="value", label_ts_col="ts"
    )
    assert out_rows(out, ["entity", "user_feat", "merch_feat", "label"]) == {
        ("u1", "fu", "fm", "L")
    }


def test_dedup_collapses_duplicate_label_rows(spark):
    feat = fi(spark, "f1", [("a", "x", t(1), 0)])
    label = spark.createDataFrame(
        [("a", "L", t(5), 0), ("a", "L", t(5), 1)],
        "entity string, value string, ts timestamp, ord long",
    )
    out = point_in_time_join(label, [feat], "entity", "value", "ts", dedup=True)
    assert out.count() == 1


def test_null_entity_label_kept_with_null_features(spark):
    """Left-join semantics: a label row with NULL entity is kept and never
    matches any feature (features with NULL entity are dropped)."""
    feat = fi(spark, "f1", [("a", "x", t(1), 0), (None, "ghost", t(1), 1)])
    label = spark.createDataFrame(
        [("a", "La", t(5), 0), (None, "Lnull", t(5), 1)],
        "entity string, value string, ts timestamp, ord long",
    )
    out = point_in_time_join(label, [feat], "entity", "value", "ts")
    rows = out_rows(out, ["entity", "f1", "label"])
    assert rows == {("a", "x", "La"), (None, None, "Lnull")}


def test_resolve_labels_truth_table(spark):
    """Reference serving_cases.py `labels` tables: labels pass through
    one row per (entity, ts); duplicate (entity, ts) rows collapse
    last-write-wins ("WithSameTimestamp": a -> 3); no-ts labels
    collapse per entity."""
    import datetime as dt

    from featureform_spark.operators.training_set import resolve_labels

    ts0 = dt.datetime(1970, 1, 1, tzinfo=dt.timezone.utc)
    rows = [("a", 1, ts0, 0), ("b", 2, ts0, 1), ("a", 3, ts0, 2)]
    df = spark.createDataFrame(
        rows, "entity string, value long, ts timestamp, ord long"
    )
    got = {
        (r["entity"],): r["value"]
        for r in resolve_labels(
            df, "entity", "value", "ts", order_col="ord"
        ).collect()
    }
    assert got == {("a",): 3, ("b",): 2}
    # distinct timestamps both survive (per (entity, ts), not entity)
    ts1 = ts0 + dt.timedelta(days=1)
    df2 = spark.createDataFrame(
        [("a", 1, ts0, 0), ("a", 9, ts1, 1)],
        "entity string, value long, ts timestamp, ord long",
    )
    assert resolve_labels(df2, "entity", "value", "ts", order_col="ord").count() == 2
    # no-ts: per entity, last write wins ("Simple" + dup)
    df3 = spark.createDataFrame(
        [("a", 1, 0), ("b", 2, 1), ("a", 4, 2)],
        "entity string, value long, ord long",
    )
    got3 = {
        r["entity"]: r["value"]
        for r in resolve_labels(
            df3, "entity", "value", None, order_col="ord"
        ).collect()
    }
    assert got3 == {"a": 4, "b": 2}
    # empty passes through empty
    empty = spark.createDataFrame([], "entity string, value long, ord long")
    assert resolve_labels(empty, "entity", "value", None, order_col="ord").count() == 0
