"""On-demand feature DAG (reference register.py:4292-4360: on-demand
features receive a ``client`` and can call other features) and the
reference's serving truth tables (client/tests/serving_cases.py
features_no_ts / features_with_ts / feature_e2e) replayed through
materialize -> online deploy -> point serve."""

from datetime import datetime, timezone

import pytest

from featureform_spark.plans.engine import Engine
from featureform_spark.registry import FeatureVariant, Registry
from featureform_spark.serving.server import FeatureServer, OnDemandCycleError


def _server_with(spark, df, features):
    reg = Registry()
    eng = Engine(spark, reg)
    reg.register_dataframe("src", df)
    for fv in features:
        reg.register(fv)
    srv = FeatureServer(eng)
    for fv in features:
        srv.deploy_feature(f"{fv.name}.{fv.variant}")
    return srv


@pytest.fixture(scope="module")
def dag_server(spark):
    df = spark.createDataFrame(
        [("a", 10.0), ("b", 200.0)], ["entity", "value"]
    )
    reg = Registry()
    eng = Engine(spark, reg)
    reg.register_dataframe("src", df)
    reg.register(FeatureVariant(
        name="base_value", source="src.default", entity="user",
        entity_column="entity", value_column="value",
        timestamp_column=""))

    calls = {"doubled": 0, "bucket": 0}

    def doubled(client, params, entities):
        calls["doubled"] += 1
        (base,) = client.features(["base_value.default"])
        return (base or 0.0) * 2

    def bucket(client, params, entities):
        calls["bucket"] += 1
        # on-demand calling BOTH a precomputed feature and another
        # on-demand feature — the diamond: bucket -> {base, doubled},
        # doubled -> base (base must resolve once, memoized)
        base, dbl = client.features(
            ["base_value.default", "ondemand/doubled.default"]
        )
        return "high" if dbl > params.get("cutoff", 100) else "low"

    def loop_a(client, params, entities):
        return client.features(["ondemand/loop_b.default"])[0]

    def loop_b(client, params, entities):
        return client.features(["ondemand/loop_a.default"])[0]

    def self_loop(client, params, entities):
        return client.features(["ondemand/self_loop.default"])[0]

    reg.register_ondemand("doubled", doubled)
    reg.register_ondemand("bucket", bucket)
    reg.register_ondemand("loop_a", loop_a)
    reg.register_ondemand("loop_b", loop_b)
    reg.register_ondemand("self_loop", self_loop)
    srv = FeatureServer(eng)
    srv.deploy_feature("base_value.default")
    srv._calls = calls
    return srv


def test_ondemand_calls_precomputed_and_ondemand(dag_server):
    vals = dag_server.serve(
        ["base_value.default", "ondemand/bucket.default"],
        entities={"user": "b"}, params={"cutoff": 100},
    )
    assert vals == [200.0, "high"]
    vals = dag_server.serve(
        ["ondemand/bucket.default"], entities={"user": "a"}
    )
    assert vals == ["low"]  # 10*2 = 20 <= 100


def test_ondemand_diamond_memoized(dag_server):
    before = dict(dag_server._calls)
    dag_server.serve(
        ["ondemand/bucket.default", "ondemand/doubled.default"],
        entities={"user": "a"},
    )
    # one request: bucket once, doubled once (bucket's call memoized
    # into the same context as the top-level doubled ref)
    assert dag_server._calls["bucket"] == before["bucket"] + 1
    assert dag_server._calls["doubled"] == before["doubled"] + 1


def test_ondemand_cycle_detected(dag_server):
    with pytest.raises(OnDemandCycleError, match="loop_a"):
        dag_server.serve(["ondemand/loop_a.default"], entities={"user": "a"})
    with pytest.raises(OnDemandCycleError, match="self_loop"):
        dag_server.serve(["ondemand/self_loop.default"], entities={"user": "a"})


def test_legacy_positional_ondemand_still_served(dag_server):
    dag_server.engine.registry.register_ondemand(
        "legacy", lambda params, entity, pre: (pre[0] or 0) + params["k"]
    )
    vals = dag_server.serve(
        ["base_value.default", "ondemand/legacy.default"],
        entity="a", params={"k": 5},
    )
    assert vals == [10.0, 15.0]


def test_bare_name_deploy_and_serve(spark):
    """deploy_feature('name') and serve(['name']) must agree on the
    normalized 'name.default' key (review r7)."""
    df = spark.createDataFrame([("a", 1.0)], ["entity", "value"])
    reg = Registry()
    eng = Engine(spark, reg)
    reg.register_dataframe("src", df)
    reg.register(FeatureVariant(
        name="price", source="src.default", entity="user",
        entity_column="entity", value_column="value"))
    srv = FeatureServer(eng)
    srv.deploy_feature("price")  # bare name
    assert srv.serve(["price"], entity="a") == [1.0]
    assert srv.serve(["price.default"], entity="a") == [1.0]


def test_ondemand_subrequest_params_and_mixed_prefix_memo(spark, dag_server):
    """client.features(params=...) with unchanged entities must apply
    the new params (review r7: they were silently dropped), and
    'ondemand/x' vs 'x' refs must share one memo entry."""
    reg = dag_server.engine.registry
    calls = {"n": 0}

    def shared(client, params, entities):
        calls["n"] += 1
        return params.get("k", 0) * 10

    def outer(client, params, entities):
        a = client.features(["ondemand/shared.default"])[0]
        b = client.features(["shared.default"])[0]  # same feature, bare
        c = client.features(
            ["ondemand/shared.default"], params={"k": 7}
        )[0]  # params override -> fresh sub-request
        return (a, b, c)

    reg.register_ondemand("shared", shared)
    reg.register_ondemand("outer", outer)
    (got,) = dag_server.serve(
        ["ondemand/outer.default"], entities={"user": "a"},
        params={"k": 2},
    )
    assert got == (20, 20, 70)
    # shared ran once for the base params (memo across prefix forms)
    # and once for the {'k': 7} sub-request
    assert calls["n"] == 2


def test_training_set_accepts_empty_ts_columns(spark):
    """The reference's no-ts configs say timestamp_column '' — the
    PIT path must treat it as absent like materialize does (review r7)."""
    from featureform_spark.registry import LabelVariant, TrainingSetVariant

    fdf = spark.createDataFrame([("a", 1.0, 0)], ["entity", "value", "ord"])
    ldf = spark.createDataFrame([("a", 9.0)], ["entity", "label"])
    reg = Registry()
    eng = Engine(spark, reg)
    reg.register_dataframe("fsrc", fdf)
    reg.register_dataframe("lsrc", ldf)
    reg.register(FeatureVariant(
        name="f", source="fsrc.default", entity="user",
        entity_column="entity", value_column="value",
        timestamp_column=""))
    reg.register(LabelVariant(
        name="lbl", source="lsrc.default", entity="user",
        entity_column="entity", value_column="label",
        timestamp_column=""))
    reg.register(TrainingSetVariant(
        name="ts", label="lbl.default", features=["f.default"]))
    rows = eng.training_set("ts.default").collect()
    assert len(rows) == 1 and rows[0]["label"] == 9.0


# ---------------------------------------------------------------------------
# reference serving truth tables (client/tests/serving_cases.py)
# ---------------------------------------------------------------------------

_TS = lambda s: datetime.fromtimestamp(s, tz=timezone.utc)  # noqa: E731

# features_no_ts + feature_e2e no-ts rows: last write wins
NO_TS_CASES = {
    "NoOverlap": (
        [["a", 1], ["b", 2], ["c", 3]],
        {"a": 1, "b": 2, "c": 3},
    ),
    "SimpleOverwrite": (
        [["a", 1], ["b", 2], ["c", 3], ["a", 4]],
        {"a": 4, "b": 2, "c": 3},
    ),
}

# features_with_ts + feature_e2e ts rows: latest timestamp wins,
# regardless of write order
TS_CASES = {
    "NoOverlap": (
        [["a", 1, _TS(0)], ["b", 2, _TS(0)], ["c", 3, _TS(0)]],
        {"a": 1, "b": 2, "c": 3},
    ),
    "SimpleChanges": (
        [["a", 1, _TS(0)], ["b", 2, _TS(0)], ["c", 3, _TS(0)],
         ["a", 4, _TS(1)]],
        {"a": 4, "b": 2, "c": 3},
    ),
    "OutOfOrderWrites": (
        [["a", 1, _TS(10)], ["b", 2, _TS(3)], ["c", 3, _TS(7)],
         ["c", 9, _TS(5)], ["a", 4, _TS(1)]],
        {"a": 1, "b": 2, "c": 3},
    ),
    "OutOfOrderOverwrites": (
        [["a", 1, _TS(10)], ["b", 2, _TS(3)], ["c", 3, _TS(7)],
         ["c", 9, _TS(5)], ["b", 12, _TS(2)], ["a", 4, _TS(1)],
         ["b", 9, _TS(3)]],
        {"a": 1, "b": 9, "c": 3},
    ),
}


@pytest.mark.parametrize("case", sorted(NO_TS_CASES))
def test_serving_truth_table_no_ts(spark, case):
    values, expected = NO_TS_CASES[case]
    df = spark.createDataFrame(values, "entity string, value long")
    srv = _server_with(spark, df, [FeatureVariant(
        name="f", source="src.default", entity="user",
        entity_column="entity", value_column="value",
        timestamp_column="")])
    for ent, want in expected.items():
        assert srv.serve(["f.default"], entity=ent) == [want], case


@pytest.mark.parametrize("case", sorted(TS_CASES))
def test_serving_truth_table_with_ts(spark, case):
    values, expected = TS_CASES[case]
    df = spark.createDataFrame(
        values, "entity string, value long, ts timestamp"
    )
    srv = _server_with(spark, df, [FeatureVariant(
        name="f", source="src.default", entity="user",
        entity_column="entity", value_column="value",
        timestamp_column="ts")])
    for ent, want in expected.items():
        assert srv.serve(["f.default"], entity=ent) == [want], case


def test_serving_truth_table_empty(spark):
    df = spark.createDataFrame([], "entity string, value long")
    srv = _server_with(spark, df, [FeatureVariant(
        name="f", source="src.default", entity="user",
        entity_column="entity", value_column="value",
        timestamp_column="")])
    assert srv.store.table_size("f.default") == 0
    assert srv.serve(["f.default"], entity="a") == [None]


def test_serving_truth_table_multiple_features(spark):
    # feature_e2e MultipleFeatures / MultipleFeaturesChanges: two value
    # columns served in request order; ts change overwrites both
    df = spark.createDataFrame(
        [["a", "one", 1, _TS(0)], ["b", "two", 2, _TS(0)],
         ["c", "three", 3, _TS(0)], ["a", "four", 4, _TS(1)]],
        "entity string, value1 string, value2 long, ts timestamp",
    )
    srv = _server_with(spark, df, [
        FeatureVariant(name="f1", source="src.default", entity="user",
                       entity_column="entity", value_column="value1",
                       timestamp_column="ts", value_type="string"),
        FeatureVariant(name="f2", source="src.default", entity="user",
                       entity_column="entity", value_column="value2",
                       timestamp_column="ts", value_type="int64"),
    ])
    assert srv.serve(["f1.default", "f2.default"], entity="a") == ["four", 4]
    assert srv.serve(["f1.default", "f2.default"], entity="b") == ["two", 2]
