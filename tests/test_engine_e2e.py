"""End-to-end quickstart flow through Registry + Engine (SURVEY §7.1):
register source → SQL transformation → feature + label → materialize →
PIT training set → split → online serve. The reference's own quickstart
(avg transaction amount per user) re-expressed over the events table."""

import pytest
from pyspark.sql import functions as F

from featureform_spark.plans.engine import Engine
from featureform_spark.registry import (
    FeatureVariant,
    LabelVariant,
    Registry,
    TrainingSetVariant,
)
from featureform_spark.serving.dataset import Dataset
from featureform_spark.serving.online import InMemoryOnlineStore, materialize_to_online


@pytest.fixture(scope="module")
def engine(spark, sf_dir):
    reg = Registry()
    eng = Engine(spark, reg)
    from featureform_spark.sources.testdata import load_table

    reg.register_dataframe("events", load_table(spark, sf_dir, "events"))
    reg.register_sql_transformation(
        "avg_purchase",
        """SELECT user_id, avg(value) AS avg_amt, max(ts) AS last_ts
           FROM {{events}} WHERE event_type = 'purchase' GROUP BY user_id""",
    )
    reg.register(FeatureVariant(
        name="avg_amt", source="avg_purchase.default", entity="user",
        entity_column="user_id", value_column="avg_amt",
        timestamp_column="last_ts",
    ))
    reg.register(FeatureVariant(
        name="click_value", source="clicks.default", entity="user",
        entity_column="user_id", value_column="value", timestamp_column="ts",
    ))
    reg.register_df_transformation(
        "clicks",
        lambda ev: ev.filter(F.col("event_type") == "click"),
        inputs=["events.default"],
    )
    reg.register(LabelVariant(
        name="purchase_label", source="events.default", entity="user",
        entity_column="user_id", value_column="value", timestamp_column="ts",
    ))
    reg.register(TrainingSetVariant(
        name="purchase_ts", label="purchase_label.default",
        features=["avg_amt.default", "click_value.default"],
        lag_features=[{"feature": "click_value.default", "lag_seconds": 3600.0}],
    ))
    return eng


def test_transformation_resolves(engine):
    df = engine.source_df("avg_purchase.default")
    assert set(df.columns) == {"user_id", "avg_amt", "last_ts"}
    assert df.count() > 0


def test_materialize_feature(engine):
    mat = engine.materialize("avg_amt.default")
    assert mat.columns == ["entity", "value", "ts"]
    # one row per entity
    assert mat.count() == mat.select("entity").distinct().count()


def test_training_set_with_lag(engine):
    ts = engine.training_set("purchase_ts.default")
    cols = ts.columns
    assert "avg_amt_default" in cols and "click_value_default" in cols
    assert "click_value_default_lag_3600s" in cols
    assert "label" in cols
    assert ts.count() > 0


def test_batch_features_via_engine(engine):
    bf = engine.batch_features(["avg_amt.default", "click_value.default"])
    assert set(bf.columns) == {"entity", "avg_amt_default", "click_value_default"}


def test_serve_flow(engine):
    mat = engine.materialize("avg_amt.default")
    store = InMemoryOnlineStore()
    materialize_to_online(mat, store, "avg_amt")
    some_entity = mat.first()["entity"]
    assert store.get("avg_amt", some_entity) is not None

    ts = engine.training_set("purchase_ts.default")
    train, test = Dataset(ts).split(["entity", "label_ts"], 0.25, seed=3)
    n_train = train.dataframe().count()
    n_test = test.dataframe().count()
    assert n_train + n_test == ts.count()


def test_ondemand_feature(engine):
    engine.registry.register_ondemand(
        "price_bucket", lambda value: "high" if value > 100 else "low"
    )
    fn = engine.registry.function("ondemand/price_bucket.default")
    assert fn(150.0) == "high" and fn(3.0) == "low"


def test_cyclic_transformation_detected(spark):
    from featureform_spark.registry import Registry
    reg = Registry()
    eng = Engine(spark, reg)
    reg.register_sql_transformation("a", "SELECT * FROM {{b}}")
    reg.register_sql_transformation("b", "SELECT * FROM {{a}}")
    with pytest.raises(ValueError, match="cyclic"):
        eng.source_df("a.default")


def test_batch_features_shared_source_single_scan(engine, spark):
    """Features on the same (source, entity, ts) collapse into ONE
    aggregation pass — no per-feature scan branches (J7 generalized)."""
    from featureform_spark.registry import FeatureVariant
    import io
    from contextlib import redirect_stdout

    engine.registry.register(FeatureVariant(
        name="ev_value", source="events.default", entity="user",
        entity_column="user_id", value_column="value", timestamp_column="ts"))
    engine.registry.register(FeatureVariant(
        name="ev_type", source="events.default", entity="user",
        entity_column="user_id", value_column="event_type",
        timestamp_column="ts", value_type="string"))
    bf = engine.batch_features(["ev_value.default", "ev_type.default"])
    buf = io.StringIO()
    with redirect_stdout(buf):
        bf.explain(mode="formatted")
    plan = buf.getvalue()
    # one source group → no outer join, single aggregate over one scan
    assert "Join" not in plan
    rows = {r["entity"]: r for r in bf.collect()}
    assert len(rows) > 0
    some = next(iter(rows.values()))
    assert some["ev_value_default"] is not None
    assert some["ev_type_default"] in ("click", "view", "purchase", "signup", "error")


def test_multi_entity_training_set_via_engine(spark, sf_dir):
    """J10 wired at the engine level: label with two entity mappings,
    each feature joining on its own label column."""
    from featureform_spark.registry import (
        FeatureVariant, LabelVariant, Registry, TrainingSetVariant,
    )
    from featureform_spark.sources.testdata import load_table

    reg = Registry()
    eng = Engine(spark, reg)
    reg.register_dataframe("lineitem", load_table(spark, sf_dir, "lineitem"))
    reg.register_dataframe("supplier", load_table(spark, sf_dir, "supplier"))
    reg.register_dataframe("part", load_table(spark, sf_dir, "part"))
    reg.register(FeatureVariant(
        name="supp_bal", source="supplier.default", entity="supplier",
        entity_column="s_suppkey", value_column="s_acctbal"))
    reg.register(FeatureVariant(
        name="part_price", source="part.default", entity="part",
        entity_column="p_partkey", value_column="p_retailprice"))
    reg.register(LabelVariant(
        name="li_price", source="lineitem.default",
        entity_mappings=[
            {"entity": "supplier", "column": "l_suppkey"},
            {"entity": "part", "column": "l_partkey"},
        ],
        value_column="l_extendedprice", timestamp_column="l_shipdate"))
    reg.register(TrainingSetVariant(
        name="li_ts", label="li_price.default",
        features=["supp_bal.default", "part_price.default"]))

    out = eng.training_set("li_ts.default", dedup=False)
    assert {"supp_bal_default", "part_price_default", "label"} <= set(out.columns)
    li = load_table(spark, sf_dir, "lineitem")
    assert out.count() == li.count()
    # spot-check one row against direct lookups
    row = out.filter(F.col("supp_bal_default").isNotNull()
                     & F.col("part_price_default").isNotNull()).first()
    assert row is not None


def test_expectations_gate_on_registered_source(engine):
    """Registry-attached data-quality rules: report + enforce through
    the engine (the opt-in publish gate ahead of materialize)."""
    from featureform_spark.functions.expectations import (
        ExpectationError,
        accepted_values,
        not_null,
    )

    eng = engine
    eng.registry.register_expectations(
        "events", [not_null("user_id"), not_null("ts")]
    )
    rep = {r["rule"]: r for r in eng.expectations_report("events").collect()}
    assert rep["not_null(user_id)"]["passed"]
    eng.enforce_expectations("events")  # green rules: silent
    # a failing rule gates the publish with per-rule detail
    eng.registry.register_expectations(
        "events", [accepted_values("event_type", ["purchase"])]
    )
    with pytest.raises(ExpectationError, match="accepted_values"):
        eng.enforce_expectations("events")
    # sources without rules pass silently (validation is opt-in)
    eng.enforce_expectations("avg_purchase")
    with pytest.raises(ValueError, match="no expectations"):
        eng.expectations_report("avg_purchase")
    # rules attach only to existing sources
    with pytest.raises(KeyError):
        eng.registry.register_expectations("nope", [not_null("x")])
