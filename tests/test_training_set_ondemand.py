"""On-demand features as training-set columns (r12, VERDICT r11 #6).

A TrainingSetVariant declares ``ondemand_features``; the engine
resolves them at build time over the PIT output via the batch
mapInPandas scorer. Pins: column values vs hand computation, per-row
serving-path parity on the latest rows, zero added shuffle, and
NULL-feature propagation (NaN -> Arrow null) matching SQL NULL
arithmetic.
"""

import math

from pyspark.sql import functions as F

from featureform_spark.plans.engine import Engine
from featureform_spark.registry import (
    FeatureVariant,
    LabelVariant,
    Registry,
    TrainingSetVariant,
)
from featureform_spark.serving.server import FeatureServer


def _setup(spark):
    reg = Registry()
    eng = Engine(spark, reg)
    feats = spark.createDataFrame(
        [("a", 10.0, 1), ("b", 20.0, 1), ("a", 30.0, 2)],
        ["entity", "value", "ts"],
    ).withColumn("ts", F.timestamp_seconds("ts"))
    # entity c has a label but NO feature history -> NULL feature
    labels = spark.createDataFrame(
        [("a", 1.0, 5), ("b", 0.0, 5), ("c", 1.0, 5)],
        ["entity", "value", "ts"],
    ).withColumn("ts", F.timestamp_seconds("ts"))
    reg.register_dataframe("feats", feats)
    reg.register_dataframe("labels", labels)
    reg.register(FeatureVariant(
        name="spend", source="feats.default", entity="user",
        entity_column="entity", value_column="value",
        timestamp_column="ts",
    ))
    reg.register(LabelVariant(
        name="converted", source="labels.default", entity="user",
        entity_column="entity", value_column="value",
        timestamp_column="ts",
    ))

    def boosted(client, params, entities):
        (s,) = client.features(["spend.default"])
        return s * 3.0

    def blended(client, params, entities):
        b, lbl = client.features(["ondemand/boosted", "label"])
        return b - lbl

    reg.register_ondemand("boosted", boosted)
    reg.register_ondemand("blended", blended)
    reg.register(TrainingSetVariant(
        name="ts_od", label="converted.default",
        features=["spend.default"],
        ondemand_features=["boosted", "blended"],
    ))
    return reg, eng


def test_training_set_resolves_ondemand_columns(spark):
    reg, eng = _setup(spark)
    rows = {
        r["entity"]: r
        for r in eng.training_set("ts_od.default", dedup=False).collect()
    }
    assert set(rows) == {"a", "b", "c"}
    # a: latest spend as of ts 5 is 30.0 -> boosted 90, blended 89
    assert rows["a"]["spend_default"] == 30.0
    assert rows["a"]["boosted"] == 90.0
    assert rows["a"]["blended"] == 89.0
    assert rows["b"]["boosted"] == 60.0 and rows["b"]["blended"] == 60.0
    # c has no feature history: NULL propagates through the on-demand
    # arithmetic as SQL NULL (NaN -> Arrow null), never a garbage 0
    assert rows["c"]["spend_default"] is None
    assert rows["c"]["boosted"] is None
    assert rows["c"]["blended"] is None


def test_training_set_ondemand_matches_serving_path(spark):
    """Per-row parity: the labels are the newest events, so each
    entity's PIT feature equals its materialized-latest value and the
    build-time scores must equal the serve-time scores."""
    reg, eng = _setup(spark)
    srv = FeatureServer(eng)
    srv.deploy_feature("spend.default")
    rows = {
        r["entity"]: r
        for r in eng.training_set("ts_od.default", dedup=False).collect()
    }
    for e in ("a", "b"):
        want = srv.serve(["ondemand/boosted.default"], entity=e)[0]
        assert rows[e]["boosted"] == want


def test_training_set_ondemand_adds_no_shuffle(spark):
    reg, eng = _setup(spark)
    base = eng.training_set("ts_od.default", dedup=False)
    plain = reg.get("training_set", "ts_od.default")
    plain.ondemand_features = []
    try:
        without = eng.training_set("ts_od.default", dedup=False)
    finally:
        plain.ondemand_features = ["boosted", "blended"]
    p_with = base._jdf.queryExecution().executedPlan().toString()
    p_without = without._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in p_with
    assert p_with.count("Exchange") == p_without.count("Exchange")
