"""FeatureServer facade: deploy → point serve → on-demand → nearest →
training data."""

import pytest
from pyspark.sql import functions as F

from featureform_spark.plans.engine import Engine
from featureform_spark.registry import (
    FeatureVariant, LabelVariant, Registry, TrainingSetVariant,
)
from featureform_spark.serving.server import FeatureServer
from featureform_spark.sources.testdata import load_table


@pytest.fixture(scope="module")
def server(spark, sf_dir):
    reg = Registry()
    eng = Engine(spark, reg)
    reg.register_dataframe("events", load_table(spark, sf_dir, "events"))
    reg.register(FeatureVariant(
        name="latest_value", source="events.default", entity="user",
        entity_column="user_id", value_column="value", timestamp_column="ts"))
    reg.register(LabelVariant(
        name="lbl", source="events.default", entity="user",
        entity_column="user_id", value_column="value", timestamp_column="ts"))
    reg.register(TrainingSetVariant(
        name="ts1", label="lbl.default", features=["latest_value.default"]))
    reg.register_ondemand(
        "value_bucket",
        lambda params, entity, precomputed: (
            "high" if (precomputed[0] or 0) > params.get("cutoff", 100) else "low"
        ),
    )
    srv = FeatureServer(eng)
    srv.deploy_feature("latest_value.default")
    return srv


def test_point_serve_and_ondemand(server, spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    some_user = events.first()["user_id"]
    vals = server.serve(
        ["latest_value.default", "ondemand/value_bucket.default"],
        some_user, params={"cutoff": 50},
    )
    assert isinstance(vals[0], float)
    assert vals[1] in ("high", "low")
    assert vals[1] == ("high" if vals[0] > 50 else "low")


def test_undeployed_feature_raises(server):
    with pytest.raises(KeyError):
        server.serve(["nope.default"], 1)


def test_nearest_via_server(server, spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    server.deploy_vectors("emb", emb)
    q = [float(x) for x in emb.filter(F.col("vec_id") == 3).first()["embedding"]]
    got = server.nearest("emb", q, k=3)
    assert got[0][0] == 3 and got[0][1] > 0.999  # self is nearest


def test_training_data_iterates(server):
    ds = server.training_data("ts1.default")
    rows = list(ds.batch(256))
    assert sum(len(b) for b in rows) == ds.dataframe().count()
