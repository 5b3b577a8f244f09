"""Registry: persistence roundtrip, immutability, template machinery."""

import pytest

from featureform_spark.plans.templates import substitute_template, template_refs
from featureform_spark.registry import (
    FeatureVariant,
    Registry,
    SourceVariant,
    TrainingSetVariant,
    VariantConflict,
)


def test_json_roundtrip(tmp_path):
    path = tmp_path / "registry.json"
    reg = Registry(path)
    reg.register_file("orders", "/data/orders", timestamp_column="ts")
    reg.register_sql_transformation("t1", "SELECT * FROM {{orders}}")
    reg.register(FeatureVariant(
        name="f1", variant="v2", source="t1.default", entity="cust",
        entity_column="e", value_column="v", value_type="float32"))
    reg.register(TrainingSetVariant(
        name="ts1", label="l.default", features=["f1.v2"],
        lag_features=[{"feature": "f1.v2", "lag_seconds": 60.0}]))

    reloaded = Registry(path)
    assert len(reloaded.list()) == 4
    f = reloaded.get("feature", "f1.v2")
    assert f.value_type == "float32" and f.source == "t1.default"
    src = reloaded.get("source", "orders")
    assert src.location["path"] == "/data/orders"
    ts = reloaded.get("training_set", "ts1")
    assert ts.lag_features[0]["lag_seconds"] == 60.0

    # immutability survives reload
    reloaded.register_file("orders", "/data/orders", timestamp_column="ts")
    with pytest.raises(VariantConflict):
        reloaded.register_file("orders", "/data/other")


def test_variant_namespacing():
    reg = Registry()
    reg.register(SourceVariant(name="s", variant="v1", sql="SELECT 1"))
    reg.register(SourceVariant(name="s", variant="v2", sql="SELECT 2"))
    assert reg.get("source", "s.v1").sql == "SELECT 1"
    assert reg.get("source", "s.v2").sql == "SELECT 2"
    with pytest.raises(KeyError):
        reg.get("source", "s.v3")


def test_template_machinery():
    sql = "SELECT * FROM {{a.v1}} JOIN {{ b }} ON x JOIN {{a.v1}} t2 ON y"
    assert template_refs(sql) == ["a.v1", "b.default"]
    out, refs = substitute_template(sql)
    assert out == "SELECT * FROM source_0 JOIN source_1 ON x JOIN source_0 t2 ON y"
    with pytest.raises(ValueError):
        substitute_template("SELECT {{x.y}} {{")


def test_lineage_dependencies():
    reg = Registry()
    reg.register(SourceVariant(name="raw", variant="v1", location={"kind": "file", "path": "/x", "file_format": "parquet"}))
    reg.register(SourceVariant(name="agg", sql="SELECT * FROM {{raw.v1}} JOIN {{dim}} USING (k)"))
    reg.register(FeatureVariant(name="f", source="agg.default", entity_column="e", value_column="v"))
    reg.register(TrainingSetVariant(
        name="ts", label="lab.default", features=["f.default"],
        lag_features=[{"feature": "f.default", "lag_seconds": 5.0}]))
    assert reg.dependencies("source", "agg") == [("source", "raw.v1"), ("source", "dim.default")]
    assert reg.dependencies("feature", "f") == [("source", "agg.default")]
    assert reg.dependencies("training_set", "ts") == [
        ("label", "lab.default"), ("feature", "f.default"), ("feature", "f.default")]
    assert reg.dependencies("source", "raw.v1") == []
