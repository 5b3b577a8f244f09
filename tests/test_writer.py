"""S15/S16/A6: partition export writer, retry, sizing, CTAS; ST4 modes."""

import pytest

from featureform_spark.serving.writer import (
    create_table_as_select,
    estimate_row_bytes,
    foreach_partition_write,
    size_partitions,
)


def test_estimate_and_size_partitions(spark):
    df = spark.range(1000).selectExpr("id", "CAST(id AS STRING) AS s", "CAST(id AS DOUBLE) AS d")
    rb = estimate_row_bytes(df.schema)
    assert rb == 8 + 32 + 8
    out = size_partitions(df, target_bytes=8_000)
    # 1000 rows * 48B = 48KB → 6 partitions
    assert out.rdd.getNumPartitions() == 6


def test_foreach_partition_write_batches(spark, tmp_path):
    out = tmp_path / "sink"
    out.mkdir()
    # CAST matters: id * 1.5 would produce DECIMAL rows (not JSON-able)
    df = spark.range(103).selectExpr(
        "id AS entity", "CAST(id * 1.5 AS DOUBLE) AS value"
    ).coalesce(2)

    def writer_factory():
        import json
        import uuid

        def write_batch(batch):
            assert len(batch) <= 25
            p = out / f"{uuid.uuid4().hex}.json"
            p.write_text(json.dumps(batch))

        return write_batch

    foreach_partition_write(df, writer_factory)
    import json

    rows = []
    for f in out.glob("*.json"):
        rows.extend(json.loads(f.read_text()))
    assert len(rows) == 103
    assert {r["entity"] for r in rows} == set(range(103))


def test_foreach_partition_write_retries(spark, tmp_path):
    marker = tmp_path / "fail_once"
    marker.write_text("")
    df = spark.range(5).selectExpr("id AS entity").coalesce(1)

    def writer_factory():
        from featureform_spark.serving.writer import TransientWriteError

        def write_batch(batch):
            if marker.exists():
                marker.unlink()
                raise TransientWriteError("throttled")

        return write_batch

    # transient first-batch failure is retried, not fatal
    foreach_partition_write(df, writer_factory, max_attempts=3, base_backoff_s=0.01)


def test_ctas(spark):
    df = spark.range(10).selectExpr("id", "id * 2 AS dbl")
    create_table_as_select(df, "ctas_test", mode="overwrite")
    assert spark.table("ctas_test").count() == 10
    spark.sql("DROP TABLE ctas_test")


def test_training_set_modes(spark, sf_dir, tmp_path):
    from featureform_spark.plans.engine import Engine
    from featureform_spark.registry import (
        FeatureVariant, LabelVariant, Registry, TrainingSetVariant,
    )
    from featureform_spark.sources.testdata import load_table

    reg = Registry()
    eng = Engine(spark, reg)
    reg.register_dataframe("orders", load_table(spark, sf_dir, "orders"))
    reg.register(FeatureVariant(
        name="price", source="orders.default", entity="cust",
        entity_column="o_custkey", value_column="o_totalprice",
        timestamp_column="o_orderdate"))
    reg.register(LabelVariant(
        name="lbl", source="orders.default", entity="cust",
        entity_column="o_custkey", value_column="o_totalprice",
        timestamp_column="o_orderdate"))
    for mode in ("view", "dynamic", "static"):
        reg.register(TrainingSetVariant(
            name=f"ts_{mode}", label="lbl.default",
            features=["price.default"], ts_type=mode))

    n_dyn = eng.create_training_set("ts_dynamic.default").count()
    n_view = eng.create_training_set("ts_view.default").count()
    static = eng.create_training_set(
        "ts_static.default", output_dir=str(tmp_path / "static_ts"))
    assert n_dyn == n_view == static.count() > 0
    with pytest.raises(ValueError):
        eng.create_training_set("ts_static.default")
