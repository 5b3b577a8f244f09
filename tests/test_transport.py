"""Pickled-function transport: a serialized transformation must produce
the same rows as the in-process call (reference rehydration semantics,
offline_store_spark_runner.py:1139-1257)."""

from __future__ import annotations

from pyspark.sql import functions as F

from featureform_spark.plans.transport import (
    load_function,
    roundtrip,
    serialize_function,
)


def test_roundtrip_closure():
    threshold = 10  # captured free variable — the case plain pickle can't do

    def over(df):
        return df.filter(F.col("id") > threshold)

    fn = roundtrip(over)
    assert fn is not over


def test_roundtrip_lambda_executes(spark):
    fn = roundtrip(lambda df: df.groupBy((F.col("id") % 3).alias("k")).count())
    out = {r["k"]: r["count"] for r in fn(spark.range(30)).collect()}
    assert out == {0: 10, 1: 10, 2: 10}


def test_blob_is_bytes_and_tagged():
    blob = serialize_function(lambda df: df)
    assert isinstance(blob, bytes) and blob.startswith(b"FFSPKL1:")
    assert callable(load_function(blob))


def test_pickled_transformation_matches_inprocess(spark, sf_dir):
    from featureform_spark.plans.engine import Engine
    from featureform_spark.registry import Registry

    cutoff = 50.0  # free variable rides the pickle

    def purchases_over(df):
        return (
            df.filter((F.col("event_type") == "purchase") & (F.col("value") > cutoff))
            .groupBy("user_id")
            .agg(F.count("*").alias("n"))
        )

    def build(register):
        reg = Registry()
        reg.register_file("events", f"{sf_dir}/events.parquet")
        register(reg)
        return Engine(spark, reg).source_df("big_purchases.default")

    direct = build(
        lambda reg: reg.register_df_transformation(
            "big_purchases", purchases_over, ["events"]
        )
    )
    rehydrated = build(
        lambda reg: reg.register_pickled_transformation(
            "big_purchases", serialize_function(purchases_over), ["events"]
        )
    )
    a = sorted(map(tuple, direct.collect()))
    b = sorted(map(tuple, rehydrated.collect()))
    assert a == b and len(a) > 0
