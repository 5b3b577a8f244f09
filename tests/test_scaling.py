"""Per-group feature scaling: null guards, broadcast plan, values."""

import math

from pyspark.sql import functions as F

from featureform_spark.operators.scaling import feature_scale


def test_zscore_and_minmax_values(spark):
    df = spark.createDataFrame(
        [(1, "a", 1.0), (2, "a", 2.0), (3, "a", 3.0)],
        "id long, g string, v double",
    )
    out = {r.id: r for r in feature_scale(df, "g", "v", id_cols=["id"]).collect()}
    assert abs(out[1].zscore + 1.0) < 1e-12 and abs(out[3].zscore - 1.0) < 1e-12
    assert out[2].zscore == 0.0
    assert out[1].minmax == 0.0 and out[2].minmax == 0.5 and out[3].minmax == 1.0


def test_degenerate_groups_yield_null(spark):
    df = spark.createDataFrame(
        [(1, "single", 5.0), (2, "flat", 7.0), (3, "flat", 7.0)],
        "id long, g string, v double",
    )
    out = {r.id: r for r in feature_scale(df, "g", "v", id_cols=["id"]).collect()}
    assert out[1].zscore is None and out[1].minmax is None  # n=1
    assert out[2].zscore is None and out[2].minmax is None  # zero spread


def test_stats_join_is_broadcast(spark):
    df = spark.createDataFrame(
        [(i, "g" + str(i % 3), float(i)) for i in range(100)],
        "id long, g string, v double",
    )
    plan = feature_scale(df, "g", "v", id_cols=["id"])._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
