"""Segmented (skew-resistant) PIT join must be semantically identical to
the single-window formulation."""

from collections import Counter
from datetime import datetime, timedelta

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from featureform_spark.operators.training_set import FeatureInput, point_in_time_join
from featureform_spark.sources.testdata import load_table

BASE = datetime(2021, 1, 1)
SCHEMA = "entity string, value long, ts timestamp, ord long"

entities = st.sampled_from(["a", "b"])
ts_days = st.one_of(st.none(), st.integers(min_value=0, max_value=40))
rows_strategy = st.lists(
    st.tuples(entities, st.integers(-5, 5), ts_days), max_size=8
)


def to_rows(rows):
    return [
        (e, v, None if d is None else BASE + timedelta(days=d), i)
        for i, (e, v, d) in enumerate(rows)
    ]


def run(spark, label_rows, feat_rows, bucket, label_ts="ts"):
    label = spark.createDataFrame(to_rows(label_rows), SCHEMA)
    feat = FeatureInput(
        name="f", df=spark.createDataFrame(to_rows(feat_rows), SCHEMA),
        entity_col="entity", value_col="value", ts_col="ts", order_col="ord",
    )
    out = point_in_time_join(
        label, [feat], "entity", "value", label_ts, time_bucket=bucket
    )
    return Counter((r["entity"], r["f"], r["label"]) for r in out.collect())


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(label_rows=rows_strategy, feat_rows=rows_strategy)
def test_bucketed_equals_default(spark, label_rows, feat_rows):
    assert run(spark, label_rows, feat_rows, "7 days") == run(
        spark, label_rows, feat_rows, None
    )


def test_bucketed_label_no_ts(spark):
    label_rows = [("a", 1, None), ("b", 2, 3)]
    feat_rows = [("a", 10, 1), ("a", 20, 35), ("b", 30, 2)]
    assert run(spark, label_rows, feat_rows, "7 days", label_ts=None) == run(
        spark, label_rows, feat_rows, None, label_ts=None
    )


def test_bucketed_carry_across_empty_buckets(spark):
    # feature at day 0, label at day 40 → carry must cross empty buckets
    label_rows = [("a", 1, 40)]
    feat_rows = [("a", 99, 0)]
    got = run(spark, label_rows, feat_rows, "7 days")
    assert got == Counter({("a", 99, 1): 1})


def test_bucketed_on_real_data_matches(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    label = events.filter(F.col("event_type") == "purchase")
    feats = [
        FeatureInput(
            name="f_click",
            df=events.filter(F.col("event_type") == "click"),
            entity_col="user_id", value_col="value",
            ts_col="ts", order_col="event_id",
        )
    ]
    base = point_in_time_join(label, feats, "user_id", "value", "ts")
    seg = point_in_time_join(
        label, feats, "user_id", "value", "ts", time_bucket="3 days"
    )
    a = Counter(map(tuple, base.collect()))
    b = Counter(map(tuple, seg.collect()))
    assert a == b
