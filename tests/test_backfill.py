"""Incremental training-set backfill (operators/backfill.py): the
contract is EQUALITY with a from-scratch rebuild on the merged
inputs, plus bounds semantics (lag shift, null-ts labels at +inf)
and loud refusals."""

import pytest
from pyspark.sql import functions as F

from featureform_spark.operators.backfill import (
    affected_label_bounds,
    backfill_training_set,
)
from featureform_spark.operators.training_set import (
    FeatureInput,
    point_in_time_join,
)


def _rows(df):
    return sorted(
        (tuple(r) for r in df.collect()),
        key=lambda t: [(v is None, str(v)) for v in t],
    )


def _fixture(spark):
    feats = spark.createDataFrame(
        [
            (i, f"e{i % 5}", f"2024-01-01 00:{i % 50:02d}:00", float(i))
            for i in range(1, 60)
        ],
        "event_id long, entity string, ts string, value double",
    )
    labels = spark.createDataFrame(
        [
            (f"e{i % 5}", f"2024-01-01 00:{(i * 7) % 55:02d}:30", float(i))
            for i in range(25)
        ],
        "entity string, ts string, value double",
    )
    # late rows: a correction batch for two entities, mid-history
    late = spark.createDataFrame(
        [
            (100, "e1", "2024-01-01 00:22:10", 999.0),
            (101, "e1", "2024-01-01 00:59:10", 888.0),
            (102, "e3", "2024-01-01 00:21:25", 777.0),
        ],
        "event_id long, entity string, ts string, value double",
    )
    return labels, feats, late


def _feature(df, lag=0.0):
    return FeatureInput(
        name="f1", df=df, entity_col="entity", value_col="value",
        ts_col="ts", order_col="event_id", lag_seconds=lag,
    )


def test_backfill_equals_full_rebuild(spark):
    labels, feats, late = _fixture(spark)
    prior = point_in_time_join(labels, [_feature(feats)], label_ts_col="ts")
    patched = backfill_training_set(
        prior, labels, [_feature(feats)], {"f1": late}, label_ts_col="ts"
    )
    full = point_in_time_join(
        labels, [_feature(feats.unionByName(late))], label_ts_col="ts"
    )
    assert _rows(patched) == _rows(full)
    # and the patch actually changed something (the fixture is built
    # so late rows land before existing labels)
    assert _rows(patched) != _rows(prior)


def test_backfill_bounds_lag_and_refusals(spark):
    labels, feats, late = _fixture(spark)
    b = {
        r["entity"]: str(r["min_ts"])
        for r in affected_label_bounds(
            [_feature(feats, lag=60.0)], {"f1": late}
        ).collect()
    }
    # min late ts per entity, shifted by the 60s lag
    assert b == {
        "e1": "2024-01-01 00:23:10",
        "e3": "2024-01-01 00:22:25",
    }
    with pytest.raises(ValueError, match="unknown feature"):
        affected_label_bounds([_feature(feats)], {"nope": late})
    no_ts = FeatureInput(
        name="f1", df=feats, entity_col="entity", value_col="value",
        ts_col=None,
    )
    with pytest.raises(ValueError, match="no timestamp"):
        affected_label_bounds([no_ts], {"f1": late})
    prior = point_in_time_join(labels, [_feature(feats)], label_ts_col="ts")
    assert backfill_training_set(
        prior, labels, [_feature(feats)], {}, label_ts_col="ts"
    ) is prior
    multi = FeatureInput(
        name="f1", df=feats, entity_col="entity", value_col="value",
        ts_col="ts", label_entity_col="other",
    )
    with pytest.raises(ValueError, match="not the primary entity"):
        backfill_training_set(
            prior, labels, [multi], {"f1": late}, label_ts_col="ts"
        )


def test_backfill_equivalence_with_lag(spark):
    labels, feats, late = _fixture(spark)
    f = _feature(feats, lag=120.0)
    prior = point_in_time_join(labels, [f], label_ts_col="ts")
    patched = backfill_training_set(
        prior, labels, [f], {"f1": late}, label_ts_col="ts"
    )
    full = point_in_time_join(
        labels,
        [_feature(feats.unionByName(late), lag=120.0)],
        label_ts_col="ts",
    )
    assert _rows(patched) == _rows(full)


def test_backfill_null_ts_labels_rebuilt(spark):
    labels, feats, late = _fixture(spark)
    labels = labels.unionByName(
        spark.createDataFrame(
            [("e1", None, 500.0), ("e4", None, 501.0)],
            "entity string, ts string, value double",
        )
    )
    f = _feature(feats)
    prior = point_in_time_join(labels, [f], label_ts_col="ts")
    patched = backfill_training_set(
        prior, labels, [f], {"f1": late}, label_ts_col="ts"
    )
    full = point_in_time_join(
        labels, [_feature(feats.unionByName(late))], label_ts_col="ts"
    )
    assert _rows(patched) == _rows(full)
    # the null-ts e1 label (evaluates at +inf) picked up the late 888.0
    got = {
        (r["entity"], r["label"]): r["f1"]
        for r in patched.filter(F.col("label_ts").isNull()).collect()
    }
    assert got[("e1", 500.0)] == 888.0
    assert got[("e4", 501.0)] is None or got[("e4", 501.0)] != 888.0


def test_backfill_untouched_rows_carried_broadcast(spark):
    labels, feats, late = _fixture(spark)
    f = _feature(feats)
    prior = point_in_time_join(labels, [f], label_ts_col="ts")
    patched = backfill_training_set(
        prior, labels, [f], {"f1": late}, label_ts_col="ts"
    )
    plan = patched._jdf.queryExecution().executedPlan().toString()
    # bounds ride broadcast joins — the corpus never shuffles on them
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    # entities without late data are byte-identical to prior
    keep_prior = _rows(prior.filter(~F.col("entity").isin("e1", "e3")))
    keep_patched = _rows(patched.filter(~F.col("entity").isin("e1", "e3")))
    assert keep_prior == keep_patched
