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


# ---------------------------------------------------------------------------
# property-based equivalence (hypothesis): arbitrary small worlds of
# features/labels/late rows — backfill must EQUAL the full rebuild on
# the merged inputs across the edge-case lattice (duplicate ts, NULL
# label ts, entities with only late data, lag shifts)
# ---------------------------------------------------------------------------

from datetime import datetime, timedelta

from hypothesis import HealthCheck, given, settings, strategies as st

BASE = datetime(2021, 1, 1)

_ents = st.sampled_from(["a", "b", "c"])
_days = st.integers(min_value=0, max_value=5)
_vals = st.integers(min_value=-3, max_value=3)
_feat_rows = st.lists(st.tuples(_ents, _days, _vals), max_size=7)
_late_rows = st.lists(st.tuples(_ents, _days, _vals), max_size=4)
_label_rows = st.lists(
    st.tuples(_ents, st.one_of(st.none(), _days), _vals), max_size=6
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(base=_feat_rows, late=_late_rows, labels=_label_rows,
       lag=st.sampled_from([0.0, 86400.0]))
def test_backfill_equivalence_property(spark, base, late, labels, lag):
    if not labels or not late:
        return
    fschema = "event_id long, entity string, ts timestamp, value double"
    fdf = spark.createDataFrame(
        [(i, e, BASE + timedelta(days=d), float(v))
         for i, (e, d, v) in enumerate(base)] or [],
        fschema,
    )
    ldf_rows = [
        (e, None if d is None else BASE + timedelta(days=d), float(v))
        for e, d, v in labels
    ]
    ldf = spark.createDataFrame(
        ldf_rows, "entity string, ts timestamp, value double"
    )
    late_df = spark.createDataFrame(
        [(100 + i, e, BASE + timedelta(days=d), float(v))
         for i, (e, d, v) in enumerate(late)],
        fschema,
    )

    def feat(df):
        return FeatureInput(
            name="f1", df=df, entity_col="entity", value_col="value",
            ts_col="ts", order_col="event_id", lag_seconds=lag,
        )

    prior = point_in_time_join(ldf, [feat(fdf)], label_ts_col="ts")
    patched = backfill_training_set(
        prior, ldf, [feat(fdf)], {"f1": late_df}, label_ts_col="ts"
    )
    full = point_in_time_join(
        ldf, [feat(fdf.unionByName(late_df))], label_ts_col="ts"
    )
    assert _rows(patched) == _rows(full)
