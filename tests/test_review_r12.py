"""Regression tests for the round-12 self-review findings: backfill
secondary-entity/NULL-ts/missing-column hazards, store migration
re-open, baseline-j-aware occupancy, DriftMonitor bins conflict,
freshness n_missing semantics."""

import warnings

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


def test_backfill_preserves_secondary_entity_feature(spark):
    """A J10 feature (joined on a secondary label column) that has NO
    late data must keep its FULL history — pruning it by the
    primary-entity set would silently null its values (review #1)."""
    prim = spark.createDataFrame(
        [(1, "e1", "2024-01-01 00:00:01", 10.0),
         (2, "e2", "2024-01-01 00:00:01", 20.0)],
        "event_id long, entity string, ts string, value double",
    )
    # secondary feature keyed by region — ids disjoint from entities
    sec = spark.createDataFrame(
        [(3, "r9", "2024-01-01 00:00:01", 77.0)],
        "event_id long, region string, ts string, value double",
    )
    labels = spark.createDataFrame(
        [("e1", "r9", "2024-01-01 00:00:05", 1.0),
         ("e2", "r9", "2024-01-01 00:00:05", 2.0)],
        "entity string, region string, ts string, value double",
    )
    feats = [
        FeatureInput(
            name="f_p", df=prim, entity_col="entity", value_col="value",
            ts_col="ts", order_col="event_id",
        ),
        FeatureInput(
            name="f_r", df=sec, entity_col="region", value_col="value",
            ts_col="ts", order_col="event_id", label_entity_col="region",
        ),
    ]
    kw = dict(label_ts_col="ts", label_cols=["region"])
    prior = point_in_time_join(labels, feats, **kw)
    late = spark.createDataFrame(
        [(9, "e1", "2024-01-01 00:00:04", 99.0)],
        "event_id long, entity string, ts string, value double",
    )
    patched = backfill_training_set(
        prior, labels, feats, {"f_p": late}, label_ts_col="ts",
        label_cols=["region"],
    )
    merged = [
        FeatureInput(
            name="f_p", df=prim.unionByName(late), entity_col="entity",
            value_col="value", ts_col="ts", order_col="event_id",
        ),
        feats[1],
    ]
    full = point_in_time_join(labels, merged, **kw)
    assert _rows(patched) == _rows(full)
    # the rebuilt e1 row must still carry the secondary feature value
    r = {
        row["entity"]: (row["f_p"], row["f_r"])
        for row in patched.collect()
    }
    assert r["e1"] == (99.0, 77.0)
    assert r["e2"] == (20.0, 77.0)


def test_backfill_null_ts_late_rows_bound_at_epoch0(spark):
    """NULL-ts late rows land at EPOCH0 in the PIT join — every label
    of the entity is affected, not silently none (review #2)."""
    feats_df = spark.createDataFrame(
        [(1, "e1", "2024-01-01 00:00:05", 10.0)],
        "event_id long, entity string, ts string, value double",
    )
    labels = spark.createDataFrame(
        [("e1", "2024-01-01 00:00:01", 1.0),
         ("e1", "2024-01-01 00:00:09", 2.0)],
        "entity string, ts string, value double",
    )
    f = FeatureInput(
        name="f1", df=feats_df, entity_col="entity", value_col="value",
        ts_col="ts", order_col="event_id",
    )
    late = spark.createDataFrame(
        [(9, "e1", None, 99.0)],
        "event_id long, entity string, ts string, value double",
    )
    b = affected_label_bounds([f], {"f1": late}).collect()
    assert str(b[0]["min_ts"]) == "1970-01-01 00:00:00"
    prior = point_in_time_join(labels, [f], label_ts_col="ts")
    patched = backfill_training_set(
        prior, labels, [f], {"f1": late}, label_ts_col="ts"
    )
    full = point_in_time_join(
        labels,
        [FeatureInput(
            name="f1", df=feats_df.unionByName(late), entity_col="entity",
            value_col="value", ts_col="ts", order_col="event_id",
        )],
        label_ts_col="ts",
    )
    assert _rows(patched) == _rows(full)
    # the early label (before any timestamped feature) now sees the
    # epoch-0 late value
    got = {str(r["label_ts"]): r["f1"] for r in patched.collect()}
    assert got["2024-01-01 00:00:01"] == 99.0


def test_backfill_missing_out_ts_refused(spark):
    feats_df = spark.createDataFrame(
        [(1, "e1", "2024-01-01 00:00:05", 10.0)],
        "event_id long, entity string, ts string, value double",
    )
    labels = spark.createDataFrame(
        [("e1", "2024-01-01 00:00:09", 2.0)],
        "entity string, ts string, value double",
    )
    f = FeatureInput(
        name="f1", df=feats_df, entity_col="entity", value_col="value",
        ts_col="ts", order_col="event_id",
    )
    late = spark.createDataFrame(
        [(9, "e1", "2024-01-01 00:00:06", 99.0)],
        "event_id long, entity string, ts string, value double",
    )
    prior = point_in_time_join(labels, [f], label_ts_col="ts")
    with pytest.raises(ValueError, match="missing the 'label_ts'"):
        backfill_training_set(
            prior.drop("label_ts"), labels, [f], {"f1": late},
            label_ts_col="ts",
        )


def test_signature_store_baseline_j_persisted(spark, tmp_path):
    """occupancy_report reasons with the j the store was sized with,
    and a reopen loads it from the table (review #3)."""
    from featureform_spark.streaming.signature_store import SignatureStore

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta epsilon tok{i} z{i} q{i}")
         for i in range(30)],
        "doc_id long, text string",
    )
    path = str(tmp_path / "s")
    st = SignatureStore.auto(
        spark, path, expected_corpus_rows=30, baseline_jaccard=0.2
    )
    st.ingest(docs)
    rep = st.occupancy_report()
    r = st.params["num_hashes"] // st.params["bands"]
    assert rep["baseline_jaccard"] == 0.2
    assert rep["capacity_docs"] == 8 * 5.0 ** r
    st2 = SignatureStore(
        spark, path,
        num_hashes=st.params["num_hashes"], bands=st.params["bands"],
    )
    assert st2.baseline_jaccard == 0.2
    assert st2.occupancy_report()["capacity_docs"] == 8 * 5.0 ** r


def test_embedding_store_reopen_after_rebucket(spark, tmp_path):
    """A fixed-config constructor re-open AFTER a migration adopts the
    migrated scheme (with a warning) instead of raising (review #4),
    and flags identically."""
    from featureform_spark.streaming.vector_store import EmbeddingStore

    vecs = spark.createDataFrame(
        [(i, [float((i * 7 + d) % 13) - 6.0 for d in range(8)])
         for i in range(40)],
        "vec_id long, embedding array<double>",
    )
    path = str(tmp_path / "v")
    st = EmbeddingStore(spark, path, dim=8, num_planes=4,
                        cosine_threshold=0.99)
    st.ingest(vecs, on_overflow="ignore")
    st.rebucket(7)
    flags_migrated = _rows(st.flag(vecs))
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        st2 = EmbeddingStore(spark, path, dim=8, num_planes=4,
                             cosine_threshold=0.99)
    assert st2.num_planes == 7
    assert any("migrated" in str(x.message) for x in w)
    assert _rows(st2.flag(vecs)) == flags_migrated
    # a WRONG dim still refuses loudly
    with pytest.raises(ValueError, match="dim"):
        EmbeddingStore(spark, path, dim=9, num_planes=7)


def test_signature_store_reopen_after_reband(spark, tmp_path):
    from featureform_spark.streaming.signature_store import SignatureStore

    docs = spark.createDataFrame(
        [(i, f"w{i} x{i} y{i} z{i} common tail tokens here")
         for i in range(20)],
        "doc_id long, text string",
    )
    path = str(tmp_path / "s")
    st = SignatureStore(spark, path, num_hashes=24, bands=8)
    st.ingest(docs)
    st.reband(docs, num_hashes=32, bands=16)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        st2 = SignatureStore(spark, path, num_hashes=24, bands=8)
    assert st2.params["num_hashes"] == 32 and st2.params["bands"] == 16
    assert any("migrated" in str(x.message) for x in w)


def test_drift_monitor_bins_conflict_without_cols(spark, tmp_path):
    from featureform_spark.streaming.drift_monitor import DriftMonitor

    ref = spark.createDataFrame([(float(i),) for i in range(20)],
                                "x double")
    path = str(tmp_path / "m")
    mon = DriftMonitor(spark, path, ["x"], bins=10)
    mon.set_reference(ref)
    with pytest.raises(ValueError, match="bins"):
        DriftMonitor(spark, path, bins=7)          # review #6
    assert DriftMonitor(spark, path).bins == 10


def test_freshness_n_missing_counts_provenance_only(spark):
    """A no-ts label row whose feature DID match is not 'missing' —
    its staleness is merely undefined (review #10)."""
    from featureform_spark.operators.audit import freshness_report

    feats_df = spark.createDataFrame(
        [(1, "e1", "2024-01-01 00:00:01", 10.0)],
        "event_id long, entity string, ts string, value double",
    )
    labels = spark.createDataFrame(
        [("e1", "2024-01-01 00:00:05", 1.0),
         ("e1", None, 2.0),       # no-ts label: matches at +inf
         ("e2", "2024-01-01 00:00:05", 3.0)],  # never matches
        "entity string, ts string, value double",
    )
    f = FeatureInput(
        name="f1", df=feats_df, entity_col="entity", value_col="value",
        ts_col="ts", order_col="event_id",
    )
    ts_out = point_in_time_join(
        labels, [f], label_ts_col="ts", provenance=True
    )
    row = freshness_report(ts_out, ["f1"]).collect()[0]
    assert row["n_rows"] == 3
    assert row["n_missing"] == 1          # only the e2 row
    assert row["min_staleness_us"] == 4_000_000
    assert row["sum_staleness_us"] == 4_000_000


def test_sample_negatives_null_ids_excluded(spark):
    """NULL item ids never appear as negatives; NULL users are
    dropped rather than silently zero-sampled (review round 2)."""
    from featureform_spark.operators.negatives import sample_negatives

    items = spark.createDataFrame(
        [(None,), (0,), (1,), (2,), (3,)], "item_id long"
    )
    pos = spark.createDataFrame(
        [(1, 0), (None, 1)], "user_id long, item_id long"
    )
    rows = sample_negatives(pos, items, k=3).collect()
    assert all(r["item_id"] is not None for r in rows)
    assert all(r["user_id"] == 1 for r in rows)


def test_monitor_second_review_guards(spark, tmp_path):
    from featureform_spark.streaming.drift_monitor import DriftMonitor

    ref = spark.createDataFrame(
        [(float(i), "a") for i in range(10)], "x double, s string"
    )
    path = str(tmp_path / "m")
    mon = DriftMonitor(spark, path, cols=["x"])
    mon.set_reference(ref)
    # embedding params on a non-embedding monitor refuse (was silent)
    with pytest.raises(ValueError, match="no embedding feature"):
        DriftMonitor(spark, path, embedding_col="e", embedding_dim=4,
                     embedding_planes=3)
    # explicit bins conflicts even though... this monitor IS numeric;
    # also cover the cat-only store case
    cat_path = str(tmp_path / "c")
    cmon = DriftMonitor(spark, cat_path, categorical_cols=["s"])
    cmon.set_reference(ref)
    with pytest.raises(ValueError, match="bins"):
        DriftMonitor(spark, cat_path, bins=7)
    # planes range + overlapping names refuse at reference time
    with pytest.raises(ValueError, match="embedding_planes"):
        DriftMonitor(
            spark, str(tmp_path / "p"), embedding_col="e",
            embedding_dim=4, embedding_planes=30,
        ).set_reference(
            spark.createDataFrame([([1.0] * 4,)], "e array<double>")
        )
    with pytest.raises(ValueError, match="disjoint"):
        DriftMonitor(
            spark, str(tmp_path / "d"), cols=["x"],
            categorical_cols=["x"],
        ).set_reference(ref)
