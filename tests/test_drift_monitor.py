"""Persistent drift monitor (streaming/drift_monitor.py): pinned-edge
binning parity with histogram_compare, PSI lifecycle, durable reopen,
idempotent re-observation, and scheme-mixing refusal."""

import pytest
from pyspark.sql import functions as F

from featureform_spark.functions.drift import histogram_compare
from featureform_spark.streaming.drift_monitor import (
    REFERENCE_BATCH_ID,
    DriftMonitor,
    stream_drift,
)


def _ref(spark):
    return spark.createDataFrame(
        [(float(i % 10), float(i % 7)) for i in range(100)],
        "x double, y double",
    )


def _shifted(spark):
    rows = [(float(i % 10) + 4.0, float(i % 7)) for i in range(60)]
    rows += [(None, 0.0)] * 10
    return spark.createDataFrame(rows, "x double, y double")


def test_observe_matches_histogram_compare(spark, tmp_path):
    ref, cur = _ref(spark), _shifted(spark)
    mon = DriftMonitor(spark, str(tmp_path / "m"), ["x", "y"], bins=5)
    mon.set_reference(ref)
    mon.observe(cur, 0)
    want = {
        (r["feature"], r["bin"]): r["cur_count"]
        for r in histogram_compare(ref, cur, ["x", "y"], bins=5).collect()
        if r["cur_count"]
    }
    got = {
        (r["feature"], int(r["bin"])): r["count"]
        for r in mon.history().filter(F.col("batch_id") == 0).collect()
    }
    assert got == want


def test_psi_lifecycle_and_reopen(spark, tmp_path):
    path = str(tmp_path / "m")
    mon = DriftMonitor(spark, path, ["x", "y"], bins=5)
    mon.set_reference(_ref(spark))
    same = mon.observe(_ref(spark), 0)
    assert same["x"] == pytest.approx(0.0, abs=1e-12)
    drifted = mon.observe(_shifted(spark), 1)
    assert drifted["x"] > 0.25          # shifted + nulls
    assert drifted["y"] < 0.05          # same distribution

    # a fresh handle loads pinned cols/bins/edges from the table and
    # scores identically
    mon2 = DriftMonitor(spark, path)
    assert mon2.cols == ["x", "y"] and mon2.bins == 5
    assert mon2.edges == mon.edges
    assert mon2.scores(1) == drifted
    assert sorted(mon2.score_history()) == [0, 1]


def test_reobserve_is_idempotent(spark, tmp_path):
    mon = DriftMonitor(spark, str(tmp_path / "m"), ["x"], bins=4)
    mon.set_reference(_ref(spark).select("x"))
    first = mon.observe(_shifted(spark).select("x"), 3)
    again = mon.observe(_shifted(spark).select("x"), 3)
    assert again == first
    n = (
        mon.history()
        .filter(F.col("batch_id") == 3)
        .groupBy("feature", "bin")
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    assert n == 1  # replaced, not double-counted


def test_scheme_mixing_refused(spark, tmp_path):
    path = str(tmp_path / "m")
    mon = DriftMonitor(spark, path, ["x"], bins=4)
    mon.set_reference(_ref(spark).select("x"))
    with pytest.raises(ValueError, match="cannot be mixed"):
        DriftMonitor(spark, path, ["x", "y"], bins=4)
    with pytest.raises(ValueError, match="bins"):
        DriftMonitor(spark, path, ["x"], bins=7)
    with pytest.raises(ValueError, match="already has a reference"):
        mon.set_reference(_ref(spark).select("x"))
    with pytest.raises(ValueError, match="reserved"):
        mon.observe(_ref(spark).select("x"), -2)
    fresh = DriftMonitor(spark, str(tmp_path / "n"), ["x"])
    with pytest.raises(ValueError, match="no reference"):
        fresh.observe(_ref(spark).select("x"), 0)


def test_stream_drift_microbatches(spark, tmp_path):
    """foreachBatch glue: every micro-batch lands keyed by batch id
    and scores against the pinned reference."""
    mon = DriftMonitor(spark, str(tmp_path / "m"), ["x"], bins=4)
    mon.set_reference(_ref(spark).select("x"))
    src = str(tmp_path / "src")
    _ref(spark).select("x").coalesce(1).write.parquet(
        src + "/b0"
    )
    stream = (
        spark.readStream.schema("x double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    q = (
        stream_drift(stream, mon)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    hist = mon.score_history()
    assert len(hist) == 1
    (scores,) = hist.values()
    assert scores["x"] == pytest.approx(0.0, abs=1e-12)


def test_monitor_categorical_pinned_set(spark, tmp_path):
    """The category set is pinned at reference time: a later batch's
    new category folds into __other__, NULL is always its own
    bucket, and a reopened monitor bins identically."""
    ref = spark.createDataFrame(
        [("a",)] * 50 + [("b",)] * 30 + [("c",)] * 5,
        "s string",
    )
    cur = spark.createDataFrame(
        [("a",)] * 10 + [("zzz",)] * 40 + [(None,)] * 10,
        "s string",
    )
    path = str(tmp_path / "m")
    mon = DriftMonitor(
        spark, path, categorical_cols=["s"], cat_top_k=2
    )
    mon.set_reference(ref)
    assert mon.cat_sets == {"s": ["a", "b"]}
    scores = mon.observe(cur, 0)
    assert scores["s"] > 0.25
    rows = {
        r["bin"]: r["count"]
        for r in mon.history().filter(F.col("batch_id") == 0).collect()
    }
    # c was not pinned (top_k=2): the new zzz AND c-like strays fold
    assert rows == {"a": 10, "__other__": 40, "__null__": 10}
    mon2 = DriftMonitor(spark, path)
    assert mon2.cat_sets == {"s": ["a", "b"]}
    assert mon2.scores(0) == scores
    with pytest.raises(ValueError, match="cat_top_k"):
        DriftMonitor(spark, path, categorical_cols=["s"], cat_top_k=9)


def test_monitor_embedding_and_mixed(spark, tmp_path):
    """Numeric + categorical + embedding features in ONE monitor, one
    commit, one history table."""
    import numpy as np

    rng = np.random.default_rng(3)
    # mean-shifted vectors: sign buckets are concentrated, so the
    # negation below moves real mass (uniform gaussians would land
    # near-uniformly over 2^3 buckets and negation would barely move
    # the histogram)
    ref = spark.createDataFrame(
        [(float(i % 10), "a" if i % 2 else "b",
          [float(x) for x in rng.normal(loc=1.0, scale=0.3, size=4)])
         for i in range(80)],
        "x double, s string, e array<double>",
    )
    path = str(tmp_path / "m")
    mon = DriftMonitor(
        spark, path, cols=["x"], bins=4, categorical_cols=["s"],
        embedding_col="e", embedding_dim=4, embedding_planes=3,
    )
    mon.set_reference(ref)
    same = mon.observe(ref, 0)
    assert set(same) == {"x", "s", "e"}
    assert all(v == pytest.approx(0.0, abs=1e-12) for v in same.values())
    # negated embeddings drift only the embedding feature
    neg = ref.withColumn("e", F.transform("e", lambda v: -v))
    drifted = mon.observe(neg, 1)
    assert drifted["e"] > 0.25
    assert drifted["x"] == pytest.approx(0.0, abs=1e-12)
    with pytest.raises(ValueError, match="embedding_planes"):
        DriftMonitor(spark, path, embedding_col="e", embedding_dim=4,
                     embedding_planes=5)


def test_monitor_embedding_requires_dim(spark, tmp_path):
    mon = DriftMonitor(
        spark, str(tmp_path / "m"), embedding_col="e"
    )
    ref = spark.createDataFrame([([1.0, 2.0],)], "e array<double>")
    with pytest.raises(ValueError, match="embedding_dim"):
        mon.set_reference(ref)
