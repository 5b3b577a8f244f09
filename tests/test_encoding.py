"""Feature encoders: binning, target encoding, skew report."""
import pytest

from pyspark.sql import functions as F

from featureform_spark.operators.encoding import (
    equi_depth_bins,
    skew_report,
    target_encode,
)


def test_equi_depth_bins_balanced_and_ordered(spark):
    df = spark.createDataFrame([(float(i),) for i in range(1, 101)], "v double")
    out = equi_depth_bins(df, "v", n_bins=4)
    counts = {
        r["bin"]: r["cnt"]
        for r in out.groupBy("bin").agg(F.count("*").alias("cnt")).collect()
    }
    # 100 uniform values into 4 equi-depth bins: ~25 each
    assert set(counts) == {1, 2, 3, 4}
    assert all(20 <= c <= 30 for c in counts.values())
    # bin is monotone in v
    rows = out.orderBy("v").collect()
    assert all(a["bin"] <= b["bin"] for a, b in zip(rows, rows[1:]))


def test_bins_null_values_get_null_bin(spark):
    df = spark.createDataFrame(
        [(1.0,), (2.0,), (None,), (3.0,)], "v double"
    )
    rows = equi_depth_bins(df, "v", n_bins=2).collect()
    assert any(r["bin"] is None for r in rows if r["v"] is None)


def test_bin_assignment_is_broadcast_no_fact_shuffle(spark, sf_dir):
    from featureform_spark.sources.testdata import load_table

    li = load_table(spark, sf_dir, "lineitem")
    plan = (
        equi_depth_bins(li, "l_extendedprice", 8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan


def test_target_encode_shrinks_rare_categories(spark):
    # common category: 100 rows of label 10; rare: 1 row of label 0
    rows = [("common", 10.0)] * 100 + [("rare", 0.0)]
    df = spark.createDataFrame(rows, "cat string, label double")
    out = {r["cat"]: r["target_enc"] for r in target_encode(df, "cat", "label", alpha=10.0).collect()}
    prior = (100 * 10.0 + 0.0) / 101
    assert abs(out["common"] - (1000 + prior * 10) / 110) < 1e-6
    # the rare category lands near the prior, not at its own mean (0)
    assert abs(out["rare"] - (0 + prior * 10) / 11) < 1e-6
    assert out["rare"] > 5.0


def test_skew_report_flags_hot_key(spark):
    rows = [("hot",)] * 90 + [(f"k{i}",) for i in range(10)]
    df = spark.createDataFrame(rows, "k string")
    out = skew_report(df, "k", top_k=3).collect()
    assert out[0]["key"] == "hot" and out[0]["rank"] == 1
    assert out[0]["cnt"] == 90
    assert abs(out[0]["share"] - 0.9) < 1e-6
    # 11 distinct keys, uniform would be 100/11 rows: ratio = 90/(100/11)
    assert abs(out[0]["hot_ratio"] - 90 / (100 / 11)) < 1e-4


def test_target_encode_oof_no_leakage(spark):
    """Out-of-fold encoding: a row's own label must not influence its
    encoding. With one extreme-label row, that row's OWN encoding
    stays at the other-folds mean, while same-category rows in OTHER
    folds absorb the spike."""
    from featureform_spark.operators.encoding import target_encode_oof

    rows = [(i, "seg", 10.0) for i in range(40)]
    rows.append((999, "seg", 100000.0))  # the outlier
    df = spark.createDataFrame(rows, "id long, cat string, label double")
    out = {
        r["id"]: r["target_enc_oof"]
        for r in target_encode_oof(
            df, "cat", "label", "id", n_folds=4, alpha=0.0001
        ).collect()
    }
    # rows sharing the outlier's fold exclude it like the outlier does;
    # rows in OTHER folds include it — their encodings must exceed the
    # outlier's own (which is ~10, the clean mean)
    assert out[999] < 15.0
    assert max(out.values()) > 1000.0
    # determinism: md5 folds are stable across runs
    again = {
        r["id"]: r["target_enc_oof"]
        for r in target_encode_oof(
            df, "cat", "label", "id", n_folds=4, alpha=0.0001
        ).collect()
    }
    assert out == again


def test_target_encode_oof_fact_never_shuffles(spark):
    from featureform_spark.operators.encoding import target_encode_oof

    df = spark.createDataFrame(
        [(i, f"c{i % 3}", float(i)) for i in range(100)],
        "id long, cat string, label double",
    )
    out = target_encode_oof(df, "cat", "label", "id")
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the row-side join is broadcast: no exchange keyed on the fact rows
    assert "BroadcastHashJoin" in plan
    with pytest.raises(ValueError, match="n_folds"):
        target_encode_oof(df, "cat", "label", "id", n_folds=1)


def test_target_encode_oof_keeps_null_keys(spark):
    """NULL categories / NULL ids are their own aggregation groups —
    the null-safe join must keep every input row instead of silently
    shrinking the training set."""
    from featureform_spark.operators.encoding import target_encode_oof

    rows = [(1, "a", 1.0), (2, None, 2.0), (None, "a", 3.0),
            (4, None, 4.0)]
    df = spark.createDataFrame(rows, "id long, cat string, label double")
    out = target_encode_oof(df, "cat", "label", "id", n_folds=2)
    assert out.count() == 4  # zero rows dropped
    nulls = out.where(out["cat"].isNull()).collect()
    assert len(nulls) == 2
    assert all(r["target_enc_oof"] is not None for r in nulls)
