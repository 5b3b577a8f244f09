"""Categorical drift monitoring (r12, VERDICT r11 #4): hash-stable
top-K + __other__ binning, __null__ category, never-seen categories,
and the driver-side PSI/chi-square folds."""

import duckdb
import pytest

from featureform_spark.functions.drift import (
    categorical_compare,
    chi_square,
    drift_report_categorical,
    psi,
)


def _frames(spark):
    ref = spark.createDataFrame(
        [("a",)] * 5 + [("b",)] * 3 + [("c",)] * 2 + [("d",)] * 1 + [(None,)] * 2,
        "seg string",
    )
    cur = spark.createDataFrame(
        [("a",)] * 2 + [("b",)] * 2 + [("e",)] * 4 + [(None,)] * 1,
        "seg string",
    )
    return ref, cur


def test_topk_fold_null_and_new_categories(spark):
    ref, cur = _frames(spark)
    got = {
        (r["feature"], r["category"]): (r["ref_count"], r["cur_count"])
        for r in categorical_compare(ref, cur, ["seg"], top_k=3).collect()
    }
    # rank by (ref_count DESC, category ASC): a(5), b(3), __null__(2)...
    # tie between c(2) and __null__(2) breaks on category ASC ->
    # '__null__' < 'c', so __null__ takes rank 3 and c folds
    assert got[("seg", "a")] == (5, 2)
    assert got[("seg", "b")] == (3, 2)
    assert got[("seg", "__null__")] == (2, 1)
    # __other__ absorbs c, d AND the never-in-reference e (its mass is
    # drift, counted, not dropped)
    assert got[("seg", "__other__")] == (3, 4)
    assert len(got) == 4


def test_categorical_counts_match_duckdb_exactly(spark):
    """The oracle-shape differential: same rank/fold computed by
    DuckDB window SQL must match row-for-row (the suite row runs this
    at driver scale; this pins the shape on a frame with every edge:
    NULLs, ties, a never-seen category)."""
    ref, cur = _frames(spark)
    got = sorted(
        (r["feature"], r["category"], r["ref_count"], r["cur_count"])
        for r in categorical_compare(ref, cur, ["seg"], top_k=3).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE r (seg VARCHAR); CREATE TABLE c (seg VARCHAR)"
    )
    con.executemany(
        "INSERT INTO r VALUES (?)",
        [["a"]] * 5 + [["b"]] * 3 + [["c"]] * 2 + [["d"]] + [[None]] * 2,
    )
    con.executemany(
        "INSERT INTO c VALUES (?)",
        [["a"]] * 2 + [["b"]] * 2 + [["e"]] * 4 + [[None]],
    )
    want = sorted(
        tuple(t)
        for t in con.execute(
            """
        WITH ru AS (SELECT 'seg' AS feature,
                           COALESCE(seg, '__null__') AS category FROM r),
        cu AS (SELECT 'seg' AS feature,
                      COALESCE(seg, '__null__') AS category FROM c),
        rc AS (SELECT feature, category, count(*) AS n FROM ru GROUP BY 1,2),
        cc AS (SELECT feature, category, count(*) AS n FROM cu GROUP BY 1,2),
        j AS (SELECT COALESCE(rc.feature, cc.feature) AS feature,
                     COALESCE(rc.category, cc.category) AS category,
                     COALESCE(rc.n, 0) AS ref_count,
                     COALESCE(cc.n, 0) AS cur_count
              FROM rc FULL OUTER JOIN cc
                ON rc.feature = cc.feature AND rc.category = cc.category),
        k AS (SELECT *, row_number() OVER (PARTITION BY feature
                        ORDER BY ref_count DESC, category ASC) AS rn FROM j)
        SELECT feature,
               CASE WHEN rn <= 3 THEN category ELSE '__other__' END
                 AS category,
               CAST(SUM(ref_count) AS BIGINT) AS ref_count,
               CAST(SUM(cur_count) AS BIGINT) AS cur_count
        FROM k GROUP BY 1, 2
        """
        ).fetchall()
    )
    assert got == want


def test_multi_feature_single_pass(spark):
    ref = spark.createDataFrame(
        [("x", "p"), ("y", "p"), ("x", "q")], "f1 string, f2 string"
    )
    cur = spark.createDataFrame([("x", "q")], "f1 string, f2 string")
    out = categorical_compare(ref, cur, ["f1", "f2"], top_k=5).collect()
    assert {r["feature"] for r in out} == {"f1", "f2"}


def test_validation(spark):
    ref, cur = _frames(spark)
    with pytest.raises(ValueError, match="no feature columns"):
        categorical_compare(ref, cur, [])
    with pytest.raises(ValueError, match="top_k"):
        categorical_compare(ref, cur, ["seg"], top_k=0)
    with pytest.raises(ValueError, match="stat"):
        drift_report_categorical(ref, cur, ["seg"], stat="ks")


def test_driver_side_folds_pinned(spark):
    ref, cur = _frames(spark)
    # identical frames -> no drift under either statistic
    assert drift_report_categorical(ref, ref, ["seg"])["seg"] == 0.0
    assert (
        drift_report_categorical(ref, ref, ["seg"], stat="chi_square")["seg"]
        == 0.0
    )
    scores = drift_report_categorical(ref, cur, ["seg"], top_k=3)
    assert scores["seg"] > 0.2  # a new category at 44% share screams
    chi = drift_report_categorical(ref, cur, ["seg"], top_k=3,
                                   stat="chi_square")
    assert chi["seg"] > 0.0

    # exact folds on hand counts: psi and chi_square agree with the
    # closed-form expressions
    counts = [(5, 2), (5, 8)]
    assert psi(counts) == pytest.approx(
        (0.5 - 0.2) * __import__("math").log(0.5 / 0.2)
        + (0.5 - 0.8) * __import__("math").log(0.5 / 0.8)
    )
    assert chi_square(counts) == pytest.approx(
        (2 - 5.0) ** 2 / 5.0 + (8 - 5.0) ** 2 / 5.0
    )
    with pytest.raises(ValueError, match="empty"):
        chi_square([(0, 0)])
    # zero-reference bins are skipped by chi-square (undefined e=0)
    assert chi_square([(10, 10), (0, 3)]) == pytest.approx(
        (10 - 13.0) ** 2 / 13.0
    )
