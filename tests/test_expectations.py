"""One-scan data-quality expectations: rule semantics, NULL
conventions, the single-aggregation plan, and row-level quarantine."""

import pytest
from pyspark.sql import functions as F

from featureform_spark.functions.expectations import (
    ExpectationError,
    accepted_values,
    custom,
    enforce,
    expect,
    in_range,
    matches_regex,
    not_null,
    quarantine,
    unique,
)


@pytest.fixture(scope="module")
def messy(spark):
    rows = [
        (1, "a@x.com", 10, "OK"),
        (2, None, 200, "OK"),        # null email, out-of-range n
        (2, "c@x.com", 30, "BAD"),   # duplicate id, bad status
        (3, "not-an-email", 40, "OK"),
        (None, "e@x.com", None, "OK"),  # null id, null n
    ]
    return spark.createDataFrame(
        rows, "id long, email string, n long, status string"
    )


def _rules():
    # built lazily: Column construction needs an active SparkSession
    return [
        not_null("email"),
        unique("id"),
        in_range("n", 0, 100),
        accepted_values("status", ["OK"]),
        matches_regex("email", r"^[^@]+@[^@]+\.[^@]+$"),
    ]


def test_expect_counts_each_rule(messy):
    rep = {r["rule"]: r for r in expect(messy, _rules()).collect()}
    assert rep["not_null(email)"]["violations"] == 1
    # two rows share id=2 → one colliding extra; NULL ids don't collide
    assert rep["unique(id)"]["violations"] == 1
    # n=200 out of range, n=NULL counts as a violation (dbt convention)
    assert rep["in_range(n)"]["violations"] == 2
    assert rep["accepted_values(status)"]["violations"] == 1
    # NULL email and 'not-an-email' both fail the regex
    assert rep["matches_regex(email)"]["violations"] == 2
    assert all(r["total_rows"] == 5 for r in rep.values())
    assert not any(r["passed"] for r in rep.values())


def test_expect_passes_on_clean_data(spark):
    clean = spark.createDataFrame(
        [(1, "x"), (2, "y")], "id long, s string"
    )
    rep = expect(clean, [not_null("s"), unique("id")]).collect()
    assert all(r["passed"] and r["violations"] == 0 for r in rep)


def test_expect_is_one_scan(messy):
    rep = expect(messy, _rules())
    plan = rep._jdf.queryExecution().executedPlan().toString()
    # one scan feeds everything — rules never trigger per-rule jobs
    assert plan.count("Scan ExistingRDD") + plan.count("FileScan") <= 1


def test_enforce_raises_with_detail(messy):
    with pytest.raises(ExpectationError, match=r"unique\(id\): 1"):
        enforce(messy, _rules())
    # a green rule set returns silently; note NULL predicate results
    # count as violations, so NULL-tolerant rules must say so
    enforce(
        messy,
        [custom("n small or absent",
                F.col("n").isNull() | (F.col("n") < 1000))],
    )
    with pytest.raises(ExpectationError, match="n under 1000"):
        enforce(messy, [custom("n under 1000", F.col("n") < 1000)])


def test_quarantine_splits_rows(messy):
    row_rules = [
        not_null("email"),
        in_range("n", 0, 100),
        accepted_values("status", ["OK"]),
    ]
    clean, bad = quarantine(messy, row_rules)
    assert clean.count() == 2  # ids 1 and 3
    got = {
        (r["id"], tuple(sorted(r["_violations"])))
        for r in bad.collect()
    }
    assert got == {
        (2, ("in_range(n)", "not_null(email)")),
        (2, ("accepted_values(status)",)),
        (None, ("in_range(n)",)),  # NULL n violates the range rule
    }
    # schema is preserved plus the violations column
    assert set(bad.columns) == set(messy.columns) | {"_violations"}


def test_quarantine_rejects_aggregate_rules(messy):
    with pytest.raises(ValueError, match="aggregate-level"):
        quarantine(messy, [unique("id")])


def test_expect_requires_rules(messy):
    with pytest.raises(ValueError, match="no rules"):
        expect(messy, [])


def test_freshness_rule(spark):
    import datetime

    now = datetime.datetime.now()
    df = spark.createDataFrame(
        [(1, now), (2, now - datetime.timedelta(days=30))],
        "id long, ts timestamp",
    )
    from featureform_spark.functions.expectations import expect, freshness

    rep = expect(df, [freshness("ts", "2 days")]).collect()[0]
    assert rep["violations"] == 1 and not rep["passed"]


def test_expect_passes_vacuously_on_empty_table(spark):
    """Zero rows: every predicate rule passes with 0 violations (a
    NULL sum must not read as a failure in the publish gate)."""
    from featureform_spark.functions.expectations import (
        enforce,
        expect,
        in_range,
        not_null,
        unique,
    )

    empty = spark.createDataFrame([], "id long, s string")
    rep = expect(
        empty, [not_null("s"), unique("id"), in_range("id", 0, 9)]
    ).collect()
    assert all(r["passed"] and r["violations"] == 0 for r in rep)
    enforce(empty, [not_null("s")])  # silent


# ----------------------------------------------- sample_violations


def test_sample_violations_deterministic_and_capped(messy):
    from featureform_spark.functions.expectations import (
        sample_violations,
    )

    rules = [not_null("email"), in_range("n", 0, 100)]
    out = sample_violations(messy, rules, n=1, key_cols=["id"])
    rows = {(r["rule"], r["sample_rank"]) for r in out.collect()}
    # one sample per failed rule, rank always 1 at n=1
    assert rows == {
        ("not_null(email)", 1),
        ("in_range(n)", 1),
    }
    # deterministic: same picks on a re-run and under a different
    # partitioning (md5 ranking, not first-partition-wins)
    a = sorted(map(tuple, out.collect()))
    b = sorted(
        map(
            tuple,
            sample_violations(
                messy.repartition(7), rules, n=1, key_cols=["id"]
            ).collect(),
        )
    )
    assert a == b


def test_sample_violations_rows_actually_violate(messy):
    from featureform_spark.functions.expectations import (
        sample_violations,
    )

    out = sample_violations(
        messy, [in_range("n", 0, 100)], n=10, key_cols=["id"]
    ).collect()
    # n=200 (out of range) and n=NULL both violate (dbt convention)
    assert sorted(
        (r["n"] is None or r["n"] > 100) for r in out
    ) == [True, True]
    assert [r["sample_rank"] for r in sorted(out, key=lambda r: r["sample_rank"])] == [1, 2]


def test_sample_violations_refuses_uniqueness(messy):
    from featureform_spark.functions.expectations import (
        sample_violations,
    )

    with pytest.raises(ValueError, match="aggregate-level"):
        sample_violations(messy, [unique("id")], n=3)
    with pytest.raises(ValueError, match="n must be"):
        sample_violations(messy, [not_null("email")], n=0)


def test_sample_violations_single_scan_plan(messy):
    """One scan + one window shuffle — never per-rule jobs."""
    from featureform_spark.functions.expectations import (
        sample_violations,
    )

    out = sample_violations(
        messy,
        [not_null("email"), in_range("n", 0, 100), matches_regex("email", "@")],
        n=2,
        key_cols=["id"],
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ExistingRDD") <= 1


def test_sample_violations_two_phase_equals_single_window(spark):
    """The salted two-phase top-n must pick EXACTLY the rows a single
    global md5 window would (the per-rule global top-n is a subset of
    the per-salt top-ns) — checked against an independent pandas
    re-derivation on a frame large enough that every salt is hit."""
    import hashlib

    from featureform_spark.functions.expectations import (
        sample_violations,
    )

    rows = [(i, i % 97) for i in range(3000)]
    df = spark.createDataFrame(rows, "id long, n long")
    rules = [in_range("n", 0, 50)]
    got = sample_violations(df, rules, n=7, key_cols=["id"]).collect()

    viol = [i for i, v in rows if v > 50]
    ranked = sorted(
        viol,
        key=lambda i: hashlib.md5(
            f"{i}\x1fin_range(n)".encode()
        ).hexdigest(),
    )[:7]
    assert [r["id"] for r in sorted(got, key=lambda r: r["sample_rank"])] == ranked
