"""Round-11 ADVICE.md regressions (all four r10 advisories).

1. sample_violations refuses input columns that collide with its
   internal names (Spark resolves case-insensitively, so an input
   'rule' column would make F.col('rule') ambiguous or wrong).
2. (lives in test_commit_safety_r10.py: only CommitConflictError is
   swallowed by append's follow-on manifest merge.)
3. gap_fill: nominally-equal strides ('1 day' vs '24 hour') produce
   the SAME epoch-aligned grid in ANY session timezone.
4. bm25_topk: NULL-text rows are excluded from N/avgdl/df so the
   stats describe the same document set the scorer sees.
"""

import math

import pytest
from pyspark.sql import functions as F

from featureform_spark.functions.expectations import (
    in_range,
    sample_violations,
)
from featureform_spark.functions.retrieval import bm25_topk
from featureform_spark.operators.temporal import gap_fill


def test_sample_violations_refuses_colliding_columns(spark):
    for bad in ("rule", "RULE", "sample_rank", "_rk"):
        df = spark.createDataFrame(
            [(1, 99)], f"id long, `{bad}` long"
        )
        with pytest.raises(ValueError, match="collide"):
            sample_violations(df, [in_range("id", 0, 50)], n=3)


def test_sample_violations_clean_columns_still_work(spark):
    df = spark.createDataFrame([(1, 99), (2, 10)], "id long, n long")
    got = sample_violations(df, [in_range("n", 0, 50)], n=3).collect()
    assert [r["id"] for r in got] == [1]


def test_gap_fill_day_stride_timezone_invariant(spark):
    """'1 day' and '24 hour' must yield identical grids regardless of
    spark.sql.session.timeZone — both epoch-floor to UTC midnight.
    (date_trunc('day') would align to session-calendar midnight and
    the two nominally-equal strides would disagree.)"""
    # epoch-second instants, NOT string casts: a string->timestamp
    # cast re-interprets under whatever session timezone is active at
    # EXECUTION time, which would change the input instants themselves
    rows = [
        ("e1", 1709960400, 1.0),  # 2024-03-09 05:00:00 UTC
        ("e1", 1710284400, 2.0),  # 2024-03-12 23:00:00 UTC (DST edge between)
    ]
    df = spark.createDataFrame(rows, "uid string, epoch long, v double")
    df = df.withColumn("ts", F.timestamp_seconds("epoch"))
    prev_tz = spark.conf.get("spark.sql.session.timeZone")
    try:
        results = {}
        for tz in ("UTC", "America/New_York"):
            spark.conf.set("spark.sql.session.timeZone", tz)
            for step in ("1 day", "24 hour"):
                out = (
                    gap_fill(df, "uid", "ts", "v", step, how="zero")
                    # compare INSTANTS (epoch), not collected naive
                    # datetimes, which render in the session timezone
                    .select(
                        F.col("bucket_start").cast("long").alias("b"),
                        "value",
                    )
                    .orderBy("b")
                )
                results[(tz, step)] = [
                    (r["b"], r["value"]) for r in out.collect()
                ]
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev_tz)
    # all four runs identical: same stride => same grid, any timezone
    baseline = results[("UTC", "1 day")]
    assert len(baseline) == 4  # Mar 9,10,11,12 UTC buckets
    for key, got in results.items():
        assert got == baseline, key


def test_bm25_null_text_rows_excluded_from_stats(spark):
    """A corpus with NULL-text rows must score identically to the same
    corpus with those rows dropped — N, avgdl, df all describe the
    documents the scorer can actually match."""
    docs = [
        (1, "spark shuffles data across executors"),
        (2, "spark broadcast joins avoid the shuffle"),
        (3, "pandas runs on one machine"),
    ]
    clean = spark.createDataFrame(docs, "doc_id long, text string")
    with_nulls = spark.createDataFrame(
        docs + [(4, None), (5, None)], "doc_id long, text string"
    )
    a = bm25_topk(clean, ["spark", "shuffle"], k=3).collect()
    b = bm25_topk(with_nulls, ["spark", "shuffle"], k=3).collect()
    assert [(r["doc_id"], r["rank"]) for r in a] == [
        (r["doc_id"], r["rank"]) for r in b
    ]
    for ra, rb in zip(a, b):
        assert math.isclose(ra["bm25"], rb["bm25"], rel_tol=0, abs_tol=0)
