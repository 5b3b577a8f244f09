"""Approximate sketch aggregates: estimates must sit within their
declared error bounds of the exact answers (the reason sketch_profile
carries no SQL oracle — the estimate is implementation-specific, the
bound is the contract)."""

from __future__ import annotations

from pyspark.sql import functions as F

from featureform_spark.sources.testdata import load_table
from featureform_spark.suite import all_queries


def test_sketch_profile_within_bounds(spark, sf_dir):
    out = {
        r["event_type"]: r
        for r in all_queries()["sketch_profile"](spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events")
    exact = {
        r["event_type"]: r
        for r in ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("user_id").alias("users"),
            F.expr(
                "percentile(value, array(0.48, 0.52, 0.88, 0.92, 0.97, 1.0))"
            ).alias("qbr"),
        )
        .collect()
    }
    assert set(out) == set(exact) and len(out) > 0
    for et, row in out.items():
        ex = exact[et]
        assert row["n"] == ex["n"]  # plain count is exact
        # HLL++ rsd 2%; allow 5 sigma
        assert abs(row["approx_users"] - ex["users"]) <= max(5, 0.1 * ex["users"])
        # percentile_approx returns actual data values (nearest rank),
        # while exact percentile interpolates — so bound each estimate
        # by the exact quantiles at q +/- 2% rank instead of by value
        qs = row["value_quantiles"]
        assert qs == sorted(qs)
        brackets = [
            (ex["qbr"][0], ex["qbr"][1]),  # p50 in [p48, p52]
            (ex["qbr"][2], ex["qbr"][3]),  # p90 in [p88, p92]
            (ex["qbr"][4], ex["qbr"][5]),  # p99 in [p97, max]
        ]
        for approx, (lo, hi) in zip(qs, brackets):
            assert lo <= approx <= hi
