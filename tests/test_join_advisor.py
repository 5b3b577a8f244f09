"""Statistics-driven join planning: zero-scan profiles, NDV-based
cardinality/skew advice, and the broadcast hint landing in the
physical plan."""

import pytest

from featureform_spark.plans.join_advisor import (
    advise_join,
    join_with_stats,
    table_profile,
)
from featureform_spark.sources.puffin_stats import (
    ThetaSketch,
    estimate_intersection,
)


@pytest.fixture(scope="module")
def tables(spark, tmp_path_factory):
    from featureform_spark.sources.iceberg_protocol import (
        IcebergProtocolTable,
    )

    root = tmp_path_factory.mktemp("advisor")
    dim = IcebergProtocolTable(spark, str(root / "dim"))
    dim.create(
        spark.createDataFrame(
            [(i, f"nation{i}") for i in range(25)],
            "nkey long, name string",
        )
    )
    dim.analyze_table()
    fact = IcebergProtocolTable(spark, str(root / "fact"))
    fact.create(
        spark.createDataFrame(
            [(i, i % 25, float(i)) for i in range(5000)],
            "id long, nkey long, v double",
        )
    )
    fact.analyze_table()
    return dim, fact


def test_table_profile_is_zero_scan_and_right(tables):
    dim, fact = tables
    dp, fp = table_profile(dim), table_profile(fact)
    assert dp["rows"] == 25 and fp["rows"] == 5000
    assert dp["bytes"] > 0 and fp["files"] >= 1


def test_profile_subtracts_position_deletes(spark, tmp_path):
    from featureform_spark.sources.iceberg_protocol import (
        IcebergProtocolTable,
    )
    from pyspark.sql import functions as F

    t = IcebergProtocolTable(spark, str(tmp_path / "del"))
    t.create(
        spark.createDataFrame(
            [(i, "x") for i in range(100)], "id long, s string"
        )
    )
    t.delete_rows(F.col("id") < 40)
    assert table_profile(t)["rows"] == 60


def test_advise_broadcasts_small_side(tables):
    dim, fact = tables
    # pick a threshold between the two real live sizes so the verdict
    # is forced by the metadata, not parquet-overhead luck
    dp, fp = table_profile(dim), table_profile(fact)
    thr = (dp["bytes"] + fp["bytes"]) // 2  # between the two sizes
    adv = advise_join(fact, dim, "nkey", broadcast_threshold_bytes=thr)
    assert adv["strategy"] == "broadcast_right"
    adv2 = advise_join(dim, fact, "nkey", broadcast_threshold_bytes=thr)
    assert adv2["strategy"] == "broadcast_left"
    # NDVs came from the puffin stats, not a scan
    assert adv["ndv_left"] == 25 or adv["ndv_left"] == 5000
    assert adv["ndv_right"] == 25
    # containment bound: 5000 * 25 / max(25, 25... ) — every fact row
    # matches exactly one dim row
    assert adv["est_output_rows"] == 5000 * 25 // max(adv["ndv_left"], 25)
    # sketch intersection: all 25 dim keys appear in the fact table
    assert adv["est_matching_keys"] == 25


def test_advise_flags_skew(tables):
    dim, fact = tables
    adv = advise_join(
        fact, dim, "nkey", skew_rows_per_key=100
    )  # 5000/25 = 200 rows per key > 100
    assert adv["skew_risk"] is True
    assert any("rows/key" in r for r in adv["reasons"])
    calm = advise_join(fact, dim, "nkey", skew_rows_per_key=1000)
    assert calm["skew_risk"] is False


def test_join_with_stats_hints_broadcast(tables):
    dim, fact = tables
    dp, fp = table_profile(dim), table_profile(fact)
    thr = (dp["bytes"] + fp["bytes"]) // 2
    out, adv = join_with_stats(
        fact, dim, "nkey", broadcast_threshold_bytes=thr
    )
    assert adv["strategy"] == "broadcast_right"
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert out.count() == 5000


def test_advise_without_stats_still_plans(spark, tmp_path):
    from featureform_spark.sources.iceberg_protocol import (
        IcebergProtocolTable,
    )

    a = IcebergProtocolTable(spark, str(tmp_path / "a"))
    a.create(spark.createDataFrame([(1, "x")], "k long, s string"))
    b = IcebergProtocolTable(spark, str(tmp_path / "b"))
    b.create(spark.createDataFrame([(1, "y")], "k long, s string"))
    adv = advise_join(a, b, "k")  # never analyzed: no NDV, no crash
    assert adv["ndv_left"] is None and adv["est_output_rows"] is None
    assert adv["strategy"].startswith("broadcast")


def test_sketch_intersection_estimate():
    a, b = ThetaSketch(), ThetaSketch()
    for i in range(1000):
        a.update(i)
    for i in range(500, 1500):
        b.update(i)
    est = estimate_intersection(a, b)
    assert est == 500.0  # exact mode: inclusion-exclusion is exact
    c = ThetaSketch()
    c.update("disjoint")
    assert estimate_intersection(a, c) == 0.0


def test_advice_survives_appends_with_stale_stats(spark, tmp_path):
    """After an append the current snapshot has no stats; the advisor
    falls back to the analyzed main-ancestor's NDVs (approximate NDVs
    beat none for planning), while strict ndv() still raises."""
    from featureform_spark.sources.iceberg_protocol import (
        IcebergProtocolError,
        IcebergProtocolTable,
    )

    a = IcebergProtocolTable(spark, str(tmp_path / "sa"))
    a.create(spark.createDataFrame(
        [(i, i % 20) for i in range(200)], "id long, k long"
    ))
    a.analyze_table(columns=["k"])
    b = IcebergProtocolTable(spark, str(tmp_path / "sb"))
    b.create(spark.createDataFrame(
        [(i,) for i in range(20)], "k long"
    ))
    b.analyze_table(columns=["k"])
    a.append(spark.createDataFrame([(999, 99)], "id long, k long"))
    # strict: current snapshot has no stats
    import pytest as _pt

    with _pt.raises(IcebergProtocolError, match="no table statistics"):
        a.ndv("k")
    # stale fallback: the ancestor's stats serve
    assert a.ndv_estimates(allow_stale=True)["k"] == 20
    adv = advise_join(a, b, "k")
    assert adv["ndv_left"] == 20 and adv["est_output_rows"] is not None
