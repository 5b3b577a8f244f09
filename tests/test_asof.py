"""Generic as-of join + sessionization semantics."""

from datetime import datetime

from featureform_spark.operators.asof import asof_join, sessionize


def t(day, hour=0, minute=0):
    return datetime(2024, 1, day, hour, minute)


def make(spark, rows, schema="k string, ts timestamp, v string"):
    return spark.createDataFrame(rows, schema)


def test_backward_basic_and_ties(spark):
    left = make(spark, [("a", t(5), "L1"), ("a", t(2), "L2"), ("b", t(5), "L3")])
    right = make(spark, [("a", t(1), "r1"), ("a", t(4), "r2"), ("a", t(5), "r3"),
                         ("c", t(1), "rc")])
    out = asof_join(left, right, on="ts", by="k", value_cols=["v"])
    got = {(r["k"], r["v"]): (r["v_right"], r["ts_right"]) for r in out.collect()}
    assert got[("a", "L1")] == ("r3", t(5))   # equal ts included
    assert got[("a", "L2")] == ("r1", t(1))
    assert got[("b", "L3")] == (None, None)   # no match → left row kept


def test_forward_direction(spark):
    left = make(spark, [("a", t(3), "L")])
    right = make(spark, [("a", t(1), "past"), ("a", t(4), "next"), ("a", t(6), "later")])
    out = asof_join(left, right, on="ts", by="k", value_cols=["v"], direction="forward")
    r = out.collect()[0]
    assert (r["v_right"], r["ts_right"]) == ("next", t(4))


def test_forward_equal_ts_included(spark):
    left = make(spark, [("a", t(3), "L")])
    right = make(spark, [("a", t(3), "same")])
    out = asof_join(left, right, on="ts", by="k", value_cols=["v"], direction="forward")
    assert out.collect()[0]["v_right"] == "same"


def test_tolerance_nulls_out_far_matches(spark):
    left = make(spark, [("a", t(10), "L")])
    right = make(spark, [("a", t(1), "old")])
    out = asof_join(left, right, on="ts", by="k", value_cols=["v"],
                    tolerance_seconds=86400.0)
    r = out.collect()[0]
    assert r["v_right"] is None and r["ts_right"] is None
    out2 = asof_join(left, right, on="ts", by="k", value_cols=["v"],
                     tolerance_seconds=86400.0 * 20)
    assert out2.collect()[0]["v_right"] == "old"


def test_last_write_wins_on_duplicate_right_ts(spark):
    left = make(spark, [("a", t(5), "L")])
    right = make(spark, [("a", t(3), "first"), ("a", t(3), "second")])
    out = asof_join(left, right, on="ts", by="k", value_cols=["v"])
    assert out.collect()[0]["v_right"] == "second"


def test_sessionize_gap_semantics(spark):
    rows = [
        (1, "u", t(1, 10, 0)),
        (2, "u", t(1, 10, 20)),   # 20 min gap → same session
        (3, "u", t(1, 11, 30)),   # 70 min gap → new session
        (4, "v", t(1, 10, 0)),    # other entity → own sessions
    ]
    df = spark.createDataFrame(rows, "event_id long, user string, ts timestamp")
    out = {r["event_id"]: r["session_id"]
           for r in sessionize(df, "user", "ts", 1800, order_col="event_id").collect()}
    assert out[1] == out[2] == "u#1"
    assert out[3] == "u#2"
    assert out[4] == "v#1"


def test_session_window_matches_sessionize():
    """Pin the native session_window boundary rule to sessionize's:
    an event at exactly prev_ts + gap MERGES (new session only when the
    gap is strictly exceeded), and window end = last_ts + gap."""
    import datetime as dt

    from pyspark.sql import functions as F

    from featureform_spark.session import get_spark

    spark = get_spark("featureform_spark_tests", shuffle_partitions=4)
    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, base),
        (2, base + dt.timedelta(minutes=30)),        # exactly gap → merges
        (3, base + dt.timedelta(minutes=60, seconds=1)),  # > gap → new
    ]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp")
    out = (
        df.groupBy(F.session_window("ts", "30 minutes"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("session_window.start")
        .collect()
    )
    assert [r["n"] for r in out] == [2, 1]
    assert out[0]["session_window"]["end"] == base + dt.timedelta(minutes=60)
    # same grouping as the gap-arithmetic sessionize operator
    sess = sessionize(
        df.withColumn("user", F.lit("u")), "user", "ts", 1800,
        order_col="event_id",
    ).collect()
    by_id = {r["event_id"]: r["session_id"] for r in sess}
    assert by_id[1] == by_id[2] and by_id[3] != by_id[1]
