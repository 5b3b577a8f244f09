"""SCD2 interval building and time-grid gap filling."""

import datetime

import pytest
from pyspark.sql import functions as F

from featureform_spark.operators.temporal import gap_fill, scd2


def _ts(h, m=0):
    return datetime.datetime(2024, 1, 1, h, m)


@pytest.fixture(scope="module")
def changes(spark):
    rows = [
        # user 1: A -> A (compressed) -> B -> A
        (1, _ts(1), "A", 10),
        (1, _ts(2), "A", 11),
        (1, _ts(3), "B", 12),
        (1, _ts(4), "A", 13),
        # user 2: single state, never changes
        (2, _ts(1), "X", 20),
        (2, _ts(5), "X", 21),
    ]
    return spark.createDataFrame(
        rows, "uid long, ts timestamp, state string, v long"
    )


def test_scd2_compresses_and_closes_intervals(changes):
    out = scd2(changes, ["uid"], "ts", ["state"]).orderBy(
        "uid", "valid_from"
    ).collect()
    u1 = [r for r in out if r["uid"] == 1]
    assert [(r["state"], r["valid_from"].hour) for r in u1] == [
        ("A", 1), ("B", 3), ("A", 4)
    ]
    # half-open chain: each valid_to is the next valid_from
    assert u1[0]["valid_to"] == u1[1]["valid_from"]
    assert u1[1]["valid_to"] == u1[2]["valid_from"]
    assert u1[2]["valid_to"] is None and u1[2]["is_current"]
    assert not u1[0]["is_current"]
    u2 = [r for r in out if r["uid"] == 2]
    assert len(u2) == 1 and u2[0]["is_current"]  # full compression


def test_scd2_multi_attr_change_detection(spark):
    rows = [
        (1, _ts(1), "A", 1),
        (1, _ts(2), "A", 2),  # second attr changes -> new interval
        (1, _ts(3), "A", 2),  # unchanged -> compressed
    ]
    df = spark.createDataFrame(
        rows, "uid long, ts timestamp, s string, n long"
    )
    out = scd2(df, ["uid"], "ts", ["s", "n"]).collect()
    assert len(out) == 2


def test_scd2_same_ts_deterministic(spark):
    rows = [(1, _ts(1), "B"), (1, _ts(1), "A"), (1, _ts(2), "C")]
    df = spark.createDataFrame(rows, "uid long, ts timestamp, s string")
    a = scd2(df, ["uid"], "ts", ["s"]).orderBy("valid_from", "s").collect()
    b = scd2(df, ["uid"], "ts", ["s"]).orderBy("valid_from", "s").collect()
    assert [r["s"] for r in a] == [r["s"] for r in b]  # tiebreak on attrs


def test_gap_fill_locf_and_flags(spark):
    rows = [
        (1, _ts(1, 30), 5.0),
        (1, _ts(4, 10), 7.0),  # gap: hours 2 and 3 missing
    ]
    df = spark.createDataFrame(rows, "uid long, ts timestamp, v double")
    out = gap_fill(df, "uid", "ts", "v", "1 hour", how="locf").orderBy(
        "bucket_start"
    ).collect()
    assert [r["bucket_start"].hour for r in out] == [1, 2, 3, 4]
    assert [r["value"] for r in out] == [5.0, 5.0, 5.0, 7.0]
    assert [r["is_filled"] for r in out] == [False, True, True, False]


def test_gap_fill_zero_and_null_modes(spark):
    rows = [(1, _ts(1), 5.0), (1, _ts(3), 7.0)]
    df = spark.createDataFrame(rows, "uid long, ts timestamp, v double")
    z = gap_fill(df, "uid", "ts", "v", "1 hour", how="zero").orderBy(
        "bucket_start"
    ).collect()
    assert [r["value"] for r in z] == [5.0, 0.0, 7.0]
    n = gap_fill(df, "uid", "ts", "v", "1 hour", how="null").orderBy(
        "bucket_start"
    ).collect()
    assert n[1]["value"] is None and n[1]["is_filled"]


def test_gap_fill_grid_is_per_entity(spark):
    # entity 2's span must NOT inherit entity 1's range
    rows = [(1, _ts(1), 1.0), (1, _ts(10), 1.0), (2, _ts(5), 2.0)]
    df = spark.createDataFrame(rows, "uid long, ts timestamp, v double")
    out = gap_fill(df, "uid", "ts", "v", "1 hour").collect()
    assert sum(1 for r in out if r["entity"] == 1) == 10
    assert sum(1 for r in out if r["entity"] == 2) == 1


def test_gap_fill_rejects_multi_unit_steps(spark):
    df = spark.createDataFrame(
        [(1, _ts(1), 1.0)], "uid long, ts timestamp, v double"
    )
    with pytest.raises(ValueError, match="unsupported gap_fill step"):
        gap_fill(df, "uid", "ts", "v", "6 hours")
    with pytest.raises(ValueError, match="unknown fill"):
        gap_fill(df, "uid", "ts", "v", "1 hour", how="spline")


def test_gap_fill_linear_interpolation(spark):
    from featureform_spark.operators.temporal import gap_fill

    rows = [(1, _ts(1), 2.0), (1, _ts(4), 8.0), (1, _ts(6), 8.0)]
    df = spark.createDataFrame(rows, "uid long, ts timestamp, v double")
    out = gap_fill(df, "uid", "ts", "v", "1 hour", how="linear").orderBy(
        "bucket_start"
    ).collect()
    # hours 1..6: observed 2, interp 4, interp 6, observed 8, interp 8, observed 8
    assert [r["value"] for r in out] == [2.0, 4.0, 6.0, 8.0, 8.0, 8.0]
    assert [r["is_filled"] for r in out] == [
        False, True, True, False, True, False
    ]
    # the forward and backward neighbor windows share one exchange:
    # linear costs no more shuffles than the single-window locf
    def _n_exchanges(how):
        return (
            gap_fill(df, "uid", "ts", "v", "1 hour", how=how)
            ._jdf.queryExecution().executedPlan().toString()
            .count("Exchange hashpartitioning")
        )

    assert _n_exchanges("linear") == _n_exchanges("locf")


def test_scd2_single_shuffle_plan(changes):
    out = scd2(changes, ["uid"], "ts", ["state"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    # both windows share the (uid) partitioning: exactly one exchange
    assert plan.count("Exchange hashpartitioning") == 1


def test_funnel_ordering_and_chain_breaks(spark):
    from featureform_spark.operators.temporal import funnel

    rows = [
        (1, _ts(1), "A"), (1, _ts(2), "B"), (1, _ts(3), "C"),
        # user 2: B before A — doesn't count; B after A does
        (2, _ts(1), "B"), (2, _ts(2), "A"), (2, _ts(3), "B"),
        # user 3: A only
        (3, _ts(1), "A"),
        # user 4: same-ts A and B — strict ordering rejects the B
        (4, _ts(1), "A"), (4, _ts(1), "B"),
        # user 5: only non-step events — excluded entirely
        (5, _ts(1), "Z"),
    ]
    df = spark.createDataFrame(rows, "uid long, ts timestamp, et string")
    out = {
        r["entity"]: r
        for r in funnel(df, "uid", "ts", "et", ["A", "B", "C"]).collect()
    }
    assert out[1]["converted"] and out[1]["steps_completed"] == 3
    assert out[2]["steps_completed"] == 2
    assert out[2]["step_2_ts"].hour == 3  # the pre-A 'B' didn't count
    assert out[3]["steps_completed"] == 1
    assert out[4]["steps_completed"] == 1  # same-ts B rejected (strict)
    assert 5 not in out
    assert not out[2]["converted"]


def test_funnel_single_shuffle_and_validation(spark):
    from featureform_spark.operators.temporal import funnel

    df = spark.createDataFrame(
        [(1, _ts(1), "A"), (1, _ts(2), "B")],
        "uid long, ts timestamp, et string",
    )
    out = funnel(df, "uid", "ts", "et", ["A", "B"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    with pytest.raises(ValueError, match="at least two"):
        funnel(df, "uid", "ts", "et", ["A"])
    with pytest.raises(ValueError, match="distinct"):
        funnel(df, "uid", "ts", "et", ["A", "A"])


def test_funnel_conversion_window(spark):
    from featureform_spark.operators.temporal import funnel

    rows = [
        # user 1 converts inside 2 hours
        (1, _ts(1), "A"), (1, _ts(2), "B"),
        # user 2's B lands 5h after its A: outside the window
        (2, _ts(1), "A"), (2, _ts(6), "B"),
    ]
    df = spark.createDataFrame(rows, "uid long, ts timestamp, et string")
    out = {
        r["entity"]: r
        for r in funnel(
            df, "uid", "ts", "et", ["A", "B"], within="2 hours"
        ).collect()
    }
    assert out[1]["converted"]
    assert not out[2]["converted"] and out[2]["steps_completed"] == 1
    # without the window user 2 converts
    free = {
        r["entity"]: r
        for r in funnel(df, "uid", "ts", "et", ["A", "B"]).collect()
    }
    assert free[2]["converted"]
