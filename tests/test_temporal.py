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


def test_gap_fill_rejects_unbucketable_steps(spark):
    """Calendar-variable multiples and compound intervals still refuse
    loudly (no fixed-second floor exists for them); fixed-length
    multi-unit strides like '6 hours' are now a supported epoch-floor
    path (r9 verdict #3)."""
    df = spark.createDataFrame(
        [(1, _ts(1), 1.0)], "uid long, ts timestamp, v double"
    )
    for bad in ("2 months", "3 weeks", "1 hour 30 minutes", "hour",
                "0 minute", "-2 hour"):
        with pytest.raises(ValueError, match="unsupported gap_fill step"):
            gap_fill(df, "uid", "ts", "v", bad)
    with pytest.raises(ValueError, match="unknown fill"):
        gap_fill(df, "uid", "ts", "v", "1 hour", how="spline")


def test_gap_fill_15min_stride_grid(spark):
    """15-minute epoch-floor buckets: starts are exact multiples of
    900s from epoch, every intermediate bucket appears exactly once,
    and observed buckets are never dropped (the hazard date_trunc
    striding had)."""
    import datetime as dt

    def ts(m, s=0):
        return dt.datetime(2024, 1, 1, 10, m, s)

    rows = [
        (1, ts(7, 30), 2.0),    # -> 10:00
        (1, ts(14, 59), 3.0),   # -> 10:00 (same bucket, sums)
        (1, ts(16), 4.0),       # -> 10:15 boundary-exact
        (1, ts(59, 59), 1.0),   # -> 10:45
    ]
    df = spark.createDataFrame(rows, "uid long, ts timestamp, v double")
    out = gap_fill(df, "uid", "ts", "v", "15 minute", how="zero").orderBy(
        "bucket_start"
    ).collect()
    starts = [r["bucket_start"] for r in out]
    assert starts == [ts(0), ts(15), ts(30), ts(45)]
    assert [r["value"] for r in out] == [5.0, 4.0, 0.0, 1.0]
    assert [r["is_filled"] for r in out] == [False, False, True, False]


def test_gap_fill_6hour_and_90s_strides(spark):
    import datetime as dt

    base = dt.datetime(2024, 3, 10)
    rows = [
        (1, base + dt.timedelta(hours=2), 1.0),   # 00:00 bucket
        (1, base + dt.timedelta(hours=13), 2.0),  # 12:00 bucket
    ]
    df = spark.createDataFrame(rows, "uid long, ts timestamp, v double")
    out = gap_fill(df, "uid", "ts", "v", "6 hour", how="locf").orderBy(
        "bucket_start"
    ).collect()
    assert [r["bucket_start"].hour for r in out] == [0, 6, 12]
    assert [r["value"] for r in out] == [1.0, 1.0, 2.0]

    rows = [(1, base + dt.timedelta(seconds=s), 1.0) for s in (10, 305)]
    df = spark.createDataFrame(rows, "uid long, ts timestamp, v double")
    out = gap_fill(df, "uid", "ts", "v", "90 second", how="null").orderBy(
        "bucket_start"
    ).collect()
    secs = [
        (r["bucket_start"] - base).total_seconds() for r in out
    ]
    assert secs == [0.0, 90.0, 180.0, 270.0]  # 305 -> 270 bucket
    assert [r["value"] for r in out] == [1.0, None, None, 1.0]


def test_gap_fill_unit_strides_keep_calendar_alignment(spark):
    """'1 week' must still date_trunc to Monday (epoch-floor of 604800s
    would align to Thursday) — the existing unit semantics are pinned."""
    import datetime as dt

    # 2024-01-10 is a Wednesday; its ISO week starts Monday 2024-01-08
    df = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 10, 5), 1.0)],
        "uid long, ts timestamp, v double",
    )
    out = gap_fill(df, "uid", "ts", "v", "1 week", how="zero").collect()
    assert out[0]["bucket_start"] == dt.datetime(2024, 1, 8)


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
