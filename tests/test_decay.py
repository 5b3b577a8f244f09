"""Half-life-decayed features and online-store TTL."""

import datetime

import pytest

from featureform_spark.operators.decay import decayed_features


def _ev(spark):
    d = lambda day: datetime.datetime(2024, 1, day)
    rows = [
        # entity 1: events 0, 2 and 4 days before the anchor (hl=2d)
        (1, d(10), 8.0),
        (1, d(8), 8.0),
        (1, d(6), 8.0),
        # entity 2: one event after the anchor — PIT-excluded
        (2, d(11), 100.0),
        (2, d(10), 4.0),
    ]
    return spark.createDataFrame(rows, "uid long, ts timestamp, v double")


def test_decay_fixed_point_exact(spark):
    out = {
        r["entity"]: r
        for r in decayed_features(
            _ev(spark), "uid", "ts", "v",
            as_of="2024-01-10", half_life_days=2,
        ).collect()
    }
    # weights: 2^0, 2^-1, 2^-2 → count 1.75, sum 8*(1.75) = 14.0
    assert out[1]["decayed_count"] == 1.75
    assert out[1]["decayed_sum"] == 14.0
    # entity 2: the future event is excluded (PIT rule)
    assert out[2]["decayed_count"] == 1.0
    assert out[2]["decayed_sum"] == 4.0


def test_decay_cutoff_and_validation(spark):
    d = lambda day: datetime.datetime(2023, 1, day)
    old = spark.createDataFrame(
        [(1, d(1), 5.0)], "uid long, ts timestamp, v double"
    )
    # ~370 days old at hl=2d → k >> max_age_halflives: contributes 0
    out = decayed_features(
        old, "uid", "ts", "v", as_of="2024-01-10", half_life_days=2
    ).collect()
    assert out == []
    with pytest.raises(ValueError, match="half_life_days"):
        decayed_features(old, "uid", "ts", "v", "2024-01-10", 0)
    with pytest.raises(ValueError, match="max_age_halflives"):
        decayed_features(
            old, "uid", "ts", "v", "2024-01-10", 2,
            max_age_halflives=60,
        )


def test_decay_smooth_matches_quantized_at_step_boundaries(spark):
    # events exactly ON half-life boundaries: smooth == quantized
    out_q = {
        r["entity"]: r
        for r in decayed_features(
            _ev(spark), "uid", "ts", "v", "2024-01-10", 2
        ).collect()
    }
    out_s = {
        r["entity"]: r
        for r in decayed_features(
            _ev(spark), "uid", "ts", "v", "2024-01-10", 2, smooth=True
        ).collect()
    }
    assert out_s[1]["decayed_count"] == pytest.approx(
        out_q[1]["decayed_count"], rel=1e-9
    )
    assert out_s[1]["decayed_sum"] == pytest.approx(
        out_q[1]["decayed_sum"], rel=1e-9
    )


def test_decay_single_shuffle(spark):
    out = decayed_features(_ev(spark), "uid", "ts", "v", "2024-01-10", 2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1  # one groupBy


def test_online_store_ttl():
    from featureform_spark.serving.online import InMemoryOnlineStore

    clock = [0.0]
    store = InMemoryOnlineStore(clock=lambda: clock[0])
    store.set("f", "a", 1.0, ttl_seconds=10)
    store.set("f", "b", 2.0)  # no TTL: lives forever
    assert store.get("f", "a") == 1.0
    clock[0] = 9.9
    assert store.get("f", "a") == 1.0
    clock[0] = 10.0
    assert store.get("f", "a") is None  # lazy expiry at the deadline
    assert store.get("f", "b") == 2.0
    # re-set without TTL clears the deadline
    store.set("f", "a", 3.0, ttl_seconds=5)
    store.set("f", "a", 4.0)
    clock[0] = 1000.0
    assert store.get("f", "a") == 4.0


def test_decay_smooth_honors_cutoff(spark):
    d = datetime.datetime
    rows = [(1, d(2024, 1, 9), 4.0),   # 1 day old: in scope
            (1, d(2020, 1, 1), 9.0)]   # years old: past the cutoff
    df = spark.createDataFrame(rows, "uid long, ts timestamp, v double")
    out = decayed_features(
        df, "uid", "ts", "v", "2024-01-10", 2,
        smooth=True, max_age_halflives=5,
    ).collect()[0]
    # only the fresh event contributes: 2^-0.5 weight
    assert out["decayed_count"] == pytest.approx(2 ** -0.5)
