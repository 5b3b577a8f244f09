"""Refresh scheduling (ST3/ST4): target-lag and cron triggers, and a
DYNAMIC training set that reflects source changes without manual
refresh() — the reference's SnowflakeDynamicTableConfig contract
(metadata/proto/metadata.proto:713-722) executed in-process."""

import time

import pytest
from pyspark.sql import functions as F

from featureform_spark.streaming.scheduler import (
    DynamicTrainingSet,
    RefreshScheduler,
    cron_matches,
    parse_target_lag,
)


def test_parse_target_lag():
    assert parse_target_lag("90 seconds") == 90.0
    assert parse_target_lag("5 minutes") == 300.0
    assert parse_target_lag("1 hour") == 3600.0
    assert parse_target_lag("2 days") == 172800.0
    assert parse_target_lag(7.5) == 7.5
    with pytest.raises(ValueError):
        parse_target_lag("5 fortnights")
    with pytest.raises(ValueError):
        parse_target_lag("whenever")


def test_cron_matches():
    t = time.struct_time((2026, 8, 13, 14, 30, 0, 3, 225, -1))  # Thu 14:30
    assert cron_matches("* * * * *", t)
    assert cron_matches("30 14 * * *", t)
    assert cron_matches("*/15 * * * *", t)
    assert cron_matches("0,30 * * * *", t)
    assert cron_matches("* * * * 4", t)          # Thursday (0=Sunday)
    assert not cron_matches("31 14 * * *", t)
    assert not cron_matches("* * * * 0", t)
    with pytest.raises(ValueError):
        cron_matches("* * *", t)


def test_target_lag_job_fires_on_lag_boundary():
    runs = []
    s = RefreshScheduler()
    s.register("j", lambda: runs.append(1), target_lag="10 seconds")
    assert len(runs) == 1                       # initialize on_create
    t0 = s.jobs["j"].last_run
    assert s.run_pending(t0 + 5) == []          # inside the lag window
    assert s.run_pending(t0 + 10) == ["j"]      # due exactly at lag
    assert len(runs) == 2


def test_on_schedule_initialize_waits():
    runs = []
    s = RefreshScheduler()
    s.register("j", lambda: runs.append(1), target_lag="10 seconds",
               initialize="on_schedule")
    assert runs == []
    s.run_pending()                              # first tick: never ran → due
    assert len(runs) == 1


def test_cron_job_at_most_once_per_minute():
    runs = []
    s = RefreshScheduler()
    s.register("c", lambda: runs.append(1), schedule="* * * * *",
               initialize="on_schedule")
    base = (int(time.time() // 60) + 1) * 60.0   # a fresh minute boundary
    assert s.run_pending(base) == ["c"]
    assert s.run_pending(base + 10) == []        # same minute → no re-fire
    assert s.run_pending(base + 60) == ["c"]     # next minute
    assert len(runs) == 2


def test_exactly_one_contract_required():
    s = RefreshScheduler()
    with pytest.raises(ValueError):
        s.register("x", lambda: None)
    with pytest.raises(ValueError):
        s.register("x", lambda: None, target_lag="1 seconds", schedule="* * * * *")


def test_failing_job_surfaces_error_and_keeps_running():
    s = RefreshScheduler()
    s.register("bad", lambda: 1 / 0, target_lag="0 seconds")
    st = s.stats()["bad"]
    assert st["errors"] == 1 and "ZeroDivisionError" in st["last_error"]
    s.run_pending()                              # still schedulable
    assert s.stats()["bad"]["errors"] == 2


def _mk_engine(spark, src_path):
    from featureform_spark.plans.engine import Engine
    from featureform_spark.registry import (
        FeatureVariant,
        LabelVariant,
        Registry,
        TrainingSetVariant,
    )

    reg = Registry()
    eng = Engine(spark, reg)
    reg.register_file("ev", src_path)
    reg.register(FeatureVariant(
        name="val", source="ev.default", entity="user",
        entity_column="user_id", value_column="value", timestamp_column="ts",
    ))
    reg.register(LabelVariant(
        name="lbl", source="ev.default", entity="user",
        entity_column="user_id", value_column="value", timestamp_column="ts",
    ))
    reg.register(TrainingSetVariant(
        name="dyn", label="lbl.default", features=["val.default"],
        ts_type="dynamic",
    ))
    return eng


def test_dynamic_training_set_reflects_source_changes(spark, tmp_path):
    """The ST4 'done' criterion: a DYNAMIC set picks up new source rows
    via the scheduler tick — no manual refresh() call anywhere."""
    src_dir = str(tmp_path / "src")
    spark.createDataFrame(
        [("u1", 1.0, "2024-01-01 00:00:00")], ["user_id", "value", "ts"]
    ).withColumn("ts", F.col("ts").cast("timestamp")).write.parquet(src_dir)

    eng = _mk_engine(spark, src_dir)
    sched = RefreshScheduler()
    dyn = DynamicTrainingSet(eng, "dyn.default", sched, target_lag="30 seconds")
    assert dyn.df().count() == 1                 # initialized on create

    spark.createDataFrame(
        [("u2", 2.0, "2024-01-02 00:00:00")], ["user_id", "value", "ts"]
    ).withColumn("ts", F.col("ts").cast("timestamp")).write.mode("append").parquet(src_dir)

    t0 = sched.jobs["training_set/dyn.default"].last_run
    assert sched.run_pending(t0 + 10) == []      # within lag → stale OK
    sched.run_pending(t0 + 30)                   # lag reached → refresh fires
    assert dyn.df().count() == 2
    assert {r["entity"] for r in dyn.df().collect()} == {"u1", "u2"}


def test_background_thread_refreshes_without_any_call(spark):
    """Same contract, real thread: the loop itself triggers the refresh."""
    calls = []
    with RefreshScheduler(poll_interval=0.1) as s:
        s.register("tick", lambda: calls.append(time.time()),
                   target_lag="0.5 seconds", initialize="on_schedule")
        deadline = time.time() + 10
        while len(calls) < 2 and time.time() < deadline:
            time.sleep(0.1)
    assert len(calls) >= 2                       # fired repeatedly on its own
