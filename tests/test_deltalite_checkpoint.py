"""Log checkpointing: auto-write cadence, checkpoint+tail fold parity,
log vacuum horizon semantics."""

import os

import pytest

from featureform_spark.sources.deltalite import DeltaliteError, DeltaliteTable


def _mk(spark, path, n_appends=12, interval=5):
    t = DeltaliteTable(spark, str(path))
    df0 = spark.createDataFrame([(0, "seed")], "id long, v string")
    t.create(
        df0, properties={"deltalite.checkpoint.interval": str(interval)}
    )
    for i in range(1, n_appends + 1):
        t.append(spark.createDataFrame([(i, f"r{i}")], "id long, v string"))
    return t


def test_auto_checkpoint_cadence(spark, tmp_path):
    t = _mk(spark, tmp_path / "t", n_appends=12, interval=5)
    assert t._checkpoint_versions() == [5, 10]


def test_checkpoint_fold_matches_full_fold(spark, tmp_path):
    t = _mk(spark, tmp_path / "t", n_appends=12, interval=5)
    # state via checkpoint+tail
    assert t.row_count() == 13
    assert {r.id for r in t.snapshot().collect()} == set(range(13))
    # time travel below the newest checkpoint still works (older
    # checkpoint or full fold)
    assert t.row_count(3) == 4
    assert {r.id for r in t.snapshot(7).collect()} == set(range(8))


def test_reads_do_not_touch_pre_checkpoint_commits(spark, tmp_path):
    """The point of checkpointing: after vacuum_log removes old commit
    JSONs, latest-state reads still work from checkpoint + tail."""
    t = _mk(spark, tmp_path / "t", n_appends=12, interval=5)
    out = t.vacuum_log()
    assert out["log_horizon_version"] == 10 and out["commits_deleted"] == 10
    assert t.row_count() == 13
    assert {r.id for r in t.snapshot().collect()} == set(range(13))
    assert t.latest_version() == 12
    # time travel at/above the horizon: fine
    assert t.row_count(10) == 11
    # below the horizon: clear error, not a mis-fold
    with pytest.raises(DeltaliteError, match="horizon"):
        t.snapshot(3)
    with pytest.raises(DeltaliteError, match="horizon"):
        t.change_feed(2)
    # CDF from the horizon still works
    assert t.change_feed(10).count() == 3


def test_checkpoint_is_idempotent_and_explicit(spark, tmp_path):
    t = _mk(spark, tmp_path / "t", n_appends=3, interval=0)  # auto off
    assert t._checkpoint_versions() == []
    info = t.checkpoint()
    assert info["version"] == 3
    again = t.checkpoint()
    assert again == info
    assert t.row_count() == 4


def test_properties_and_schema_survive_checkpoint(spark, tmp_path):
    t = _mk(spark, tmp_path / "t", n_appends=10, interval=5)
    t.vacuum_log()
    assert t.properties()["deltalite.checkpoint.interval"] == "5"
    assert [f.name for f in t.schema().fields] == ["id", "v"]
