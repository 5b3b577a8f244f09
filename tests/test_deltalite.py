"""Deltalite transaction-log table format: snapshots, time travel,
copy-on-write MERGE (matched files only), schema evolution, and the
reference's CDF incremental contract (enableChangeDataFeed gate +
overwrite detection, offline_store_spark_runner.py:1076-1136)."""

import os

import pytest
from pyspark.sql import functions as F

from featureform_spark.sources.deltalite import (
    ChangeDataFeedDisabledError,
    DeltaliteError,
    DeltaliteTable,
    TableOverwrittenError,
    incremental_records,
)


def mk(spark, tmp_path, rows, cols, name="t", **kw):
    t = DeltaliteTable(spark, str(tmp_path / name))
    t.create(spark.createDataFrame(rows, cols), **kw)
    return t


def test_create_append_snapshot_and_time_travel(spark, tmp_path):
    t = mk(spark, tmp_path, [(1, "a"), (2, "b")], ["k", "v"])
    assert t.latest_version() == 0
    assert t.row_count() == 2

    t.append(spark.createDataFrame([(3, "c")], ["k", "v"]))
    assert t.latest_version() == 1
    assert {r["k"] for r in t.snapshot().collect()} == {1, 2, 3}
    # time travel to v0
    assert {r["k"] for r in t.snapshot(0).collect()} == {1, 2}
    assert t.row_count(0) == 2 and t.row_count() == 3


def test_overwrite_replaces_state(spark, tmp_path):
    t = mk(spark, tmp_path, [(1, "a")], ["k", "v"])
    t.overwrite(spark.createDataFrame([(9, "z")], ["k", "v"]))
    assert [r["k"] for r in t.snapshot().collect()] == [9]
    assert {r["k"] for r in t.snapshot(0).collect()} == {1}
    ops = [h["operation"] for h in t.history()]
    assert ops == ["overwrite", "create"]


def test_create_modes(spark, tmp_path):
    t = mk(spark, tmp_path, [(1, "a")], ["k", "v"])
    with pytest.raises(DeltaliteError, match="already exists"):
        t.create(spark.createDataFrame([(2, "b")], ["k", "v"]))
    t.create(spark.createDataFrame([(2, "b")], ["k", "v"]), mode="ignore")
    assert t.row_count() == 1


def test_merge_rewrites_only_matched_files(spark, tmp_path):
    """The scale contract: files without matched keys are carried by
    reference — their part files survive the MERGE untouched."""
    t = DeltaliteTable(spark, str(tmp_path / "m"))
    # 4 files with disjoint key ranges (one append each => >=4 files)
    t.create(spark.createDataFrame([(i, float(i)) for i in range(10)], ["k", "v"]))
    for lo in (10, 20, 30):
        t.append(
            spark.createDataFrame(
                [(i, float(i)) for i in range(lo, lo + 10)], ["k", "v"]
            ).coalesce(1)
        )
    before_files = set(t._active_files())
    assert len(before_files) >= 4

    # merge touches only keys 30..34 → only the files holding 30..39
    src = spark.createDataFrame(
        [(k, 100.0 + k) for k in range(30, 35)] + [(99, 999.0)], ["k", "v"]
    )
    stats = t.merge(src, key="k")
    after_files = set(t._active_files())

    untouched = {f for f in before_files if f in after_files}
    # the three files holding keys 0..29 survive by name
    assert len(untouched) >= 3
    assert stats["files_rewritten"] < stats["files_total"]

    got = {r["k"]: r["v"] for r in t.snapshot().collect()}
    assert len(got) == 41
    assert got[30] == 130.0 and got[34] == 134.0   # updated
    assert got[35] == 35.0 and got[0] == 0.0       # untouched
    assert got[99] == 999.0                        # inserted


def test_merge_schema_evolution_adds_column(spark, tmp_path):
    """ALTER ADD COLUMNS analog (reference :719-731): a new source
    column appears on the table; pre-evolution rows read as NULL."""
    t = mk(spark, tmp_path, [(1, "a"), (2, "b")], ["entity", "f1"])
    t.merge(
        spark.createDataFrame([(2, 2.5), (3, 3.5)], ["entity", "f2"]),
        key="entity",
    )
    rows = {r["entity"]: (r["f1"], r["f2"]) for r in t.snapshot().collect()}
    assert rows[1] == ("a", None)      # untouched row, evolved column NULL
    assert rows[2] == ("b", 2.5)       # matched: f1 kept, f2 set
    assert rows[3] == (None, 3.5)      # inserted: f1 NULL


def test_merge_without_insert(spark, tmp_path):
    t = mk(spark, tmp_path, [(1, 1.0), (2, 2.0)], ["k", "v"])
    t.merge(
        spark.createDataFrame([(2, 20.0), (9, 90.0)], ["k", "v"]),
        key="k",
        insert=False,
    )
    got = {r["k"]: r["v"] for r in t.snapshot().collect()}
    assert got == {1: 1.0, 2: 20.0}


def test_change_feed_appends_and_merge(spark, tmp_path):
    t = mk(
        spark, tmp_path, [(1, 1.0)], ["k", "v"],
        properties={"enableChangeDataFeed": "true"},
    )
    t.append(spark.createDataFrame([(2, 2.0)], ["k", "v"]))          # v1
    t.merge(spark.createDataFrame([(2, 20.0), (3, 3.0)], ["k", "v"]), key="k")  # v2

    feed = incremental_records(t, last_run_version=0)
    got = {(r["k"], r["_change_type"], r["_commit_version"]) for r in feed.collect()}
    assert got == {
        (2, "insert", 1),
        (2, "update_postimage", 2),
        (3, "insert", 2),
    }
    vals = {(r["k"], r["_change_type"]): r["v"] for r in feed.collect()}
    assert vals[(2, "update_postimage")] == 20.0


def test_incremental_contract_errors(spark, tmp_path):
    # CDF not enabled
    t = mk(spark, tmp_path, [(1, 1.0)], ["k", "v"], name="nocdf")
    t.append(spark.createDataFrame([(2, 2.0)], ["k", "v"]))
    with pytest.raises(ChangeDataFeedDisabledError):
        incremental_records(t, 0)

    # overwrite since last run
    t2 = mk(
        spark, tmp_path, [(1, 1.0)], ["k", "v"], name="ow",
        properties={"enableChangeDataFeed": "true"},
    )
    t2.overwrite(spark.createDataFrame([(9, 9.0)], ["k", "v"]))
    with pytest.raises(TableOverwrittenError, match="overwritten"):
        incremental_records(t2, 0)

    # no new snapshots
    t3 = mk(
        spark, tmp_path, [(1, 1.0)], ["k", "v"], name="nonew",
        properties={"enableChangeDataFeed": "true"},
    )
    with pytest.raises(DeltaliteError, match="[Nn]o new"):
        incremental_records(t3, 0)


def test_row_count_is_log_fold_no_scan(spark, tmp_path):
    t = mk(spark, tmp_path, [(i,) for i in range(100)], ["k"])
    t.append(spark.createDataFrame([(i,) for i in range(100, 150)], ["k"]))
    # delete the data files: the count must still answer from the log
    for f in t._active_files():
        os.rename(
            os.path.join(t.path, f), os.path.join(t.path, f + ".hidden")
        )
    try:
        assert t.row_count() == 150
    finally:
        for f in t._active_files():
            os.rename(
                os.path.join(t.path, f + ".hidden"), os.path.join(t.path, f)
            )


def test_schema_read_of_pre_evolution_files(spark, tmp_path):
    """Append with a new column evolves the schema; old files read NULL."""
    t = mk(spark, tmp_path, [(1, "a")], ["k", "v"])
    t.append(spark.createDataFrame([(2, "b", 5.0)], ["k", "v", "w"]))
    got = {r["k"]: r["w"] for r in t.snapshot().collect()}
    assert got == {1: None, 2: 5.0}
    assert [f.name for f in t.schema().fields] == ["k", "v", "w"]


def test_deltalite_incremental_transformation(spark, tmp_path):
    from featureform_spark.streaming.incremental import (
        DeltaliteIncrementalTransformation,
    )

    src = mk(
        spark, tmp_path, [(1, 10.0), (2, 20.0)], ["k", "v"], name="itsrc",
        properties={"enableChangeDataFeed": "true"},
    )
    inc = DeltaliteIncrementalTransformation(
        src, str(tmp_path / "itwork"),
        lambda df: df.select("k", (F.col("v") * 2).alias("v2")),
    )
    assert inc.refresh() == 2   # first run: the create commit
    assert {(r["k"], r["v2"]) for r in inc.output().collect()} == {(1, 20.0), (2, 40.0)}

    assert inc.refresh() == 0   # caught up: no-op

    src.append(spark.createDataFrame([(3, 30.0)], ["k", "v"]))
    assert inc.refresh() == 1   # only the new row processed
    assert {(r["k"], r["v2"]) for r in inc.output().collect()} == {
        (1, 20.0), (2, 40.0), (3, 60.0)
    }


def test_deltalite_location_dispatch(spark, tmp_path):
    from featureform_spark.registry import DeltaliteLocation
    from featureform_spark.sources.readers import read_location
    from featureform_spark.sources.writers import write_deltalite

    path = str(tmp_path / "loc")
    assert write_deltalite(spark.createDataFrame([(1, "a")], ["k", "v"]), path) == 0
    assert write_deltalite(spark.createDataFrame([(2, "b")], ["k", "v"]), path) == 1

    df = read_location(spark, DeltaliteLocation(path=path))
    assert {r["k"] for r in df.collect()} == {1, 2}
    v0 = read_location(spark, DeltaliteLocation(path=path, version=0))
    assert {r["k"] for r in v0.collect()} == {1}
    # dict-shaped location (driver/registry serialization path)
    d = read_location(spark, {"kind": "deltalite", "path": path})
    assert d.count() == 2
