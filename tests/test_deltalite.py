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


def test_merge_leaves_null_key_rows_untouched(spark, tmp_path):
    """NULL-key target rows colocated in rewritten files survive a
    MERGE on other keys (origin markers, not key nullness)."""
    t = DeltaliteTable(spark, str(tmp_path / "nk"))
    t.create(
        spark.createDataFrame(
            [(1, "a"), (2, "b"), (None, "keepme")], "k long, v string"
        ).coalesce(1)
    )
    t.merge(
        spark.createDataFrame([(2, "b2"), (7, "new")], "k long, v string"),
        key="k",
    )
    rows = sorted(
        ((r["k"], r["v"]) for r in t.snapshot().collect()),
        key=lambda x: (x[0] is None, x[0]),
    )
    assert rows == [(1, "a"), (2, "b2"), (7, "new"), (None, "keepme")]


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


def test_append_retries_past_concurrent_commit(spark, tmp_path):
    """Losing the version-slot race retargets the append at the new log
    tail instead of failing (blind appends conflict with nothing)."""
    import json

    from featureform_spark.sources.deltalite import Commit

    t = mk(spark, tmp_path, [(1, "a")], ["k", "v"])
    orig_write = t._write_files

    def write_then_get_raced(df, version_hint):
        adds = orig_write(df, version_hint)
        if not getattr(t, "_raced", False):  # thief commits v1 mid-flight
            t._raced = True
            t._commit(Commit(
                version=1, operation="append", is_blind_append=True,
                add=[], remove=[],
                schema_json=json.dumps(t.schema().jsonValue()),
            ))
        return adds

    t._write_files = write_then_get_raced
    v = t.append(spark.createDataFrame([(9, "z")], ["k", "v"]))
    assert v == 2                                # targeted v1, lost, retried
    assert {r["k"] for r in t.snapshot().collect()} == {1, 9}


def test_optimize_compacts_without_logical_change(spark, tmp_path):
    t = mk(
        spark, tmp_path, [(1, 1.0)], ["k", "v"],
        properties={"enableChangeDataFeed": "true"},
    )
    for i in range(2, 7):
        t.append(spark.createDataFrame([(i, float(i))], ["k", "v"]).coalesce(1))
    before = {r["k"]: r["v"] for r in t.snapshot().collect()}
    n_before = len(t._active_files())
    assert n_before >= 6

    stats = t.optimize(target_rows_per_file=1000)
    assert stats["files_compacted"] == n_before
    assert stats["files_written"] < n_before
    assert {r["k"]: r["v"] for r in t.snapshot().collect()} == before
    assert t.row_count() == 6

    # physical-only: no change-feed rows, not an overwrite for incrementals
    feed = incremental_records(t, last_run_version=5)
    assert feed.count() == 0 or all(
        r["_commit_version"] <= 5 for r in feed.collect()
    )
    assert [h["operation"] for h in t.history()][0] == "optimize"


def test_vacuum_deletes_unreferenced_and_guards_time_travel(spark, tmp_path):
    t = mk(spark, tmp_path, [(1, "a"), (2, "b")], ["k", "v"])
    t.overwrite(spark.createDataFrame([(9, "z")], ["k", "v"]))

    all_parquet = [f for f in os.listdir(t.path) if f.endswith(".parquet")]
    live = set(t._active_files())
    assert set(all_parquet) - live  # v0 files still on disk

    stats = t.vacuum(retain_versions=0)
    assert stats["files_deleted"] == len(set(all_parquet) - live)
    assert [r["k"] for r in t.snapshot().collect()] == [9]  # current intact

    with pytest.raises(DeltaliteError, match="vacuum"):
        t.snapshot(0)  # time travel below the horizon → clear error


def test_zone_map_pruned_snapshot(spark, tmp_path):
    """Pruned read plans from the log: disjoint-range files are skipped
    without opening footers; results equal the unpruned filter."""
    t = DeltaliteTable(spark, str(tmp_path / "zm"))
    t.create(spark.createDataFrame(
        [(i, f"r{i}") for i in range(0, 100)], ["k", "v"]).coalesce(1))
    for lo in (100, 200, 300):
        t.append(spark.createDataFrame(
            [(i, f"r{i}") for i in range(lo, lo + 100)], ["k", "v"]).coalesce(1))
    assert len(t._active_files()) == 4

    got = t.snapshot_pruned("k", lo=150, hi=250)
    expect = t.snapshot().filter((F.col("k") >= 150) & (F.col("k") <= 250))
    assert {r["k"] for r in got.collect()} == {r["k"] for r in expect.collect()}
    prune = t.last_prune_stats()
    assert prune == {"files_total": 4, "files_read": 2}

    # open-ended ranges and fully-out-of-range prunes
    t.snapshot_pruned("k", lo=350)
    assert t.last_prune_stats()["files_read"] == 1
    assert t.snapshot_pruned("k", lo=1000).count() == 0
    assert t.last_prune_stats()["files_read"] == 0

    # string column zone maps work too (lexicographic)
    got_s = t.snapshot_pruned("v", lo="r100", hi="r199")
    assert got_s.count() == spark.createDataFrame(
        [(f"r{i}",) for i in range(0, 400)], ["v"]
    ).filter((F.col("v") >= "r100") & (F.col("v") <= "r199")).count()


def test_zone_maps_survive_merge_and_optimize(spark, tmp_path):
    t = DeltaliteTable(spark, str(tmp_path / "zm2"))
    t.create(spark.createDataFrame(
        [(i, float(i)) for i in range(10)], ["k", "v"]).coalesce(1))
    t.append(spark.createDataFrame(
        [(i, float(i)) for i in range(100, 110)], ["k", "v"]).coalesce(1))
    t.merge(spark.createDataFrame([(5, 55.0)], ["k", "v"]), key="k")
    t.optimize(target_rows_per_file=1000)
    for a in t._active_actions():
        assert "stats" in a and "k" in a["stats"]
    got = t.snapshot_pruned("k", lo=0, hi=10)
    assert {r["v"] for r in got.filter(F.col("k") == 5).collect()} == {55.0}


def test_incremental_sql_transformation(spark, tmp_path):
    """ff.incremental semantics (SQLTransformation proto is_incremental +
    incremental_source): the incremental ref binds only NEW rows per
    refresh; the dimension ref binds its full snapshot every time."""
    from featureform_spark.streaming.incremental import IncrementalSQLTransformation

    ev = mk(
        spark, tmp_path, [(1, "click", 10.0), (2, "view", 20.0)],
        ["user_id", "etype", "value"], name="ev",
        properties={"enableChangeDataFeed": "true"},
    )
    dim = spark.createDataFrame(
        [("click", 2.0), ("view", 3.0)], ["etype", "weight"]
    )

    inc = IncrementalSQLTransformation(
        spark,
        """SELECT e.user_id, e.value * d.weight AS score
           FROM {{ev}} e JOIN {{dim}} d ON e.etype = d.etype""",
        sources={"ev": ev, "dim": dim},
        incremental=["ev"],
        work_dir=str(tmp_path / "inc_sql"),
    )
    assert inc.refresh() == 2
    assert {(r["user_id"], r["score"]) for r in inc.output().collect()} == {
        (1, 20.0), (2, 60.0)
    }
    assert inc.refresh() == 0                    # caught up

    ev.append(spark.createDataFrame([(3, "click", 5.0)], ["user_id", "etype", "value"]))
    assert inc.refresh() == 1                    # only the new row joined
    assert {(r["user_id"], r["score"]) for r in inc.output().collect()} == {
        (1, 20.0), (2, 60.0), (3, 10.0)
    }


def test_incremental_sql_transformation_validation(spark, tmp_path):
    from featureform_spark.streaming.incremental import IncrementalSQLTransformation

    ev = mk(spark, tmp_path, [(1, 1.0)], ["k", "v"], name="vev")
    df = spark.createDataFrame([(1, 1.0)], ["k", "v"])
    with pytest.raises(ValueError, match="without sources"):
        IncrementalSQLTransformation(
            spark, "SELECT * FROM {{missing}}", {"ev": ev}, ["ev"],
            str(tmp_path / "w1"),
        )
    with pytest.raises(ValueError, match="not in template"):
        IncrementalSQLTransformation(
            spark, "SELECT * FROM {{ev}}", {"ev": ev, "x": df}, ["x"],
            str(tmp_path / "w2"),
        )
    with pytest.raises(TypeError, match="change feed"):
        IncrementalSQLTransformation(
            spark, "SELECT * FROM {{plain}}", {"plain": df}, ["plain"],
            str(tmp_path / "w3"),
        )


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


def test_zorder_reclusters_for_multi_column_pruning(spark, tmp_path):
    """Before zorder: files are tight on x only (append order), so a
    y-filter reads everything. After OPTIMIZE ZORDER BY (x, y): files
    cover z-curve octants, so single-column filters on EITHER column
    prune, and conjunctive filters multiply."""
    from featureform_spark.sources.deltalite import DeltaliteTable

    t = DeltaliteTable(spark, str(tmp_path / "zo"))
    # 8 x-sorted files: x tight per file, y spans full range everywhere
    rows = [(x, y) for x in range(64) for y in range(64)]
    t.create(spark.createDataFrame(rows[:512], ["x", "y"]).coalesce(1))
    for i in range(1, 8):
        t.append(
            spark.createDataFrame(rows[512 * i : 512 * (i + 1)], ["x", "y"])
            .coalesce(1)
        )
    before = t.snapshot()
    before_rows = sorted((r["x"], r["y"]) for r in before.collect())

    t.snapshot_pruned("y", lo=0, hi=7).count()
    assert t.last_prune_stats()["files_read"] == 8  # y-prune useless

    res = t.optimize_zorder(["x", "y"], target_rows_per_file=512)
    assert res["files_clustered"] == 8 and res["files_written"] >= 4

    # row set byte-identical
    after_rows = sorted((r["x"], r["y"]) for r in t.snapshot().collect())
    assert after_rows == before_rows
    # change feed silent for the physical-only commit
    assert t.change_feed(res["version"]).count() == 0

    got = t.snapshot_pruned("y", lo=0, hi=7)
    assert sorted((r["x"], r["y"]) for r in got.collect()) == sorted(
        (x, y) for x in range(64) for y in range(8)
    )
    y_prune = t.last_prune_stats()
    assert y_prune["files_read"] < y_prune["files_total"]

    t.snapshot_pruned("x", lo=0, hi=7).count()
    x_prune = t.last_prune_stats()
    assert x_prune["files_read"] < x_prune["files_total"]

    # conjunctive multi-column prune: strictly stronger than either alone
    got2 = t.snapshot_pruned_multi({"x": (0, 7), "y": (0, 7)})
    assert sorted((r["x"], r["y"]) for r in got2.collect()) == sorted(
        (x, y) for x in range(8) for y in range(8)
    )
    both = t.last_prune_stats()
    assert both["files_read"] <= min(x_prune["files_read"], y_prune["files_read"])


def test_zorder_partition_keys_match_spark_hash(spark):
    """The analytic z-slice router picks partition keys driver-side
    with a reimplementation of Spark's Murmur3 long hash; pin both the
    hash values and the bijection (slot j's key must land in physical
    partition j under repartition(n, key)) against Spark itself."""
    from featureform_spark.sources.deltalite import (
        _murmur3_hash_long,
        _partition_bijection_keys,
    )

    vals = [0, 1, 7, 42, 2**31, 2**33 + 5, 999999999999]
    rows = (
        spark.createDataFrame([(v,) for v in vals], "v long")
        .select("v", F.hash("v").alias("h"))
        .collect()
    )
    for r in rows:
        assert _murmur3_hash_long(r["v"]) == r["h"]
    for n in (1, 2, 5, 12, 31):
        keys = _partition_bijection_keys(n)
        slots = (
            spark.createDataFrame([(k,) for k in keys], "k long")
            .select(F.pmod(F.hash("k"), F.lit(n)).alias("s"))
            .collect()
        )
        assert [r["s"] for r in slots] == list(range(n))
        # end-to-end: each key owns exactly one partition
        df = spark.createDataFrame(
            [(k, i) for k in keys for i in range(3)], "k long, i int"
        ).repartition(n, "k")
        per = (
            df.groupBy(F.spark_partition_id().alias("p"))
            .agg(F.countDistinct("k").alias("nk"))
            .collect()
        )
        assert len(per) == n and all(r["nk"] == 1 for r in per)


def test_zorder_large_nout_broadcast_mapping(spark):
    """n_out > 256 routes the slice->key mapping through a broadcast
    LocalRelation join instead of a giant array literal; rows are
    preserved and each partition holds at most one z-slice."""
    from featureform_spark.sources.deltalite import zorder_cluster

    df = spark.range(2000).selectExpr(
        "id as x", "(id * 37) % 2000 as y"
    )
    out = zorder_cluster(df, ["x", "y"], 300)
    assert sorted(
        (r["x"], r["y"]) for r in out.select("x", "y").collect()
    ) == sorted((i, (i * 37) % 2000) for i in range(2000))
    assert out.rdd.getNumPartitions() == 300
    per = (
        out.groupBy(F.spark_partition_id().alias("p"))
        .agg(F.countDistinct("__zsid").alias("ns"))
        .collect()
    )
    assert all(r["ns"] == 1 for r in per)


def test_zorder_wide_key_stays_analytic(spark):
    """r13 (r12 verdict #2): 7-8 z-columns previously overflowed the
    52-bit slice arithmetic and silently fell back to
    repartitionByRange — whose range-bounds SAMPLING pass re-executes
    the whole scan + z-kernel — on exactly the widest inputs.
    bits_per_col now adapts downward so the analytic one-pass path
    holds; the plan must carry no RangePartitioning/sampling subtree
    and rows are preserved."""
    from featureform_spark.sources.deltalite import zorder_cluster

    cols = [f"c{i}" for i in range(8)]
    df = spark.range(500).selectExpr(
        *[f"(id * {3 + i}) % 97 as c{i}" for i in range(8)]
    )
    out = zorder_cluster(df, cols, 12)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" not in plan.lower(), plan
    assert out.count() == 500
    # every row keeps its column tuple (clustering is layout-only)
    assert sorted(
        tuple(r[c] for c in cols) for r in out.select(*cols).collect()
    ) == sorted(
        tuple((i * (3 + j)) % 97 for j in range(8)) for i in range(500)
    )


def test_zorder_validation_and_nulls(spark, tmp_path):
    from featureform_spark.sources.deltalite import DeltaliteTable

    t = DeltaliteTable(spark, str(tmp_path / "zv"))
    t.create(
        spark.createDataFrame(
            [(1, "a", None), (2, "b", 5), (None, "c", 6)],
            "x int, s string, y int",
        )
    )
    with pytest.raises(ValueError, match="numeric"):
        t.optimize_zorder(["s"])
    with pytest.raises(ValueError, match="unknown"):
        t.optimize_zorder(["nope"])
    res = t.optimize_zorder(["x", "y"], target_rows_per_file=10)
    assert res["files_clustered"] >= 1
    got = sorted(
        ((r["x"], r["s"], r["y"]) for r in t.snapshot().collect()), key=str
    )
    assert len(got) == 3  # nulls survive re-clustering


# ------------------------------------------------ r12: DELETE + replace


def test_delete_where_cow_matched_files_only(spark, tmp_path):
    from featureform_spark.sources.deltalite import DeltaliteTable

    t = DeltaliteTable(spark, str(tmp_path / "dw"))
    t.create(
        spark.createDataFrame(
            [(i, i % 3) for i in range(30)], "id long, g long"
        ).repartition(3, "g"),
        properties={"enableChangeDataFeed": "true"},
    )
    files_before = len(t._active_files())
    out = t.delete_where("id >= 20 AND g = 0")
    assert out["rows_deleted"] == sum(
        1 for i in range(20, 30) if i % 3 == 0
    )
    # CoW: only files holding matching rows were rewritten
    assert 0 < out["files_rewritten"] < out["files_total"] == files_before
    assert t.snapshot().count() == 30 - out["rows_deleted"]
    # survivors colocated in rewritten files are intact
    assert t.snapshot().filter("id < 20 AND g = 0").count() == 7
    # CDF carries the deleted rows
    feed = t.change_feed(out["version"]).collect()
    assert {r["_change_type"] for r in feed} == {"delete"}
    assert {r["id"] for r in feed} == {21, 24, 27}
    # time travel still serves the pre-delete rows
    assert t.snapshot(version=out["version"] - 1).count() == 30

    # no-match predicate is a no-op: no commit
    v = t.latest_version()
    noop = t.delete_where("id = 99999")
    assert noop["rows_deleted"] == 0 and t.latest_version() == v


def test_overwrite_properties_ride_the_commit(spark, tmp_path):
    from featureform_spark.sources.deltalite import DeltaliteTable

    t = DeltaliteTable(spark, str(tmp_path / "op"))
    t.create(
        spark.createDataFrame([(1,)], "x long"),
        properties={"scheme": "a", "keep": "yes"},
    )
    t.overwrite(
        spark.createDataFrame([(2,)], "x long"),
        properties={"scheme": "b"},
    )
    props = t.properties()
    assert props["scheme"] == "b"  # updated atomically with the rows
    assert props["keep"] == "yes"  # untouched keys fold through
    assert [r["x"] for r in t.snapshot().collect()] == [2]
