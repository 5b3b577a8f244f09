"""The registered deltaprotocol data source: batch parity with the
native snapshot reader, and REAL Structured Streaming over commit
versions — checkpointed resume, OPTIMIZE transparency, change-commit
refusal/skip — the delta streaming-source contract without the vendor
jar."""

import os

import pytest
from pyspark.sql import functions as F

from featureform_spark.sources.delta_protocol import DeltaProtocolTable
from featureform_spark.sources.deltaprotocol_datasource import register


def _orders(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "orders.parquet")).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )


@pytest.fixture()
def reg(spark):
    register(spark)
    return spark


def test_batch_read_matches_snapshot(reg, spark, sf_dir, tmp_path):
    orders = _orders(spark, sf_dir)
    t = DeltaProtocolTable(spark, str(tmp_path / "b"))
    t.create(orders.filter(F.col("o_orderkey") % 3 == 0))
    t.append(orders.filter(F.col("o_orderkey") % 3 == 1))
    via_ds = spark.read.format("deltaprotocol").options(
        path=str(tmp_path / "b")
    ).load()
    assert via_ds.columns == t.snapshot().columns
    assert sorted(map(tuple, via_ds.collect())) == sorted(
        map(tuple, t.snapshot().collect())
    )


def test_batch_read_partitioned_table(reg, spark, sf_dir, tmp_path):
    events = spark.read.parquet(
        os.path.join(sf_dir, "events.parquet")
    ).select("event_id", "event_type", "value")
    t = DeltaProtocolTable(spark, str(tmp_path / "p"))
    t.create(events, partition_by=["event_type"])
    via_ds = spark.read.format("deltaprotocol").options(
        path=str(tmp_path / "p")
    ).load()
    assert sorted(map(tuple, via_ds.collect())) == sorted(
        map(tuple, events.collect())
    )


def test_stream_commit_version_offsets_and_resume(
    reg, spark, sf_dir, tmp_path
):
    orders = _orders(spark, sf_dir)
    tdir = str(tmp_path / "s")
    t = DeltaProtocolTable(spark, tdir)
    t.create(orders.filter(F.col("o_orderkey") % 4 == 0))       # v0
    t.append(orders.filter(F.col("o_orderkey") % 4 == 1))       # v1
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def drain():
        q = (
            spark.readStream.format("deltaprotocol")
            .options(path=tdir)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return spark.read.parquet(out)

    n01 = orders.filter(F.col("o_orderkey") % 4 <= 1).count()
    assert drain().count() == n01
    # OPTIMIZE between batches is transparent (dataChange=false)
    t.compact()                                                  # v2
    t.append(orders.filter(F.col("o_orderkey") % 4 == 2))        # v3
    got = drain()
    n = orders.filter(F.col("o_orderkey") % 4 <= 2).count()
    assert got.count() == n
    # no row emitted twice across the compaction
    assert got.distinct().count() == n


def test_stream_refuses_change_commits_unless_skipped(
    reg, spark, sf_dir, tmp_path
):
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import StreamingQueryException

    orders = _orders(spark, sf_dir)
    tdir = str(tmp_path / "c")
    t = DeltaProtocolTable(spark, tdir)
    t.create(orders.limit(100))
    dead = [r["o_orderkey"] for r in t.snapshot().limit(3).collect()]
    t.merge(
        orders.filter(F.col("o_orderkey").isin(dead)).withColumn(
            "o_custkey", F.lit(-1).cast("long")
        ),
        key="o_orderkey",
    )                                                            # v1 rewrites

    def run(extra_opts):
        q = (
            spark.readStream.format("deltaprotocol")
            .options(path=tdir, **extra_opts)
            .load()
            .writeStream.format("memory")
            .queryName(f"dp_{len(extra_opts)}")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    with pytest.raises((StreamingQueryException, Py4JJavaError)) as ei:
        run({})
    assert "skipChangeCommits" in str(ei.value)
    run({"skipChangeCommits": "true"})  # v1 skipped, v0 streams
    n = spark.sql("SELECT count(*) c FROM dp_1").first()["c"]
    assert n == 100  # the initial snapshot only


def test_stream_starting_version(reg, spark, sf_dir, tmp_path):
    orders = _orders(spark, sf_dir)
    tdir = str(tmp_path / "sv")
    t = DeltaProtocolTable(spark, tdir)
    t.create(orders.filter(F.col("o_orderkey") % 4 == 0))        # v0
    t.append(orders.filter(F.col("o_orderkey") % 4 == 1))        # v1
    t.append(orders.filter(F.col("o_orderkey") % 4 == 2))        # v2
    q = (
        spark.readStream.format("deltaprotocol")
        .options(path=tdir, startingVersion="1")
        .load()
        .writeStream.format("memory")
        .queryName("dp_sv")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM dp_sv")
    assert got.count() == orders.filter(
        F.col("o_orderkey") % 4 == 1
    ).count() + orders.filter(F.col("o_orderkey") % 4 == 2).count()
    assert got.filter(F.col("o_orderkey") % 4 == 0).count() == 0


def test_batch_read_applies_deletion_vectors(reg, spark, sf_dir, tmp_path):
    """Round 6: the batch reader no longer gates DV'd tables — each
    input partition ships the compact roaring blob and the executor
    masks rows by file-relative index during the Arrow read. Streams
    still refuse (DVs arrive via change commits)."""
    from featureform_spark.sources.delta_protocol import (
        UnsupportedTableFeatureError,
    )

    orders = _orders(spark, sf_dir)
    tdir = str(tmp_path / "dv")
    t = DeltaProtocolTable(spark, tdir)
    t.create(orders.limit(300).repartition(3))
    t.delete_where(F.col("o_orderkey") % 5 == 0)
    t.append(orders.limit(340).subtract(orders.limit(300)))
    via_ds = spark.read.format("deltaprotocol").options(path=tdir).load()
    assert sorted(map(tuple, via_ds.collect())) == sorted(
        map(tuple, t.snapshot().collect())
    )
    # partitioned + DV'd composes (partition literals AND masks)
    events = spark.read.parquet(
        os.path.join(sf_dir, "events.parquet")
    ).select("event_id", "event_type", "value")
    pdir = str(tmp_path / "pdv")
    p = DeltaProtocolTable(spark, pdir)
    p.create(events.limit(400), partition_by=["event_type"])
    p.delete_where(F.col("event_id") % 3 == 0)
    got = spark.read.format("deltaprotocol").options(path=pdir).load()
    assert sorted(map(tuple, got.select(*p.snapshot().columns).collect())) \
        == sorted(map(tuple, p.snapshot().collect()))


def test_stream_read_change_feed(reg, spark, sf_dir, tmp_path):
    """readChangeFeed=true (round 6): the registered source streams CDF
    rows — inserts derived from blind appends, deletes/updates served
    from cdc files — with _change_type/_commit_version/_commit_timestamp
    columns, checkpointed exactly-once across restarts."""
    events = spark.read.parquet(
        os.path.join(sf_dir, "events.parquet")
    ).select("event_id", "event_type", "value")
    tdir = str(tmp_path / "cdf")
    t = DeltaProtocolTable(spark, tdir)
    t.create(
        events.filter(F.col("event_id") % 4 == 0).limit(100),
        properties={"delta.enableChangeDataFeed": "true"},
    )                                                            # v0
    t.append(events.filter(F.col("event_id") % 4 == 1).limit(80))  # v1
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def drain():
        q = (
            spark.readStream.format("deltaprotocol")
            .options(path=tdir, readChangeFeed="true")
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return spark.read.parquet(out)

    got1 = drain()
    assert set(got1.columns) == set(
        ["event_id", "event_type", "value",
         "_change_type", "_commit_version", "_commit_timestamp"]
    )
    assert got1.count() == 180
    assert set(
        r["_change_type"] for r in got1.select("_change_type").distinct().collect()
    ) == {"insert"}
    # DV delete writes cdc actions; the resumed stream serves them
    t.delete_where(F.col("event_id") % 8 == 0)                   # v2
    got2 = drain()
    dels = got2.filter(F.col("_change_type") == "delete")
    n_del = (
        events.filter(F.col("event_id") % 4 == 0)
        .limit(100)
        .filter(F.col("event_id") % 8 == 0)
        .count()
    )
    assert dels.count() == n_del
    assert set(
        r["_commit_version"]
        for r in dels.select("_commit_version").distinct().collect()
    ) == {2}
    # parity with the batch CDF read over the same range
    batch = t.table_changes(1, 2).select(
        "event_id", "event_type", "value", "_change_type"
    )
    stream_v2 = got2.filter(F.col("_commit_version") == 2).select(
        "event_id", "event_type", "value", "_change_type"
    )
    assert sorted(map(tuple, stream_v2.collect())) == sorted(
        map(tuple, batch.collect())
    )
    # no duplicate rows across the two drains (exactly-once resume)
    assert got2.count() == got2.distinct().count()


def test_stream_cdf_partitioned_table(reg, spark, sf_dir, tmp_path):
    """CDF streaming over a Hive-partitioned table: insert slices
    attach partition literals, cdc files carry the columns in-file —
    both shapes land in one stream with correct values."""
    events = spark.read.parquet(
        os.path.join(sf_dir, "events.parquet")
    ).select("event_id", "event_type", "value")
    tdir = str(tmp_path / "pcdf")
    t = DeltaProtocolTable(spark, tdir)
    t.create(
        events.limit(200),
        partition_by=["event_type"],
        properties={"delta.enableChangeDataFeed": "true"},
    )
    t.delete_where(F.col("event_id") % 4 == 0)  # cdc actions
    q = (
        spark.readStream.format("deltaprotocol")
        .options(path=tdir, readChangeFeed="true")
        .load()
        .writeStream.format("memory")
        .queryName("pcdf")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM pcdf")
    assert got.filter(F.col("event_type").isNull()).count() == 0
    ins = got.filter(F.col("_change_type") == "insert")
    dels = got.filter(F.col("_change_type") == "delete")
    assert ins.count() == 200
    assert dels.count() == events.limit(200).filter(
        F.col("event_id") % 4 == 0
    ).count()
    # partition values correct on BOTH shapes
    expect = sorted(
        (r["event_id"], r["event_type"])
        for r in events.limit(200).collect()
    )
    assert sorted(
        (r["event_id"], r["event_type"]) for r in ins.collect()
    ) == expect


def test_batch_read_change_feed(reg, spark, sf_dir, tmp_path):
    """Batch CDF through the registered source: readChangeFeed=true +
    startingVersion/endingVersion mirror the connector's batch CDF
    options; parity with table_changes over the same range."""
    events = spark.read.parquet(
        os.path.join(sf_dir, "events.parquet")
    ).select("event_id", "event_type", "value")
    tdir = str(tmp_path / "bcdf")
    t = DeltaProtocolTable(spark, tdir)
    t.create(
        events.limit(100),
        properties={"delta.enableChangeDataFeed": "true"},
    )                                                       # v0
    t.append(events.limit(160).subtract(events.limit(100)))  # v1
    t.delete_where(F.col("event_id") % 3 == 0)               # v2
    got = (
        spark.read.format("deltaprotocol")
        .options(path=tdir, readChangeFeed="true", startingVersion="1")
        .load()
        .select("event_id", "event_type", "value",
                "_change_type", "_commit_version")
    )
    want = t.table_changes(0).select(
        "event_id", "event_type", "value",
        "_change_type", "_commit_version",
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )
    # endingVersion bounds the range
    only_v1 = (
        spark.read.format("deltaprotocol")
        .options(
            path=tdir, readChangeFeed="true",
            startingVersion="1", endingVersion="1",
        )
        .load()
    )
    assert set(
        r["_commit_version"]
        for r in only_v1.select("_commit_version").distinct().collect()
    ) == {1}


def test_batch_read_with_row_ids(spark, sf_dir, tmp_path):
    """withRowIds=true: the registered source computes
    _row_id/_row_commit_version executor-side (baseRowId + original
    file index, DV-filtered, materialized columns win) and matches the
    native snapshot_with_row_ids scan exactly."""
    from featureform_spark.sources.delta_protocol import DeltaProtocolTable

    path = str(tmp_path / "rt")
    t = DeltaProtocolTable(spark, path)
    df = spark.range(40).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    t.create(df.limit(25), properties={"delta.enableRowTracking": "true"})
    t.append(df.subtract(df.limit(25)))
    t.delete_where(F.col("k") % 4 == 0)         # DV: ids must hold
    t.merge(
        spark.range(35, 45).select(
            F.col("id").alias("k"), F.lit(-1).cast("long").alias("v")
        ),
        "k",
    )                                            # materialized ids
    got = (
        spark.read.format("deltaprotocol")
        .option("path", path)
        .option("withRowIds", "true")
        .load()
    )
    assert got.columns == ["k", "v", "_row_id", "_row_commit_version"]
    native = t.snapshot_with_row_ids().select(
        "k", "v",
        F.col("_row_id").cast("long").alias("_row_id"),
        F.col("_row_commit_version").cast("long").alias(
            "_row_commit_version"
        ),
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, native.collect())
    )
    # untracked table refuses; CDF combination refuses
    t2 = DeltaProtocolTable(spark, str(tmp_path / "plain"))
    t2.create(df.limit(5))
    with pytest.raises(Exception, match="enableRowTracking"):
        (
            spark.read.format("deltaprotocol")
            .option("path", str(tmp_path / "plain"))
            .option("withRowIds", "true")
            .load()
            .collect()
        )
