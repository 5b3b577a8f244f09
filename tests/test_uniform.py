"""Delta UniForm (sources/uniform.py): the Iceberg mirror must read
the exact live rows of the Delta table from the SAME parquet files —
including deletion vectors converted to Iceberg position deletes —
and re-sync incrementally by Delta version."""

import os

import pytest
from pyspark.sql import functions as F

from featureform_spark.sources.delta_protocol import (
    DeltaProtocolTable,
    UnsupportedTableFeatureError,
)
from featureform_spark.sources.iceberg_protocol import IcebergProtocolTable
from featureform_spark.sources.uniform import sync_uniform


def _orders(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "orders.parquet")).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_uniform_mirror_reads_same_rows(spark, sf_dir, tmp_path):
    orders = _orders(spark, sf_dir)
    path = str(tmp_path / "u")
    d = DeltaProtocolTable(spark, path)
    d.create(orders.filter(F.col("o_orderkey") % 3 == 0))
    d.append(orders.filter(F.col("o_orderkey") % 3 == 1))
    snap_id = sync_uniform(spark, path)
    assert snap_id > 0
    ice = IcebergProtocolTable(spark, path)
    assert _rows(ice.snapshot()) == _rows(d.snapshot())
    # no data copied: the iceberg entries point at delta's part files
    n_parquet = sum(
        1
        for n in os.listdir(path)
        if n.endswith(".parquet")
    )
    assert ice.snapshot().count() == d.snapshot().count()
    assert n_parquet == len(d.state().adds)  # nothing rewritten


def test_uniform_converts_deletion_vectors(spark, sf_dir, tmp_path):
    orders = _orders(spark, sf_dir)
    path = str(tmp_path / "dv")
    d = DeltaProtocolTable(spark, path)
    d.create(orders.limit(100))
    d.delete_where(F.col("o_orderkey") % 4 == 0)
    sync_uniform(spark, path)
    ice = IcebergProtocolTable(spark, path)
    assert _rows(ice.snapshot()) == _rows(d.snapshot())
    assert ice.snapshot().filter(F.col("o_orderkey") % 4 == 0).count() == 0


def test_uniform_resync_advances_with_delta(spark, sf_dir, tmp_path):
    orders = _orders(spark, sf_dir)
    path = str(tmp_path / "rs")
    d = DeltaProtocolTable(spark, path)
    d.create(orders.filter(F.col("o_orderkey") % 3 == 0))
    sync_uniform(spark, path)
    assert sync_uniform(spark, path) == -1  # already in sync: no-op
    d.append(orders.filter(F.col("o_orderkey") % 3 == 1))
    d.delete_where(F.col("o_orderkey") % 9 == 0)
    snap2 = sync_uniform(spark, path)
    assert snap2 > 0
    ice = IcebergProtocolTable(spark, path)
    assert _rows(ice.snapshot()) == _rows(d.snapshot())
    # both snapshots remain time-travelable on the iceberg side
    assert len(ice.snapshots(ice.metadata())) == 2
    # delta vacuum must not collect the iceberg mirror's files
    d.vacuum(retain_versions=0)
    assert _rows(ice.snapshot()) == _rows(d.snapshot())


def test_uniform_partitioned_table_identity_spec(spark, sf_dir, tmp_path):
    """Round-6 (verdict r5 #4): Hive-partitioned Delta tables sync with
    an identity partition spec; the iceberg reader reattaches partition
    values from the manifest partition tuples (they are absent from the
    data files), including through DV position deletes and resyncs."""
    events = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).select(
        "event_id", "event_type", "value"
    )
    path = str(tmp_path / "part")
    d = DeltaProtocolTable(spark, path)
    d.create(events.limit(400), partition_by=["event_type"])
    sync_uniform(spark, path)
    ice = IcebergProtocolTable(spark, path)
    md = ice.metadata()
    spec = ice.partition_spec(md)
    assert [f["transform"] for f in spec] == ["identity"]
    assert spec[0]["name"] == "event_type"
    got = ice.snapshot()
    assert _rows(got.select("event_id", "event_type", "value")) == _rows(
        d.snapshot().select("event_id", "event_type", "value")
    )
    assert got.filter(F.col("event_type").isNull()).count() == 0
    # partition-valued rows survive a DV delete + resync
    d.delete_where(F.col("event_id") % 3 == 0)
    sync_uniform(spark, path)
    assert _rows(ice.snapshot().select("event_id", "event_type", "value")) == _rows(
        d.snapshot().select("event_id", "event_type", "value")
    )
    # scan planning can prune by the identity partition value
    one_type = d.snapshot().select("event_type").first()[0]
    planned = ice.scan_planned_eq("event_type", one_type)
    assert _rows(planned.select("event_id", "event_type", "value")) == _rows(
        d.snapshot().filter(F.col("event_type") == one_type)
        .select("event_id", "event_type", "value")
    )
    assert ice._last_prune["files_read"] <= ice._last_prune["files_total"]


def test_uniform_column_mapped_name_mapping(spark, sf_dir, tmp_path):
    """Round-6: column-mapped Delta tables mirror via Iceberg name
    mapping — the data files store PHYSICAL column names; the mirror
    lists them as name-mapping alternates and the reader resolves back
    to the logical schema. With a DV on top."""
    import json as _json

    orders = _orders(spark, sf_dir)
    p2 = str(tmp_path / "cm")
    d = DeltaProtocolTable(spark, p2)
    d.create(
        orders.limit(200), properties={"delta.columnMapping.mode": "name"}
    )
    d.delete_where(F.col("o_orderkey") % 3 == 0)
    sync_uniform(spark, p2)
    ice = IcebergProtocolTable(spark, p2)
    nm = _json.loads(
        ice.metadata()["properties"]["schema.name-mapping.default"]
    )
    assert all(len(e["names"]) == 2 for e in nm)  # logical + physical
    got = ice.snapshot()
    assert got.columns == d.snapshot().columns  # logical names
    assert _rows(got) == _rows(d.snapshot())
    # resync after more DML stays exact
    d.append(
        orders.limit(260).subtract(orders.limit(200))
    )
    sync_uniform(spark, p2)
    assert _rows(ice.snapshot()) == _rows(d.snapshot())


def test_uniform_column_mapped_partitioned(spark, sf_dir, tmp_path):
    """The combined case: column-mapped AND Hive-partitioned — physical
    partition dirs + identity spec + name mapping all compose."""
    events = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).select(
        "event_id", "event_type", "value"
    )
    p3 = str(tmp_path / "cmp")
    d = DeltaProtocolTable(spark, p3)
    d.create(
        events.limit(300),
        partition_by=["event_type"],
        properties={"delta.columnMapping.mode": "name"},
    )
    sync_uniform(spark, p3)
    ice = IcebergProtocolTable(spark, p3)
    got = ice.snapshot().select("event_id", "event_type", "value")
    assert _rows(got) == _rows(
        d.snapshot().select("event_id", "event_type", "value")
    )
    assert got.filter(F.col("event_type").isNull()).count() == 0


def test_identity_patch_join_is_broadcast(spark, sf_dir, tmp_path):
    """Scale check: partition-value reattachment on UniForm mirrors is
    a BROADCAST join on the file path (file-count-scale side input) —
    never a shuffle of the fact scan."""
    events = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).select(
        "event_id", "event_type", "value"
    )
    path = str(tmp_path / "bplan")
    d = DeltaProtocolTable(spark, path)
    d.create(events.limit(200), partition_by=["event_type"])
    sync_uniform(spark, path)
    plan = (
        IcebergProtocolTable(spark, path)
        .snapshot()
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_uniform_v3_references_delta_dv_bytes(spark, sf_dir, tmp_path):
    """iceberg_format_version=3: the mirror's DV entries point at
    Delta's deletion_vector_*.bin blobs IN PLACE (shared framed roaring
    layout — no decode, no conversion file); reads apply them exactly,
    and resyncs keep referencing the newest Delta vectors."""
    import glob
    import json as _json

    orders = _orders(spark, sf_dir)
    path = str(tmp_path / "u3")
    d = DeltaProtocolTable(spark, path)
    d.create(orders.limit(200).repartition(2))
    d.delete_where(F.col("o_orderkey") % 3 == 0)
    sync_uniform(spark, path, iceberg_format_version=3)
    ice = IcebergProtocolTable(spark, path)
    assert ice.metadata()["format-version"] == 3
    # NO conversion parquet was written — the mirror references delta's
    # dv file directly
    assert not glob.glob(os.path.join(path, "metadata", "uniform-delete-*"))
    snap = ice._snapshot_by(None, md=ice.metadata())
    _data, deletes = ice._live_entries(snap)
    assert deletes
    dv_files = {e["data_file"]["file_path"] for e in deletes}
    assert all("deletion_vector_" in p for p in dv_files)
    assert _rows(ice.snapshot()) == _rows(d.snapshot())
    # resync after another delete keeps the zero-conversion path
    d.delete_where(F.col("o_orderkey") % 5 == 0)
    sync_uniform(spark, path)
    assert _rows(ice.snapshot()) == _rows(d.snapshot())
    assert not glob.glob(os.path.join(path, "metadata", "uniform-delete-*"))


def test_partition_value_storage_domain_roundtrip():
    """Property: Delta partitionValues strings -> Iceberg storage
    domain (_typed_partition_value) -> the reader's cast-string
    (_as_cast_str equivalent) recovers the original value for every
    supported type — dates ride as epoch days, timestamps as micros."""
    import datetime

    from hypothesis import given, settings, strategies as st_

    from featureform_spark.sources.uniform import _typed_partition_value

    def _reader_str(v, ice_type):
        # mirror of iceberg_protocol._identity_patch._as_cast_str
        if v is None:
            return None
        if ice_type == "date":
            return (
                datetime.date(1970, 1, 1) + datetime.timedelta(days=int(v))
            ).isoformat()
        if ice_type.startswith("timestamp"):
            return (
                datetime.datetime(1970, 1, 1)
                + datetime.timedelta(microseconds=int(v))
            ).strftime("%Y-%m-%d %H:%M:%S.%f")
        return str(v)

    @settings(max_examples=200, deadline=None)
    @given(
        st_.one_of(
            st_.integers(min_value=-(2**62), max_value=2**62).map(
                lambda i: ("long", str(i), str(i))
            ),
            st_.booleans().map(
                lambda b: ("boolean", str(b).lower(), str(b))
            ),
            st_.dates(
                min_value=datetime.date(1, 1, 1),
                max_value=datetime.date(9999, 12, 31),
            ).map(lambda d: ("date", d.isoformat(), d.isoformat())),
            st_.datetimes(
                min_value=datetime.datetime(1970, 1, 1),
                max_value=datetime.datetime(9999, 12, 30),
            ).map(
                lambda t: (
                    "timestamp",
                    t.isoformat(sep=" "),
                    t.strftime("%Y-%m-%d %H:%M:%S.%f"),
                )
            ),
            st_.text(min_size=0, max_size=40).map(
                lambda s: ("string", s, s)
            ),
        )
    )
    def check(case):
        ice_type, raw, expect = case
        stored = _typed_partition_value(raw, ice_type)
        back = _reader_str(stored, ice_type)
        if ice_type == "date":
            assert back == expect
        elif ice_type == "timestamp":
            assert back == expect
        elif ice_type == "boolean":
            assert back.lower() == expect.lower()
        else:
            assert back == expect
        assert _typed_partition_value(None, ice_type) is None

    check()


def test_mirror_expiry_never_deletes_delta_files(spark, sf_dir, tmp_path):
    """expire_snapshots on a UniForm mirror must not touch the DATA
    plane — Delta's log may still reference files only old mirror
    snapshots point at (VACUUM is the authority there); only the
    mirror's own metadata artifacts are collected."""
    orders = _orders(spark, sf_dir)
    path = str(tmp_path / "mexp")
    d = DeltaProtocolTable(spark, path)
    d.create(orders.limit(100))
    sync_uniform(spark, path, iceberg_format_version=3)
    d.delete_where(F.col("o_orderkey") % 2 == 0)
    sync_uniform(spark, path)      # mirror snapshot 2
    d.overwrite(orders.limit(40))  # delta forgets the old files...
    sync_uniform(spark, path)      # ...mirror snapshot 3
    ice = IcebergProtocolTable(spark, path)
    ice.expire_snapshots(retain_last=1)
    # delta time travel across ALL prior versions still reads (no data
    # or DV file was deleted by the mirror's expiry)
    assert d.snapshot(version=0).count() == 100
    assert d.snapshot(version=1).count() == 50
    assert _rows(ice.snapshot()) == _rows(d.snapshot())


def test_remove_orphan_files_uniform_guard(spark, sf_dir, tmp_path):
    """remove_orphan_files on a UniForm mirror must not touch the
    Delta side's artifacts (ADVICE r6): _delta_log commits,
    _last_checkpoint, checkpoint parquets, CDC files and DV blobs are
    invisible to the Iceberg keep set — an unrestricted walk would
    destroy the owning Delta table. On a mirror, only files under the
    mirror's own metadata/ prefix are eligible."""
    orders = _orders(spark, sf_dir)
    path = str(tmp_path / "og")
    d = DeltaProtocolTable(spark, path)
    d.create(
        orders.limit(100),
        properties={"delta.enableChangeDataFeed": "true"},
    )
    d.delete_where(F.col("o_orderkey") % 4 == 0)  # DV blob + CDC file
    d.checkpoint()  # checkpoint parquet + _last_checkpoint
    before = _rows(d.snapshot())
    sync_uniform(spark, path)
    ice = IcebergProtocolTable(spark, path)
    # a stray file inside the mirror's own metadata dir IS collected
    stray = os.path.join(path, "metadata", "stray.avro")
    with open(stray, "wb") as f:
        f.write(b"junk")
    res = ice.remove_orphan_files(older_than_ms=2**60)
    assert res["deleted"] >= 1
    assert not os.path.exists(stray)
    # the delta table is unharmed: log, checkpoint, CDC, DV all intact
    assert os.path.isdir(os.path.join(path, "_delta_log"))
    assert os.path.exists(
        os.path.join(path, "_delta_log", "_last_checkpoint")
    )
    d2 = DeltaProtocolTable(spark, path)
    assert _rows(d2.snapshot()) == before
    assert _rows(d2.table_changes(0, d2.version())) != []
    # the mirror still reads too
    assert _rows(ice.snapshot()) == before
