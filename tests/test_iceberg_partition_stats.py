"""Partition statistics files (iceberg_protocol
compute_partition_statistics / partition_statistics; spec §Partition
Statistics): one row per (unified partition tuple, spec_id) with data
record/file counts, byte totals, and delete-file counts — written as
parquet from a driver-side manifest fold (no data reads) and
registered under the metadata's ``partition-statistics`` list."""

import os

import pytest
from pyspark.sql import functions as F

from featureform_spark.sources.iceberg_protocol import (
    IcebergProtocolError,
    IcebergProtocolTable,
)


def _orders(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "orders.parquet")).select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )


def test_partition_stats_match_groupby(spark, sf_dir, tmp_path):
    orders = _orders(spark, sf_dir)
    t = IcebergProtocolTable(spark, str(tmp_path / "t"))
    t.create(orders, partition_by=["o_orderstatus"])
    t.append(orders.filter(F.col("o_orderkey") % 3 == 0))
    path = t.compute_partition_statistics()
    assert os.path.exists(path)
    stats = t.partition_statistics()
    got = {
        r["o_orderstatus"]: (r["data_record_count"], r["data_file_count"])
        for r in stats.select(
            "partition.o_orderstatus", "data_record_count",
            "data_file_count",
        ).collect()
    }
    want = {
        r["o_orderstatus"]: r["n"]
        for r in orders.unionAll(orders.filter(F.col("o_orderkey") % 3 == 0))
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert {k: v[0] for k, v in got.items()} == want
    assert all(v[1] >= 2 for v in got.values())  # two appends => >=2 files
    # registered in table metadata with the file size
    md = t.metadata()
    entry = md["partition-statistics"][-1]
    assert entry["snapshot-id"] == t.current_snapshot(md)["snapshot-id"]
    assert entry["file-size-in-bytes"] == os.path.getsize(path)


def test_partition_stats_count_delete_files(spark, sf_dir, tmp_path):
    orders = _orders(spark, sf_dir)
    t = IcebergProtocolTable(spark, str(tmp_path / "t"))
    t.create(orders, partition_by=["o_orderstatus"])
    t.delete_rows(F.col("o_orderkey") % 5 == 0)  # position deletes
    t.compute_partition_statistics()
    stats = t.partition_statistics()
    row = stats.agg(
        F.sum("position_delete_record_count").alias("pr"),
        F.sum("position_delete_file_count").alias("pf"),
    ).first()
    deleted = orders.filter(F.col("o_orderkey") % 5 == 0).count()
    assert row["pr"] == deleted
    assert row["pf"] >= 1
    # data counts are pre-delete (merge-on-read: files unchanged)
    assert stats.agg(F.sum("data_record_count")).first()[0] == orders.count()


def test_partition_stats_per_snapshot_and_refusals(spark, sf_dir, tmp_path):
    orders = _orders(spark, sf_dir)
    t = IcebergProtocolTable(spark, str(tmp_path / "t"))
    t.create(orders.limit(100), partition_by=["o_orderstatus"])
    md = t.metadata()
    first_sid = t.current_snapshot(md)["snapshot-id"]
    with pytest.raises(IcebergProtocolError, match="no partition stat"):
        t.partition_statistics()
    t.compute_partition_statistics()
    t.append(orders.limit(40))
    # the registered stats belong to the FIRST snapshot
    with pytest.raises(IcebergProtocolError, match="no partition stat"):
        t.partition_statistics()  # current snapshot has none yet
    old = t.partition_statistics(snapshot_id=first_sid)
    assert old.agg(F.sum("data_record_count")).first()[0] == 100
    t.compute_partition_statistics()
    assert (
        t.partition_statistics().agg(F.sum("data_record_count")).first()[0]
        == 140
    )
    # unpartitioned refusal
    u = IcebergProtocolTable(spark, str(tmp_path / "u"))
    u.create(orders.limit(10))
    with pytest.raises(IcebergProtocolError, match="unpartitioned"):
        u.compute_partition_statistics()


def test_partitions_metadata_table(spark, sf_dir, tmp_path):
    """metadata_table('partitions') serves the same fold live: counts
    equal the persisted stats file and a plain groupBy of the data."""
    orders = _orders(spark, sf_dir)
    t = IcebergProtocolTable(spark, str(tmp_path / "t"))
    t.create(orders, partition_by=["o_orderstatus"])
    t.delete_rows(F.col("o_orderkey") % 4 == 0)
    live = {
        r["partition"]: (
            r["record_count"],
            r["position_delete_record_count"],
        )
        for r in t.metadata_table("partitions").collect()
    }
    import json as _j

    want = {
        _j.dumps({"o_orderstatus": r["o_orderstatus"]}, sort_keys=True): r["n"]
        for r in orders.groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    # global (partition-unscoped) delete files aggregate under the
    # all-null tuple with zero data records — compare data rows only
    assert {k: v[0] for k, v in live.items() if v[0] > 0} == want
    assert sum(v[1] for v in live.values()) == orders.filter(
        F.col("o_orderkey") % 4 == 0
    ).count()
    # unpartitioned → empty relation, stable schema
    u = IcebergProtocolTable(spark, str(tmp_path / "u"))
    u.create(orders.limit(5))
    assert u.metadata_table("partitions").count() == 0


def test_partition_stats_after_spec_evolution(spark, sf_dir, tmp_path):
    """Review regression: the unified tuple has a field no live file
    carries (all-None) after spec evolution — the stats file must
    still write and read back (null-typed arrow columns anchor as
    string)."""
    orders = _orders(spark, sf_dir)
    t = IcebergProtocolTable(spark, str(tmp_path / "t"))
    t.create(orders.limit(200), partition_by=["o_orderstatus"])
    t.update_spec(["o_orderstatus", "o_custkey"])  # new field, no data yet
    t.compute_partition_statistics()
    stats = t.partition_statistics()
    rows = stats.select(
        "partition.o_orderstatus", "partition.o_custkey",
        "data_record_count",
    ).collect()
    assert sum(r["data_record_count"] for r in rows) == 200
    assert all(r["o_custkey"] is None for r in rows)
