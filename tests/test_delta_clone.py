"""SHALLOW CLONE (delta_protocol.shallow_clone): zero-copy fork whose
version-0 adds reference the source's files by absolute ``file:`` URI
(PROTOCOL.md allows absolute add paths). Covers: read equality at head
and pinned version, log shape (fresh table id, absolute URIs, carried
protocol/config/txns/domains), write isolation in both directions,
CoW DELETE on the clone, DV re-anchoring, vacuum safety, and guards.

Reference parity: delta-io/delta CloneTableCommand semantics (the
reference repo drives clones through vendor delta-spark; this engine
implements the protocol directly)."""

import json
import os

import pytest
from pyspark.sql import functions as F

from featureform_spark.sources.delta_protocol import (
    DeltaProtocolError,
    DeltaProtocolTable,
)


def _orders(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "orders.parquet")).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _commit0_actions(table):
    with open(os.path.join(table.log_path, "0" * 20 + ".json")) as f:
        return [json.loads(line) for line in f if line.strip()]


def test_clone_reads_equal_and_log_shape(spark, sf_dir, tmp_path):
    orders = _orders(spark, sf_dir)
    src = DeltaProtocolTable(spark, str(tmp_path / "src"))
    src.create(
        orders.filter(F.col("o_orderkey") % 2 == 0),
        properties={"delta.appendOnly": "false", "myprop": "v"},
    )
    src.append(orders.filter(F.col("o_orderkey") % 2 == 1))

    clone = src.shallow_clone(str(tmp_path / "clone"))
    assert _rows(clone.snapshot()) == _rows(src.snapshot())

    acts = _commit0_actions(clone)
    ci = [a["commitInfo"] for a in acts if "commitInfo" in a][0]
    assert ci["operation"] == "CLONE"
    md = [a["metaData"] for a in acts if "metaData" in a][0]
    src_md = src.state().metadata
    assert md["id"] != src_md["id"]  # a clone is a NEW table
    assert md["schemaString"] == src_md["schemaString"]
    assert md["configuration"] == src_md["configuration"]
    adds = [a["add"] for a in acts if "add" in a]
    assert adds and all(a["path"].startswith("file:///") for a in adds)
    # no data bytes were copied: the clone dir holds only its log
    files = [
        os.path.join(dp, n)
        for dp, _d, ns in os.walk(str(tmp_path / "clone"))
        for n in ns
    ]
    assert all("_delta_log" in p for p in files)


def test_clone_version_pin(spark, sf_dir, tmp_path):
    orders = _orders(spark, sf_dir)
    src = DeltaProtocolTable(spark, str(tmp_path / "src"))
    src.create(orders.filter(F.col("o_orderkey") % 3 == 0))  # v0
    src.append(orders.filter(F.col("o_orderkey") % 3 == 1))  # v1
    clone = src.shallow_clone(str(tmp_path / "c0"), version=0)
    assert _rows(clone.snapshot()) == _rows(src.snapshot(0))


def test_clone_write_isolation_both_ways(spark, sf_dir, tmp_path):
    orders = _orders(spark, sf_dir)
    src = DeltaProtocolTable(spark, str(tmp_path / "src"))
    src.create(orders.filter(F.col("o_orderkey") <= 1000))
    before = _rows(src.snapshot())
    clone = src.shallow_clone(str(tmp_path / "clone"))

    # append to the clone: lands under the clone dir, source unchanged
    extra = orders.filter(F.col("o_orderkey") > 1000).limit(50)
    clone.append(extra)
    assert clone.snapshot().count() == len(before) + extra.count()
    assert _rows(src.snapshot()) == before
    # the appended file is clone-local (relative path)
    acts = clone._read_commit(1)
    new_adds = [a["add"]["path"] for a in acts if "add" in a]
    assert new_adds and not any(p.startswith("file:") for p in new_adds)

    # append to the SOURCE after cloning: clone pinned, does not see it
    n_clone = clone.snapshot().count()
    src.append(orders.filter(F.col("o_orderkey") > 1000).limit(25))
    assert clone.snapshot().count() == n_clone


def test_clone_cow_delete_keeps_source_files(spark, sf_dir, tmp_path):
    orders = _orders(spark, sf_dir)
    src = DeltaProtocolTable(spark, str(tmp_path / "src"))
    src.create(orders.filter(F.col("o_orderkey") <= 2000))
    src_files = set(src._data_paths(src.state()))
    clone = src.shallow_clone(str(tmp_path / "clone"))

    clone.delete_where(F.col("o_custkey") % 7 == 0)
    expect = _rows(
        src.snapshot().filter(~(F.col("o_custkey") % 7 == 0))
    )
    assert _rows(clone.snapshot()) == expect
    # CoW rewrote referenced files into the CLONE dir; source intact
    assert all(os.path.exists(p) for p in src_files)
    assert _rows(src.snapshot()) == _rows(src.snapshot(0))


def test_clone_vacuum_never_touches_source(spark, sf_dir, tmp_path):
    orders = _orders(spark, sf_dir)
    src = DeltaProtocolTable(spark, str(tmp_path / "src"))
    src.create(orders.limit(500))
    src_files = set(src._data_paths(src.state()))
    clone = src.shallow_clone(str(tmp_path / "clone"))
    # overwrite drops every absolute reference, then vacuum
    clone.overwrite(orders.limit(10))
    clone.vacuum(retain_versions=0)
    assert all(os.path.exists(p) for p in src_files)
    assert _rows(src.snapshot()) == _rows(src.snapshot(0))
    assert clone.snapshot().count() == 10


def test_clone_carries_txns_and_rowtracking_domain(spark, sf_dir, tmp_path):
    orders = _orders(spark, sf_dir)
    src = DeltaProtocolTable(spark, str(tmp_path / "src"))
    src.create(
        orders.limit(200),
        properties={"delta.enableRowTracking": "true"},
    )
    src.append(orders.limit(40), txn=("appA", 7))
    clone = src.shallow_clone(str(tmp_path / "clone"))
    assert clone.txn_version("appA") == 7
    st = clone.state()
    assert st.row_tracking
    # row-id HWM carried: fresh appends continue above the source's
    hwm = st.row_id_high_water_mark
    assert hwm >= 0
    clone.append(orders.limit(5))
    ids = [
        r[0]
        for r in clone.snapshot_with_row_ids().select("_row_id").collect()
    ]
    assert len(ids) == len(set(ids))  # no collision with cloned rows


def test_clone_with_deletion_vectors_reanchors(spark, sf_dir, tmp_path):
    orders = _orders(spark, sf_dir)
    src = DeltaProtocolTable(spark, str(tmp_path / "src"))
    src.create(
        orders.limit(300),
        properties={"delta.enableDeletionVectors": "true"},
    )
    src.delete_where(F.col("o_orderkey") % 5 == 0)
    st = src.state()
    assert any(a.get("deletionVector") for a in st.adds.values()), (
        "precondition: the delete must have produced a DV"
    )
    clone = src.shallow_clone(str(tmp_path / "clone"))
    assert _rows(clone.snapshot()) == _rows(src.snapshot())
    for a in clone.state().adds.values():
        dv = a.get("deletionVector")
        if dv:
            assert dv["storageType"] in ("p", "i")
            if dv["storageType"] == "p":
                assert os.path.isabs(dv["pathOrInlineDv"])


def test_clone_guards(spark, sf_dir, tmp_path):
    orders = _orders(spark, sf_dir)
    src = DeltaProtocolTable(spark, str(tmp_path / "src"))
    src.create(orders.limit(10))
    src.shallow_clone(str(tmp_path / "c"))
    with pytest.raises(DeltaProtocolError, match="already exists"):
        src.shallow_clone(str(tmp_path / "c"))
    with pytest.raises(DeltaProtocolError, match="onto itself"):
        src.shallow_clone(str(tmp_path / "src"))


def test_clone_of_widened_table_and_widen_of_clone(spark, sf_dir, tmp_path):
    """Feature interplay: a clone carries typeWidening (protocol +
    delta.typeChanges history, incl. the byte/short→decimal gate), and
    widening a CLONE is metadata-only on the clone's log — absolute-
    path source files upcast per file like any narrow file."""
    from pyspark.sql import types as T

    src = DeltaProtocolTable(spark, str(tmp_path / "src"))
    src.create(
        spark.range(10).select(
            F.col("id").alias("k"), F.col("id").cast("byte").alias("v")
        )
    )
    src.widen_column("v", "integer")
    clone = src.shallow_clone(str(tmp_path / "c1"))
    st = clone.state()
    assert "typeWidening" in st.protocol["readerFeatures"]
    assert dict(st.schema["v"].metadata)["delta.typeChanges"] == [
        {"fromType": "byte", "toType": "integer"}
    ]
    # the byte-history decimal gate travels with the clone
    from featureform_spark.sources.delta_protocol import (
        UnsupportedTableFeatureError,
    )

    with pytest.raises(UnsupportedTableFeatureError, match="byte/short"):
        clone.widen_column("v", "decimal(12,0)")

    # widening the clone itself: source files (written byte) upcast
    clone.widen_column("v", "long")
    assert clone.snapshot().schema["v"].dataType == T.LongType()
    assert sorted(r["v"] for r in clone.snapshot().collect()) == list(
        range(10)
    )
    # source untouched: still integer
    assert src.state().schema["v"].dataType == T.IntegerType()


def test_clone_uniform_mirror(spark, sf_dir, tmp_path):
    """Review regression: UniForm of a CLONE must resolve the clone's
    absolute file: add paths (shared abs_data_path), not join them
    under the table root — the mirror scans the SOURCE's files."""
    from featureform_spark.sources.iceberg_protocol import (
        IcebergProtocolTable,
    )
    from featureform_spark.sources.uniform import sync_uniform

    orders = _orders(spark, sf_dir)
    src = DeltaProtocolTable(spark, str(tmp_path / "src"))
    src.create(orders.limit(400))
    clone = src.shallow_clone(str(tmp_path / "clone"))
    sync_uniform(spark, str(tmp_path / "clone"))
    ice = IcebergProtocolTable(spark, str(tmp_path / "clone"))
    assert _rows(ice.snapshot()) == _rows(clone.snapshot())


def test_clone_cdf_dv_delete_no_reemission(spark, sf_dir, tmp_path):
    """Review regression: a second DV delete on a CDF+DV clone must
    anti-join the PRIOR deletes through the absolute-path resolver —
    previously-deleted rows must not re-emit as CDC."""
    orders = _orders(spark, sf_dir)
    src = DeltaProtocolTable(spark, str(tmp_path / "src"))
    src.create(
        orders.limit(300),
        properties={
            "delta.enableDeletionVectors": "true",
            "delta.enableChangeDataFeed": "true",
        },
    )
    clone = src.shallow_clone(str(tmp_path / "clone"))
    clone.delete_where(F.col("o_orderkey") % 2 == 0)      # v1
    clone.delete_where(F.col("o_orderkey") % 3 == 0)      # v2
    changes = clone.table_changes(1, 2)  # from-exclusive: v2 only
    emitted = {r["o_orderkey"] for r in changes.collect()}
    # v2 must emit only odd multiples of 3 (evens died in v1)
    expect = {
        r["o_orderkey"]
        for r in src.snapshot()
        .filter(
            (F.col("o_orderkey") % 3 == 0)
            & (F.col("o_orderkey") % 2 != 0)
        )
        .collect()
    }
    assert emitted == expect
