"""Adversarial-log hardening for delta_protocol + avro_codec fuzz.

Round-3 verdict #8: every malformed-input path must end in a clean
error or a provably-correct fold — never silently wrong rows.
"""

import json
import os

import pytest
from pyspark.sql import functions as F

from featureform_spark.sources.avro_codec import (
    AvroError,
    read_container,
    write_container,
)
from featureform_spark.sources.delta_protocol import (
    DeltaProtocolError,
    DeltaProtocolTable,
)


def _orders(spark, sf_dir):
    from featureform_spark.sources.testdata import load_table

    return load_table(spark, sf_dir, "orders")


# ------------------------------------------------------- delta log corpus


def test_duplicate_add_same_path_folds_once(spark, sf_dir, tmp_path):
    """Re-adding an already-live path (what a real engine emits for
    in-place stats refresh) must not duplicate rows: last add wins."""
    orders = _orders(spark, sf_dir)
    t = DeltaProtocolTable(spark, str(tmp_path / "a"))
    t.create(orders.limit(10))
    st = t.state()
    path, add = next(iter(st.adds.items()))
    t._commit(1, [{"add": dict(add)}], "WRITE")
    assert t.snapshot().count() == 10


def test_remove_of_unknown_path_is_noop(spark, sf_dir, tmp_path):
    orders = _orders(spark, sf_dir)
    t = DeltaProtocolTable(spark, str(tmp_path / "b"))
    t.create(orders.limit(10))
    t._commit(
        1,
        [{"remove": {"path": "ghost.parquet", "deletionTimestamp": 0,
                     "dataChange": True}}],
        "DELETE",
    )
    assert t.snapshot().count() == 10


def test_version_gap_raises_not_partial_state(spark, sf_dir, tmp_path):
    """A missing middle commit (vacuumed without a covering checkpoint)
    must refuse — folding around the hole could resurrect removed
    files."""
    orders = _orders(spark, sf_dir)
    t = DeltaProtocolTable(spark, str(tmp_path / "c"))
    t.create(orders.limit(10))
    t.append(orders.limit(5))
    t.append(orders.limit(5))
    os.remove(os.path.join(t.log_path, "%020d.json" % 1))
    with pytest.raises(DeltaProtocolError, match="missing commits"):
        t.snapshot()


def test_time_travel_below_checkpoint_horizon_raises(
    spark, sf_dir, tmp_path
):
    """After clean_log(), versions below the checkpoint are gone;
    VERSION AS OF one of them must error, not return the checkpoint
    fold (which would be a different table state)."""
    orders = _orders(spark, sf_dir)
    t = DeltaProtocolTable(spark, str(tmp_path / "d"))
    t.create(orders.limit(10))       # v0
    t.overwrite(orders.limit(3))     # v1
    t.checkpoint()                   # checkpoint @1
    t.clean_log()
    assert t.snapshot(1).count() == 3   # checkpoint exactly covers v1
    with pytest.raises(DeltaProtocolError):
        t.snapshot(0)                   # pre-checkpoint state is gone


def test_missing_stats_reads_file_instead_of_skipping(
    spark, sf_dir, tmp_path
):
    """A file without stats must be READ by the pruning scan (unknown
    range ⇒ cannot skip), never dropped."""
    orders = _orders(spark, sf_dir).select("o_orderkey", "o_totalprice")
    t = DeltaProtocolTable(spark, str(tmp_path / "e"))
    t.create(orders.limit(50))
    # strip stats from every add via a doctored commit
    st = t.state()
    actions = []
    now = 0
    for p, add in st.adds.items():
        actions.append({"remove": {"path": p, "deletionTimestamp": now,
                                   "dataChange": False}})
        add2 = dict(add)
        add2.pop("stats", None)
        actions.append({"add": add2})
    t._commit(1, actions, "OPTIMIZE")
    got = t.snapshot_pruned("o_orderkey", lo=-10**9, hi=10**9)
    assert got.count() == 50
    assert t._last_prune["files_read"] == t._last_prune["files_total"]


def test_corrupt_commit_json_raises(spark, sf_dir, tmp_path):
    orders = _orders(spark, sf_dir)
    t = DeltaProtocolTable(spark, str(tmp_path / "f"))
    t.create(orders.limit(5))
    with open(os.path.join(t.log_path, "%020d.json" % 1), "w") as f:
        f.write('{"add": {"path": tru\n')
    with pytest.raises(Exception):
        t.snapshot()


def test_stale_last_checkpoint_pointer_is_harmless(
    spark, sf_dir, tmp_path
):
    """_last_checkpoint lying about a vacuumed checkpoint must not
    break reads — state folds from the real directory listing."""
    orders = _orders(spark, sf_dir)
    t = DeltaProtocolTable(spark, str(tmp_path / "g"))
    t.create(orders.limit(10))
    with open(os.path.join(t.log_path, "_last_checkpoint"), "w") as f:
        json.dump({"version": 99, "size": 1}, f)
    assert t.snapshot().count() == 10


# ------------------------------------------------------------ avro fuzz


def _sample_container(tmp_path, codec="deflate"):
    schema = {
        "type": "record",
        "name": "rec",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "s", "type": ["null", "string"]},
            {"name": "xs", "type": {"type": "array", "items": "double"}},
        ],
    }
    records = [
        {"id": i, "s": None if i % 3 == 0 else f"v{i}", "xs": [i * 0.5, -i * 1.5]}
        for i in range(200)
    ]
    path = str(tmp_path / f"fuzz_{codec}.avro")
    write_container(path, schema, records, codec=codec)
    return path, records


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_truncation_never_returns_silently(tmp_path, codec):
    """Truncating the container at ANY prefix length either raises or
    (only when the cut lands exactly at a block boundary) returns a
    strict prefix of the records — never altered values."""
    path, records = _sample_container(tmp_path, codec)
    data = open(path, "rb").read()
    n = len(data)
    # every byte for the header region, then a stride through the body
    cuts = list(range(1, min(64, n))) + list(range(64, n, 97))
    for cut in cuts:
        with open(path, "wb") as f:
            f.write(data[:cut])
        try:
            _, got = read_container(path)
        except (AvroError, Exception):
            continue
        assert got == records[: len(got)], f"silent corruption at cut={cut}"


def test_sync_marker_corruption_raises(tmp_path):
    path, _ = _sample_container(tmp_path)
    data = bytearray(open(path, "rb").read())
    data[-1] ^= 0xFF  # trailing sync marker byte
    with open(path, "wb") as f:
        f.write(bytes(data))
    with pytest.raises(AvroError, match="sync"):
        read_container(path)


def test_unknown_codec_raises(tmp_path):
    path, _ = _sample_container(tmp_path)
    # rewrite header metadata with a bogus codec by re-writing the file
    # via the public API, then binary-patching the codec string
    data = open(path, "rb").read().replace(b"deflate", b"zstd\x00\x00\x00")
    with open(path, "wb") as f:
        f.write(data)
    with pytest.raises(AvroError):
        read_container(path)


def test_timestamp_as_of_and_optimize(spark, sf_dir, tmp_path):
    import time as _time

    orders = _orders(spark, sf_dir).select("o_orderkey", "o_totalprice")
    t = DeltaProtocolTable(spark, str(tmp_path / "ts"))
    t.create(orders.limit(100))
    _time.sleep(0.05)
    mid = int(_time.time() * 1000)
    _time.sleep(0.05)
    t.append(orders.limit(50))
    assert t.version_at_timestamp(mid) == 0
    assert t.snapshot(t.version_at_timestamp(mid)).count() == 100
    import pytest as _p

    with _p.raises(DeltaProtocolError):
        t.version_at_timestamp(0)

    # OPTIMIZE: fewer files, identical rows, dataChange=false actions
    before = t.snapshot().count()
    n_files_before = len(t.state().adds)
    v = t.compact()
    st = t.state()
    assert t.snapshot().count() == before
    assert len(st.adds) <= n_files_before
    acts = t._read_commit(v)
    changed = [
        a for a in acts
        if ("add" in a and a["add"]["dataChange"])
        or ("remove" in a and a["remove"]["dataChange"])
    ]
    assert changed == []


def test_iceberg_snapshot_as_of_timestamp(spark, sf_dir, tmp_path):
    import time as _time

    from featureform_spark.sources.iceberg_protocol import (
        IcebergProtocolError,
        IcebergProtocolTable,
    )

    orders = _orders(spark, sf_dir).select("o_orderkey")
    t = IcebergProtocolTable(spark, str(tmp_path / "its"))
    t.create(orders.limit(80))
    _time.sleep(0.05)
    mid = int(_time.time() * 1000)
    _time.sleep(0.05)
    t.append(orders.limit(20))
    assert t.snapshot_as_of_timestamp(mid).count() == 80
    assert t.snapshot_as_of_timestamp(
        int(_time.time() * 1000)
    ).count() == 100
    import pytest as _p

    with _p.raises(IcebergProtocolError):
        t.snapshot_as_of_timestamp(0)


def test_delta_vacuum_unreferenced_files(spark, sf_dir, tmp_path):
    orders = _orders(spark, sf_dir).select("o_orderkey", "o_totalprice")
    t = DeltaProtocolTable(spark, str(tmp_path / "v"))
    t.create(orders.limit(100))            # v0 files
    t.overwrite(orders.limit(40))          # v1: v0 files unreferenced
    n_before = sum(
        1 for _d, _s, fs in os.walk(tmp_path / "v")
        for f in fs if f.endswith(".parquet") and "_delta_log" not in _d
    )
    out = t.vacuum(retain_versions=0)
    assert out["deleted"] > 0
    assert t.snapshot().count() == 40      # current state intact
    n_after = sum(
        1 for _d, _s, fs in os.walk(tmp_path / "v")
        for f in fs if f.endswith(".parquet") and "_delta_log" not in _d
    )
    assert n_after == n_before - out["deleted"]


def test_iceberg_expire_snapshots(spark, sf_dir, tmp_path):
    from featureform_spark.sources.iceberg_protocol import (
        IcebergProtocolError,
        IcebergProtocolTable,
    )

    orders = _orders(spark, sf_dir).select("o_orderkey")
    t = IcebergProtocolTable(spark, str(tmp_path / "ex"))
    s0 = t.create(orders.limit(100))
    t.overwrite(orders.limit(30))
    out = t.expire_snapshots(retain_last=1)
    assert out["expired"] == 1 and out["files_deleted"] > 0
    assert t.snapshot().count() == 30
    import pytest as _p

    with _p.raises(IcebergProtocolError):
        t.snapshot(snapshot_id=s0)   # expired: time travel refuses


def test_delta_restore(spark, sf_dir, tmp_path):
    orders = _orders(spark, sf_dir).select("o_orderkey", "o_totalprice")
    t = DeltaProtocolTable(spark, str(tmp_path / "rs"))
    t.create(orders.limit(100))          # v0
    t.overwrite(orders.limit(30))        # v1
    v = t.restore(0)                     # v2 == v0 state
    assert t.snapshot().count() == 100
    assert t.snapshot(1).count() == 30   # pre-restore state preserved
    assert v == 2
    # restore to a vacuumed version refuses instead of breaking reads
    t.overwrite(orders.limit(10))        # v3
    t.vacuum(retain_versions=0)          # v0/v1 files gone
    with pytest.raises(DeltaProtocolError, match="vacuumed"):
        t.restore(1)


def test_iceberg_refs(spark, sf_dir, tmp_path):
    from featureform_spark.sources.iceberg_protocol import (
        IcebergProtocolError,
        IcebergProtocolTable,
    )

    orders = _orders(spark, sf_dir).select("o_orderkey")
    t = IcebergProtocolTable(spark, str(tmp_path / "rf"))
    t.create(orders.limit(100))
    t.create_ref("v1.0", kind="tag")
    t.overwrite(orders.limit(25))
    assert t.snapshot().count() == 25
    assert t.snapshot_ref("v1.0").count() == 100   # tag pins old state
    md = t.metadata()
    assert md["refs"]["v1.0"]["type"] == "tag"
    import pytest as _p

    with _p.raises(IcebergProtocolError):
        t.snapshot_ref("nope")
