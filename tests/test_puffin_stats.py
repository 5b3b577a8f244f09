"""Puffin table statistics: murmur3/theta-sketch correctness, the
Puffin container round-trip, and the Iceberg analyze_table lifecycle
(write → ndv → replace → expire)."""

import os
import struct

import pytest

from featureform_spark.sources.puffin_stats import (
    MAX_THETA,
    THETA_BLOB_TYPE,
    ThetaSketch,
    compute_seed_hash,
    murmur3_x64_128,
    read_puffin,
    write_puffin,
)

_M64 = (1 << 64) - 1


# ----------------------------------------------------------- murmur3


def test_murmur3_empty_seed0_is_zero():
    assert murmur3_x64_128(b"", 0) == (0, 0)


def test_murmur3_known_vector_foo():
    # mmh3's documented hash64('foo') == (-2129773440516405919,
    # 9128664383759220103) — the x64_128 variant's two halves as
    # signed 64-bit ints
    h1, h2 = murmur3_x64_128(b"foo", 0)
    assert h1 == (-2129773440516405919) & _M64
    assert h2 == 9128664383759220103


def test_murmur3_seed_changes_hash():
    assert murmur3_x64_128(b"abc", 0) != murmur3_x64_128(b"abc", 9001)


def test_murmur3_tail_lengths():
    # exercise every tail length 0..16 (block + tail code paths)
    seen = set()
    for n in range(33):
        h = murmur3_x64_128(bytes(range(n)), 9001)
        assert h not in seen
        seen.add(h)


def test_seed_hash_nonzero_and_stable():
    sh = compute_seed_hash(9001)
    assert 0 < sh < (1 << 16)
    assert compute_seed_hash(9001) == sh


# ------------------------------------------------------------- sketch


def test_exact_mode_counts_distinct():
    sk = ThetaSketch(lg_k=12)
    for i in range(1000):
        sk.update(i)
        sk.update(i)  # duplicates are free
    assert sk.is_exact()
    assert sk.estimate() == 1000.0


def test_nulls_and_type_canonicalization():
    sk = ThetaSketch()
    sk.update(None)  # SQL NULL: excluded, like COUNT(DISTINCT)
    assert sk.estimate() == 0.0
    sk.update(1)
    sk.update(True)  # bool(1) canonicalizes to int64(1)
    assert sk.estimate() == 1.0
    sk.update(-0.0)
    sk.update(0.0)  # -0.0 folds into +0.0
    assert sk.estimate() == 2.0
    sk.update("a")
    sk.update(b"a")  # str hashes utf-8 bytes == the raw bytes
    assert sk.estimate() == 3.0


def test_estimation_mode_error_bound():
    sk = ThetaSketch(lg_k=10)  # k=1024, KMV RSE ~3%
    n = 100_000
    for i in range(n):
        sk.update(f"v{i}")
    assert not sk.is_exact()
    assert sk.retained <= 1 << 10
    est = sk.estimate()
    assert abs(est - n) / n < 0.15


def test_serialize_roundtrip_exact():
    sk = ThetaSketch(lg_k=12)
    for i in range(500):
        sk.update(f"x{i}")
    data = sk.serialize()
    # DataSketches compact preamble: serial version 3, family COMPACT=3
    assert data[1] == 3 and data[2] == 3
    flags = data[5]
    assert flags & (1 << 3) and flags & (1 << 4)  # compact|ordered
    assert data[0] == 2  # exact mode: 2 preamble longs, no theta
    back = ThetaSketch.deserialize(data)
    assert back.estimate() == 500.0
    assert back._set == sk._set


def test_serialize_roundtrip_estimation():
    sk = ThetaSketch(lg_k=8)
    for i in range(20_000):
        sk.update(i)
    data = sk.serialize()
    assert data[0] == 3  # estimation mode carries the theta long
    back = ThetaSketch.deserialize(data, lg_k=8)
    assert back.theta == sk.theta < MAX_THETA
    assert back._set == sk._set
    assert back.estimate() == sk.estimate()


def test_serialize_roundtrip_empty():
    data = ThetaSketch().serialize()
    assert len(data) == 8 and data[0] == 1
    assert data[5] & (1 << 2)  # empty flag
    assert ThetaSketch.deserialize(data).estimate() == 0.0


def test_union_equals_single_pass():
    whole = ThetaSketch(lg_k=7)
    parts = [ThetaSketch(lg_k=7) for _ in range(4)]
    for i in range(8_000):
        whole.update(i)
        parts[i % 4].update(i)
    merged = ThetaSketch(lg_k=7)
    for p in parts:
        merged.union(ThetaSketch.deserialize(p.serialize(), lg_k=7))
    # the union must retain exactly the k smallest global hashes —
    # identical to one pass over all the data
    assert merged.theta == whole.theta
    assert merged._set == whole._set


def test_union_seed_mismatch_raises():
    a, b = ThetaSketch(seed=9001), ThetaSketch(seed=1234)
    with pytest.raises(ValueError, match="seed"):
        a.union(b)


def test_deserialize_rejects_wrong_seed_hash():
    sk = ThetaSketch(seed=1234)
    sk.update("x")
    with pytest.raises(ValueError, match="seed hash"):
        ThetaSketch.deserialize(sk.serialize())  # default seed 9001


# -------------------------------------------------------------- puffin


def test_puffin_roundtrip(tmp_path):
    p = str(tmp_path / "x.stats")
    sk = ThetaSketch()
    sk.update_all(["a", "b", "c"])
    metas, footer = write_puffin(
        p,
        [
            {
                "type": THETA_BLOB_TYPE,
                "fields": [1],
                "snapshot-id": 42,
                "sequence-number": 7,
                "properties": {"ndv": "3"},
                "data": sk.serialize(),
            },
            {
                "type": THETA_BLOB_TYPE,
                "fields": [2],
                "snapshot-id": 42,
                "sequence-number": 7,
                "data": b"\x00" * 8,
            },
        ],
        properties={"created-by": "test"},
    )
    assert metas[0]["offset"] == 4  # first blob right after the magic
    assert metas[1]["offset"] == 4 + metas[0]["length"]
    meta, blobs = read_puffin(p)
    assert meta["properties"] == {"created-by": "test"}
    assert [m["fields"] for m, _ in blobs] == [[1], [2]]
    got = ThetaSketch.deserialize(blobs[0][1])
    assert got.estimate() == 3.0
    # footer size covers magic..magic, recorded for planners
    assert footer == os.path.getsize(p) - 4 - metas[0]["length"] - 8


def test_puffin_rejects_corruption(tmp_path):
    p = str(tmp_path / "bad.stats")
    with open(p, "wb") as f:
        f.write(b"NOPE" + b"\x00" * 40)
    with pytest.raises(ValueError, match="not a puffin"):
        read_puffin(p)
    good = str(tmp_path / "good.stats")
    write_puffin(good, [])
    data = open(good, "rb").read()
    # flip the compressed-footer flag: honest unsupported error
    flagged = data[:-8] + struct.pack("<i", 1) + data[-4:]
    bad2 = str(tmp_path / "flag.stats")
    open(bad2, "wb").write(flagged)
    with pytest.raises(ValueError, match="compressed"):
        read_puffin(bad2)


# ------------------------------------------------- iceberg lifecycle


@pytest.fixture()
def stats_table(spark, tmp_path):
    from featureform_spark.sources.iceberg_protocol import (
        IcebergProtocolTable,
    )

    df = spark.createDataFrame(
        [(i, f"seg{i % 5}", float(i % 25)) for i in range(400)],
        "id long, seg string, bal double",
    )
    t = IcebergProtocolTable(spark, str(tmp_path / "t"))
    t.create(df)
    return t


def test_analyze_table_exact_ndv(spark, stats_table):
    t = stats_table
    path = t.analyze_table(lg_k=12)
    assert os.path.exists(path)
    est = t.ndv_estimates()
    assert est == {"id": 400, "seg": 5, "bal": 25}
    assert t.ndv("seg") == 5
    # blob metadata rides in table metadata — zero file reads needed
    md = t.metadata()
    assert len(md["statistics"]) == 1
    entry = md["statistics"][0]
    assert entry["file-footer-size-in-bytes"] > 0
    assert all(
        b["type"] == THETA_BLOB_TYPE for b in entry["blob-metadata"]
    )
    # and the file itself deserializes to the same numbers
    sketches = t.read_statistics_sketches()
    assert sketches["id"].estimate() == 400.0
    assert sketches["seg"].is_exact()


def test_analyze_metadata_table_and_replace(spark, stats_table):
    t = stats_table
    t.analyze_table(columns=["seg"])
    rows = {
        (r["column_name"], r["ndv"])
        for r in t.metadata_table("statistics").collect()
    }
    assert rows == {("seg", 5)}
    # re-analyze the SAME snapshot: entry replaced, not duplicated
    t.analyze_table(columns=["seg", "id"])
    md = t.metadata()
    assert len(md["statistics"]) == 1
    assert t.ndv("id") == 400


def test_analyze_new_snapshot_keeps_old_stats(spark, stats_table):
    t = stats_table
    t.analyze_table(columns=["seg"])
    old_sid = t.current_snapshot(t.metadata())["snapshot-id"]
    extra = spark.createDataFrame(
        [(1000 + i, "segX", 99.0) for i in range(10)],
        "id long, seg string, bal double",
    )
    t.append(extra)
    t.analyze_table(columns=["seg"])
    assert t.ndv("seg") == 6  # new snapshot sees segX
    assert t.ndv("seg", snapshot_id=old_sid) == 5  # history intact
    assert len(t.metadata()["statistics"]) == 2


def test_expire_snapshots_drops_stats_files(spark, stats_table):
    t = stats_table
    t.analyze_table(columns=["seg"])
    first_stats = t.metadata()["statistics"][0]["statistics-path"]
    extra = spark.createDataFrame(
        [(2000, "segY", 1.0)], "id long, seg string, bal double"
    )
    t.append(extra)
    t.analyze_table(columns=["seg"])
    out = t.expire_snapshots(retain_last=1)
    assert out["expired"] == 1
    assert not os.path.exists(first_stats)
    md = t.metadata()
    assert len(md["statistics"]) == 1
    assert t.ndv("seg") == 6  # current snapshot's stats survive


def test_analyze_rejects_unknown_column(stats_table):
    from featureform_spark.sources.iceberg_protocol import (
        IcebergProtocolError,
    )

    with pytest.raises(IcebergProtocolError, match="atomic"):
        stats_table.analyze_table(columns=["nope"])


def test_deserialize_recovers_lg_k():
    sk = ThetaSketch(lg_k=14)
    for i in range(10_000):
        sk.update(i)
    back = ThetaSketch.deserialize(sk.serialize())  # no lg_k passed
    assert back.lg_k == 14 and back.k == 1 << 14
    assert back.is_exact() and back.estimate() == 10_000.0
    # and a union of two recovered exact sketches STAYS exact (the
    # join advisor's intersection path)
    other = ThetaSketch(lg_k=14)
    for i in range(5_000, 15_000):
        other.update(i)
    from featureform_spark.sources.puffin_stats import (
        estimate_intersection,
    )

    assert estimate_intersection(back, ThetaSketch.deserialize(
        other.serialize()
    )) == 5_000.0


def test_deserialize_single_item_compact():
    # DataSketches single-item compact form: preLongs=1, EMPTY clear,
    # one retained hash long — must read as NDV 1, not empty
    one = ThetaSketch()
    one.update("only")
    (h,) = one._set
    blob = struct.pack(
        "<BBBBBBH",
        1, 3, 3, 0, 0,
        (1 << 1) | (1 << 3) | (1 << 4),  # readonly|compact|ordered
        __import__(
            "featureform_spark.sources.puffin_stats",
            fromlist=["compute_seed_hash"],
        ).compute_seed_hash(9001),
    ) + struct.pack("<q", h)
    back = ThetaSketch.deserialize(blob)
    assert back.estimate() == 1.0
    assert back._set == {h}


def test_reanalyze_removes_orphaned_stats_file(spark, stats_table):
    t = stats_table
    first = t.analyze_table(columns=["seg"])
    second = t.analyze_table(columns=["seg", "id"])
    # the replaced entry's puffin file is unreachable — removed
    assert not os.path.exists(first)
    assert os.path.exists(second)
    assert len(t.metadata()["statistics"]) == 1


def test_analyze_nullable_int_column_ndv_exact(spark, tmp_path):
    """Arrow→pandas turns int64-with-null batches into float64 while
    null-free batches stay int64 — without the string-cast projection
    the same value hashes under two encodings and NDV inflates."""
    from featureform_spark.sources.iceberg_protocol import (
        IcebergProtocolTable,
    )

    rows = [(i, i % 50 if i % 7 else None) for i in range(600)]
    df = spark.createDataFrame(rows, "id long, k long").repartition(8)
    t = IcebergProtocolTable(spark, str(tmp_path / "nullable"))
    t.create(df)
    t.analyze_table(columns=["k"])
    # values 0..49 appear with nulls scattered across partitions;
    # NDV must be exactly 50, not inflated by dtype-split hashing
    assert t.ndv("k") == 50


def test_analyze_races_concurrent_append(spark, tmp_path):
    """The CAS retry loop: an append committed AFTER analyze_table
    reads metadata but BEFORE it commits must survive — the statistics
    commit refolds onto fresh metadata instead of clobbering the
    concurrent snapshot (the silent-lost-append hazard the review
    flagged)."""
    from featureform_spark.sources.iceberg_protocol import (
        IcebergProtocolTable,
    )

    t = IcebergProtocolTable(spark, str(tmp_path / "race"))
    t.create(
        spark.createDataFrame(
            [(i, f"s{i % 3}") for i in range(90)], "id long, seg string"
        )
    )
    extra = spark.createDataFrame([(1000, "sX")], "id long, seg string")

    # interleave: let the sketch job finish, then inject an append
    # right before the stats commit by racing a real append during
    # analyze (mapInPandas pass gives a window); run several rounds to
    # actually hit the window
    import threading

    stop = threading.Event()

    def appender():
        while not stop.is_set():
            try:
                t.append(extra)
            except Exception:
                pass

    th = threading.Thread(target=appender, daemon=True)
    th.start()
    try:
        for _ in range(3):
            t.analyze_table(columns=["seg"])
    finally:
        stop.set()
        th.join(timeout=30)
    md = t.metadata()
    # every committed snapshot is still reachable — nothing was
    # clobbered by a stale stats commit
    snaps = md.get("snapshots") or []
    assert len(snaps) >= 2
    assert md.get("statistics")
    # the table still reads consistently (appends all present)
    n = t.snapshot().count()
    assert n >= 91 and (n - 90) == len(snaps) - 1


def test_composite_key_ndv(spark, tmp_path):
    """Composite-key sketches: one blob over a value TUPLE (spec blob
    metadata carries the full field-id list) — the multi-column join
    cardinality input. NULL-containing tuples are skipped, matching
    SQL's multi-argument COUNT(DISTINCT a, b); length-prefixed
    encoding keeps ("ab","c") and ("a","bc") distinct."""
    from featureform_spark.sources.iceberg_protocol import (
        IcebergProtocolTable,
    )

    rows = [(i % 10, f"s{i % 7}", i) for i in range(300)]
    rows.append((None, "sX", 999))  # NULL component: tuple skipped
    rows.extend([("collide", None, 1000), (None, None, 1001)])
    df = spark.createDataFrame(
        [(str(a) if a is not None else None, b, c) for a, b, c in rows],
        "a string, b string, id long",
    )
    t = IcebergProtocolTable(spark, str(tmp_path / "comp"))
    t.create(df)
    t.analyze_table(columns=["a", ("a", "b"), ("a", "b", "id")])
    est = t.ndv_estimates()
    # 10 distinct a (+1 'collide'); 70 distinct (a,b) pairs — nulls out
    assert est["a"] == 11
    assert est[("a", "b")] == 70
    assert t.ndv(("a", "b", "id")) == 300
    # metadata table renders the composite name
    names = {
        r["column_name"]: r["ndv"]
        for r in t.metadata_table("statistics").collect()
    }
    assert names["(a,b)"] == 70 and names["(a,b,id)"] == 300


def test_composite_bytes_injective():
    from featureform_spark.sources.puffin_stats import composite_bytes

    assert composite_bytes(("ab", "c")) != composite_bytes(("a", "bc"))
    assert composite_bytes(("a", None)) is None
    assert composite_bytes((1, "x")) == composite_bytes((1, "x"))
