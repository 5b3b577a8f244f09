"""Delta row tracking (PROTOCOL.md §Row Tracking): stable row
identity via add-action baseRowId/defaultRowCommitVersion, the
delta.rowTracking domainMetadata high-water mark, and materialized
row-id columns on every rewrite path (MERGE, OPTIMIZE). The reference
has no row-identity surface at all (its CDF reads are whole-file,
offline_store_spark_runner.py:1076-1136); this is the piece that makes
row-level incremental processing tractable on a 100-TB table."""

import json

import pytest
from pyspark.sql import functions as F

from featureform_spark.sources.delta_protocol import (
    DeltaProtocolTable,
    UnsupportedTableFeatureError,
)


def _mk(spark, path, n=20):
    t = DeltaProtocolTable(spark, path)
    df = spark.range(n).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v")
    )
    t.create(df, properties={"delta.enableRowTracking": "true"})
    return t


def _ids(t):
    pdf = t.snapshot_with_row_ids().toPandas().set_index("k")
    assert pdf["_row_id"].nunique() == len(pdf), "duplicate row ids"
    return pdf


def test_row_ids_stable_across_append_delete_merge_compact(
    spark, tmp_path
):
    t = _mk(spark, str(tmp_path / "t"))
    s1 = _ids(t)
    assert set(s1["_row_id"]) == set(range(20))
    assert (s1["_row_commit_version"] == 0).all()

    t.append(
        spark.range(20, 30).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("v")
        )
    )
    s2 = _ids(t)
    assert (s2.loc[s1.index, "_row_id"] == s1["_row_id"]).all()
    assert set(s2["_row_id"]) == set(range(30))

    # DV delete: data files untouched, surviving ids untouched
    t.delete_where(F.col("k") % 3 == 0)
    s3 = _ids(t)
    assert (s3["_row_id"] == s2.loc[s3.index, "_row_id"]).all()

    # MERGE: survivors (carried AND updated) keep ids, inserts fresh
    src = spark.range(25, 35).select(
        F.col("id").alias("k"), F.lit(-1).alias("v")
    )
    v = t.merge(src, "k")["version"]
    s4 = _ids(t)
    common = s3.index.intersection(s4.index)
    assert (s4.loc[common, "_row_id"] == s3.loc[common, "_row_id"]).all()
    fresh = s4.index.difference(s3.index)
    assert (s4.loc[fresh, "_row_id"] > s2["_row_id"].max()).all()
    # updated row re-versions; carried row keeps its commit version
    updated = [k for k in common if 25 <= k < 35]
    carried = [k for k in common if k < 25]
    assert (s4.loc[updated, "_row_commit_version"] == v).all()
    assert (
        s4.loc[carried, "_row_commit_version"]
        == s3.loc[carried, "_row_commit_version"]
    ).all()

    # OPTIMIZE: identical identity, plain reads unchanged
    t.compact()
    s5 = _ids(t)
    assert (
        s5.sort_index()[["_row_id", "_row_commit_version"]]
        == s4.sort_index()[["_row_id", "_row_commit_version"]]
    ).all().all()
    assert t.snapshot().columns == ["k", "v"]


def test_row_tracking_survives_checkpoint_and_log_clean(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    t.append(
        spark.range(20, 25).select(
            F.col("id").alias("k"), F.lit(0).alias("v")
        )
    )
    before = _ids(t)
    hwm = t.state().row_id_high_water_mark
    assert hwm == 24
    t.checkpoint()
    t.clean_log()
    t2 = DeltaProtocolTable(spark, str(tmp_path / "t"))
    st = t2.state()
    # the high-water mark AND the v7 feature lists survive the fold
    assert st.row_id_high_water_mark == hwm
    assert "rowTracking" in set(st.protocol.get("writerFeatures") or [])
    after = _ids(t2)
    assert (
        after.sort_index()["_row_id"] == before.sort_index()["_row_id"]
    ).all()
    # fresh ids continue past the checkpointed mark
    t2.append(
        spark.range(100, 103).select(
            F.col("id").alias("k"), F.lit(0).alias("v")
        )
    )
    _ids(t2)


def test_concurrent_sessionless_appends_unique_ids(spark, tmp_path):
    """Six append_arrow threads race: the retry path restamps
    baseRowId against the winner's high-water mark, so ids stay
    globally unique."""
    import threading

    path = str(tmp_path / "t")
    t = _mk(spark, path, n=10)
    base = spark.range(10, 70).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v")
    ).toArrow()
    chunks = [base.slice(i * 10, 10) for i in range(6)]
    errs = []

    def put(tbl):
        try:
            DeltaProtocolTable(None, path).append_arrow(tbl)
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    threads = [threading.Thread(target=put, args=(c,)) for c in chunks]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errs
    pdf = _ids(t)  # asserts uniqueness
    assert len(pdf) == 70
    assert t.state().row_id_high_water_mark == 69


def test_cdf_rows_carry_no_materialized_columns(spark, tmp_path):
    t = DeltaProtocolTable(spark, str(tmp_path / "t"))
    df = spark.range(10).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v")
    )
    t.create(
        df,
        properties={
            "delta.enableRowTracking": "true",
            "delta.enableChangeDataFeed": "true",
        },
    )
    t.merge(
        spark.range(5, 15).select(
            F.col("id").alias("k"), F.lit(-1).alias("v")
        ),
        "k",
    )
    ch = t.table_changes(0)
    assert set(ch.columns) == {
        "k", "v", "_change_type", "_commit_version"
    }
    kinds = {r["_change_type"] for r in ch.select("_change_type").collect()}
    assert {"update_preimage", "update_postimage", "insert"} <= kinds


def test_row_tracking_gates(spark, tmp_path):
    # column mapping + row tracking refuses at create
    df = spark.range(5).select(F.col("id").alias("k"))
    with pytest.raises(UnsupportedTableFeatureError, match="column mapping"):
        DeltaProtocolTable(spark, str(tmp_path / "a")).create(
            df,
            properties={
                "delta.enableRowTracking": "true",
                "delta.columnMapping.mode": "name",
            },
        )
    # snapshot_with_row_ids on an untracked table refuses
    t = DeltaProtocolTable(spark, str(tmp_path / "b"))
    t.create(df)
    with pytest.raises(Exception, match="enableRowTracking"):
        t.snapshot_with_row_ids()
    # protocol shape: writer-only features leave the reader bar at 1
    tr = DeltaProtocolTable(spark, str(tmp_path / "c"))
    tr.create(df, properties={"delta.enableRowTracking": "true"})
    proto = tr.state().protocol
    assert proto["minReaderVersion"] == 1
    assert proto["minWriterVersion"] == 7
    assert "readerFeatures" not in proto
    assert {"rowTracking", "domainMetadata"} <= set(
        proto["writerFeatures"]
    )
    # adds carry baseRowId/defaultRowCommitVersion + stats numRecords
    st = tr.state()
    for a in st.adds.values():
        assert a["baseRowId"] >= 0
        assert a["defaultRowCommitVersion"] == 0
        assert json.loads(a["stats"])["numRecords"] > 0
