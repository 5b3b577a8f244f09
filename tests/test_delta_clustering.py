"""Clustered tables / liquid clustering (delta_protocol `cluster_by`,
`alter_cluster_by`, clustering-aware OPTIMIZE): the clustering column
list lives in `delta.clustering` domainMetadata, data files carry
`clusteringProvider: "liquid"`, and OPTIMIZE re-clusters on the
CURRENT columns — the re-clusterable layout static partitioning and
one-shot ZORDER lack."""

import json

import pytest
from pyspark.sql import functions as F

from featureform_spark.sources.delta_protocol import (
    DeltaProtocolError,
    DeltaProtocolTable,
)


def _data(spark, n=4000, shift=0):
    return spark.range(n).select(
        ((F.col("id") * 2654435761) % 10000 + shift).alias("a"),
        ((F.col("id") * 40503) % 10000).alias("b"),
        F.col("id").alias("payload"),
    )


def test_create_clustered_shape_and_pruning(spark, tmp_path):
    t = DeltaProtocolTable(spark, str(tmp_path / "t"))
    t.create(
        _data(spark).repartition(8),
        cluster_by=["a", "b"],
        target_rows_per_file=500,
    )
    st = t.state()
    assert st.clustering_columns == ["a", "b"]
    assert "clustering" in st.protocol["writerFeatures"]
    assert all(
        a.get("clusteringProvider") == "liquid" for a in st.adds.values()
    )
    # Morton layout → zone maps prune BOTH dimensions
    for col in ("a", "b"):
        df = t.snapshot_pruned(col, 100, 300)
        assert t._last_prune["files_read"] < t._last_prune["files_total"]
        assert df.count() == _data(spark).filter(
            (F.col(col) >= 100) & (F.col(col) <= 300)
        ).count()


def test_optimize_reclusters_appends(spark, tmp_path):
    t = DeltaProtocolTable(spark, str(tmp_path / "t"))
    t.create(_data(spark, 2000), cluster_by=["a"])
    t.append(_data(spark, 2000, shift=1).repartition(6))  # unclustered
    t.compact(target_rows_per_file=500)
    st = t.state()
    assert all(
        a.get("clusteringProvider") == "liquid" for a in st.adds.values()
    )
    df = t.snapshot_pruned("a", 0, 500)
    assert t._last_prune["files_read"] < t._last_prune["files_total"]
    expect = (
        _data(spark, 2000)
        .unionAll(_data(spark, 2000, shift=1))
        .filter(F.col("a").between(0, 500))
        .count()
    )
    assert df.count() == expect


def test_alter_cluster_by_redirects_optimize(spark, tmp_path):
    t = DeltaProtocolTable(spark, str(tmp_path / "t"))
    t.create(_data(spark), cluster_by=["a"])
    t.alter_cluster_by(["b"])
    assert t.state().clustering_columns == ["b"]
    t.compact(target_rows_per_file=500)
    df = t.snapshot_pruned("b", 100, 300)
    assert t._last_prune["files_read"] < t._last_prune["files_total"]
    assert df.count() == _data(spark).filter(
        F.col("b").between(100, 300)
    ).count()


def test_clustering_refusals(spark, tmp_path):
    t = DeltaProtocolTable(spark, str(tmp_path / "t"))
    with pytest.raises(DeltaProtocolError, match="mutually"):
        t.create(
            _data(spark, 100), partition_by=["a"], cluster_by=["b"]
        )
    with pytest.raises(DeltaProtocolError, match="unknown column"):
        t.create(_data(spark, 100), cluster_by=["nope"])
    t.create(_data(spark, 100), cluster_by=["a"])
    with pytest.raises(DeltaProtocolError, match="not allowed"):
        t.compact(zorder_by=["b"])
    u = DeltaProtocolTable(spark, str(tmp_path / "u"))
    u.create(_data(spark, 100))
    with pytest.raises(DeltaProtocolError, match="not a clustered"):
        u.alter_cluster_by(["a"])


def test_clone_carries_clustering(spark, tmp_path):
    src = DeltaProtocolTable(spark, str(tmp_path / "src"))
    src.create(_data(spark, 1000), cluster_by=["a"])
    clone = src.shallow_clone(str(tmp_path / "clone"))
    assert clone.state().clustering_columns == ["a"]
    clone.alter_cluster_by(["b"])
    clone.compact(target_rows_per_file=250)
    assert clone.state().clustering_columns == ["b"]
    assert src.state().clustering_columns == ["a"]  # source untouched
    # the crc sidecar folded the domain too
    assert clone.validate_checksum() is True


def test_optimize_is_incremental_rewrites_only_appends(spark, tmp_path):
    """The round-8 scale-killer fix: OPTIMIZE on a clustered table
    rewrites ONLY files lacking the current clustering fingerprint —
    an append-then-OPTIMIZE touches none of the already-clustered
    files (at 100 TB the maintenance cost is O(new data))."""
    t = DeltaProtocolTable(spark, str(tmp_path / "t"))
    t.create(_data(spark, 4000), cluster_by=["a"], target_rows_per_file=500)
    seed = set(t.state().adds)
    assert len(seed) >= 8
    t.append(_data(spark, 1000, shift=1).repartition(2))  # unclustered
    appended = set(t.state().adds) - seed
    assert len(appended) == 2
    v = t.compact(target_rows_per_file=500)
    st = t.state()
    assert st.version == v
    # every seed file survived untouched; every appended file is gone
    assert seed <= set(st.adds)
    assert not (appended & set(st.adds))
    # the rewritten files carry the fingerprint
    for rel in set(st.adds) - seed:
        a = st.adds[rel]
        assert a.get("clusteringProvider") == "liquid"
        assert json.loads(a["tags"]["ZCUBE_ZORDER_BY"]) == ["a"]
    # second OPTIMIZE with nothing stale is a no-op: same version
    assert t.compact(target_rows_per_file=500) == v
    assert set(t.state().adds) == set(st.adds)


def test_optimize_full_reclusters_everything(spark, tmp_path):
    t = DeltaProtocolTable(spark, str(tmp_path / "t"))
    t.create(_data(spark, 2000), cluster_by=["a"], target_rows_per_file=500)
    before = set(t.state().adds)
    v = t.compact(target_rows_per_file=1000, full=True)
    st = t.state()
    assert st.version == v
    assert not (before & set(st.adds))  # every file rewritten
    assert t.snapshot().count() == 2000


def test_optimize_binpacks_undersized_clustered_files(spark, tmp_path):
    """Two clustered-but-tiny files (< target/4 rows each) get
    bin-packed; a LONE small file is left alone so repeated OPTIMIZE
    converges instead of rewriting a small table forever."""
    t = DeltaProtocolTable(spark, str(tmp_path / "t"))
    # 8 files of 500 rows, target 500 → each is exactly target-sized
    t.create(_data(spark, 4000), cluster_by=["a"], target_rows_per_file=500)
    n0 = len(t.state().adds)
    # raise the target: now every 500-row file is < 8000/4
    v = t.compact(target_rows_per_file=8000)
    st = t.state()
    assert st.version == v
    assert len(st.adds) == 1  # bin-packed into one
    assert t.snapshot().count() == 4000
    # lone small file: no-op
    assert t.compact(target_rows_per_file=8000) == v


def test_alter_cluster_by_invalidates_fingerprints(spark, tmp_path):
    """alter_cluster_by changes the column list → every file's
    fingerprint mismatches → the next (default) OPTIMIZE re-clusters
    the whole table on the NEW columns without needing full=True."""
    t = DeltaProtocolTable(spark, str(tmp_path / "t"))
    t.create(_data(spark, 4000), cluster_by=["a"], target_rows_per_file=500)
    before = set(t.state().adds)
    t.alter_cluster_by(["b"])
    t.compact(target_rows_per_file=500)
    st = t.state()
    assert not (before & set(st.adds))
    for a in st.adds.values():
        assert json.loads(a["tags"]["ZCUBE_ZORDER_BY"]) == ["b"]
    df = t.snapshot_pruned("b", 100, 300)
    assert t._last_prune["files_read"] < t._last_prune["files_total"]
    assert df.count() == _data(spark).filter(
        F.col("b").between(100, 300)
    ).count()


def test_cluster_fingerprint_survives_checkpoint(spark, tmp_path):
    """The ZCube tag rides the checkpoint add schema — without it,
    every post-checkpoint OPTIMIZE would re-cluster the whole table."""
    t = DeltaProtocolTable(spark, str(tmp_path / "t"))
    t.create(_data(spark, 2000), cluster_by=["a"], target_rows_per_file=500)
    t.checkpoint()
    t.clean_log()
    st = t.state()
    for a in st.adds.values():
        assert a.get("clusteringProvider") == "liquid"
        assert json.loads(a["tags"]["ZCUBE_ZORDER_BY"]) == ["a"]
    seed = set(st.adds)
    t.append(_data(spark, 500, shift=1))
    t.compact(target_rows_per_file=500)
    assert seed <= set(t.state().adds)  # seeds still recognized


def test_optimize_purges_dv_files(spark, tmp_path):
    """A clustered file that picked up a deletion vector is a rewrite
    candidate: OPTIMIZE materializes the deletes and drops the DV."""
    t = DeltaProtocolTable(spark, str(tmp_path / "t"))
    t.create(_data(spark, 4000), cluster_by=["a"], target_rows_per_file=500)
    t.delete_where(F.col("payload") < 100)
    st = t.state()
    dv_files = {p for p, a in st.adds.items() if a.get("deletionVector")}
    clean = set(st.adds) - dv_files
    assert dv_files
    expect = t.snapshot().count()
    t.compact(target_rows_per_file=500)
    st2 = t.state()
    assert clean <= set(st2.adds)          # untouched
    assert not (dv_files & set(st2.adds))  # rewritten
    assert not any(a.get("deletionVector") for a in st2.adds.values())
    assert t.snapshot().count() == expect
