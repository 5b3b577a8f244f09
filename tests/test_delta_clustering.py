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
