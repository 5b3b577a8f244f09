"""Parallelism probe (functions/parallel.py): split estimation from
file sizes and suffix-aware maxPartitionBytes parsing."""

import pytest

from featureform_spark.functions.parallel import (
    _estimated_splits,
    _max_partition_bytes,
    fan_out_if_underparallel,
)


def test_max_partition_bytes_suffixes(spark):
    prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
    df = spark.range(1)
    try:
        for raw, want in (
            ("134217728b", 134217728),
            ("128m", 128 << 20),
            ("1g", 1 << 30),
            ("64k", 64 << 10),
            ("1048576", 1048576),
        ):
            spark.conf.set("spark.sql.files.maxPartitionBytes", raw)
            assert _max_partition_bytes(df) == want, raw
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", prev)


def test_split_estimate_short_circuits_at_cap(monkeypatch):
    """r13 (verdict r12 #4): the probe must not stat-walk a huge file
    list — it stops the moment `cap` splits are counted, and a listing
    with >= cap files never stats anything at all."""
    import featureform_spark.functions.parallel as par

    calls = []

    def counting_getsize(path):
        calls.append(path)
        return 1

    monkeypatch.setattr(par.os.path, "getsize", counting_getsize)

    class FakeDF:
        def __init__(self, files):
            self._files = files

        def inputFiles(self):
            return list(self._files)

        @property
        def sparkSession(self):  # _max_partition_bytes falls back
            raise RuntimeError("no session")

    # 1M-file listing, cap 32: len(files) >= cap, zero stats
    big = FakeDF([f"file:/data/part-{i}.parquet" for i in range(1_000_000)])
    assert par._estimated_splits(big, cap=32) == 32
    assert calls == []

    # 10 files, cap 4: stops after at most 4 stats
    small = FakeDF([f"file:/data/p{i}.parquet" for i in range(10)])
    assert par._estimated_splits(small, cap=4) == 4
    assert len(calls) <= 4

    # no cap: full walk (legacy behaviour for direct callers)
    calls.clear()
    assert par._estimated_splits(small) == 10
    assert len(calls) == 10


def test_no_input_files_fans_out_only_local_relations(
    spark, sf_dir, tmp_path
):
    """r13 (r12 advice): a source with no reported input files is
    fanned out only when it is driver-local data; a non-file DSv2
    relation must NOT get a full round-robin shuffle that caps its
    parallelism at the local core count."""
    import os as _os

    from pyspark.sql import functions as F

    from featureform_spark.functions.parallel import (
        _estimated_splits,
        _is_local_relation,
    )
    from featureform_spark.sources.iceberg_protocol import (
        IcebergProtocolTable,
    )
    from featureform_spark.sources.icebergprotocol_datasource import register

    # driver-local relation: no input files, fan-out preserved
    local = spark.createDataFrame([(1, "a"), (2, "b")], "id long, t string")
    assert _estimated_splits(local) is None
    assert _is_local_relation(local)
    assert fan_out_if_underparallel(local) is not local

    # DSv2 relation: no input files either, but left alone
    register(spark)
    orders = spark.read.parquet(
        _os.path.join(sf_dir, "orders.parquet")
    ).select("o_orderkey", "o_custkey")
    t = IcebergProtocolTable(spark, str(tmp_path / "dsv2"))
    t.create(orders.filter(F.col("o_orderkey") % 7 == 0))
    via_ds = (
        spark.read.format("icebergprotocol")
        .options(path=str(tmp_path / "dsv2"))
        .load()
    )
    assert not _is_local_relation(via_ds)
    assert fan_out_if_underparallel(via_ds) is via_ds


def test_single_large_file_not_refanned(spark, tmp_path):
    """A single file that already splits into >= cores scan tasks must
    NOT be repartitioned (the old file-count probe would full-shuffle
    it and cap parallelism at n_cores)."""
    p = str(tmp_path / "one_file")
    spark.range(200_000).selectExpr(
        "id", "repeat('x', 64) AS pad"
    ).coalesce(1).write.parquet(p)
    df = spark.read.parquet(p)
    prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        spark.conf.set("spark.sql.files.maxPartitionBytes", "16k")
        cores = spark.sparkContext.defaultParallelism
        assert _estimated_splits(df) >= cores
        assert fan_out_if_underparallel(df) is df  # no-op, same object
        spark.conf.set("spark.sql.files.maxPartitionBytes", "1g")
        assert _estimated_splits(df) < cores
        assert fan_out_if_underparallel(df) is not df
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", prev)
