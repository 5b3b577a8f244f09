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
