"""Zone-map manifest: distributed footer stats, file pruning, and
pruned-read equivalence against a full scan + filter."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from featureform_spark.sources.manifest import (
    build_manifest,
    prune_files,
    read_pruned,
)


@pytest.fixture(scope="module")
def laid_out(spark, tmp_path_factory):
    """Events written value-sorted into 8 files → tight per-file ranges."""
    path = str(tmp_path_factory.mktemp("zonemap") / "events")
    df = spark.range(0, 8000).select(
        F.col("id").alias("k"),
        (F.col("id") % 977).cast("double").alias("v"),
    )
    df.repartitionByRange(8, "k").sortWithinPartitions("k").write.parquet(path)
    return path


def test_manifest_covers_all_files_and_rows(spark, laid_out):
    pdf = build_manifest(spark, laid_out).toPandas()
    k = pdf[pdf["column"] == "k"]
    assert len(k) == 8
    assert k["n_rows"].sum() == 8000
    assert float(k["min_val"].astype(float).min()) == 0.0
    assert float(k["max_val"].astype(float).max()) == 7999.0
    assert (k["null_count"] == 0).all()


def test_prune_skips_nonintersecting_files(spark, laid_out):
    pdf = build_manifest(spark, laid_out).toPandas()
    kept = prune_files(pdf, "k", lo=100, hi=300)
    assert 1 <= len(kept) < 8  # a narrow range must not keep every file

    # unknown column → conservatively keep everything
    assert len(prune_files(pdf, "nope", lo=0, hi=1)) == 8


def test_read_pruned_equals_full_scan_filter(spark, laid_out):
    pruned = read_pruned(spark, laid_out, "k", lo=2500, hi=2600)
    full = spark.read.parquet(laid_out).filter(
        (F.col("k") >= 2500) & (F.col("k") <= 2600)
    )
    got = sorted(r["k"] for r in pruned.collect())
    want = sorted(r["k"] for r in full.collect())
    assert got == want == list(range(2500, 2601))
    # and it actually reads fewer files than the directory holds
    n_input = pruned.select(F.input_file_name()).distinct().count()
    assert n_input < 8


def test_read_pruned_empty_range(spark, laid_out):
    assert read_pruned(spark, laid_out, "k", lo=10**9).count() == 0


def test_prune_files_string_stats():
    pdf = pd.DataFrame(
        [
            {"file": "a", "n_rows": 1, "column": "s", "min_val": "apple",
             "max_val": "mango", "null_count": 0, "kind": "string"},
            {"file": "b", "n_rows": 1, "column": "s", "min_val": "peach",
             "max_val": "zebra", "null_count": 0, "kind": "string"},
        ]
    )
    assert prune_files(pdf, "s", lo="banana", hi="cherry") == ["a"]
    assert sorted(prune_files(pdf, "s", lo="m")) == ["a", "b"]
