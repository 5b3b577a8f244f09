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


def test_prune_keeps_uncovered_and_other_kinds():
    """ADVICE r01: partial row-group stats coverage and non-comparable
    kinds (bool/temporal) must be kept — zone maps are conservative."""
    pdf = pd.DataFrame(
        [
            {"file": "a", "n_rows": 1, "column": "k", "min_val": "0",
             "max_val": "10", "null_count": 0, "kind": "uncovered"},
            {"file": "b", "n_rows": 1, "column": "k", "min_val": "True",
             "max_val": "True", "null_count": 0, "kind": "other"},
            {"file": "c", "n_rows": 1, "column": "k", "min_val": "50",
             "max_val": "60", "null_count": 0, "kind": "numeric"},
        ]
    )
    # range [100, 200]: numeric file c provably excluded; a & b kept
    assert sorted(prune_files(pdf, "k", lo=100, hi=200)) == ["a", "b"]


def test_manifest_bool_column_no_crash(spark, tmp_path):
    """bool stats used to be classified numeric (bool is int) and crash
    float('True'); they must land as non-prunable 'other'."""
    path = str(tmp_path / "boolcol")
    spark.range(0, 100).select(
        F.col("id").alias("k"), (F.col("id") % 2 == 0).alias("flag")
    ).write.parquet(path)
    pdf = build_manifest(spark, path).toPandas()
    flag = pdf[pdf["column"] == "flag"]
    assert (flag["kind"] == "other").all()
    # pruning on the bool column keeps everything (no crash)
    all_files = pdf["file"].unique().tolist()
    assert sorted(prune_files(pdf, "flag", lo=False, hi=True)) == sorted(all_files)


def test_manifest_timestamp_column_kept_conservatively(spark, tmp_path):
    import datetime

    path = str(tmp_path / "tscol")
    spark.sql(
        "SELECT id AS k, timestamp'2024-01-01' + make_interval(0,0,0,CAST(id AS INT)) AS ts "
        "FROM range(0, 100)"
    ).write.parquet(path)
    pdf = build_manifest(spark, path).toPandas()
    ts = pdf[pdf["column"] == "ts"]
    assert len(ts) >= 1
    # temporal stats are 'other' → never pruned on, never compared
    assert set(ts["kind"]) <= {"other", "uncovered"}
    kept = prune_files(pdf, "ts", lo=datetime.datetime(2030, 1, 1))
    assert set(kept) == set(pdf["file"].unique())
