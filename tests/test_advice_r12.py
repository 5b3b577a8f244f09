"""Round-12 ADVICE regressions.

1. drift.histogram_compare: NaN must not poison the bin edges (Spark
   min/max order NaN as the largest double) and NaN values must count
   as drift (the -1 bin), never silently misbin.
2. pii: NULL text counts 0 matches per type (size(NULL) is -1 under
   spark.sql.legacy.sizeOfNull), and pii_report sums are undeflated.
3. EmbeddingStore.stored_rows: the pre-first-ingest flag() must use
   the batch's real id type, not a hardcoded long (same for
   SignatureStore.stored_buckets).
4. iceberg append(): a non-conflict failure in the follow-on manifest
   merge surfaces as AppendCommittedMaintenanceError carrying the
   durably-committed snapshot id, so retry-on-error callers cannot
   double-append.
"""

import math

import pytest
from pyspark.sql import functions as F

from featureform_spark.functions.drift import drift_report, histogram_compare
from featureform_spark.functions.pii import pii_report, pii_scan


# ------------------------------------------------ 1. drift NaN handling


def test_histogram_compare_nan_in_reference_keeps_edges(spark):
    nan = float("nan")
    ref = spark.createDataFrame(
        [(0.0,), (5.0,), (10.0,), (nan,)], "x double"
    )
    cur = spark.createDataFrame([(0.0,), (10.0,), (nan,), (nan,)], "x double")
    rows = {
        (r["bin"],): (r["ref_count"], r["cur_count"])
        for r in histogram_compare(ref, cur, ["x"], bins=2).collect()
    }
    # edges are [0, 10] from the finite values (width 5): 0.0 -> bin 0,
    # 5.0 -> bin 1 (edge), 10.0 -> bin 1 (clamped); NaN -> -1, NOT bin 0
    assert rows[(-1,)] == (1, 2)
    assert rows[(0,)] == (1, 1)
    assert rows[(1,)] == (2, 1)


def test_histogram_compare_nan_current_counts_as_drift(spark):
    ref = spark.createDataFrame([(float(i),) for i in range(10)], "x double")
    cur = spark.createDataFrame(
        [(float("nan"),)] * 8 + [(1.0,), (2.0,)], "x double"
    )
    psi = drift_report(ref, cur, ["x"], bins=5)["x"]
    assert math.isfinite(psi) and psi > 0.25  # 80% NaN must scream


def test_histogram_compare_all_nan_reference_raises(spark):
    ref = spark.createDataFrame(
        [(float("nan"),), (None,)], "x double"
    )
    cur = spark.createDataFrame([(1.0,)], "x double")
    with pytest.raises(ValueError, match="non-NaN"):
        histogram_compare(ref, cur, ["x"])


# --------------------------------------------------- 2. pii NULL text


def test_pii_scan_null_text_counts_zero(spark):
    df = spark.createDataFrame(
        [(1, "mail me: a@b.com"), (2, None)], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in pii_scan(df).collect()}
    assert out[2]["n_email"] == 0  # was -1 via size(NULL)
    assert all(out[2][f"n_{t}"] == 0 for t in ("ipv4", "phone", "ssn", "card"))
    assert out[2]["redacted"] is None  # faithful passthrough
    assert out[1]["n_email"] == 1


def test_pii_report_null_text_not_deflated(spark):
    df = spark.createDataFrame(
        [(1, "a@b.com x@y.org"), (2, None), (3, None)],
        "doc_id long, text string",
    )
    rep = {r["pii_type"]: r for r in pii_report(df).collect()}
    # two real matches; the two NULL docs must not subtract (2 - 2 = 0
    # was the failure shape with size(NULL) = -1 summed in)
    assert rep["email"]["n_matches"] == 2
    assert rep["email"]["n_docs"] == 1


# ------------------------------------ 3. fresh-store id-type fidelity


def test_embedding_store_first_flag_string_ids(spark, tmp_path):
    from featureform_spark.streaming.vector_store import EmbeddingStore

    store = EmbeddingStore(
        spark, str(tmp_path / "vs"), dim=4, num_planes=4, id_col="vid"
    )
    batch = spark.createDataFrame(
        [("a", [1.0, 0.0, 0.0, 0.0]), ("b", [0.0, 1.0, 0.0, 0.0])],
        "vid string, embedding array<double>",
    )
    # pre-first-ingest flag(): empty store side must carry the batch's
    # string id type (a hardcoded long would break the join/cast here)
    flags = store.flag(batch)
    assert dict(flags.dtypes)["vid"] == "string"
    assert {r["vid"]: r["is_dup"] for r in flags.collect()} == {
        "a": 0,
        "b": 0,
    }
    store.ingest(batch)
    again = store.ingest(batch.limit(1))
    assert [r["is_dup"] for r in again.collect()] == [1]


def test_signature_store_first_flag_string_ids(spark, tmp_path):
    from featureform_spark.streaming.signature_store import SignatureStore

    store = SignatureStore(
        spark, str(tmp_path / "ss"), id_col="did", text_col="text"
    )
    batch = spark.createDataFrame(
        [("x", "the quick brown fox jumps over the lazy dog")],
        "did string, text string",
    )
    flags = store.flag(batch)
    assert dict(flags.dtypes)["did"] == "string"
    assert [r["is_dup"] for r in flags.collect()] == [0]
    store.ingest(batch)
    assert [r["is_dup"] for r in store.flag(batch).collect()] == [1]


# ------------------------- 4. append-committed maintenance error type


def test_append_maintenance_failure_distinct_type(
    spark, tmp_path, monkeypatch
):
    from featureform_spark.sources.iceberg_protocol import (
        AppendCommittedMaintenanceError,
        IcebergProtocolError,
        IcebergProtocolTable,
    )

    df = spark.createDataFrame(
        [(i, f"s{i}") for i in range(20)], "id long, s string"
    ).repartition(2)
    t = IcebergProtocolTable(spark, str(tmp_path / "m"))
    t.create(
        df,
        properties={
            "commit.manifest-merge.enabled": "true",
            "commit.manifest.min-count-to-merge": "2",
        },
    )

    def boom():
        raise IcebergProtocolError("corrupt manifest during rewrite")

    monkeypatch.setattr(t, "rewrite_manifests", boom)
    extra = spark.createDataFrame([(1000, "x")], "id long, s string")
    with pytest.raises(AppendCommittedMaintenanceError) as ei:
        t.append(extra)
    # the error names the committed snapshot and chains the cause, so
    # retry logic can tell "append succeeded, maintenance failed"
    assert ei.value.snapshot_id == t.current_snapshot()["snapshot-id"]
    assert isinstance(ei.value.__cause__, IcebergProtocolError)
    assert t.snapshot().count() == 21  # the append IS durable
