"""Iceberg v3 default values (spec §Default values): `evolve_schema`
with `defaults` stamps `initial-default`/`write-default` on NEW fields
(JSON single-value serialization). Readers serve the initial-default
for every pre-existing data file that lacks the field — zero rewrite —
while post-evolution files (including explicit NULLs) read their own
values; writers materialize the write-default when an append omits the
column."""

import datetime
import decimal

import pyarrow as pa
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from featureform_spark.sources.iceberg_protocol import (
    IcebergProtocolError,
    IcebergProtocolTable,
    UnsupportedIcebergFeatureError,
    default_value_to_json,
)
from featureform_spark.sources.testdata import load_table


def _orders(spark, sf_dir):
    return load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )


def _mk_v3(spark, sf_dir, tmp_path, n=20):
    t = IcebergProtocolTable(spark, str(tmp_path / "dflt"))
    t.create(_orders(spark, sf_dir).limit(n))
    t.upgrade_format_version(3)
    return t


def test_initial_default_served_without_rewrite(spark, sf_dir, tmp_path):
    t = _mk_v3(spark, sf_dir, tmp_path)
    files_before = {
        e["data_file"]["file_path"]
        for e in t._live_entries(t.current_snapshot())[0]
    }
    new = (
        _orders(spark, sf_dir)
        .limit(1)
        .withColumn("region", F.lit("emea"))
        .schema
    )
    t.evolve_schema(new, defaults={"region": "emea"})
    # metadata-only: no data file touched
    files_after = {
        e["data_file"]["file_path"]
        for e in t._live_entries(t.current_snapshot())[0]
    }
    assert files_after == files_before
    f = next(
        f for f in t.schema()["fields"] if f["name"] == "region"
    )
    assert f["initial-default"] == "emea"
    assert f["write-default"] == "emea"
    got = t.snapshot()
    assert got.count() == 20
    # every pre-existing row reads the default, not NULL
    assert got.filter(F.col("region") == "emea").count() == 20


def test_post_evolution_files_keep_their_values(spark, sf_dir, tmp_path):
    t = _mk_v3(spark, sf_dir, tmp_path)
    new = (
        _orders(spark, sf_dir)
        .limit(1)
        .withColumn("region", F.lit("x"))
        .schema
    )
    t.evolve_schema(new, defaults={"region": "emea"})
    # append WITH the column, including a real NULL — the file's own
    # values must win over the default
    t.append(
        _orders(spark, sf_dir)
        .limit(30)
        .subtract(_orders(spark, sf_dir).limit(20))
        .withColumn(
            "region",
            F.when(F.col("o_orderkey") % 2 == 0, F.lit("apac")),
        )
    )
    got = t.snapshot()
    assert got.count() == 30
    assert got.filter(F.col("region") == "emea").count() == 20
    assert got.filter(F.col("region") == "apac").count() > 0
    assert got.filter(F.col("region").isNull()).count() > 0


def test_write_default_stamped_when_column_omitted(spark, sf_dir, tmp_path):
    t = _mk_v3(spark, sf_dir, tmp_path)
    new = (
        _orders(spark, sf_dir)
        .limit(1)
        .withColumn("score", F.lit(0).cast("long"))
        .schema
    )
    t.evolve_schema(new, defaults={"score": 7})
    # append WITHOUT the column: writer materializes write-default
    extra = (
        _orders(spark, sf_dir)
        .limit(25)
        .subtract(_orders(spark, sf_dir).limit(20))
    )
    t.append(extra)
    got = t.snapshot()
    assert got.count() == 25
    assert got.filter(F.col("score") == 7).count() == 25
    # the appended file physically CONTAINS the column (field-id in
    # value_counts), so it is not served via the read-time patch
    entries, _ = t._live_entries(t.current_snapshot())
    fid = next(
        f["id"] for f in t.schema()["fields"] if f["name"] == "score"
    )
    newest = max(entries, key=lambda e: e["sequence_number"])
    assert any(
        int(kv["key"]) == fid
        for kv in newest["data_file"]["value_counts"]
    )


def test_time_travel_and_defaults(spark, sf_dir, tmp_path):
    t = _mk_v3(spark, sf_dir, tmp_path)
    snap0 = t.current_snapshot()["snapshot-id"]
    new = (
        _orders(spark, sf_dir)
        .limit(1)
        .withColumn("region", F.lit("x"))
        .schema
    )
    t.evolve_schema(new, defaults={"region": "emea"})
    t.append(
        _orders(spark, sf_dir)
        .limit(22)
        .subtract(_orders(spark, sf_dir).limit(20))
        .withColumn("region", F.lit("apac"))
    )
    # time travel to the pre-evolution snapshot: current schema, old
    # files -> default everywhere
    old = t.snapshot(snapshot_id=snap0)
    if "region" in old.columns:
        assert old.filter(F.col("region") == "emea").count() == old.count()
    latest = t.snapshot()
    assert latest.filter(F.col("region") == "emea").count() == 20
    assert latest.filter(F.col("region") == "apac").count() == 2


def test_typed_defaults_roundtrip(spark, sf_dir, tmp_path):
    """date / timestamp / decimal / double / boolean defaults survive
    the JSON single-value round trip and read back typed."""
    t = _mk_v3(spark, sf_dir, tmp_path, n=5)
    base = _orders(spark, sf_dir).limit(1)
    new = base.select(
        "*",
        F.lit(datetime.date(2024, 3, 1)).alias("d"),
        F.lit(datetime.datetime(2024, 3, 1, 12, 30)).cast(
            "timestamp_ntz"
        ).alias("ts"),
        F.lit(1.5).alias("w"),
        F.lit(True).alias("flag"),
        F.lit(decimal.Decimal("12.34")).cast("decimal(8,2)").alias("m"),
    ).schema
    t.evolve_schema(
        new,
        defaults={
            "d": datetime.date(2024, 3, 1),
            "ts": datetime.datetime(2024, 3, 1, 12, 30),
            "w": 1.5,
            "flag": True,
            "m": decimal.Decimal("12.34"),
        },
    )
    row = t.snapshot().first()
    assert row["d"] == datetime.date(2024, 3, 1)
    assert row["ts"] == datetime.datetime(2024, 3, 1, 12, 30)
    assert row["w"] == 1.5
    assert row["flag"] is True
    assert row["m"] == decimal.Decimal("12.34")


def test_default_gates(spark, sf_dir, tmp_path):
    # v2 tables: defaults are v3-only
    t = IcebergProtocolTable(spark, str(tmp_path / "v2"))
    t.create(_orders(spark, sf_dir).limit(5))
    new = (
        _orders(spark, sf_dir)
        .limit(1)
        .withColumn("region", F.lit("x"))
        .schema
    )
    with pytest.raises(UnsupportedIcebergFeatureError, match="format-version 3"):
        t.evolve_schema(new, defaults={"region": "emea"})
    # existing column cannot gain an initial-default
    t.upgrade_format_version(3)
    t.evolve_schema(new)
    with pytest.raises(IcebergProtocolError, match="already exists"):
        t.evolve_schema(new, defaults={"region": "emea"})
    # unknown column
    with pytest.raises(IcebergProtocolError, match="unknown columns"):
        t.evolve_schema(new, defaults={"nope": 1})
    # null default
    with pytest.raises(IcebergProtocolError, match="cannot be null"):
        default_value_to_json("string", None)


def test_append_arrow_fills_write_default(spark, sf_dir, tmp_path):
    t = _mk_v3(spark, sf_dir, tmp_path, n=5)
    new = (
        _orders(spark, sf_dir)
        .limit(1)
        .withColumn("score", F.lit(0).cast("long"))
        .schema
    )
    t.evolve_schema(new, defaults={"score": 9})
    tbl = pa.table(
        {
            "o_orderkey": pa.array([101, 102], type=pa.int64()),
            "o_custkey": pa.array([1, 2], type=pa.int64()),
            "o_totalprice": pa.array([1.0, 2.0], type=pa.float64()),
        }
    )
    t.append_arrow(tbl)
    got = t.snapshot()
    assert got.count() == 7
    assert got.filter(F.col("score") == 9).count() == 7  # 5 initial + 2 filled
