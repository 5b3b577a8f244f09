"""Iceberg v3 VARIANT columns: a variant schema forces format-version
3 at create (with row lineage stamped from birth), scans come back as
Spark's native VariantType, writer stats fall back to numRecords-only
(pyarrow can't parse VARIANT footers), and adding a variant column to
a v2 table refuses until upgrade_format_version(3)."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from featureform_spark.sources.iceberg_protocol import (
    IcebergProtocolTable,
    UnsupportedIcebergFeatureError,
)


def _vdata(spark, n=20, start=0):
    return spark.range(start, start + n).select(
        F.col("id").alias("k"),
        F.parse_json(
            F.concat(
                F.lit('{"a": '), F.col("id").cast("string"), F.lit("}")
            )
        ).alias("v"),
    )


def test_variant_create_is_v3_and_roundtrips(spark, tmp_path):
    t = IcebergProtocolTable(spark, str(tmp_path / "t"))
    t.create(_vdata(spark))
    md = t.metadata()
    assert md["format-version"] == 3
    assert "next-row-id" in md
    sch = t.schema(md)
    assert any(f["type"] == "variant" for f in sch["fields"])
    got = sorted(
        (r["k"], r["a"])
        for r in t.snapshot()
        .select("k", F.variant_get("v", "$.a", "long").alias("a"))
        .collect()
    )
    assert got == [(i, i) for i in range(20)]


def test_variant_append_and_row_lineage(spark, tmp_path):
    t = IcebergProtocolTable(spark, str(tmp_path / "t"))
    t.create(_vdata(spark, 10))
    t.append(_vdata(spark, 5, start=100))
    assert t.snapshot().count() == 15
    # v3 row lineage: ids unique across both commits
    ids = [
        r["_row_id"]
        for r in t.snapshot_with_row_ids()
        .select("_row_id")
        .collect()
    ]
    assert len(ids) == 15 and len(set(ids)) == 15


def test_variant_v3_delete_rows(spark, tmp_path):
    t = IcebergProtocolTable(spark, str(tmp_path / "t"))
    t.create(_vdata(spark, 30))
    t.delete_rows(F.col("k") % 3 == 0)  # v3: puffin deletion vectors
    rows = sorted(
        (r["k"], r["a"])
        for r in t.snapshot()
        .select("k", F.variant_get("v", "$.a", "long").alias("a"))
        .collect()
    )
    assert rows == [(i, i) for i in range(30) if i % 3 != 0]


def test_variant_evolve_gate_on_v2(spark, tmp_path):
    t = IcebergProtocolTable(spark, str(tmp_path / "t"))
    t.create(spark.range(5).select(F.col("id").alias("k")))
    assert t.metadata()["format-version"] == 2
    new_schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("v", T.VariantType()),
        ]
    )
    with pytest.raises(UnsupportedIcebergFeatureError, match="v3-only"):
        t.evolve_schema(new_schema)
    t.upgrade_format_version(3)
    t.evolve_schema(new_schema)
    t.append(_vdata(spark, 3, start=50))
    out = t.snapshot().select(
        "k", F.variant_get("v", "$.a", "long").alias("a")
    )
    got = sorted((r["k"], r["a"]) for r in out.collect())
    assert got == [(i, None) for i in range(5)] + [
        (i, i) for i in range(50, 53)
    ]


def test_uniform_variant_requires_v3_mirror(spark, tmp_path):
    """UniForm of a variant Delta table: refuse a v2 mirror (variant
    is v3-only), succeed at 3 — the mirror scan reads the SAME files
    back as VariantType."""
    from featureform_spark.sources.delta_protocol import (
        DeltaProtocolTable,
        UnsupportedTableFeatureError,
    )
    from featureform_spark.sources.uniform import sync_uniform

    d = str(tmp_path / "t")
    t = DeltaProtocolTable(spark, d)
    t.create(_vdata(spark, 8))
    with pytest.raises(UnsupportedTableFeatureError, match="format-version 3"):
        sync_uniform(spark, d)  # default v2 mirror
    sync_uniform(spark, d, iceberg_format_version=3)
    ice = IcebergProtocolTable(spark, d)
    got = sorted(
        (r["k"], r["a"])
        for r in ice.snapshot()
        .select("k", F.variant_get("v", "$.a", "long").alias("a"))
        .collect()
    )
    assert got == [(i, i) for i in range(8)]
