"""VARIANT columns (delta_protocol `variantType` reader-writer
feature): semi-structured values written/scanned through Spark's
native VARIANT type. pyarrow cannot parse such footers, so the writer
falls back to one Spark pass for per-file row counts (numRecords-only
stats — min/max are undefined for variant). No shredding
(variantShredding stays an honest unknown-feature gate)."""

import json
import os

import pytest
from pyspark.sql import functions as F

from featureform_spark.sources.delta_protocol import (
    DeltaProtocolTable,
    UnsupportedTableFeatureError,
)


def _vdata(spark, n=20, start=0):
    return spark.range(start, start + n).select(
        F.col("id").alias("k"),
        F.parse_json(
            F.concat(
                F.lit('{"a": '),
                F.col("id").cast("string"),
                F.lit(', "tag": "t'),
                (F.col("id") % 3).cast("string"),
                F.lit('"}'),
            )
        ).alias("v"),
    )


def test_variant_roundtrip_and_protocol(spark, tmp_path):
    t = DeltaProtocolTable(spark, str(tmp_path / "t"))
    t.create(_vdata(spark))
    proto = t.state().protocol
    assert "variantType" in proto["readerFeatures"]
    assert "variantType" in proto["writerFeatures"]
    got = sorted(
        (r["k"], r["a"], r["tag"])
        for r in t.snapshot()
        .select(
            "k",
            F.variant_get(F.col("v"), "$.a", "long").alias("a"),
            F.variant_get(F.col("v"), "$.tag", "string").alias("tag"),
        )
        .collect()
    )
    assert got == [(i, i, f"t{i % 3}") for i in range(20)]
    # adds carry numRecords-only stats (pyarrow cannot read the footer)
    st = t.state()
    stats = [json.loads(a["stats"]) for a in st.adds.values()]
    assert sum(s["numRecords"] for s in stats) == 20


def test_variant_append_time_travel(spark, tmp_path):
    t = DeltaProtocolTable(spark, str(tmp_path / "t"))
    t.create(_vdata(spark, 10))
    t.append(_vdata(spark, 5, start=100))
    assert t.snapshot().count() == 15
    assert t.snapshot(0).count() == 10
    assert (
        t.snapshot()
        .select(F.variant_get("v", "$.a", "long").alias("a"))
        .agg(F.sum("a"))
        .first()[0]
        == sum(range(10)) + sum(range(100, 105))
    )


def test_variant_delete_with_dvs(spark, tmp_path):
    t = DeltaProtocolTable(spark, str(tmp_path / "t"))
    t.create(
        _vdata(spark, 30),
        properties={"delta.enableDeletionVectors": "true"},
    )
    t.delete_where(F.col("k") % 3 == 0)
    df = t.snapshot().select(
        "k", F.variant_get("v", "$.a", "long").alias("a")
    )
    rows = sorted(tuple(r) for r in df.collect())
    assert rows == [(i, i) for i in range(30) if i % 3 != 0]


def test_variant_shredding_stays_gated(spark, tmp_path):
    t = DeltaProtocolTable(spark, str(tmp_path / "t"))
    t.create(_vdata(spark, 5))
    # an external writer upgrades the table to shredded variants:
    # this reader must refuse rather than misread shredded files
    st = t.state()
    proto = dict(st.protocol)
    proto["readerFeatures"] = sorted(
        set(proto["readerFeatures"]) | {"variantShredding"}
    )
    with open(
        os.path.join(t.log_path, "%020d.json" % 1), "w"
    ) as f:
        f.write(json.dumps({"protocol": proto}) + "\n")
    with pytest.raises(UnsupportedTableFeatureError):
        t.snapshot()
