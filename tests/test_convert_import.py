"""In-place, metadata-only imports: CONVERT TO DELTA
(`DeltaProtocolTable.convert_from_parquet`) and Iceberg's `add_files`
procedure — the migration front door. Both must be O(files) footer
reads with ZERO data rewrite (file-identity assertions), and the
resulting tables must behave as ordinary tables afterwards (append,
delete, time travel, stats-based pruning)."""

import os

import pytest
from pyspark.sql import functions as F

from featureform_spark.sources.delta_protocol import (
    DeltaProtocolError,
    DeltaProtocolTable,
)
from featureform_spark.sources.iceberg_protocol import (
    IcebergProtocolError,
    IcebergProtocolTable,
    UnsupportedIcebergFeatureError,
)
from featureform_spark.sources.testdata import load_table


def _orders(spark, sf_dir):
    return load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )


def _parquet_files(root):
    out = []
    for dirpath, dirnames, filenames in os.walk(root):
        dirnames[:] = [d for d in dirnames if not d.startswith(("_", "."))]
        out.extend(
            os.path.join(dirpath, f)
            for f in filenames
            if f.endswith(".parquet") and not f.startswith(("_", "."))
        )
    return sorted(out)


def test_convert_to_delta_flat(spark, sf_dir, tmp_path):
    raw = str(tmp_path / "raw")
    orders = _orders(spark, sf_dir).limit(200)
    orders.repartition(4).write.parquet(raw)
    before = _parquet_files(raw)
    expect = sorted(tuple(r) for r in spark.read.parquet(raw).collect())

    t = DeltaProtocolTable.convert_from_parquet(spark, raw)
    # metadata-only: the data files are byte-identical and in place
    assert _parquet_files(raw) == before
    st = t.state()
    assert len(st.adds) == len(before)
    assert all(a.get("stats") for a in st.adds.values())
    got = sorted(tuple(r) for r in t.snapshot().collect())
    assert got == expect

    # ...and it is an ordinary Delta table afterwards
    t.append(
        spark.range(3).select(
            F.col("id").alias("o_orderkey"),
            F.col("id").alias("o_custkey"),
            F.lit(1.0).alias("o_totalprice"),
        )
    )
    t.delete_where(F.col("o_custkey") % 7 == 0)
    assert t.snapshot(0).count() == 200  # time travel to the convert
    assert t.validate_checksum() is True


def test_convert_to_delta_partitioned(spark, sf_dir, tmp_path):
    raw = str(tmp_path / "rawp")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    ).limit(300)
    orders.write.partitionBy("o_orderstatus").parquet(raw)
    t = DeltaProtocolTable.convert_from_parquet(
        spark, raw, partition_schema={"o_orderstatus": "string"}
    )
    st = t.state()
    assert st.partition_columns == ["o_orderstatus"]
    assert all(
        set(a["partitionValues"]) == {"o_orderstatus"}
        for a in st.adds.values()
    )
    got = t.snapshot()
    assert got.count() == 300
    assert (
        sorted(
            tuple(r)
            for r in got.select(
                "o_orderkey", "o_orderstatus"
            ).collect()
        )
        == sorted(
            tuple(r)
            for r in orders.select(
                "o_orderkey", "o_orderstatus"
            ).collect()
        )
    )
    # partition pruning from the log works on imported metadata
    some = got.select("o_orderstatus").first()[0]
    pruned = t.snapshot_where({"o_orderstatus": some})
    assert pruned.count() == orders.filter(
        F.col("o_orderstatus") == some
    ).count()


def test_convert_gates(spark, sf_dir, tmp_path):
    raw = str(tmp_path / "g")
    _orders(spark, sf_dir).limit(10).write.parquet(raw)
    t = DeltaProtocolTable.convert_from_parquet(spark, raw)
    with pytest.raises(DeltaProtocolError, match="already a Delta"):
        DeltaProtocolTable.convert_from_parquet(spark, raw)
    # partitioned layout without partition_schema is rejected
    rawp = str(tmp_path / "gp")
    load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus"
    ).limit(30).write.partitionBy("o_orderstatus").parquet(rawp)
    with pytest.raises(DeltaProtocolError, match="partition"):
        DeltaProtocolTable.convert_from_parquet(spark, rawp)
    empty = tmp_path / "empty_dir"
    empty.mkdir()
    with pytest.raises(DeltaProtocolError, match="no parquet files"):
        DeltaProtocolTable.convert_from_parquet(spark, str(empty))


def test_iceberg_add_files(spark, sf_dir, tmp_path):
    raw = str(tmp_path / "src")
    orders = _orders(spark, sf_dir).limit(200)
    orders.repartition(4).write.parquet(raw)
    before = _parquet_files(raw)
    t = IcebergProtocolTable(spark, str(tmp_path / "tbl"))
    t.create(orders.limit(0))
    v = t.add_files(raw)
    assert v > 0
    # zero rewrite: manifests reference the source files in place
    entries, _ = t._live_entries(t.current_snapshot())
    assert sorted(
        e["data_file"]["file_path"] for e in entries
    ) == before
    assert _parquet_files(raw) == before
    # footer stats imported (field-id keyed value_counts + bounds)
    assert all(e["data_file"]["value_counts"] for e in entries)
    got = sorted(tuple(r) for r in t.snapshot().collect())
    assert got == sorted(tuple(r) for r in orders.collect())
    # stats-based scan planning works on imported bounds
    lo = orders.agg(F.min("o_orderkey")).first()[0]
    planned = t.scan_planned("o_orderkey", lo, lo + 5)
    assert planned.count() == orders.filter(
        F.col("o_orderkey").between(lo, lo + 5)
    ).count()
    # ordinary table afterwards
    t.append(orders.limit(3))
    t.delete_rows(F.col("o_custkey") % 7 == 0)
    assert t.snapshot(ordinal=1).count() == 200  # time travel


def test_iceberg_add_files_gates(spark, sf_dir, tmp_path):
    raw = str(tmp_path / "src")
    orders = _orders(spark, sf_dir).limit(20)
    orders.write.parquet(raw)
    t = IcebergProtocolTable(spark, str(tmp_path / "tbl"))
    t.create(orders.limit(0))
    t.add_files(raw)
    with pytest.raises(IcebergProtocolError, match="already referenced"):
        t.add_files(raw)
    p = IcebergProtocolTable(spark, str(tmp_path / "ptbl"))
    p.create(
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderstatus")
        .limit(10),
        partition_by=["o_orderstatus"],
    )
    with pytest.raises(UnsupportedIcebergFeatureError, match="partitioned"):
        p.add_files(raw)
