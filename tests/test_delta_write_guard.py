"""Writer-side protocol enforcement (delta_protocol._write_guard) —
the write mirror of the reader's honest gates: a conformant writer
refuses tables whose writer requirements it can't honor and ENFORCES
the ones it claims (PROTOCOL.md §Writer Requirements). The reference
gets this from the vendor connector
(offline_store_spark_runner.py:920-949 sinks); here it's implemented
directly."""

import json
import os

import pytest
from pyspark.sql import functions as F

from featureform_spark.sources.delta_protocol import (
    DeltaProtocolError,
    DeltaProtocolTable,
    UnsupportedTableFeatureError,
)


def _orders(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "orders.parquet")).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )


def test_append_only_blocks_row_removal(spark, sf_dir, tmp_path):
    orders = _orders(spark, sf_dir)
    t = DeltaProtocolTable(spark, str(tmp_path / "ao"))
    t.create(orders.limit(50), properties={"delta.appendOnly": "true"})
    t.append(orders.limit(60).subtract(orders.limit(50)))  # appends legal
    with pytest.raises(DeltaProtocolError, match="appendOnly"):
        t.overwrite(orders.limit(5))
    with pytest.raises(DeltaProtocolError, match="appendOnly"):
        t.merge(orders.limit(5), key="o_orderkey")
    with pytest.raises(DeltaProtocolError, match="appendOnly"):
        t.delete_where(F.lit(True))
    # OPTIMIZE is dataChange=false — legal under append-only
    n = t.snapshot().count()
    t.compact()
    assert t.snapshot().count() == n


def test_check_constraint_enforced_on_writes(spark, sf_dir, tmp_path):
    orders = _orders(spark, sf_dir)
    t = DeltaProtocolTable(spark, str(tmp_path / "ck"))
    t.create(
        orders.limit(50).filter(F.col("o_orderkey") > 0),
        properties={"delta.constraints.positive_key": "o_orderkey > 0"},
    )
    good = spark.createDataFrame(
        [(10**9, 1, None)],
        "o_orderkey long, o_custkey long, o_totalprice string",
    ).withColumn(
        "o_totalprice",
        F.col("o_totalprice").cast(dict(orders.dtypes)["o_totalprice"]),
    )
    t.append(good)
    bad = good.withColumn("o_orderkey", F.lit(-5).cast("long"))
    with pytest.raises(DeltaProtocolError, match="positive_key"):
        t.append(bad)
    with pytest.raises(DeltaProtocolError, match="positive_key"):
        t.merge(bad, key="o_orderkey")
    # a NULL evaluation passes, like SQL CHECK
    null_key = good.withColumn("o_orderkey", F.lit(None).cast("long"))
    t.append(null_key)


def test_create_validates_property_constraints(spark, sf_dir, tmp_path):
    orders = _orders(spark, sf_dir)
    t = DeltaProtocolTable(spark, str(tmp_path / "cv"))
    with pytest.raises(DeltaProtocolError, match="impossible"):
        t.create(
            orders.limit(10),
            properties={"delta.constraints.impossible": "o_orderkey < 0"},
        )


def test_add_constraint_validates_existing_rows(spark, sf_dir, tmp_path):
    orders = _orders(spark, sf_dir)
    t = DeltaProtocolTable(spark, str(tmp_path / "ac"))
    t.create(orders.limit(40))
    with pytest.raises(DeltaProtocolError, match="existing row"):
        t.add_constraint("neg", "o_orderkey < 0")
    v = t.add_constraint("pos", "o_orderkey >= 0")
    assert v == 1
    with pytest.raises(DeltaProtocolError, match="pos"):
        t.append(
            t.snapshot().limit(1).withColumn(
                "o_orderkey", F.lit(-1).cast("long")
            )
        )
    t.drop_constraint("pos")
    t.append(
        t.snapshot().limit(1).withColumn("o_orderkey", F.lit(-1).cast("long"))
    )


def test_unknown_writer_feature_blocks_writes_not_reads(
    spark, sf_dir, tmp_path
):
    orders = _orders(spark, sf_dir)
    t = DeltaProtocolTable(spark, str(tmp_path / "wf"))
    t.create(orders.limit(20))
    with open(os.path.join(t.log_path, "%020d.json" % 1), "w") as f:
        f.write(
            json.dumps(
                {
                    "protocol": {
                        "minReaderVersion": 1,
                        "minWriterVersion": 7,
                        "writerFeatures": ["generatedColumns"],
                    }
                }
            )
            + "\n"
        )
    assert t.snapshot().count() == 20  # reads unaffected
    with pytest.raises(UnsupportedTableFeatureError, match="generatedColumns"):
        t.append(orders.limit(1))
    with pytest.raises(UnsupportedTableFeatureError, match="generatedColumns"):
        t.delete_where(F.lit(True))


def test_column_invariant_enforced(spark, sf_dir, tmp_path):
    """Legacy delta.invariants field metadata (writer v2 feature) is
    parsed from the schema and enforced like a CHECK constraint."""
    orders = _orders(spark, sf_dir)
    t = DeltaProtocolTable(spark, str(tmp_path / "inv"))
    t.create(orders.limit(20))
    st = t.state()
    sj = json.loads(st.metadata["schemaString"])
    for fld in sj["fields"]:
        if fld["name"] == "o_custkey":
            fld["metadata"] = {
                "delta.invariants": json.dumps(
                    {"expression": {"expression": "o_custkey >= 0"}}
                )
            }
    meta = dict(st.metadata)
    meta["schemaString"] = json.dumps(sj)
    with open(os.path.join(t.log_path, "%020d.json" % 1), "w") as f:
        f.write(json.dumps({"metaData": meta}) + "\n")
    bad = t.snapshot().limit(1).withColumn(
        "o_custkey", F.lit(-3).cast("long")
    )
    with pytest.raises(DeltaProtocolError, match="invariant"):
        t.append(bad)
    t.append(t.snapshot().limit(1))  # conforming rows still write
