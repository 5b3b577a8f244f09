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
                        "writerFeatures": ["liquidClustering"],
                    }
                }
            )
            + "\n"
        )
    assert t.snapshot().count() == 20  # reads unaffected
    with pytest.raises(UnsupportedTableFeatureError, match="liquidClustering"):
        t.append(orders.limit(1))
    with pytest.raises(UnsupportedTableFeatureError, match="liquidClustering"):
        t.delete_where(F.lit(True))


def _forge_schema_meta(t, col, md_entry):
    """Rewrite the table's metaData with extra field metadata on one
    column (forging a foreign writer's schema)."""
    st = t.state()
    sj = json.loads(st.metadata["schemaString"])
    for fld in sj["fields"]:
        if fld["name"] == col:
            fld["metadata"] = md_entry
    meta = dict(st.metadata)
    meta["schemaString"] = json.dumps(sj)
    v = st.version + 1
    with open(os.path.join(t.log_path, "%020d.json" % v), "w") as f:
        f.write(json.dumps({"metaData": meta}) + "\n")


def test_legacy_writer_version_generated_column_gates(
    spark, sf_dir, tmp_path
):
    """minWriterVersion 4-6 implies generatedColumns/identityColumns
    WITHOUT listing writerFeatures (ADVICE r5). Generated columns are
    COMPUTED when omitted and VALIDATED when provided (round-6
    upgrade); inconsistent values abort; identity columns still refuse
    row writes; DELETE (writes no rows) stays legal on both."""
    orders = _orders(spark, sf_dir)
    t = DeltaProtocolTable(spark, str(tmp_path / "gen4"))
    t.create(orders.limit(20))
    _forge_schema_meta(
        t,
        "o_custkey",
        {"delta.generationExpression": "o_orderkey % 100"},
    )
    with open(os.path.join(t.log_path, "%020d.json" % 2), "w") as f:
        f.write(
            json.dumps(
                {"protocol": {"minReaderVersion": 1, "minWriterVersion": 4}}
            )
            + "\n"
        )
    assert t.snapshot().count() == 20  # reads unaffected
    # inconsistent provided values abort
    bad = orders.limit(1).withColumn(
        "o_custkey", F.col("o_orderkey") % 100 + 1
    )
    with pytest.raises(DeltaProtocolError, match="generated"):
        t.append(bad)
    # omitted generated column is computed by the writer
    t.append(orders.limit(25).subtract(orders.limit(20)).drop("o_custkey"))
    got = t.snapshot().filter(
        F.col("o_custkey") != F.col("o_orderkey") % 100
    )
    assert got.count() == 20  # only the original (pre-forge) rows
    # consistent provided values write fine
    ok = (
        orders.limit(30)
        .subtract(orders.limit(25))
        .withColumn("o_custkey", F.col("o_orderkey") % 100)
    )
    t.append(ok)
    assert t.snapshot().count() == 30
    # DELETE writes no rows: legal even on generated-column tables
    t.delete_where(F.col("o_orderkey") % 2 == 0)
    # MERGE does not recompute generated values: refuses
    with pytest.raises(UnsupportedTableFeatureError, match="MERGE"):
        t.merge(orders.limit(2), key="o_orderkey")

    # identity column under legacy v6
    t2 = DeltaProtocolTable(spark, str(tmp_path / "id6"))
    t2.create(orders.limit(10))
    _forge_schema_meta(
        t2,
        "o_orderkey",
        {
            "delta.identity.start": 1,
            "delta.identity.step": 1,
            "delta.identity.allowExplicitInsert": False,
        },
    )
    with open(os.path.join(t2.log_path, "%020d.json" % 2), "w") as f:
        f.write(
            json.dumps(
                {"protocol": {"minReaderVersion": 1, "minWriterVersion": 6}}
            )
            + "\n"
        )
    # explicit values on GENERATED ALWAYS refuse; omitting the column
    # lets the allocator generate (r8: identity writes implemented)
    with pytest.raises(DeltaProtocolError, match="GENERATED ALWAYS"):
        t2.append(orders.limit(1))
    t2.append(
        orders.limit(12).subtract(orders.limit(10)).drop("o_orderkey")
    )
    got2 = t2.snapshot().count()
    assert got2 == 12

    # a legacy v4 table WITHOUT generated columns still accepts writes
    t3 = DeltaProtocolTable(spark, str(tmp_path / "plain4"))
    t3.create(orders.limit(10))
    with open(os.path.join(t3.log_path, "%020d.json" % 1), "w") as f:
        f.write(
            json.dumps(
                {"protocol": {"minReaderVersion": 1, "minWriterVersion": 4}}
            )
            + "\n"
        )
    t3.append(orders.limit(5))
    assert t3.snapshot().count() == 15


def test_legacy_upgrade_carries_implied_features(spark, sf_dir, tmp_path):
    """delete_where's protocol upgrade to (3,7) from a legacy
    minWriterVersion must list every feature that version implied
    (v5 → +checkConstraints +changeDataFeed +generatedColumns
    +columnMapping), or external engines stop enforcing them
    (ADVICE r5)."""
    orders = _orders(spark, sf_dir)
    t = DeltaProtocolTable(spark, str(tmp_path / "up5"))
    t.create(orders.limit(40))
    with open(os.path.join(t.log_path, "%020d.json" % 1), "w") as f:
        f.write(
            json.dumps(
                {"protocol": {"minReaderVersion": 1, "minWriterVersion": 5}}
            )
            + "\n"
        )
    t.delete_where(F.col("o_orderkey") % 2 == 0)
    proto = t.state().protocol
    assert proto["minWriterVersion"] == 7
    feats = set(proto["writerFeatures"])
    assert {
        "appendOnly",
        "invariants",
        "checkConstraints",
        "changeDataFeed",
        "generatedColumns",
        "columnMapping",
    } <= feats
    assert "deletionVectors" in feats
    # the upgraded table (no actual generated columns) stays writable
    t.append(orders.limit(45).subtract(orders.limit(40)))


def test_append_retry_revalidates_concurrent_constraint(
    spark, sf_dir, tmp_path
):
    """Losing the commit race to a writer that added a CHECK constraint
    must re-validate the staged rows against the NEW configuration —
    not blindly commit them (ADVICE r5)."""
    orders = _orders(spark, sf_dir)
    t = DeltaProtocolTable(spark, str(tmp_path / "race"))
    t.create(orders.limit(20).filter(F.col("o_orderkey") > 0))
    bad = t.snapshot().limit(1).withColumn(
        "o_orderkey", F.lit(-5).cast("long")
    )
    orig_commit = t._commit
    fired = {"done": False}

    def racing_commit(v, actions, op):
        if not fired["done"] and op == "WRITE":
            fired["done"] = True
            # the winning writer lands a CHECK constraint at our version
            DeltaProtocolTable(spark, t.path).add_constraint(
                "positive_key", "o_orderkey > 0"
            )
        return orig_commit(v, actions, op)

    t._commit = racing_commit
    with pytest.raises(DeltaProtocolError, match="positive_key"):
        t.append(bad)
    # rows that satisfy the winner's constraint retry and commit fine
    fired["done"] = True
    good = t.snapshot().limit(1).withColumn(
        "o_orderkey", F.lit(10**9).cast("long")
    )
    t._commit = orig_commit
    t.append(good)
    assert (
        t.snapshot().filter(F.col("o_orderkey") == 10**9).count() == 1
    )


def test_append_retry_raises_on_concurrent_schema_change(
    spark, sf_dir, tmp_path
):
    """A winner that changed the schema makes our staged files invalid;
    the retry must raise, not commit files written under old metadata."""
    from featureform_spark.sources.delta_protocol import (
        ConcurrentCommitError,
    )

    orders = _orders(spark, sf_dir)
    t = DeltaProtocolTable(spark, str(tmp_path / "race2"))
    t.create(orders.limit(20))
    orig_commit = t._commit
    fired = {"done": False}

    def racing_commit(v, actions, op):
        if not fired["done"] and op == "WRITE":
            fired["done"] = True
            DeltaProtocolTable(spark, t.path).merge(
                t.snapshot().limit(1).withColumn("extra", F.lit(1)),
                key="o_orderkey",
            )  # schema evolves concurrently
        return orig_commit(v, actions, op)

    t._commit = racing_commit
    with pytest.raises(ConcurrentCommitError, match="schema"):
        t.append(orders.limit(1))


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
