"""Version checksum sidecars (delta_protocol `<version>.crc`): every
commit writes a snapshot-level digest (delta-spark's state-validation
artifact) and `validate_checksum` catches post-commit log tampering.
"""

import json
import os

import pytest
from pyspark.sql import functions as F

from featureform_spark.sources.delta_protocol import (
    DeltaProtocolError,
    DeltaProtocolTable,
    _crc_name,
)


def _mk(spark, path):
    t = DeltaProtocolTable(spark, path)
    t.create(
        spark.range(20).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v")
        )
    )
    return t


def test_crc_written_per_commit_and_validates(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    t.append(spark.range(5).select(F.col("id").alias("k"),
                                   F.col("id").alias("v")))
    t.delete_where(F.col("k") % 7 == 0)
    for v in (0, 1, 2):
        assert os.path.exists(os.path.join(t.log_path, _crc_name(v)))
        assert t.validate_checksum(v) is True
    crc = json.loads(
        open(os.path.join(t.log_path, _crc_name(0))).read()
    )
    st0 = t.state(0)
    assert crc["numFiles"] == len(st0.adds)
    assert crc["tableSizeBytes"] == sum(
        int(a["size"]) for a in st0.adds.values()
    )
    assert crc["metadata"]["schemaString"] == st0.metadata["schemaString"]


def test_crc_catches_log_tampering(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    t.append(spark.range(3).select(F.col("id").alias("k"),
                                   F.col("id").alias("v")))
    # hand-edit the v1 commit: drop one add action (simulated
    # corruption / tampering after the checksum was written)
    p = os.path.join(t.log_path, "%020d.json" % 1)
    lines = [json.loads(x) for x in open(p) if x.strip()]
    kept, dropped = [], False
    for a in lines:
        if "add" in a and not dropped:
            dropped = True
            continue
        kept.append(a)
    assert dropped
    with open(p, "w") as f:
        f.write("\n".join(json.dumps(a) for a in kept) + "\n")
    with pytest.raises(DeltaProtocolError, match="checksum mismatch"):
        t.validate_checksum()


def test_crc_missing_returns_false_and_clean_log_removes(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    os.remove(os.path.join(t.log_path, _crc_name(0)))
    assert t.validate_checksum(0) is False
    t.append(spark.range(2).select(F.col("id").alias("k"),
                                   F.col("id").alias("v")))
    t.checkpoint()
    t.clean_log()
    # pre-checkpoint sidecars left with their commits
    assert not os.path.exists(os.path.join(t.log_path, _crc_name(1)))
    names = os.listdir(t.log_path)
    assert not any(n == _crc_name(0) or n == _crc_name(1) for n in names)


def test_crc_covers_txns_domains_dvs(spark, tmp_path):
    t = DeltaProtocolTable(spark, str(tmp_path / "t"))
    t.create(
        spark.range(30).select(F.col("id").alias("k"),
                               F.col("id").alias("v")),
        properties={"delta.enableDeletionVectors": "true"},
    )
    t.append(
        spark.range(3).select((F.col("id") + 50).alias("k"),
                              F.col("id").alias("v")),
        txn=("appZ", 3),
    )
    t.delete_where(F.col("k") % 4 == 0)
    assert t.validate_checksum() is True
    crc = json.loads(
        open(os.path.join(t.log_path, _crc_name(t.version()))).read()
    )
    assert {"appId": "appZ", "version": 3} in crc["setTransactions"]
    assert crc["numDeletionVectorsOpt"] >= 1
    assert crc["numDeletedRecordsOpt"] >= 1


def test_crc_valid_across_randomized_lifecycle(spark, tmp_path):
    """Hardening: an arbitrary interleaving of table operations keeps
    every version's checksum self-consistent — the crc fold and the
    state fold can never drift. Deterministic op sequence derived from
    a fixed seed (each op is Spark work; hypothesis would be slow)."""
    import random

    rng = random.Random(8)
    t = _mk(spark, str(tmp_path / "t"))
    t2 = None
    for i in range(10):
        op = rng.choice(
            ["append", "append", "delete", "optimize", "widen",
             "constraint", "checkpoint", "clone"]
        )
        if op == "append":
            t.append(
                spark.range(rng.randint(1, 8)).select(
                    (F.col("id") + 100 * i).alias("k"),
                    F.col("id").alias("v"),
                )
            )
        elif op == "delete":
            t.delete_where(F.col("k") % rng.randint(2, 5) == 0)
        elif op == "optimize":
            t.compact(target_rows_per_file=50)
        elif op == "widen":
            try:
                t.widen_column("v", "long")
            except DeltaProtocolError:
                pass  # already long
        elif op == "constraint":
            try:
                t.add_constraint(f"c{i}", "k >= 0")
            except DeltaProtocolError:
                pass
        elif op == "checkpoint":
            t.checkpoint()
        elif op == "clone" and t2 is None:
            t2 = t.shallow_clone(str(tmp_path / "c"))
            assert t2.validate_checksum() is True
        assert t.validate_checksum() is True, f"op {i}: {op}"
    # every retained version's sidecar validates, not just the head
    for v in t._commit_versions():
        assert t.validate_checksum(v) is True


def test_crc_tolerates_omitted_optional_fields(spark, tmp_path):
    """A conformant .crc from another writer (delta-spark) may omit
    optional fields (setTransactions, domainMetadata,
    numDeletedRecordsOpt, ...). Absence is not divergence — only
    fields the sidecar stores participate in the comparison."""
    t = _mk(spark, str(tmp_path / "t"))
    p = os.path.join(t.log_path, _crc_name(0))
    stored = json.loads(open(p).read())
    for k in ("setTransactions", "domainMetadata",
              "numDeletedRecordsOpt", "histogramOpt"):
        stored.pop(k, None)
    with open(p, "w") as f:
        f.write(json.dumps(stored) + "\n")
    assert t.validate_checksum(0) is True
    # ...but a PRESENT field that diverges still raises
    stored["numFiles"] = 999
    with open(p, "w") as f:
        f.write(json.dumps(stored) + "\n")
    with pytest.raises(DeltaProtocolError, match="checksum mismatch"):
        t.validate_checksum(0)
