"""Delta column DEFAULT values (PROTOCOL.md §Column Default Values,
the ``allowColumnDefaults`` writer feature; delta-spark's ALTER COLUMN
SET DEFAULT): a write that omits a column carrying a CURRENT_DEFAULT
expression writes the default for every row; provided values always
win; defaults are WRITE-time only (changing one never rewrites
materialized values); new columns cannot arrive with a default (Delta
has no initial-default — that is the Iceberg v3 feature's territory).
"""

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from featureform_spark.sources.delta_protocol import (
    DeltaProtocolError,
    DeltaProtocolTable,
    UnsupportedTableFeatureError,
)


def _rows(spark, ids, with_value=True):
    if with_value:
        return spark.createDataFrame(
            [(i, f"u{i}", float(i)) for i in ids],
            "event_id long, user_id string, value double",
        )
    return spark.createDataFrame(
        [(i, f"u{i}") for i in ids], "event_id long, user_id string"
    )


def _default_of(t, col):
    sj = json.loads(t.state().metadata["schemaString"])
    for f in sj["fields"]:
        if f["name"] == col:
            return (f.get("metadata") or {}).get("CURRENT_DEFAULT")
    raise AssertionError(col)


def test_default_lifecycle(spark, tmp_path):
    t = DeltaProtocolTable(spark, str(tmp_path / "t"))
    t.create(_rows(spark, [0, 1]))                       # v0 explicit
    # omitted column without a default: the file simply lacks the
    # column and those rows read NULL (pre-existing lenient contract)
    t.append(_rows(spark, [90], with_value=False))
    assert {
        r["value"]
        for r in t.snapshot().filter(F.col("event_id") == 90).collect()
    } == {None}
    t.set_column_default("value", "CAST(-1.0 AS DOUBLE)")
    proto = t.state().protocol
    assert proto["minWriterVersion"] == 7
    assert "allowColumnDefaults" in proto["writerFeatures"]
    assert _default_of(t, "value") == "CAST(-1.0 AS DOUBLE)"
    t.append(_rows(spark, [2, 3], with_value=False))     # default -1.0
    # CURRENT_DEFAULT semantics: a new default affects only FUTURE
    # omitted writes; already-materialized values never change
    t.set_column_default("value", "99.5")
    t.append(_rows(spark, [4], with_value=False))        # default 99.5
    t.append(_rows(spark, [5]))                          # explicit wins
    got = {
        r["event_id"]: r["value"] for r in t.snapshot().collect()
    }
    assert got == {
        0: 0.0, 1: 1.0, 2: -1.0, 3: -1.0, 4: 99.5, 5: 5.0, 90: None
    }
    # drop: omitted writes go back to NULL; materialized values stay
    t.drop_column_default("value")
    assert _default_of(t, "value") is None
    t.append(_rows(spark, [91], with_value=False))
    now = {r["event_id"]: r["value"] for r in t.snapshot().collect()}
    assert now == {**got, 91: None}
    # the feature flag legitimately stays in the protocol
    assert "allowColumnDefaults" in t.state().protocol["writerFeatures"]


def test_default_overwrite_and_explicit_null(spark, tmp_path):
    t = DeltaProtocolTable(spark, str(tmp_path / "t"))
    t.create(_rows(spark, [0]))
    t.set_column_default("value", "7.5")
    t.overwrite(_rows(spark, [1, 2], with_value=False))
    assert {
        (r["event_id"], r["value"]) for r in t.snapshot().collect()
    } == {(1, 7.5), (2, 7.5)}
    # an EXPLICIT NULL is a provided value — the default never
    # overwrites it
    withnull = spark.createDataFrame(
        [(3, "u3", None)], "event_id long, user_id string, value double"
    )
    t.append(withnull)
    got = {r["event_id"]: r["value"] for r in t.snapshot().collect()}
    assert got[3] is None


def test_default_validation_refusals(spark, tmp_path):
    t = DeltaProtocolTable(spark, str(tmp_path / "t"))
    t.create(_rows(spark, [0]))
    with pytest.raises(DeltaProtocolError, match="no column"):
        t.set_column_default("ghost", "1")
    # column references are not self-contained
    with pytest.raises(DeltaProtocolError, match="self-contained"):
        t.set_column_default("value", "event_id + 1")
    # un-castable expression
    with pytest.raises(DeltaProtocolError, match="self-contained"):
        t.set_column_default("value", "array(1, 2)")
    # garbage SQL
    with pytest.raises(DeltaProtocolError, match="self-contained"):
        t.set_column_default("value", "SELECT FROM WHERE")
    with pytest.raises(DeltaProtocolError, match="no default"):
        t.drop_column_default("value")
    # new columns cannot arrive with a default
    with pytest.raises(DeltaProtocolError, match="set_column_default"):
        t.add_columns(
            T.StructType(
                [
                    T.StructField(
                        "extra",
                        T.LongType(),
                        True,
                        metadata={"CURRENT_DEFAULT": "1"},
                    )
                ]
            )
        )
    # but add-then-set works, and only post-ALTER omitted writes fill
    t.add_columns(
        T.StructType([T.StructField("extra", T.LongType(), True)])
    )
    t.set_column_default("extra", "42")
    t.append(_rows(spark, [1]))  # omits extra -> 42
    got = {r["event_id"]: r["extra"] for r in t.snapshot().collect()}
    assert got == {0: None, 1: 42}  # old files read NULL, per spec


def test_default_on_identity_or_generated_refused(spark, tmp_path):
    t = DeltaProtocolTable(spark, str(tmp_path / "tid"))
    schema = T.StructType(
        [
            T.StructField(
                "id",
                T.LongType(),
                True,
                metadata={"delta.identity.start": 1,
                          "delta.identity.step": 1,
                          "delta.identity.allowExplicitInsert": True},
            ),
            T.StructField("payload", T.StringType(), True),
        ]
    )
    t.create(spark.createDataFrame([], schema))
    with pytest.raises(DeltaProtocolError, match="identity"):
        t.set_column_default("id", "1")


def test_default_merge_insert_refused(spark, tmp_path):
    t = DeltaProtocolTable(spark, str(tmp_path / "t"))
    t.create(_rows(spark, [0, 1]))
    t.set_column_default("value", "5.0")
    src = _rows(spark, [1, 2], with_value=False)
    with pytest.raises(UnsupportedTableFeatureError, match="CURRENT_DEFAULT"):
        t.merge(src, key="event_id")
    # update-only merges stay legal (no inserted rows to fill)
    out = t.merge(src, key="event_id", insert=False)
    assert out["version"] >= 1
    # and a source CARRYING the column merges fine with inserts
    t.merge(_rows(spark, [2, 3]), key="event_id")
    assert t.snapshot().count() == 4


def test_default_survives_time_travel_and_clone(spark, tmp_path):
    t = DeltaProtocolTable(spark, str(tmp_path / "t"))
    t.create(_rows(spark, [0]))
    t.set_column_default("value", "3.25")
    v = t.append(_rows(spark, [1], with_value=False))
    t.append(_rows(spark, [2]))
    # time travel to the defaulted append shows the materialized value
    old = {
        r["event_id"]: r["value"]
        for r in t.snapshot(version=v).collect()
    }
    assert old == {0: 0.0, 1: 3.25}
    # a shallow clone carries the default and keeps honoring it
    c = t.shallow_clone(str(tmp_path / "c"))
    assert _default_of(c, "value") == "3.25"
    c.append(_rows(spark, [7], with_value=False))
    got = {r["event_id"]: r["value"] for r in c.snapshot().collect()}
    assert got[7] == 3.25


def test_create_with_default_refused(spark, tmp_path):
    """The create-time smuggling gate (mirror of add_columns'): a
    CURRENT_DEFAULT arriving through create would stamp the schema
    without the allowColumnDefaults feature flag — refused with the
    fix spelled out."""
    t = DeltaProtocolTable(spark, str(tmp_path / "t"))
    df = spark.createDataFrame(
        [],
        T.StructType([
            T.StructField("event_id", T.LongType(), True),
            T.StructField(
                "value", T.DoubleType(), True,
                metadata={"CURRENT_DEFAULT": "5.0"},
            ),
        ]),
    )
    with pytest.raises(DeltaProtocolError, match="set_column_default"):
        t.create(df)


def test_defaults_ignored_without_feature_flag(spark, tmp_path):
    """A schema carrying CURRENT_DEFAULT while the protocol lacks
    allowColumnDefaults (a malformed table some other writer produced)
    must NOT be honored: a conformant external writer would write
    NULLs, and materializing the default here would put
    writer-divergent data in the same table."""
    t = DeltaProtocolTable(spark, str(tmp_path / "t"))
    t.create(_rows(spark, [0]))
    # stamp the default into the schema WITHOUT the protocol feature
    # (raw metaData commit — simulating the malformed external table)
    st = t.state()
    sj = json.loads(st.metadata["schemaString"])
    for f in sj["fields"]:
        if f["name"] == "value":
            f["metadata"] = {"CURRENT_DEFAULT": "5.0"}
    meta = dict(st.metadata)
    meta["schemaString"] = json.dumps(sj)
    t._commit(st.version + 1, [{"metaData": meta}], "CHANGE COLUMN")
    assert "allowColumnDefaults" not in (
        (t.state().protocol or {}).get("writerFeatures") or []
    )
    t.append(_rows(spark, [1], with_value=False))
    got = {r["event_id"]: r["value"] for r in t.snapshot().collect()}
    assert got == {0: 0.0, 1: None}  # NULL, not 5.0
