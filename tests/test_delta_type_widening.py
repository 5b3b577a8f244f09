"""Type widening (delta_protocol.widen_column; PROTOCOL.md §Type
Widening): metadata-only type changes — old files keep their narrow
physical type and the reader upcasts per file against the logical
schema, so a widen never rewrites data. Covers the lifecycle (widen
then append wider values), schema/metadata/protocol shape, time
travel to the narrow schema, stats pruning on mixed-width files,
checkpoint fold, exact value preservation, and the refusal matrix
(narrowing, non-widening, byte/short→decimal capability gate)."""

import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from featureform_spark.sources.delta_protocol import (
    DeltaProtocolError,
    DeltaProtocolTable,
    UnsupportedTableFeatureError,
    _widening_allowed,
)


def _mk(spark, path, dtype="int"):
    t = DeltaProtocolTable(spark, path)
    t.create(
        spark.range(10).select(
            F.col("id").cast("long").alias("k"),
            F.col("id").cast(dtype).alias("v"),
        )
    )
    return t


def test_widen_int_to_long_lifecycle(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    t.widen_column("v", "long")
    assert dict(t.state().schema.fields[1].metadata)[
        "delta.typeChanges"
    ] == [{"fromType": "integer", "toType": "long"}]
    # wider-than-int values append fine now
    t.append(
        spark.range(2).select(
            (F.col("id") + 100).alias("k"),
            (F.col("id") + 2**40).alias("v"),
        )
    )
    df = t.snapshot()
    assert df.schema["v"].dataType == T.LongType()
    vals = sorted(r["v"] for r in df.collect())
    assert vals == list(range(10)) + [2**40, 2**40 + 1]
    # protocol upgraded with the feature in BOTH lists
    proto = t.state().protocol
    assert "typeWidening" in proto["readerFeatures"]
    assert "typeWidening" in proto["writerFeatures"]


def test_widen_time_travel_keeps_narrow_schema(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    t.widen_column("v", "long")
    assert t.snapshot(0).schema["v"].dataType == T.IntegerType()
    assert t.snapshot().schema["v"].dataType == T.LongType()


def test_widen_float_double_and_decimal_exact(spark, tmp_path):
    t = DeltaProtocolTable(spark, str(tmp_path / "t"))
    t.create(
        spark.range(5).select(
            F.col("id").cast("float").alias("f"),
            F.col("id").cast("decimal(5,2)").alias("d"),
        )
    )
    t.widen_column("f", "double")
    t.widen_column("d", "decimal(12,4)")
    rows = sorted(tuple(r) for r in t.snapshot().collect())
    assert rows[3][0] == 3.0  # float 3.0 upcasts exactly
    assert str(rows[3][1]) == "3.0000"
    sch = t.state().schema
    assert sch["f"].dataType == T.DoubleType()
    assert sch["d"].dataType == T.DecimalType(12, 4)


def test_widen_stats_pruning_survives(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    t.append(
        spark.range(3).select(
            (F.col("id") + 50).alias("k"),
            (F.col("id") + 1000).cast("int").alias("v"),
        )
    )
    t.widen_column("v", "long")
    t.append(
        spark.range(3).select(
            (F.col("id") + 60).alias("k"),
            (F.col("id") + 2**35).alias("v"),
        )
    )
    df = t.snapshot_pruned("v", 1000, 1002)
    assert t._last_prune["files_read"] < t._last_prune["files_total"]
    assert sorted(r["v"] for r in df.collect()) == [1000, 1001, 1002]


def test_widen_checkpoint_roundtrip(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    t.widen_column("v", "long")
    t.append(
        spark.range(2).select(
            (F.col("id") + 20).alias("k"), (F.col("id") + 2**33).alias("v")
        )
    )
    t.checkpoint()
    t.clean_log()
    t2 = DeltaProtocolTable(spark, str(tmp_path / "t"))
    assert t2.snapshot().schema["v"].dataType == T.LongType()
    assert t2.snapshot().count() == 12


def test_widen_refusals(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"), dtype="long")
    with pytest.raises(DeltaProtocolError, match="not an allowed"):
        t.widen_column("v", "integer")  # narrowing
    with pytest.raises(DeltaProtocolError, match="not an allowed"):
        t.widen_column("v", "string")
    with pytest.raises(DeltaProtocolError, match="not an allowed"):
        t.widen_column("v", "decimal(19,0)")  # long needs p-s >= 20
    with pytest.raises(DeltaProtocolError, match="no column"):
        t.widen_column("nope", "long")
    t.widen_column("v", "decimal(21,1)")  # p-s = 20: allowed


def test_byte_history_blocks_decimal(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"), dtype="byte")
    t.widen_column("v", "integer")
    # files written as int8 pages can never promote to decimal
    with pytest.raises(UnsupportedTableFeatureError, match="byte/short"):
        t.widen_column("v", "decimal(12,0)")
    t.widen_column("v", "long")  # int-family stays open


def test_date_to_timestamp_ntz(spark, tmp_path):
    t = DeltaProtocolTable(spark, str(tmp_path / "t"))
    t.create(
        spark.range(3).select(
            F.date_from_unix_date(F.col("id").cast("int")).alias("dt")
        )
    )
    t.widen_column("dt", "timestamp_ntz")
    proto = t.state().protocol
    assert "timestampNtz" in proto["readerFeatures"]
    rows = sorted(r["dt"].isoformat() for r in t.snapshot().collect())
    assert rows[1] == "1970-01-02T00:00:00"


def test_widening_allowed_matrix():
    assert _widening_allowed("byte", "short")
    assert _widening_allowed("short", "double")
    assert _widening_allowed("integer", "decimal(10,0)")
    assert not _widening_allowed("integer", "decimal(11,2)")  # p-s = 9
    assert _widening_allowed("decimal(5,2)", "decimal(7,4)")
    assert not _widening_allowed("decimal(5,2)", "decimal(7,1)")  # scale drop
    assert not _widening_allowed("long", "long")
    assert not _widening_allowed("double", "float")
    assert not _widening_allowed("string", "long")


def test_generated_partition_pruning(spark, tmp_path):
    """delta-spark's generated-column partition filters: a range
    filter on ts prunes partitions generated as CAST(ts AS DATE) /
    YEAR(ts) — even for files carrying no ts stats."""
    from pyspark.sql import functions as F
    import datetime as dtm

    schema = T.StructType(
        [
            T.StructField("ts", T.TimestampType(), True),
            T.StructField("v", T.LongType(), True),
            T.StructField(
                "d", T.DateType(), True,
                metadata={
                    "delta.generationExpression": "CAST(ts AS DATE)"
                },
            ),
        ]
    )
    t = DeltaProtocolTable(spark, str(tmp_path / "t"))
    t.create(spark.createDataFrame([], schema), partition_by=["d"])
    # 10 days x 10 rows; the generated column is computed on append
    t.append(
        spark.range(100).select(
            (
                F.lit("2024-03-01 00:00:00").cast("timestamp")
                + F.make_interval(days=(F.col("id") % 10).cast("int"))
            ).alias("ts"),
            F.col("id").alias("v"),
        )
    )
    df = t.snapshot_pruned(
        "ts",
        dtm.datetime(2024, 3, 2, 0, 0),
        dtm.datetime(2024, 3, 4, 23, 59),
    )
    prune = t._last_prune
    assert prune["files_read"] < prune["files_total"]
    assert prune["files_read"] <= 3  # exactly the 3 matching days
    assert df.count() == 30
    # non-monotonic generation shapes must NOT derive bounds
    st = t.state()
    assert DeltaProtocolTable._generated_partition_bounds(
        st, "v", 0, 1
    ) == []


def test_generated_partition_pruning_year(spark, tmp_path):
    from pyspark.sql import functions as F
    import datetime as dtm

    schema = T.StructType(
        [
            T.StructField("ts", T.TimestampType(), True),
            T.StructField(
                "y", T.IntegerType(), True,
                metadata={"delta.generationExpression": "year(ts)"},
            ),
        ]
    )
    t = DeltaProtocolTable(spark, str(tmp_path / "t"))
    t.create(spark.createDataFrame([], schema), partition_by=["y"])
    t.append(
        spark.range(30).select(
            F.concat(
                (F.lit(2020) + F.col("id") % 3).cast("string"),
                F.lit("-06-15 12:00:00"),
            )
            .cast("timestamp")
            .alias("ts"),
        )
    )
    df = t.snapshot_pruned(
        "ts", dtm.datetime(2021, 1, 1), dtm.datetime(2021, 12, 31)
    )
    assert t._last_prune["files_read"] < t._last_prune["files_total"]
    assert df.count() == 10


def test_generated_bounds_pattern_case_sensitivity(spark, tmp_path):
    """Review regression: 'yyyy-MM-dd' (date) derives bounds; the
    case-folded near-miss 'yyyy-mm-dd' (MINUTES — non-monotonic) and
    month()/day() must not."""
    cases = {
        "DATE_FORMAT(ts, 'yyyy-MM-dd')": True,
        "date_format(ts, 'yyyy-MM-dd')": True,
        "date_format(ts, 'yyyy-mm-dd')": False,  # minutes!
        "CAST(ts AS DATE)": True,
        "cast(ts as date)": True,
        "month(ts)": False,
        "day(ts)": False,
        "YEAR(ts)": True,
    }
    for expr, expect in cases.items():
        schema = T.StructType(
            [
                T.StructField("ts", T.TimestampType(), True),
                T.StructField(
                    "p", T.StringType(), True,
                    metadata={"delta.generationExpression": expr},
                ),
            ]
        )
        t = DeltaProtocolTable(
            spark, str(tmp_path / expr.replace("'", "").replace("(", "_")
                       .replace(")", "_").replace(",", "_").replace(" ", ""))
        )
        t.create(spark.createDataFrame([], schema), partition_by=["p"])
        st = t.state()
        got = DeltaProtocolTable._generated_partition_bounds(
            st, "ts", "2024-03-01 00:00:00", "2024-03-31 23:59:59"
        )
        assert bool(got) == expect, expr


def test_widen_malformed_decimal_strings(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    for bad in ("decimal(10)", "decimal(1,2,3)", "decimal(x,y)"):
        with pytest.raises(DeltaProtocolError, match="not an allowed"):
            t.widen_column("v", bad)
