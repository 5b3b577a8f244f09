"""Materialization truth tables from the reference
(provider/offline_test.go:281-410, summarized in FIXTURES.md §3a)."""

from datetime import datetime

from pyspark.sql import types as T

from featureform_spark.operators.materialize import (
    iterate_segment,
    materialize_latest,
    with_row_index,
)

EPOCH0 = datetime(1970, 1, 1)
SCHEMA = "entity string, value int, ts timestamp, ord long"


def rows(df):
    return {(r["entity"], r["value"], r["ts"]) for r in df.collect()}


def t(day):
    return datetime(2021, 1, day)


def test_empty(spark):
    df = spark.createDataFrame([], SCHEMA)
    out = materialize_latest(df, "entity", "value", "ts", "ord")
    assert out.count() == 0


def test_no_overlap_no_ts(spark):
    df = spark.createDataFrame(
        [("a", 1, None, 0), ("b", 2, None, 1), ("c", 3, None, 2)], SCHEMA
    )
    out = materialize_latest(df, "entity", "value", "ts", "ord")
    assert rows(out) == {("a", 1, EPOCH0), ("b", 2, EPOCH0), ("c", 3, EPOCH0)}


def test_simple_overwrite_no_ts_insertion_order_wins(spark):
    df = spark.createDataFrame(
        [("a", 1, None, 0), ("b", 2, None, 1), ("c", 3, None, 2), ("a", 4, None, 3)],
        SCHEMA,
    )
    out = materialize_latest(df, "entity", "value", "ts", "ord")
    assert rows(out) == {("a", 4, EPOCH0), ("b", 2, EPOCH0), ("c", 3, EPOCH0)}


def test_simple_changes(spark):
    df = spark.createDataFrame(
        [("a", 1, t(1), 0), ("b", 2, t(1), 1), ("c", 3, t(1), 2), ("a", 4, t(2), 3)],
        SCHEMA,
    )
    out = materialize_latest(df, "entity", "value", "ts", "ord")
    assert rows(out) == {("a", 4, t(2)), ("b", 2, t(1)), ("c", 3, t(1))}


def test_out_of_order_writes(spark):
    df = spark.createDataFrame(
        [
            ("a", 1, t(10), 0),
            ("b", 2, t(3), 1),
            ("c", 3, t(7), 2),
            ("c", 9, t(5), 3),
            ("a", 4, t(1), 4),
        ],
        SCHEMA,
    )
    out = materialize_latest(df, "entity", "value", "ts", "ord")
    assert rows(out) == {("a", 1, t(10)), ("b", 2, t(3)), ("c", 3, t(7))}


def test_out_of_order_overwrites_last_write_wins_on_equal_ts(spark):
    df = spark.createDataFrame(
        [
            ("a", 1, t(10), 0),
            ("b", 2, t(3), 1),
            ("c", 3, t(7), 2),
            ("b", 12, t(2), 3),
            ("c", 9, t(5), 4),
            ("b", 9, t(3), 5),  # duplicate ts for b, written later → wins
            ("a", 4, t(1), 6),
        ],
        SCHEMA,
    )
    out = materialize_latest(df, "entity", "value", "ts", "ord")
    assert rows(out) == {("a", 1, t(10)), ("b", 9, t(3)), ("c", 3, t(7))}


def test_row_index_and_segment_iteration(spark):
    df = spark.createDataFrame(
        [("a", 1, t(1), 0), ("b", 2, t(1), 1), ("c", 3, t(1), 2)], SCHEMA
    )
    mat = materialize_latest(df, "entity", "value", "ts", "ord")
    idx = with_row_index(mat, order_cols=["entity"])
    got = {(r["entity"], r["row_number"]) for r in idx.collect()}
    assert got == {("a", 1), ("b", 2), ("c", 3)}
    # SubSegmentNoOverlap: segment (1, 2] = b
    seg = iterate_segment(idx, 1, 2)
    assert [r["entity"] for r in seg.collect()] == ["b"]


def test_row_index_dense_and_unique_at_scale(spark, sf_dir):
    from featureform_spark.sources.testdata import load_table

    df = load_table(spark, sf_dir, "events")
    idx = with_row_index(df)
    n = df.count()
    stats = idx.selectExpr(
        "count(distinct row_number) u", "min(row_number) lo", "max(row_number) hi"
    ).collect()[0]
    assert (stats["u"], stats["lo"], stats["hi"]) == (n, 1, n)


def test_wide_materialize_one_pass(spark):
    from featureform_spark.operators.materialize import wide_materialize

    df = spark.createDataFrame(
        [("a", 1, t(1), 0, "x"), ("a", 2, t(2), 1, "x"),
         ("a", 9, t(1), 2, "y"), ("b", 5, t(1), 3, "x"),
         ("a", 7, t(3), 4, "z")],  # key z not requested → ignored
        "entity string, value int, ts timestamp, ord long, k string",
    )
    out = wide_materialize(df, "entity", "value", "k", ["x", "y"],
                           ts_col="ts", order_col="ord")
    rows = {r["entity"]: (r["f_x"], r["f_y"]) for r in out.collect()}
    assert rows == {"a": (2, 9), "b": (5, None)}
