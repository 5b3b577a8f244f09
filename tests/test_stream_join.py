"""Stream-stream interval join: streaming replay equals the batch
interval join of the same inputs."""

import datetime as dt
import os

from pyspark.sql import functions as F

from featureform_spark.streaming.joins import interval_join_streams

SCHEMA_L = "user long, ts timestamp, click string"
SCHEMA_R = "user long, ts timestamp, amount double"

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _mins(m):
    return T0 + dt.timedelta(minutes=m)


CLICKS = [
    (1, _mins(0), "adA"),
    (1, _mins(40), "adB"),
    (2, _mins(5), "adC"),
]
BUYS = [
    (1, _mins(10), 9.0),   # joins adA (within 30 min)
    (1, _mins(45), 5.0),   # joins adB (and NOT adA: 45 > 0+30)
    (2, _mins(50), 7.0),   # joins nothing (45 min after adC)
]


def test_streaming_equals_batch(spark, tmp_path):
    lsrc, rsrc = tmp_path / "l", tmp_path / "r"
    spark.createDataFrame(CLICKS, SCHEMA_L).coalesce(1).write.parquet(str(lsrc))
    spark.createDataFrame(BUYS, SCHEMA_R).coalesce(1).write.parquet(str(rsrc))

    batch = interval_join_streams(
        spark.read.parquet(str(lsrc)),
        spark.read.parquet(str(rsrc)),
        key="user", left_ts="ts", right_ts="ts", within_seconds=1800,
    )
    expected = sorted(
        (r.user, r.l_click, r.r_amount) for r in batch.collect()
    )
    assert expected == [(1, "adA", 9.0), (1, "adB", 5.0)]

    streamed = interval_join_streams(
        spark.readStream.schema(SCHEMA_L).parquet(str(lsrc)),
        spark.readStream.schema(SCHEMA_R).parquet(str(rsrc)),
        key="user", left_ts="ts", right_ts="ts", within_seconds=1800,
    )
    q = (
        streamed.writeStream.format("memory")
        .queryName("attr_join")
        .option("checkpointLocation", str(tmp_path / "cp"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r.user, r.l_click, r.r_amount)
        for r in spark.sql("SELECT * FROM attr_join").collect()
    )
    assert got == expected


def test_left_outer_keeps_unattributed(spark, tmp_path):
    l = spark.createDataFrame(CLICKS, SCHEMA_L)
    r = spark.createDataFrame(BUYS, SCHEMA_R)
    out = interval_join_streams(
        l, r, key="user", left_ts="ts", right_ts="ts",
        within_seconds=1800, join_type="left_outer",
    )
    rows = out.collect()
    assert len(rows) == 3  # adC click retained with NULL purchase
    unattr = [r for r in rows if r.r_amount is None]
    assert len(unattr) == 1 and unattr[0].l_click == "adC"
