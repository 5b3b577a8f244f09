"""The registered filetopic data source (Spark 4 Python Data Source
API): batch topic-partition splits and REAL Structured Streaming
offset progression — checkpointed exactly-once restarts included —
against the FileTopic spool (S8/ST2 without a broker)."""

import os
import time

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from featureform_spark.sources.filetopic_datasource import register
from featureform_spark.sources.kafka import FileTopic, parse_topic

VALUE_SCHEMA = T.StructType(
    [
        T.StructField("user", T.StringType()),
        T.StructField("amount", T.DoubleType()),
    ]
)


@pytest.fixture()
def topic(spark, tmp_path):
    t = FileTopic(str(tmp_path), "events", num_partitions=3)
    t.create_topic_if_not_exists()
    register(spark)
    return t


def _write(t, n, base=0):
    t.write(
        [
            (f"u{i % 5}", {"user": f"u{i % 5}", "amount": float(base + i)})
            for i in range(n)
        ]
    )


def test_batch_read_matches_filetopic(spark, tmp_path, topic):
    _write(topic, 40)
    via_ds = spark.read.format("filetopic").options(
        path=str(tmp_path), topic="events"
    ).load()
    assert [(f.name, f.dataType) for f in via_ds.schema.fields] == [
        (f.name, f.dataType) for f in topic.batch(spark).schema.fields
    ]
    def rows(df):
        return sorted(map(tuple, df.collect()))

    a = rows(via_ds)
    b = rows(topic.batch(spark))
    assert len(a) == len(b) == 40
    for ra, rb in zip(a, b):
        # timestamps spool as float seconds; Python fromtimestamp and
        # Spark timestamp_seconds can round the LAST microsecond apart
        # — truncating to a fixed grain still flakes when the stray
        # microsecond crosses the grain boundary, so compare the pair
        # with a 1ms tolerance instead
        assert ra[:5] == rb[:5] and ra[6] == rb[6]
        assert abs((ra[5] - rb[5]).total_seconds()) <= 0.001
    # one input partition per topic partition (kafka's split shape)
    assert via_ds.rdd.getNumPartitions() == 3
    # the parse pipeline is source-agnostic
    parsed = parse_topic(via_ds, VALUE_SCHEMA)
    assert parsed.filter(F.col("amount") >= 0).count() == 40


def test_stream_offsets_progress_and_resume(spark, tmp_path, topic):
    """availableNow drains to the current end offsets; a restart from
    the same checkpoint reads ONLY records appended since — Spark's own
    offset log drives exactly-once progression."""
    _write(topic, 30)
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def drain():
        q = (
            spark.readStream.format("filetopic")
            .options(path=str(tmp_path), topic="events")
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drain()
    got = spark.read.parquet(out)
    assert got.count() == 30
    _write(topic, 12, base=1000)
    drain()
    got = spark.read.parquet(out)
    assert got.count() == 42
    # no record read twice
    assert got.select("partition", "offset").distinct().count() == 42


def test_stream_max_offsets_per_trigger(spark, tmp_path, topic):
    """maxOffsetsPerTrigger caps each micro-batch at 10 records.
    (With availableNow the capped end IS what the engine sees as
    'available' — the Python source API has no separate admission
    probe — so each drain advances one capped batch; a processing-time
    stream batches the same way continuously.)"""
    _write(topic, 25)
    ckpt = str(tmp_path / "ckpt2")
    out = str(tmp_path / "out2")

    def drain():
        q = (
            spark.readStream.format("filetopic")
            .options(
                path=str(tmp_path), topic="events", maxOffsetsPerTrigger="10"
            )
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return spark.read.parquet(out).count()

    counts = [drain()]
    while counts[-1] < 25 and len(counts) < 6:
        counts.append(drain())
    assert counts[0] == 10          # first batch capped
    assert counts[-1] == 25         # converges to the full topic
    assert len(counts) == 3         # 10 + 10 + 5


def test_stream_starting_offsets_latest(spark, tmp_path, topic):
    _write(topic, 15)
    ckpt = str(tmp_path / "ckpt3")
    out = str(tmp_path / "out3")

    def drain():
        q = (
            spark.readStream.format("filetopic")
            .options(
                path=str(tmp_path), topic="events", startingOffsets="latest"
            )
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drain()  # latest: the 15 pre-existing records are skipped
    _write(topic, 7, base=500)
    drain()
    got = spark.read.parquet(out)
    assert got.count() == 7
    assert {r["amount"] for r in parse_topic(got, VALUE_SCHEMA).collect()} == {
        float(500 + i) for i in range(7)
    }


def test_windowed_agg_over_stream(spark, tmp_path, topic):
    """The full streaming pipeline the reference runs on kafka:
    wire → parse → event-time window + watermark → sink."""
    _write(topic, 20)
    out_tbl = f"ft_win_{int(time.time())}"
    src = (
        spark.readStream.format("filetopic")
        .options(path=str(tmp_path), topic="events")
        .load()
    )
    agg = (
        parse_topic(src, VALUE_SCHEMA)
        .withWatermark("kafka_ts", "1 minute")
        .groupBy(F.window("kafka_ts", "5 minutes"), F.col("user"))
        .agg(F.sum("amount").alias("total"), F.count("*").alias("n"))
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(out_tbl)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql(f"SELECT * FROM {out_tbl}").collect()
    assert sum(r["n"] for r in rows) == 20
    assert {r["user"] for r in rows} == {f"u{i}" for i in range(5)}
