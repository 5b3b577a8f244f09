"""End-to-end streaming pipeline over the round-5 registered sources:
kafka-wire topic → registered filetopic streaming source → declarative
parse/transform → exactly-once Delta-protocol sink → registered
deltaprotocol streaming source reads the results back — the reference's
topic → transformation → store loop
(offline_store_spark_runner.py:271-415, :920-949) executed entirely on
Spark's own streaming machinery, no broker or vendor jar."""

import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from featureform_spark.sources.delta_protocol import DeltaProtocolTable
from featureform_spark.sources.deltaprotocol_datasource import (
    register as register_delta_source,
)
from featureform_spark.sources.filetopic_datasource import (
    register as register_filetopic,
)
from featureform_spark.sources.kafka import FileTopic, parse_topic
from featureform_spark.streaming.incremental import stream_to_delta_protocol

VALUE_SCHEMA = T.StructType(
    [
        T.StructField("user", T.StringType()),
        T.StructField("amount", T.DoubleType()),
    ]
)


def test_topic_to_delta_to_stream_roundtrip(spark, tmp_path):
    register_filetopic(spark)
    register_delta_source(spark)
    topic = FileTopic(str(tmp_path), "tx", num_partitions=2)
    topic.create_topic_if_not_exists()
    topic.write(
        [(f"u{i % 4}", {"user": f"u{i % 4}", "amount": float(i)}) for i in range(40)]
    )

    table = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def run_sink():
        src = (
            spark.readStream.format("filetopic")
            .options(path=str(tmp_path), topic="tx")
            .load()
        )
        q = stream_to_delta_protocol(
            src,
            table,
            app_id="tx-pipeline",
            checkpoint=ckpt,
            transform=lambda b: parse_topic(b, VALUE_SCHEMA).select(
                "key", "user", "amount", "offset", "partition"
            ),
        )
        q.awaitTermination(120)

    run_sink()
    t = DeltaProtocolTable(spark, table)
    assert t.snapshot().count() == 40
    # replaying the WHOLE pipeline from the same checkpoint is a no-op
    # (source offsets + SetTransaction both protect it)
    run_sink()
    assert t.snapshot().count() == 40
    # late messages flow through incrementally, exactly once
    topic.write([(f"u{i % 4}", {"user": f"u{i % 4}", "amount": 500.0}) for i in range(7)])
    run_sink()
    assert t.snapshot().count() == 47
    assert t.snapshot().filter(F.col("amount") == 500.0).count() == 7

    # downstream: the sink table is itself a streaming source
    out = str(tmp_path / "downstream")
    q = (
        spark.readStream.format("deltaprotocol")
        .options(path=table)
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    assert got.count() == 47
    assert got.select("offset", "partition", "user").distinct().count() == 47
