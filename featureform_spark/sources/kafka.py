"""Kafka topic I/O (S8/ST2), Spark-first.

The reference ships a kafka-python client (topic CRUD + JSON-serialized
values with string keys) and wires streams through it
(provider/scripts/spark/offline_store_spark_runner.py:271-415). The
Spark-native equivalent is the ``kafka`` structured-streaming source:
declare the topic + offsets as reader options, decode the wire columns
declaratively (``CAST(value AS STRING)`` + ``from_json``), and let every
downstream operator (watermarks, stateful aggs, ``stream_to_online``) be
ordinary Structured Streaming.

Two paths share one parse pipeline:

- ``read_kafka_stream``: the real ``format("kafka")`` connector. The
  connector jar (spark-sql-kafka) is not bundled in this container, so
  the call raises an actionable error at ``load()`` when absent — the
  same gating as the warehouse JDBC readers.
- ``FileTopic``: a broker emulator with the reference KafkaClient's API
  surface (create/exists/delete/write/read) that spools records to JSON
  segment files and replays them — batch or as a file-source stream —
  in the EXACT Kafka wire schema (key/value binary, topic, partition,
  offset, timestamp, timestampType). Downstream code cannot tell the
  difference, which is the point: tests drive the full
  topic → parse → stream_to_online loop end-to-end without a broker,
  and swapping in the real source changes only the reader call.
- ``filetopic_datasource``: the emulator lifted into a REGISTERED
  Spark data source (Spark 4 Python Data Source API) —
  ``spark.readStream.format("filetopic")`` runs genuine Structured
  Streaming per-partition offset progression (startingOffsets,
  maxOffsetsPerTrigger, checkpointed exactly-once restarts) rather
  than file discovery.

Offsets are per-partition append counters; keys hash-route to
partitions like Kafka's default partitioner (murmur-ish stability is
not required — only per-partition order, which Kafka alone guarantees).
"""

from __future__ import annotations

import json
import os
import time
import uuid
import zlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# The structured-streaming kafka source's fixed output schema
# (spark-sql-kafka's KafkaRecordToRowConverter).
KAFKA_WIRE_SCHEMA = T.StructType(
    [
        T.StructField("key", T.BinaryType()),
        T.StructField("value", T.BinaryType()),
        T.StructField("topic", T.StringType()),
        T.StructField("partition", T.IntegerType()),
        T.StructField("offset", T.LongType()),
        T.StructField("timestamp", T.TimestampType()),
        T.StructField("timestampType", T.IntegerType()),
    ]
)


def kafka_options(
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
    fail_on_data_loss: bool = False,
) -> dict[str, str]:
    """The exact option set handed to the kafka source — kept as data so
    tests can pin the contract (reference reads from earliest with
    auto-commit, :388-396)."""
    return {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": topic,
        "startingOffsets": starting_offsets,
        "failOnDataLoss": str(fail_on_data_loss).lower(),
    }


def read_kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
) -> DataFrame:
    """S8: the real connector path. Raises an actionable error when the
    spark-sql-kafka jar is absent from the classpath."""
    reader = spark.readStream.format("kafka")
    for k, v in kafka_options(bootstrap_servers, topic, starting_offsets).items():
        reader = reader.option(k, v)
    try:
        return reader.load()
    except Exception as e:
        raise RuntimeError(
            f"reading Kafka topic {topic!r} requires the spark-sql-kafka "
            "connector jar on the Spark classpath "
            "(--packages org.apache.spark:spark-sql-kafka-0-10_2.13)"
        ) from e


def parse_topic(df: DataFrame, value_schema: T.StructType) -> DataFrame:
    """Decode kafka wire rows: key → string, JSON value → typed columns
    (the reference's json.loads value deserializer, :393), keeping the
    stream metadata. Works identically on the real source and FileTopic
    replays — both present KAFKA_WIRE_SCHEMA."""
    return df.select(
        F.col("key").cast("string").alias("key"),
        F.from_json(F.col("value").cast("string"), value_schema).alias("v"),
        "topic",
        "partition",
        "offset",
        F.col("timestamp").alias("kafka_ts"),
    ).select("key", "v.*", "topic", "partition", "offset", "kafka_ts")


class TopicNotFoundError(Exception):
    pass


class FileTopic:
    """Reference KafkaClient API (:271-415) over a spool directory.

    Layout: ``<root>/<topic>/p<partition>/<offset padded>.json`` — one
    record per file so a Spark file-source stream discovers appends
    incrementally (maxFilesPerTrigger batches them like poll() batches).
    """

    def __init__(self, root: str, topic: str, num_partitions: int = 1):
        self.root = str(root)
        self.topic = topic
        self.num_partitions = num_partitions
        self._dir = os.path.join(self.root, topic)

    # -- topic CRUD (reference :315-384) ----------------------------------

    def exists(self) -> bool:
        return os.path.isdir(self._dir)

    def create_topic_if_not_exists(self) -> None:
        for p in range(self.num_partitions):
            os.makedirs(os.path.join(self._dir, f"p{p}"), exist_ok=True)

    def delete(self) -> None:
        import shutil

        shutil.rmtree(self._dir, ignore_errors=True)

    # -- producer (reference :337-361) ------------------------------------

    def _partition_for(self, key: str) -> int:
        return zlib.crc32(str(key).encode()) % self.num_partitions

    def write(self, key_value_data: list[tuple]) -> None:
        """JSON-serialize values, stringify keys (the reference's
        serializers), append at the next per-partition offset."""
        self.create_topic_if_not_exists()
        for key, value in key_value_data:
            p = self._partition_for(key)
            pdir = os.path.join(self._dir, f"p{p}")
            offset = sum(1 for n in os.listdir(pdir) if n.endswith(".json"))
            rec = {
                "key": str(key),
                "value": json.dumps(value),
                "topic": self.topic,
                "partition": p,
                "offset": offset,
                "timestamp": time.time(),
            }
            tmp = os.path.join(pdir, f".{uuid.uuid4().hex}.tmp")
            with open(tmp, "w") as f:
                json.dump(rec, f)
            os.replace(tmp, os.path.join(pdir, f"{offset:020d}.json"))

    create = write

    # -- consumers ---------------------------------------------------------

    _FILE_SCHEMA = T.StructType(
        [
            T.StructField("key", T.StringType()),
            T.StructField("value", T.StringType()),
            T.StructField("topic", T.StringType()),
            T.StructField("partition", T.IntegerType()),
            T.StructField("offset", T.LongType()),
            T.StructField("timestamp", T.DoubleType()),
        ]
    )

    @staticmethod
    def _to_wire(df: DataFrame) -> DataFrame:
        """Project spooled records into KAFKA_WIRE_SCHEMA exactly."""
        return df.select(
            F.encode("key", "utf-8").alias("key"),
            F.encode("value", "utf-8").alias("value"),
            "topic",
            "partition",
            "offset",
            F.timestamp_seconds("timestamp").alias("timestamp"),
            F.lit(0).alias("timestampType"),
        )

    def batch(self, spark: SparkSession) -> DataFrame:
        """Whole-topic read (consumer from earliest, reference :386-400)."""
        if not self.exists():
            raise TopicNotFoundError(self.topic)
        df = spark.read.schema(self._FILE_SCHEMA).option(
            "recursiveFileLookup", "true"
        ).json(self._dir)
        return self._to_wire(df)

    def stream(self, spark: SparkSession, max_files_per_trigger: int = 1000) -> DataFrame:
        """readStream over the spool in kafka wire shape."""
        if not self.exists():
            raise TopicNotFoundError(self.topic)
        df = (
            spark.readStream.schema(self._FILE_SCHEMA)
            .option("recursiveFileLookup", "true")
            .option("maxFilesPerTrigger", str(max_files_per_trigger))
            .json(self._dir)
        )
        return self._to_wire(df)

    def read(self, spark: SparkSession) -> list[tuple]:
        """(key, value) pairs like the reference's consumer loop."""
        rows = self.batch(spark).orderBy("partition", "offset").collect()
        return [
            (r["key"].decode(), json.loads(r["value"].decode())) for r in rows
        ]
