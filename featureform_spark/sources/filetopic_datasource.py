"""A registered Spark data source for the FileTopic broker emulator —
``spark.read.format("filetopic")`` and
``spark.readStream.format("filetopic")`` with the kafka source's
option contract (S8/ST2).

The reference consumes Kafka through the spark-sql-kafka connector
(provider/scripts/spark/offline_store_spark_runner.py:271-415); no
broker or connector jar ships in this container. ``FileTopic``
(sources/kafka.py) already replays the wire schema; this module lifts
it into a first-class source via Spark 4's Python Data Source API so
the full Structured Streaming machinery — offset log, checkpointed
exactly-once progression, ``maxOffsetsPerTrigger`` batching,
``availableNow`` draining — executes for real instead of being
emulated with a file-discovery stream:

- **Batch** (``spark.read``): one ``InputPartition`` per topic
  partition, read executor-side — the same parallelism shape as the
  kafka connector's topic-partition splits.
- **Streaming** (``spark.readStream``): a
  ``SimpleDataSourceStreamReader`` tracking per-partition offsets
  ``{"0": next_offset, ...}`` exactly like kafka's offset JSON;
  restarts resume from the checkpointed offset (replays via
  ``readBetweenOffsets``), so a crashed query never double-reads.

Options: ``path`` (spool root), ``topic`` (the reference's
subscribe), ``startingOffsets`` (``earliest`` default / ``latest``),
``maxOffsetsPerTrigger`` (total records per micro-batch, like kafka's
option of the same name).

Scale note: the emulator targets test/CI volumes; the real 100-TB path
is the kafka connector with identical downstream code
(sources/kafka.py:read_kafka_stream — same wire schema, same
``parse_topic``)."""

from __future__ import annotations

import datetime
import json
import os
from typing import Iterator, Sequence, Tuple

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

WIRE_DDL = (
    "key binary, value binary, topic string, partition int, "
    "offset long, timestamp timestamp, timestampType int"
)


def _topic_dir(options: dict) -> str:
    root = options.get("path")
    topic = options.get("topic")
    if not root or not topic:
        raise ValueError(
            "filetopic requires options path=<spool root> and topic=<name>"
        )
    return os.path.join(root, topic)


def _partitions_of(tdir: str) -> list[int]:
    if not os.path.isdir(tdir):
        raise FileNotFoundError(f"no such topic spool: {tdir}")
    return sorted(
        int(n[1:]) for n in os.listdir(tdir)
        if n.startswith("p") and n[1:].isdigit()
    )


def _end_offset(tdir: str, p: int) -> int:
    pdir = os.path.join(tdir, f"p{p}")
    return sum(1 for n in os.listdir(pdir) if n.endswith(".json"))


def _read_records(
    tdir: str, p: int, start: int, end: int
) -> Iterator[Tuple]:
    pdir = os.path.join(tdir, f"p{p}")
    for off in range(start, end):
        with open(os.path.join(pdir, f"{off:020d}.json")) as f:
            rec = json.load(f)
        yield (
            rec["key"].encode(),
            rec["value"].encode(),
            rec["topic"],
            int(rec["partition"]),
            int(rec["offset"]),
            datetime.datetime.fromtimestamp(float(rec["timestamp"])),
            0,
        )


class _TopicPartition(InputPartition):
    def __init__(self, tdir: str, p: int, start: int, end: int):
        self.tdir = tdir
        self.p = p
        self.start = start
        self.end = end


class FileTopicBatchReader(DataSourceReader):
    def __init__(self, options: dict):
        self.tdir = _topic_dir(options)

    def partitions(self) -> Sequence[InputPartition]:
        return [
            _TopicPartition(self.tdir, p, 0, _end_offset(self.tdir, p))
            for p in _partitions_of(self.tdir)
        ]

    def read(self, partition: _TopicPartition) -> Iterator[Tuple]:
        return _read_records(
            partition.tdir, partition.p, partition.start, partition.end
        )


class FileTopicStreamReader(SimpleDataSourceStreamReader):
    """Per-partition offset progression with kafka semantics: an
    offset dict maps partition id -> next offset to read. Runs
    driver-side (record volumes are emulator-scale); the offset log /
    commit protocol is Spark's own."""

    def __init__(self, options: dict):
        self.tdir = _topic_dir(options)
        self.starting = options.get("startingoffsets", "earliest").lower()
        self.max_per_trigger = int(options.get("maxoffsetspertrigger", 0))

    def initialOffset(self) -> dict:
        if self.starting == "latest":
            return {
                str(p): _end_offset(self.tdir, p)
                for p in _partitions_of(self.tdir)
            }
        return {str(p): 0 for p in _partitions_of(self.tdir)}

    def _snapshot_end(self, start: dict) -> dict:
        # new partitions appearing after the stream began start at 0,
        # like kafka topic expansion
        end = {}
        budget = self.max_per_trigger or None
        for p in _partitions_of(self.tdir):
            s = int(start.get(str(p), 0))
            e = _end_offset(self.tdir, p)
            if budget is not None:
                take = min(e - s, budget)
                e = s + max(take, 0)
                budget -= max(take, 0)
            end[str(p)] = e
        return end

    def read(self, start: dict) -> Tuple[Iterator[Tuple], dict]:
        end = self._snapshot_end(start)
        return self.readBetweenOffsets(start, end), end

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[Tuple]:
        # a list_iterator, not a generator: Spark's prefetch cache both
        # next()s the returned iterator and copy.copy()s it across
        # micro-batch replans — generators can't be copied, bare lists
        # can't be next()ed; a list_iterator supports both
        out: list[Tuple] = []
        for p_str in sorted(end, key=int):
            p = int(p_str)
            out.extend(
                _read_records(
                    self.tdir, p, int(start.get(p_str, 0)), int(end[p_str])
                )
            )
        return iter(out)


class FileTopicDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "filetopic"

    def schema(self) -> str:
        return WIRE_DDL

    def reader(self, schema) -> DataSourceReader:
        return FileTopicBatchReader(self.options)

    def simpleStreamReader(self, schema) -> SimpleDataSourceStreamReader:
        return FileTopicStreamReader(self.options)


def register(spark) -> None:
    """Idempotently register the source on a session."""
    spark.dataSource.register(FileTopicDataSource)
