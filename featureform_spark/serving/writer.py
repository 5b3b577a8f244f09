"""Partition-parallel online-store export (S15 + A6).

The reference ships materializations to DynamoDB by estimating row bytes
from the schema, repartitioning to ~128 MB targets, then
``foreachPartition`` writing 25-item batches with adaptive retry/backoff
(offline_store_spark_runner.py:420-485, :583-669). Same shape here with
the KV client injected: executors call ``writer_factory()`` once per
partition and push batches — swapping the stub for boto3/redis is a
one-liner at the call site, the Spark side doesn't change.
"""

from __future__ import annotations

import time
from typing import Any, Callable, Iterable

from pyspark.sql import DataFrame
from pyspark.sql import types as T

TARGET_PARTITION_BYTES = 128 * 1024 * 1024  # reference's 128 MB target
BATCH_SIZE = 25                             # reference's Dynamo batch size

_TYPE_BYTES: dict[type, int] = {
    T.BooleanType: 1, T.ByteType: 1, T.ShortType: 2, T.IntegerType: 4,
    T.LongType: 8, T.FloatType: 4, T.DoubleType: 8, T.TimestampType: 8,
    T.DateType: 4, T.StringType: 32,
}


def estimate_row_bytes(schema: T.StructType) -> int:
    """A6: schema-based row size estimate (strings ~32B, arrays by elem)."""
    total = 0
    for f in schema.fields:
        if isinstance(f.dataType, T.ArrayType):
            elem = _TYPE_BYTES.get(type(f.dataType.elementType), 16)
            total += elem * 64  # assume ~64 elements when unknown
        else:
            total += _TYPE_BYTES.get(type(f.dataType), 16)
    return max(total, 1)


def size_partitions(df: DataFrame, target_bytes: int = TARGET_PARTITION_BYTES) -> DataFrame:
    """A6: repartition so each partition is ~target_bytes of row data.

    Costs one count() action, like the reference. Use before a
    rate-limited external write, not for normal processing (AQE already
    sizes shuffle partitions).
    """
    n_rows = df.count()
    row_bytes = estimate_row_bytes(df.schema)
    parts = max(1, (n_rows * row_bytes + target_bytes - 1) // target_bytes)
    return df.repartition(parts)


class TransientWriteError(Exception):
    """Raise from a batch writer to request a retry (throttling etc.)."""


#: retried with backoff; anything else (TypeError, KeyError, ...) is a
#: bug in the writer and propagates immediately — retrying a permanent
#: error 100x with backoff turns a crash into an 8-minute fake hang
RETRYABLE = (TransientWriteError, ConnectionError, TimeoutError, OSError)


def foreach_partition_write(
    df: DataFrame,
    writer_factory: Callable[[], Callable[[list[dict[str, Any]]], None]],
    batch_size: int = BATCH_SIZE,
    max_attempts: int = 100,
    base_backoff_s: float = 0.05,
    retryable: tuple[type[BaseException], ...] = RETRYABLE,
) -> None:
    """S15: batched, retrying per-partition export.

    ``writer_factory`` runs on the executor and returns a callable that
    writes one batch of row-dicts (raising ``retryable`` to signal a
    transient error). Retries use exponential backoff capped at
    ``max_attempts`` like the reference's Dynamo writer.
    """

    def handle(rows: Iterable) -> None:
        write_batch = writer_factory()
        batch: list[dict[str, Any]] = []

        def flush() -> None:
            if not batch:
                return
            for attempt in range(max_attempts):
                try:
                    write_batch(batch)
                    batch.clear()
                    return
                except retryable:
                    if attempt == max_attempts - 1:
                        raise
                    time.sleep(min(base_backoff_s * 2**attempt, 5.0))

        for row in rows:
            batch.append(row.asDict())
            if len(batch) >= batch_size:
                flush()
        flush()

    df.foreachPartition(handle)


def create_table_as_select(df: DataFrame, table: str, mode: str = "errorifexists") -> None:
    """S16: CREATE TABLE AS SELECT into the Spark catalog."""
    df.write.mode(mode).saveAsTable(table)
