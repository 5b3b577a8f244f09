"""Dataset streaming to clients: Arrow batches and row appends.

- S18 (Arrow Flight dataset streamer, streamer/iceberg_streamer.py:17-106):
  serve a table scan as Arrow record batches, capped at 2M records per
  request like the reference. In-process we hand back pyarrow batches
  directly (``toArrow``); a Flight server would wrap the same iterator.
- S17 (primary-table row writer, provider/sql.go:1302-1333): batched row
  append into a parquet table.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession

TWO_MILLION_RECORD_LIMIT = 2_000_000  # reference streamer cap


def serve_arrow(df: DataFrame, limit: int = TWO_MILLION_RECORD_LIMIT) -> pa.Table:
    """Whole (capped) result as one Arrow table."""
    return df.limit(limit).toArrow()


def arrow_batches(
    df: DataFrame, batch_rows: int = 65_536, limit: int = TWO_MILLION_RECORD_LIMIT
) -> Iterator[pa.RecordBatch]:
    """Streamed Arrow record batches (bounded memory via the cap)."""
    table = serve_arrow(df, limit)
    yield from table.to_batches(max_chunksize=batch_rows)


def append_rows(
    spark: SparkSession,
    path: str,
    rows: list[tuple[Any, ...]],
    schema: str,
) -> None:
    """S17: batched INSERT INTO analog for parquet primary tables."""
    spark.createDataFrame(rows, schema).write.mode("append").parquet(path)
