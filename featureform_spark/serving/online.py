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

    def __init__(self, clock=None):
        self._tables: dict[str, dict[Any, Any]] = {}
        self._timestamps: dict[str, dict[Any, Any]] = {}
        self._expiry: dict[str, dict[Any, float]] = {}
        self._vectors: dict[str, DataFrame] = {}
        self._ann: dict[str, Any] = {}  # name -> IvfPqIndex | HnswIndex | ShardedHnsw
        self._frozen: set[str] = set()  # immutable vector spaces
        # injectable clock so TTL tests don't sleep; real KV stores
        # (Redis EXPIRE, Dynamo TTL) own this server-side
        import time as _time

        self._clock = clock or _time.monotonic

    # -- table plane ---------------------------------------------------------

    def set(
        self,
        table: str,
        entity: Any,
        value: Any,
        ttl_seconds: float | None = None,
    ) -> None:
        """``ttl_seconds`` mirrors Redis EXPIRE / DynamoDB TTL: the
        value reads as a miss once the deadline passes (lazy expiry —
        the entry reaps on its next read, the standard KV semantics; a
        background sweeper is the store's concern, not the client's).
        A re-set without a TTL clears any prior deadline."""
        self._tables.setdefault(table, {})[entity] = value
        exp = self._expiry.setdefault(table, {})
        if ttl_seconds is not None:
            exp[entity] = self._clock() + float(ttl_seconds)
        else:
            exp.pop(entity, None)

    def ensure_table(self, table: str) -> None:
        """Create the table if absent (an empty deploy still serves
        misses, not unknown-table errors)."""
        self._tables.setdefault(table, {})

    def set_if_newer(
        self,
        table: str,
        entity: Any,
        value: Any,
        ts: Any,
        ttl_seconds: float | None = None,
    ) -> None:
        """Upsert that ignores stale writes (out-of-order stream
        batches). A winning write refreshes the TTL deadline — or
        clears it when no ``ttl_seconds`` is given — exactly like
        ``set``; leaving a stale deadline in place would reap the
        FRESH value and serve live data as a miss."""
        t = self._tables.setdefault(table, {})
        ts_table = self._timestamps.setdefault(table, {})
        prev = ts_table.get(entity)
        if prev is None or (ts is not None and ts >= prev):
            t[entity] = value
            ts_table[entity] = ts
            exp = self._expiry.setdefault(table, {})
            if ttl_seconds is not None:
                exp[entity] = self._clock() + float(ttl_seconds)
            else:
                exp.pop(entity, None)

    def get(self, table: str, entity: Any) -> Any:
        deadline = self._expiry.get(table, {}).get(entity)
        if deadline is not None and self._clock() >= deadline:
            self._tables[table].pop(entity, None)
            self._expiry[table].pop(entity, None)
            self._timestamps.get(table, {}).pop(entity, None)
            return None
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

    def build_ann_index(self, name: str, algo: str = "ivfpq", **kw) -> None:
        """Build the in-RAM index for a registered vector set — the
        reference's embeddinghub shape (index built/held in the serving
        process, queries never run a storage job). ``algo``:
        ``"ivfpq"`` (IVFADC cells+codes), ``"hnsw"`` (the reference's
        actual hnswlib structure, numpy reimplementation), or
        ``"hnsw_sharded"`` (per-partition graphs built executor-side)."""
        if algo == "ivfpq":
            from featureform_spark.serving.ann_index import IvfPqIndex

            self._ann[name] = IvfPqIndex.build(self._vectors[name], **kw)
        elif algo == "hnsw":
            from featureform_spark.serving.hnsw_index import HnswIndex

            self._ann[name] = HnswIndex.build(self._vectors[name], **kw)
        elif algo == "hnsw_sharded":
            from featureform_spark.serving.hnsw_index import ShardedHnsw

            self._ann[name] = ShardedHnsw.build(self._vectors[name], **kw)
        else:
            raise ValueError(f"unknown ANN algo: {algo!r}")

    def add_vectors(self, name: str, ids: list, vectors: list) -> None:
        """Incremental write path: new vectors become queryable
        immediately (embeddinghub index add). Raises on a frozen
        space, like the reference's Set against an immutable version
        (embeddinghub/embeddingstore/server.cc:113-127)."""
        if name in self._frozen:
            raise PermissionError(
                f"Cannot write to immutable space: {name!r}"
            )
        self._ann[name].add(ids, vectors)

    def get_vector(self, name: str, vec_id: int) -> list[float] | None:
        """Point lookup of a stored embedding (embeddinghub Get,
        server.cc:98-111): answered from the in-RAM index when one is
        built, else a pruned filter on the registered DataFrame."""
        ix = self._ann.get(name)
        if ix is not None:
            return ix.get(vec_id)
        from pyspark.sql import functions as F

        row = (
            self._vectors[name]
            .filter(F.col("vec_id") == int(vec_id))
            .first()
        )
        return None if row is None else [float(x) for x in row["embedding"]]

    def is_frozen(self, name: str) -> bool:
        """Public frozen probe — Flight servers pass
        ``frozen=lambda: store.is_frozen(name)`` to ``register_index``
        so a store-side freeze also closes the wire write path."""
        return name in self._frozen

    def freeze_vectors(self, name: str) -> None:
        """FreezeSpace parity (embeddingstore/server.cc:82-96): the
        space becomes immutable — reads and Nearest() keep working,
        writes fail until the space is deleted and recreated."""
        if name not in self._vectors and name not in self._ann:
            raise KeyError(name)
        self._frozen.add(name)

    def delete_vector_space(self, name: str) -> None:
        """DeleteSpace parity (embeddingstore/server.cc:74-80)."""
        self._vectors.pop(name, None)
        self._ann.pop(name, None)
        self._frozen.discard(name)

    def nearest(
        self,
        name: str,
        vector: list[float],
        k: int,
        approximate: bool = False,
        nprobe: int = 8,
        **index_kw,
    ) -> list[tuple[Any, float]]:
        """V4: top-k neighbors (the reference's Nearest()).

        Exact mode runs the distributed cosine scan (one Spark job per
        call); ``approximate=True`` answers from the in-RAM index
        (IVFADC or HNSW, whichever :meth:`build_ann_index` built) in
        microseconds. Index-specific knobs pass through ``**index_kw``
        (``rerank`` for IVFADC, ``ef`` for HNSW — each index swallows
        the other's params). Approximate results carry L2 distances
        (lower = closer), exact results cosine scores.
        """
        allow = index_kw.pop("allow", None)
        if isinstance(allow, (list, tuple)):
            # the indexes dispatch on set/frozenset/dict vs callable, so a
            # bare id sequence must become a collection before forwarding
            allow = frozenset(allow)
        if approximate:
            return self._ann[name].query(
                vector, k=k, nprobe=nprobe, allow=allow, **index_kw
            )
        src_df = self._vectors[name]
        if allow is not None:
            from pyspark.sql import functions as F

            if isinstance(allow, (set, frozenset, list, tuple, dict)):
                # id collection: the isin predicate pushes into the scan
                src_df = src_df.filter(
                    F.col("vec_id").isin(list(allow))
                )
            else:
                # callable predicate (the form the indexes accept):
                # Arrow-batched, applied before the distributed top-k
                import pandas as pd
                from pyspark.sql.functions import pandas_udf

                fn = allow
                ok = pandas_udf(
                    lambda s: s.map(lambda i: bool(fn(int(i)))),
                    "boolean",
                )
                src_df = src_df.filter(ok(F.col("vec_id")))
        out = cosine_topk(src_df, vector, k)
        return [(r["vec_id"], r["score"]) for r in out.collect()]


class FileBackedOnlineStore:
    """KV store backed by a spool directory of append-only JSON batch
    segments — the shared write surface a real Dynamo/Redis endpoint
    provides, so **executor processes** can write to it directly
    (``partition_writer`` below plugs into ``foreach_partition_write``,
    matching the reference's executor-side Dynamo pattern,
    offline_store_spark_runner.py:420-485). Reads fold segments in write
    order with the same newer-or-equal-wins rule as
    ``InMemoryOnlineStore.set_if_newer``.

    Timestamps are JSON-serialized via ``str`` (ISO-like), which
    compares lexicographically in time order — adequate for the
    last-write-wins fold; a real store compares native timestamps.
    """

    def __init__(self, root: str):
        import os

        self._root = str(root)
        os.makedirs(self._root, exist_ok=True)

    def _table_dir(self, table: str) -> str:
        import os

        d = os.path.join(self._root, table)
        os.makedirs(d, exist_ok=True)
        return d

    def partition_writer(self, table: str):
        """Picklable executor-side writer factory for
        ``foreach_partition_write``: each batch lands as one atomic
        segment file (tmp + rename), filename-prefixed with a
        nanosecond clock so the read fold replays write order."""
        root = self._table_dir(table)

        def factory():
            import json
            import os
            import time
            import uuid

            def write_batch(rows):
                name = f"{time.time_ns():020d}-{uuid.uuid4().hex}.json"
                tmp = os.path.join(root, name + ".tmp")
                with open(tmp, "w") as f:
                    json.dump(rows, f, default=str)
                os.replace(tmp, os.path.join(root, name))

            return write_batch

        return factory

    def _fold(self, table: str) -> dict[Any, Any]:
        import json
        import os

        d = self._table_dir(table)
        values: dict[Any, Any] = {}
        stamps: dict[Any, Any] = {}
        for name in sorted(os.listdir(d)):
            if not name.endswith(".json"):
                continue
            with open(os.path.join(d, name)) as f:
                for row in json.load(f):
                    e, v, ts = row["entity"], row["value"], row.get("ts")
                    prev = stamps.get(e)
                    if prev is None or (ts is not None and str(ts) >= str(prev)):
                        values[e] = v
                        stamps[e] = ts
        return values

    def get(self, table: str, entity: Any) -> Any:
        return self._fold(table).get(entity)

    def serve_features(self, tables: list[str], entity: Any) -> list[Any]:
        return [self.get(t, entity) for t in tables]

    def table_size(self, table: str) -> int:
        return len(self._fold(table))


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
    # an empty materialization still deploys an (empty) table — serving
    # it returns misses, not "unknown table" (serving_cases.py "Empty")
    store.ensure_table(table)
    for row in mat.select(entity_col, value_col).toLocalIterator():
        store.set(table, row[entity_col], row[value_col])
    return chunks
