"""A registered Spark data source for Delta protocol tables —
``spark.read.format("deltaprotocol")`` and
``spark.readStream.format("deltaprotocol")`` over the in-repo
transaction-log implementation (sources/delta_protocol.py).

The reference streams Delta tables through the vendor connector's
streaming source (``spark.readStream.format("delta")``,
offline_store_spark_runner.py:1076-1136 is the batch-incremental
flavor of the same contract). This module provides that surface
without the jar, on Spark 4's Python Data Source API:

- **Offsets are commit versions** (``{"version": N}``), exactly the
  delta streaming source's reservedId/version model: each micro-batch
  covers commits ``(start, end]``, Spark's offset log checkpoints the
  progression, and restarts replay from the committed version.
- **Append-only contract**: dataChange=false actions (OPTIMIZE) are
  skipped; a commit that removes data with dataChange=true aborts the
  stream unless ``skipChangeCommits=true`` (the delta option of the
  same name) — silently re-emitting or dropping rows is never an
  option.
- **Executor-side Arrow reads**: one input partition per data file;
  each partition streams the file's pyarrow record batches straight
  into Spark's Arrow channel (no per-row Python), with Hive partition
  values attached as constant columns.

Honest gates: column-mapped tables raise everywhere; deletion-vector
adds raise on the STREAM path only (they arrive via change commits,
which the append-only contract already refuses) — the batch reader
applies DVs executor-side: the compact roaring blob ships with each
input partition and masks rows by file-relative index during the
Arrow read. The native ``DeltaProtocolTable`` reader (JVM scan +
broadcast anti-join) remains the 100-TB path.

Options: ``path`` (table root), ``startingVersion`` (int or
``earliest`` [default] / ``latest``), ``skipChangeCommits``.
"""

from __future__ import annotations

import json
import os
import urllib.parse
from typing import Iterator, Sequence, Tuple

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

from featureform_spark.sources.delta_protocol import (
    DeltaProtocolError,
    DeltaProtocolTable,
    UnsupportedTableFeatureError,
)


def _table(options: dict) -> DeltaProtocolTable:
    path = options.get("path")
    if not path:
        raise ValueError("deltaprotocol requires option path=<table root>")
    return DeltaProtocolTable(None, path)


def _gate(st) -> None:
    if st.column_mapping:
        raise UnsupportedTableFeatureError(
            "deltaprotocol source: column-mapped tables are served by "
            "DeltaProtocolTable.snapshot() (native scan), not this source"
        )
    for a in st.adds.values():
        if a.get("deletionVector"):
            raise UnsupportedTableFeatureError(
                "deltaprotocol source: deletion-vector adds are served "
                "by DeltaProtocolTable.snapshot() (native scan)"
            )


class _FileSlice(InputPartition):
    def __init__(
        self, abs_path: str, part_values: dict, part_types: dict,
        field_order: list, dv_blob: bytes | None = None,
    ):
        self.abs_path = abs_path
        self.part_values = part_values   # {col: raw string or None}
        self.part_types = part_types     # {col: spark simpleString}
        self.field_order = field_order   # full logical column order
        self.dv_blob = dv_blob           # roaring DV blob (compact) or None


def _pa_scalar_type(simple: str):
    import pyarrow as pa

    return {
        "string": pa.string(),
        "long": pa.int64(),
        "bigint": pa.int64(),
        "int": pa.int32(),
        "integer": pa.int32(),
        "short": pa.int16(),
        "double": pa.float64(),
        "float": pa.float32(),
        "boolean": pa.bool_(),
        "date": pa.date32(),
        "timestamp": pa.timestamp("us"),
    }.get(simple, pa.string())


def _py_partition_value(raw: str | None, simple: str):
    if raw is None:
        return None
    if simple in ("long", "bigint", "int", "integer", "short"):
        return int(raw)
    if simple in ("double", "float"):
        return float(raw)
    if simple == "boolean":
        return raw.lower() == "true"
    if simple == "date":
        import datetime

        return datetime.date.fromisoformat(raw)
    if simple == "timestamp":
        import datetime

        return datetime.datetime.fromisoformat(raw)
    if simple.startswith("decimal"):
        from decimal import Decimal

        return Decimal(raw)
    return raw


def _read_slice(part: _FileSlice) -> Iterator:
    """Executor-side: the parquet file's record batches with partition
    literals attached, reordered to the logical schema. Deletion
    vectors (shipped as the compact roaring blob, decoded HERE on the
    executor) mask rows by file-relative index while streaming."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    deleted = None
    if part.dv_blob is not None:
        from featureform_spark.sources.dv_bitmap import decode_rbm_array

        deleted = decode_rbm_array(part.dv_blob)
    pf = pq.ParquetFile(part.abs_path)
    row_offset = 0
    for batch in pf.iter_batches():
        if deleted is not None and len(deleted):
            nrows = batch.num_rows
            lo = np.searchsorted(deleted, row_offset)
            hi = np.searchsorted(deleted, row_offset + nrows)
            row_offset += nrows
            if hi > lo:
                keep = np.ones(nrows, dtype=bool)
                keep[(deleted[lo:hi] - (row_offset - nrows)).astype(np.int64)] = False
                batch = batch.filter(pa.array(keep))
            if batch.num_rows == 0:
                continue
        n = batch.num_rows
        cols = {name: batch.column(i) for i, name in enumerate(batch.schema.names)}
        arrays = []
        fields = []
        for name in part.field_order:
            if name in part.part_values:
                simple = part.part_types[name]
                val = _py_partition_value(part.part_values[name], simple)
                typ = (
                    _pa_scalar_type(simple)
                    if not simple.startswith("decimal")
                    else pa.string()
                )
                if simple.startswith("decimal"):
                    # keep decimals exact through arrow by parsing into
                    # the declared decimal type
                    import re

                    m = re.match(r"decimal\((\d+),(\d+)\)", simple)
                    typ = pa.decimal128(int(m.group(1)), int(m.group(2)))
                arrays.append(pa.array([val] * n, type=typ))
            else:
                arrays.append(cols[name])
            fields.append(name)
        yield pa.RecordBatch.from_arrays(arrays, names=fields)


class DeltaProtocolBatchReader(DataSourceReader):
    def __init__(self, options: dict):
        self.t = _table(options)

    def partitions(self) -> Sequence[InputPartition]:
        st = self.t.state()
        if st.column_mapping:
            raise UnsupportedTableFeatureError(
                "deltaprotocol source: column-mapped tables are served "
                "by DeltaProtocolTable.snapshot() (native scan)"
            )
        parts = st.partition_columns
        types = {f.name: f.dataType.simpleString() for f in st.schema.fields}
        order = [f.name for f in st.schema.fields]
        out = []
        for rel in sorted(st.adds):
            a = st.adds[rel]
            pv = {
                c: (a.get("partitionValues") or {}).get(c) for c in parts
            }
            dv = a.get("deletionVector")
            out.append(
                _FileSlice(
                    os.path.join(self.t.path, urllib.parse.unquote(rel)),
                    pv,
                    {c: types[c] for c in parts},
                    order,
                    # ship the COMPACT blob; decode happens executor-side
                    self.t._dv_blob(dv) if dv else None,
                )
            )
        return out

    def read(self, partition: _FileSlice) -> Iterator:
        return _read_slice(partition)


class DeltaProtocolStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict):
        self.t = _table(options)
        self.skip_change = (
            options.get("skipchangecommits", "false").lower() == "true"
        )
        starting = options.get("startingversion", "earliest").lower()
        if starting == "earliest":
            self.start_version = -1
        elif starting == "latest":
            self.start_version = self.t.version()
        else:
            # startingVersion=N streams commits >= N (delta semantics)
            self.start_version = int(starting) - 1

    def initialOffset(self) -> dict:
        return {"version": self.start_version}

    def latestOffset(self) -> dict:
        return {"version": self.t.version()}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        st = self.t.state()
        _gate(st)
        parts = st.partition_columns
        types = {f.name: f.dataType.simpleString() for f in st.schema.fields}
        order = [f.name for f in st.schema.fields]
        lo, hi = int(start["version"]), int(end["version"])
        have = set(self.t._commit_versions())
        missing = [v for v in range(lo + 1, hi + 1) if v not in have]
        if missing:
            raise DeltaProtocolError(
                f"commits {missing} were cleaned; stream from version "
                f"{lo} is no longer possible"
            )
        out = []
        for v in range(lo + 1, hi + 1):
            actions = self.t._read_commit(v)
            removes = [
                a["remove"] for a in actions
                if "remove" in a and a["remove"].get("dataChange", True)
            ]
            if removes:
                if self.skip_change:
                    continue
                raise DeltaProtocolError(
                    f"version {v} removes or changes rows (not a blind "
                    "append); set skipChangeCommits=true to skip such "
                    "commits, or consume table_changes() for the CDF"
                )
            for a in actions:
                if "add" not in a or not a["add"].get("dataChange", True):
                    continue
                add = a["add"]
                if add.get("deletionVector"):
                    raise UnsupportedTableFeatureError(
                        "deletion-vector add in streamed commit"
                    )
                pv = {
                    c: (add.get("partitionValues") or {}).get(c)
                    for c in parts
                }
                out.append(
                    _FileSlice(
                        os.path.join(
                            self.t.path, urllib.parse.unquote(add["path"])
                        ),
                        pv,
                        {c: types[c] for c in parts},
                        order,
                    )
                )
        return out

    def read(self, partition: _FileSlice) -> Iterator:
        return _read_slice(partition)

    def commit(self, end: dict) -> None:
        pass


class DeltaProtocolDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "deltaprotocol"

    def schema(self):
        return _table(self.options).state().schema

    def reader(self, schema) -> DataSourceReader:
        return DeltaProtocolBatchReader(self.options)

    def streamReader(self, schema) -> DataSourceStreamReader:
        return DeltaProtocolStreamReader(self.options)


def register(spark) -> None:
    """Idempotently register the source on a session."""
    spark.dataSource.register(DeltaProtocolDataSource)
