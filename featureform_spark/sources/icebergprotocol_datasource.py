"""A registered Spark data source for Iceberg protocol tables —
``spark.read.format("icebergprotocol")`` and
``spark.readStream.format("icebergprotocol")`` over the in-repo table
format (sources/iceberg_protocol.py).

The reference streams Iceberg tables through a dedicated pyiceberg
streamer (streamer/iceberg_streamer.py:17-106) and reads them through
the vendor IcebergSource (offline_store_spark_runner.py:966-980).
Neither ships here; this module provides both surfaces on Spark 4's
Python Data Source API:

- **Offsets are snapshot-lineage ordinals** (``{"ordinal": i}`` into
  the table's snapshot list) — the streamer's incremental-append
  contract: each micro-batch covers the data files committed by
  snapshots ``(start, end]``, checkpointed by Spark's offset log.
- **Append-only contract**: an overwrite/delete/replace snapshot in
  range aborts the stream unless ``skipChangeSnapshots=true`` —
  identical semantics to incremental_append_scan
  (sources/iceberg_protocol.py) and the deltaprotocol source's
  skipChangeCommits.
- **Executor-side Arrow reads**: one input partition per data file;
  pyarrow record batches flow straight into Spark's Arrow channel.
  Iceberg keeps source columns IN the data files (directories are
  convention), so no partition-literal reattachment is needed.

Honest gate: tables with live position/equality deletes route to the
native merge-on-read reader (``IcebergProtocolTable.snapshot()``);
this source exists to run the real Structured Streaming machinery
over snapshot lineage.

Options: ``path`` (table root), ``startingSnapshotOrdinal`` (int or
``earliest`` [default] / ``latest``), ``skipChangeSnapshots``.
"""

from __future__ import annotations

from typing import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

from featureform_spark.sources.iceberg_protocol import (
    IcebergProtocolError,
    IcebergProtocolTable,
    UnsupportedIcebergFeatureError,
)


class _IceSlice(InputPartition):
    def __init__(self, abs_path: str, field_order: list):
        self.abs_path = abs_path
        self.field_order = field_order


def _read_ice_slice(part: _IceSlice) -> Iterator:
    import pyarrow as pa
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(part.abs_path)
    for batch in pf.iter_batches():
        cols = {
            name: batch.column(i)
            for i, name in enumerate(batch.schema.names)
        }
        yield pa.RecordBatch.from_arrays(
            [cols[n] for n in part.field_order], names=part.field_order
        )


def _table(options: dict) -> IcebergProtocolTable:
    path = options.get("path")
    if not path:
        raise ValueError(
            "icebergprotocol requires option path=<table root>"
        )
    return IcebergProtocolTable(None, path)


class IcebergProtocolBatchReader(DataSourceReader):
    def __init__(self, options: dict):
        self.t = _table(options)

    def partitions(self) -> Sequence[InputPartition]:
        md = self.t.metadata()
        snap = self.t._snapshot_by(None, md=md)
        order = [f.name for f in self.t.spark_schema(md).fields]
        if snap is None:
            return []
        data_entries, deletes = self.t._live_entries(snap)
        if deletes:
            raise UnsupportedIcebergFeatureError(
                "icebergprotocol source: tables with live deletes are "
                "served by IcebergProtocolTable.snapshot() (merge-on-read)"
            )
        return [
            _IceSlice(
                self.t._resolve_path(e["data_file"]["file_path"]), order
            )
            for e in data_entries
        ]

    def read(self, partition: _IceSlice) -> Iterator:
        return _read_ice_slice(partition)


class IcebergProtocolStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict):
        self.t = _table(options)
        self.skip_change = (
            options.get("skipchangesnapshots", "false").lower() == "true"
        )
        starting = options.get("startingsnapshotordinal", "earliest").lower()
        snaps = self.t.snapshots(self.t.metadata())
        if starting == "earliest":
            self.start_ordinal = -1
        elif starting == "latest":
            self.start_ordinal = len(snaps) - 1
        else:
            self.start_ordinal = int(starting) - 1

    def initialOffset(self) -> dict:
        return {"ordinal": self.start_ordinal}

    def latestOffset(self) -> dict:
        return {"ordinal": len(self.t.snapshots(self.t.metadata())) - 1}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        md = self.t.metadata()
        snaps = self.t.snapshots(md)
        order = [f.name for f in self.t.spark_schema(md).fields]
        lo, hi = int(start["ordinal"]), int(end["ordinal"])
        if hi < lo or hi >= len(snaps):
            raise IcebergProtocolError(
                f"snapshot range ({lo}, {hi}] out of lineage "
                f"(have {len(snaps)} snapshots — expired?)"
            )
        if hi == lo:
            return []
        # files are collected from each append snapshot's OWN view (the
        # entries it added), not the range head's live set: a later
        # rewrite in range replaces earlier files, but the rows were
        # committed by the appends and the original files persist until
        # expire_snapshots — reading per-snapshot keeps skipped change
        # snapshots from swallowing prior appends
        out: list[_IceSlice] = []
        seen: set[str] = set()
        for s in snaps[lo + 1 : hi + 1]:
            op = (s.get("summary") or {}).get("operation", "append")
            if op != "append":
                if self.skip_change:
                    continue
                raise IcebergProtocolError(
                    f"snapshot {s['snapshot-id']} is {op!r}, not append — "
                    "set skipChangeSnapshots=true to skip such snapshots"
                )
            data_entries, deletes = self.t._live_entries(s)
            if deletes:
                raise UnsupportedIcebergFeatureError(
                    "live position/equality deletes in streamed range — "
                    "use IcebergProtocolTable.snapshot() (merge-on-read)"
                )
            sid = s["snapshot-id"]
            for e in data_entries:
                if int(e.get("snapshot_id") or -1) != sid:
                    continue
                p = self.t._resolve_path(e["data_file"]["file_path"])
                if p not in seen:
                    seen.add(p)
                    out.append(_IceSlice(p, order))
        return out

    def read(self, partition: _IceSlice) -> Iterator:
        return _read_ice_slice(partition)

    def commit(self, end: dict) -> None:
        pass


class IcebergProtocolDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "icebergprotocol"

    def schema(self):
        t = _table(self.options)
        return t.spark_schema(t.metadata())

    def reader(self, schema) -> DataSourceReader:
        return IcebergProtocolBatchReader(self.options)

    def streamReader(self, schema) -> DataSourceStreamReader:
        return IcebergProtocolStreamReader(self.options)


def register(spark) -> None:
    """Idempotently register the source on a session."""
    spark.dataSource.register(IcebergProtocolDataSource)
