"""Persistent drift monitor for continuous serving traffic.

``functions.drift`` compares two frames ad hoc; a production feature
platform monitors CONTINUOUSLY: the reference histogram is pinned
once (the training snapshot), every serving micro-batch is binned
under the SAME edges, and the per-batch histograms accumulate into a
durable drift history the on-call reads when a model goes sideways.
This module is that lifecycle — the monitoring twin of
``SignatureStore``/``EmbeddingStore``:

- :meth:`DriftMonitor.set_reference` computes the NaN-excluding bin
  edges (one agg) and persists edges + reference histogram in one
  atomic Deltalite commit — edges are table properties, so every
  later observer bins identically or refuses loudly;
- :meth:`DriftMonitor.observe` bins a batch with the pinned edges
  (pure codegen expressions — scan + ONE partial-agg groupBy however
  many features) and appends ``(batch_id, feature, bin, count)``
  rows: an O(features × bins) write per batch, independent of batch
  size; it returns the per-feature PSI vs the reference
  (driver-side libm fold, the standing transcendental convention);
- :meth:`stream_drift` glues a Structured Streaming source to the
  monitor via ``foreachBatch`` — at-least-once appends keyed by
  batch id, so a replayed batch overwrites its own rows
  idempotently rather than double-counting.

State size: (features × (bins+1)) longs per observed batch — a
monitor observing 1k batches of 100 features at 10 bins holds ~1.1M
rows, trivially aggregation-scale; the 100 TB of traffic behind it
never lands in the store. Backed by DeltaliteTable for atomic
commits + time travel (re-read the history as of any version).

No reference-repo counterpart (featureform's dashboard surfaces
metadata only); beyond-reference monitoring family, SURVEY.md §8.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from featureform_spark.functions.drift import (
    binned_counts,
    psi,
    reference_edges,
)
from featureform_spark.sources.deltalite import DeltaliteTable

__all__ = ["DriftMonitor", "stream_drift"]

REFERENCE_BATCH_ID = -1


class DriftMonitor:
    """Edges-pinned histogram store with a reference/observe lifecycle.

    A monitor opened on an existing table loads its pinned columns,
    bins and edges from the table properties; passing conflicting
    values refuses loudly (two edge schemes in one history would make
    every PSI score silently incomparable — same policy as the LSH
    stores' "banding schemes cannot be mixed")."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        cols: list[str] | None = None,
        bins: int | None = None,
    ):
        self.spark = spark
        self.table = DeltaliteTable(spark, path)
        self.cols = list(cols) if cols else None
        # None = "whatever the store pins / the default at reference
        # time" — an EXPLICIT bins always conflicts loudly against an
        # existing monitor, whether or not cols was also passed
        self.bins = bins
        self.edges: dict[str, tuple[float, float]] | None = None
        if self.table.exists():
            props = self.table.properties()
            stored_cols = json.loads(props["drift.cols"])
            stored_bins = int(props["drift.bins"])
            if self.cols is not None and self.cols != stored_cols:
                raise ValueError(
                    f"monitor at {path} tracks columns {stored_cols}, "
                    f"got {self.cols} — edge schemes cannot be mixed"
                )
            if bins is not None and bins != stored_bins:
                raise ValueError(
                    f"monitor at {path} was built with bins="
                    f"{stored_bins}, got bins={bins}"
                )
            self.cols = stored_cols
            self.bins = stored_bins
            self.edges = {
                c: (mn, w)
                for c, (mn, w) in json.loads(props["drift.edges"]).items()
            }

    # -- lifecycle ----------------------------------------------------

    def set_reference(self, ref: DataFrame) -> dict[str, tuple[float, float]]:
        """Pin the reference: one agg for the edges, one histogram
        pass, one atomic commit carrying rows AND the edge descriptor
        (a monitor can never observe under edges that aren't the ones
        its reference rows were binned with)."""
        if self.table.exists():
            raise ValueError(
                f"monitor at {self.table.path} already has a reference; "
                "open a new path to re-baseline (the old history stays "
                "readable via time travel)"
            )
        if not self.cols:
            raise ValueError("set_reference: no feature columns declared")
        if self.bins is None:
            self.bins = 10
        self.edges = reference_edges(ref, self.cols, self.bins)
        rows = binned_counts(ref, self.edges, self.bins, "count").select(
            F.lit(REFERENCE_BATCH_ID).cast("long").alias("batch_id"),
            "feature",
            "bin",
            "count",
        )
        self.table.create(
            rows,
            properties={
                "drift.cols": json.dumps(self.cols),
                "drift.bins": str(self.bins),
                "drift.edges": json.dumps(
                    {c: list(e) for c, e in self.edges.items()}
                ),
            },
        )
        return self.edges

    def _require_reference(self) -> None:
        if self.edges is None:
            raise ValueError(
                f"monitor at {self.table.path} has no reference yet — "
                "call set_reference(ref) first"
            )

    def observe(self, batch: DataFrame, batch_id: int) -> dict[str, float]:
        """Bin the batch under the pinned edges, append its histogram
        keyed by ``batch_id``, return per-feature PSI vs the
        reference. Re-observing a batch id REPLACES its rows (one
        copy-on-write delete touching only that id's files) so
        streaming replays stay idempotent."""
        self._require_reference()
        if batch_id < 0:
            raise ValueError("batch_id must be >= 0 (negative ids are "
                             "reserved for the reference)")
        hist = binned_counts(batch, self.edges, self.bins, "count").select(
            F.lit(int(batch_id)).cast("long").alias("batch_id"),
            "feature",
            "bin",
            "count",
        )
        # unconditional: delete_where no-ops (no commit) when nothing
        # matches, so replays replace their rows without a dedicated
        # full-history distinct scan per batch
        self.table.delete_where(F.col("batch_id") == int(batch_id))
        self.table.append(hist)
        return self.scores(batch_id)

    # -- reads --------------------------------------------------------

    def history(self) -> DataFrame:
        """All persisted (batch_id, feature, bin, count) rows —
        reference rows carry batch_id = -1."""
        self._require_reference()
        return self.table.snapshot()

    def _counts(self, batch_id: int) -> dict[str, dict[int, int]]:
        out: dict[str, dict[int, int]] = {}
        for r in (
            self.table.snapshot()
            .filter(F.col("batch_id") == int(batch_id))
            .collect()
        ):
            out.setdefault(r["feature"], {})[int(r["bin"])] = int(r["count"])
        return out

    def scores(self, batch_id: int) -> dict[str, float]:
        """Per-feature PSI of one observed batch vs the reference —
        an aggregation-scale collect plus a driver-side libm fold."""
        self._require_reference()
        ref = self._counts(REFERENCE_BATCH_ID)
        cur = self._counts(batch_id)
        out: dict[str, float] = {}
        for feature in sorted(ref):
            bins = sorted(set(ref[feature]) | set(cur.get(feature, {})))
            out[feature] = psi(
                [
                    (
                        ref[feature].get(b, 0),
                        cur.get(feature, {}).get(b, 0),
                    )
                    for b in bins
                ]
            )
        return out

    def score_history(self) -> dict[int, dict[str, float]]:
        """{batch_id: {feature: psi}} over every observed batch."""
        self._require_reference()
        ids = sorted(
            int(r["batch_id"])
            for r in self.table.snapshot()
            .select("batch_id")
            .distinct()
            .collect()
            if int(r["batch_id"]) != REFERENCE_BATCH_ID
        )
        return {b: self.scores(b) for b in ids}


def stream_drift(stream_df: DataFrame, monitor: DriftMonitor):
    """Attach a DriftMonitor to a streaming source: every micro-batch
    is binned and appended keyed by its batch id (replays replace
    their own rows — idempotent under at-least-once foreachBatch).
    Returns the DataStreamWriter; caller picks trigger/checkpoint and
    calls ``.start()``."""
    monitor._require_reference()
    return stream_df.writeStream.foreachBatch(
        lambda batch, bid: monitor.observe(batch, int(bid))
    )
