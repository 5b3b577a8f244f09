"""Statistics-driven join planning over Iceberg protocol tables.

What the table-level statistics written by ``analyze_table`` are FOR:
at 100 TB the difference between a broadcast hash join and a
full-shuffle sort-merge join — or between a clean shuffle and a
skew-stalled one — is the dominant cost of the whole query, and the
decision needs **zero-scan** inputs. This module folds the two
metadata planes the format already carries:

* **manifest fold** (``table_profile``): live row/byte/file counts
  straight from manifest entries — the same numbers engines print in
  ``DESCRIBE DETAIL``, no data-file reads;
* **Puffin NDV sketches** (``analyze_table``): per-join-key distinct
  counts, plus loss-free sketch unions for cross-table key-overlap
  estimates (inclusion–exclusion).

into an explicit join plan:

* broadcast the smaller side when its live bytes fit the threshold
  (mirrors ``spark.sql.autoBroadcastJoinThreshold``, default 10 MiB);
* estimate output cardinality with the textbook containment bound
  ``|L ⋈ R| ≈ rows_L · rows_R / max(ndv_L, ndv_R)``;
* flag skew when average rows-per-key on the probe side exceeds
  ``skew_rows_per_key`` — the signal to salt the key or lean on AQE's
  skew-join split rather than discover the straggler at runtime.

``join_with_stats`` applies the advice (broadcast hint on the chosen
side) and returns the joined DataFrame — Catalyst still owns the
physical plan; the advice only adds hints Catalyst can act on, never
bypasses it.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_BROADCAST_BYTES = 10 << 20  # spark.sql.autoBroadcastJoinThreshold
DEFAULT_SKEW_ROWS_PER_KEY = 100_000


def table_profile(table: Any, snapshot_id: int | None = None) -> dict:
    """Zero-scan size profile of an Iceberg protocol table: live data
    rows (data records minus position/DV delete records — equality
    deletes can't be counted without a scan, so the row figure is an
    upper bound, which is the safe direction for broadcast decisions),
    total live data bytes, and file count. Pure manifest-entry fold."""
    md = table.metadata()
    snap = table._snapshot_by(snapshot_id, md=md)
    if snap is None:
        raise ValueError("table has no snapshot")
    data_entries, delete_entries = table._live_entries(snap)
    rows = sum(
        int(e["data_file"].get("record_count") or 0) for e in data_entries
    )
    size = sum(
        int(e["data_file"].get("file_size_in_bytes") or 0)
        for e in data_entries
    )
    pos_deleted = sum(
        int(e["data_file"].get("record_count") or 0)
        for e in delete_entries
        if int(e["data_file"].get("content", 1)) == 1
    )
    return {
        "rows": max(0, rows - pos_deleted),
        "bytes": size,
        "files": len(data_entries),
        "snapshot_id": int(snap["snapshot-id"]),
    }


def _ndv_or_none(table: Any, column: str) -> int | None:
    try:
        # stale fallback: stats from an analyzed ancestor snapshot
        # still bound the key cardinality usefully after appends
        return table.ndv_estimates(allow_stale=True).get(column)
    except Exception:  # no stats at all — advise without
        return None


def advise_join(
    left: Any,
    right: Any,
    key: str,
    right_key: str | None = None,
    broadcast_threshold_bytes: int = DEFAULT_BROADCAST_BYTES,
    skew_rows_per_key: int = DEFAULT_SKEW_ROWS_PER_KEY,
) -> dict:
    """Join plan from metadata alone. Returns::

        {"strategy": "broadcast_left" | "broadcast_right" | "shuffle",
         "left": profile, "right": profile,
         "ndv_left", "ndv_right",          # None when not analyzed
         "est_output_rows",                # containment bound, or None
         "est_matching_keys",              # sketch ∩ estimate, or None
         "skew_risk", "reasons": [...]}
    """
    rk = right_key or key
    lp = table_profile(left)
    rp = table_profile(right)
    ndv_l = _ndv_or_none(left, key)
    ndv_r = _ndv_or_none(right, rk)
    reasons: list[str] = []
    if rp["bytes"] <= broadcast_threshold_bytes <= lp["bytes"]:
        strategy = "broadcast_right"
        reasons.append(
            f"right side is {rp['bytes']}B live "
            f"(≤ {broadcast_threshold_bytes}B threshold)"
        )
    elif lp["bytes"] <= broadcast_threshold_bytes <= rp["bytes"]:
        strategy = "broadcast_left"
        reasons.append(
            f"left side is {lp['bytes']}B live "
            f"(≤ {broadcast_threshold_bytes}B threshold)"
        )
    elif max(lp["bytes"], rp["bytes"]) <= broadcast_threshold_bytes:
        # both tiny: broadcast the smaller
        strategy = (
            "broadcast_right" if rp["bytes"] <= lp["bytes"]
            else "broadcast_left"
        )
        reasons.append("both sides under the broadcast threshold")
    else:
        strategy = "shuffle"
        reasons.append("both sides exceed the broadcast threshold")
    est_rows = None
    if ndv_l and ndv_r:
        est_rows = int(
            lp["rows"] * rp["rows"] // max(ndv_l, ndv_r, 1)
        )
    est_matching = None
    try:
        sk_l = left.read_statistics_sketches().get(key)
        sk_r = right.read_statistics_sketches().get(rk)
        if sk_l is not None and sk_r is not None:
            from featureform_spark.sources.puffin_stats import (
                estimate_intersection,
            )

            est_matching = int(round(estimate_intersection(sk_l, sk_r)))
    except Exception:  # stats file gone / never analyzed
        pass
    skew = False
    for side, prof, ndv in (("left", lp, ndv_l), ("right", rp, ndv_r)):
        if ndv and prof["rows"] // max(ndv, 1) > skew_rows_per_key:
            skew = True
            reasons.append(
                f"{side} side averages {prof['rows'] // ndv} rows/key on "
                f"{key if side == 'left' else rk} — salt or rely on AQE "
                "skew-join splitting"
            )
    return {
        "strategy": strategy,
        "left": lp,
        "right": rp,
        "ndv_left": ndv_l,
        "ndv_right": ndv_r,
        "est_output_rows": est_rows,
        "est_matching_keys": est_matching,
        "skew_risk": skew,
        "reasons": reasons,
    }


def join_with_stats(
    left: Any,
    right: Any,
    key: str,
    right_key: str | None = None,
    how: str = "inner",
    broadcast_threshold_bytes: int = DEFAULT_BROADCAST_BYTES,
) -> tuple[DataFrame, dict]:
    """Execute the advised join: scan both tables, apply the broadcast
    hint the statistics justify, and return (DataFrame, advice). The
    hint is advisory — Catalyst/AQE still re-plan at runtime if actual
    sizes diverge (the hint simply spares AQE the first bad shuffle)."""
    rk = right_key or key
    advice = advise_join(
        left, right, key, rk,
        broadcast_threshold_bytes=broadcast_threshold_bytes,
    )
    ldf = left.snapshot()
    rdf = right.snapshot()
    if advice["strategy"] == "broadcast_right":
        rdf = F.broadcast(rdf)
    elif advice["strategy"] == "broadcast_left":
        ldf = F.broadcast(ldf)
    cond = ldf[key] == rdf[rk]
    return ldf.join(rdf, cond, how), advice
