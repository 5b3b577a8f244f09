"""Plan-side parallelism probe shared by CPU-bound per-row operators.

A small input that arrives as one scan split (single parquet file
under ``maxPartitionBytes``) would run a CPU-bound per-row kernel on
one core. ``fan_out_if_underparallel`` repartitions the RAW rows first
in that case — a cheap shuffle of undeduplicated text — so downstream
Arrow kernels / folds run map-side parallel. At real scale the scan
already has >> cores splits and this no-ops.

The probe estimates SCAN SPLITS, not just file count: a single 10 GB
parquet file already splits into ~size/maxPartitionBytes tasks, so
counting files alone would trigger a pointless full shuffle (and
collapse the scan's natural parallelism down to ``cores``). Local
``file:`` URIs are sized via the filesystem; files that cannot be
sized conservatively count as one split. ``df.rdd`` is deliberately
never touched (it forces conversion of the whole DataFrame plan to an
RDD plan just to ask a planning question).

Driver cost is bounded (r12 verdict #4): the stat walk short-circuits
the moment ``cap`` splits are counted — and since every file is at
least one split, a listing with >= cap files never stats anything —
so a 10^6-file table pays O(cores) stats, not O(files).

Sources that report NO input files are split two ways (r12 advice):
a driver-local relation (LocalRelation / LogicalRDD — in-memory test
input) is fanned out as before (the shuffle is tiny by construction),
but a non-file DSv2 relation (Iceberg-style ``RelationV2``) is left
alone — it can be arbitrarily large, and a round-robin
``repartition(cores)`` would both shuffle the full corpus and CAP its
parallelism at the local core count.
"""

from __future__ import annotations

import os
import re
import urllib.parse

from pyspark.sql import DataFrame

_DEFAULT_MAX_PARTITION_BYTES = 128 * 1024 * 1024


def _max_partition_bytes(df: DataFrame) -> int:
    try:
        raw = df.sparkSession.conf.get(
            "spark.sql.files.maxPartitionBytes",
            str(_DEFAULT_MAX_PARTITION_BYTES),
        )
        m = re.match(r"(\d+)\s*([kmgt]?)b?", str(raw).strip().lower())
        if m:
            mult = {"": 1, "k": 1 << 10, "m": 1 << 20, "g": 1 << 30,
                    "t": 1 << 40}[m.group(2)]
            return max(1, int(m.group(1)) * mult)
    except Exception:
        pass
    return _DEFAULT_MAX_PARTITION_BYTES


def _estimated_splits(df: DataFrame, cap: int | None = None) -> int | None:
    """Estimated scan split count, or ``None`` when the source reports
    no input files (non-file relation). With ``cap`` set, counting
    stops — and ``cap`` is returned — as soon as that many splits are
    known, so large listings never pay a full per-file stat walk."""
    try:
        files = df.inputFiles()
    except Exception:
        return None
    if not files:
        return None
    if cap is not None and len(files) >= cap:
        return cap  # every file is at least one split
    mpb = _max_partition_bytes(df)
    splits = 0
    for uri in files:
        parsed = urllib.parse.urlparse(uri)
        if parsed.scheme in ("file", ""):
            path = urllib.parse.unquote(parsed.path or uri)
            try:
                size = os.path.getsize(path)
                splits += max(1, -(-size // mpb))
            except OSError:
                splits += 1
        else:
            splits += 1  # unsized/remote file: at least one split
        if cap is not None and splits >= cap:
            return cap
    return splits


def _is_local_relation(df: DataFrame) -> bool:
    """True when the frame's leaves are driver-local data (test
    inputs) rather than a non-file table scan. Inspects the ANALYZED
    plan string — no job, no physical planning."""
    try:
        plan = df._jdf.queryExecution().analyzed().toString()
    except Exception:
        return True  # cannot tell: keep the historical fan-out
    return "RelationV2" not in plan and "BatchScan" not in plan


def fan_out_if_underparallel(df: DataFrame) -> DataFrame:
    cores = df.sparkSession.sparkContext.defaultParallelism
    splits = _estimated_splits(df, cap=cores)
    if splits is None:
        # No reported input files: fan out only driver-local test
        # inputs; leave non-file DSv2 tables at their native layout.
        return df.repartition(cores) if _is_local_relation(df) else df
    if splits < cores:
        return df.repartition(cores)
    return df
