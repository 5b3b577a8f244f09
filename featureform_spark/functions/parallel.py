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
RDD plan just to ask a planning question). Non-file sources report
zero input files and are conservatively fanned out — they are
in-memory test inputs, so the shuffle is tiny.
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


def _estimated_splits(df: DataFrame) -> int:
    try:
        files = df.inputFiles()
    except Exception:
        return 0
    if not files:
        return 0
    mpb = _max_partition_bytes(df)
    splits = 0
    for uri in files:
        parsed = urllib.parse.urlparse(uri)
        if parsed.scheme in ("file", ""):
            path = urllib.parse.unquote(parsed.path or uri)
            try:
                size = os.path.getsize(path)
                splits += max(1, -(-size // mpb))
                continue
            except OSError:
                pass
        splits += 1  # unsized/remote file: at least one split
    return splits


def fan_out_if_underparallel(df: DataFrame) -> DataFrame:
    cores = df.sparkSession.sparkContext.defaultParallelism
    if _estimated_splits(df) < cores:
        return df.repartition(cores)
    return df
