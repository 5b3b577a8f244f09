"""Plan-side parallelism probe shared by CPU-bound per-row operators.

A small input that arrives as one scan split (single parquet file
under ``maxPartitionBytes``) would run a CPU-bound per-row kernel on
one core. ``fan_out_if_underparallel`` repartitions the RAW rows first
in that case — a cheap shuffle of undeduplicated text — so downstream
Arrow kernels / folds run map-side parallel. At real scale the scan
already has >> cores splits and this no-ops.

The probe counts ``df.inputFiles()`` instead of touching ``df.rdd``
(which forces conversion of the whole DataFrame plan to an RDD plan
just to ask a planning question). Non-file sources report zero input
files and are conservatively fanned out — they are in-memory test
inputs, so the shuffle is tiny.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out_if_underparallel(df: DataFrame) -> DataFrame:
    cores = df.sparkSession.sparkContext.defaultParallelism
    try:
        n_splits = len(df.inputFiles())
    except Exception:
        n_splits = 0
    if n_splits < cores:
        return df.repartition(cores)
    return df
