"""x100 probe for the store re-bucketing migration (r12, VERDICT r11
task #1 done-criterion).

Reproduces the r11 blowup shape — an EmbeddingStore PINNED at 8
planes holding the x100 accepted vectors (the shape BENCH_x100.json
measured at 157.7s / 66x for `incremental_embedding_dedup` before the
destination-auto fix) — then migrates it in place with
``rebucket(recommended)`` and re-times the same batch flag with the
bench's full forcing. Done-criterion: the MIGRATED store flags at
<= 15x the settled sf0.1 time.

Usage: python scripts/probe_rebucket_x100.py [x100_dir]
Prints one JSON line {pinned_flag_s, rebucket_s, migrated_flag_s,
planes_before, planes_after, n_accepted, n_batch, flags_*}.
"""

from __future__ import annotations

import json
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _force(df) -> None:
    df.selectExpr(
        "count(*)", *[f"count(`{c}`)" for c in df.columns]
    ).collect()


def main() -> None:
    x100 = sys.argv[1] if len(sys.argv) > 1 else "/tmp/ffspark_scaled_x100"

    from pyspark.sql import functions as F

    from featureform_spark.session import get_spark
    from featureform_spark.sources.testdata import load_table
    from featureform_spark.streaming.vector_store import EmbeddingStore

    spark = get_spark("probe_rebucket_x100")
    emb = load_table(spark, x100, "embeddings")
    dim = len(emb.select("embedding").first()["embedding"])
    accepted = emb.filter(F.col("vec_id") % 5 != 0)
    batch = emb.filter(F.col("vec_id") % 5 == 0)
    n_acc, n_batch = accepted.count(), batch.count()

    path = "/tmp/ffspark_rebucket_probe_store"
    shutil.rmtree(path, ignore_errors=True)
    store = EmbeddingStore(
        spark, path, dim=dim, num_planes=8, cosine_threshold=0.2
    )
    store.ingest(accepted, on_overflow="ignore")

    t0 = time.time()
    flags_pinned = store.flag(batch)
    _force(flags_pinned)
    pinned_s = time.time() - t0
    n_dup_pinned = store.flag(batch).agg(F.sum("is_dup")).collect()[0][0]

    rep = store.occupancy_report()
    assert rep["needs_rebucket"], rep
    t0 = time.time()
    store.rebucket(rep["recommended_planes"])
    rebucket_s = time.time() - t0

    t0 = time.time()
    flags_migrated = store.flag(batch)
    _force(flags_migrated)
    migrated_s = time.time() - t0
    n_dup_migrated = store.flag(batch).agg(F.sum("is_dup")).collect()[0][0]

    print(json.dumps({
        "pinned_flag_s": round(pinned_s, 1),
        "rebucket_s": round(rebucket_s, 1),
        "migrated_flag_s": round(migrated_s, 1),
        "planes_before": 8,
        "planes_after": rep["recommended_planes"],
        "n_accepted": n_acc,
        "n_batch": n_batch,
        "flags_pinned": int(n_dup_pinned),
        "flags_migrated": int(n_dup_migrated),
    }))


if __name__ == "__main__":
    main()
