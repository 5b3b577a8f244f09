"""Pinned-vs-auto LSH family on one corpus (r12, VERDICT r11 #5).

The standard scaled corpus gives every doc/vector ~factor near-copies,
so the minhash rows are OUTPUT-bound and auto-banding's
false-candidate cut never shows in the artifact of record. This
runner times JUST the dedup/ANN pinned/auto twins on a given sf dir —
meant to be run once on the copy-heavy x100 and once on the
``--unique`` x100 — with the bench's exact forcing shape.

Usage: python scripts/bench_dedup_family.py <sf_dir> [query ...]
Prints one JSON line {dir, queries: {name: sec}}.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

FAMILY = [
    "minhash_lsh_dedup",
    "minhash_lsh_dedup_auto",
    "embedding_near_dup",
    "embedding_near_dup_auto",
    "hard_negatives",
    "hard_negatives_auto",
    "dedup_keep_canonical",
    "dedup_keep_canonical_auto",
    "incremental_embedding_dedup",
]


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2:] or FAMILY

    from featureform_spark.session import get_spark
    from featureform_spark.suite import all_queries

    spark = get_spark("bench_dedup_family")
    qs = all_queries()
    timings = {}
    for name in names:
        t0 = time.time()
        df = qs[name](spark, sf_dir)
        df.selectExpr(
            "count(*)", *[f"count(`{c}`)" for c in df.columns]
        ).collect()
        timings[name] = round(time.time() - t0, 2)
        print(f"# {name}: {timings[name]}s", file=sys.stderr)
    print(json.dumps({"dir": sf_dir, "queries": timings}))


if __name__ == "__main__":
    main()
