"""Min-of-N probe of a single suite query with the bench forcing shape.

Usage: python scripts/probe_query.py QUERY [QUERY...] [--n 5]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)

Matches bench.py methodology: warmup (range-sum, table counts, worker
pool fork), then per repetition build + force with
selectExpr(count(*), count(col)...) and report each sample + min.
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n = 5
    for i, a in enumerate(sys.argv[1:]):
        if a == "--n":
            n = int(sys.argv[1:][i + 1])
            args.remove(sys.argv[1:][i + 1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.environ.setdefault("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))

    from featureform_spark.session import get_spark
    from featureform_spark.suite import all_queries

    spark = get_spark("probe_query")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    from featureform_spark.sources.testdata import TABLES, load_table

    for t in TABLES:
        try:
            load_table(spark, sf_dir, t).count()
        except Exception:
            pass
    try:
        cpus = int(os.environ["SPARK_GRAFT_CPUS"])
        spark.range(cpus * 4, numPartitions=cpus).mapInPandas(
            lambda it: it, schema="id long"
        ).count()
    except Exception:
        pass

    queries = all_queries()

    def _cleanup() -> None:
        spark.catalog.clearCache()
        for rdd in dict(
            spark.sparkContext._jsc.getPersistentRDDs()
        ).values():
            rdd.unpersist()

    for name in args:
        fn = queries[name]
        samples = []
        for _ in range(n):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.selectExpr(
                "count(*)", *[f"count({c})" for c in df.columns]
            ).collect()
            samples.append(round(time.perf_counter() - t0, 3))
            _cleanup()
        print(
            f"PROBE {name}: min={min(samples)} samples={samples}",
            flush=True,
        )


if __name__ == "__main__":
    main()
