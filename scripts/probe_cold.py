"""Cold-JVM single-run probe of suite queries, driver-bench shaped.

Each invocation of this script is ONE fresh process (fresh JVM): it
runs bench.py's exact warmup (range-sum, table counts, python worker
pool fork), then times each named query ONCE with the bench forcing
shape and prints one line per query. No warm retimes — this reproduces
the driver's single-cold-pass measurement conditions (VERDICT r12 next
#1). A caller shell loop alternates code arms (via env toggles) across
fresh processes to get an interleaved A/B under identical box weather.

Usage: python scripts/probe_cold.py QUERY [QUERY...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS, plus whatever arm toggles the caller sets.
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.environ.setdefault("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))

    from featureform_spark.session import get_spark
    from featureform_spark.suite import all_queries

    spark = get_spark("probe_cold")
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

    for name in names:
        fn = queries[name]
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        df.selectExpr(
            "count(*)", *[f"count({c})" for c in df.columns]
        ).collect()
        dt = round(time.perf_counter() - t0, 3)
        print(f"COLD {name}: {dt}", flush=True)
        _cleanup()


if __name__ == "__main__":
    main()
