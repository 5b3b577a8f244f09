"""Per-query profiling: split each suite query's wall time into
driver-side build (the Python call that may run internal collects)
vs. execution of the returned plan (forced exactly like bench.py),
and count the Spark jobs/stages/tasks each phase launched.

Usage:
    python scripts/profile_queries.py [sf_dir] [query ...]

Writes PROFILE_r12.json next to the repo root with one record per
query: {build_s, exec_s, jobs_build, jobs_exec, tasks, n_queries...}.
Purely a measurement tool (guide §1) — not part of the bench contract.
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    only = set(sys.argv[2:])
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    os.environ["SPARK_GRAFT_CPUS"] = cpus

    from featureform_spark.session import get_spark
    from featureform_spark.suite import all_queries

    spark = get_spark("featureform_spark_profile")
    sc = spark.sparkContext

    spark.range(1_000_000).selectExpr("sum(id)").collect()
    from featureform_spark.sources.testdata import TABLES, load_table

    for t in TABLES:
        try:
            load_table(spark, sf_dir, t).count()
        except Exception:
            pass
    try:
        spark.range(int(cpus) * 4, numPartitions=int(cpus)).mapInPandas(
            lambda it: it, schema="id long"
        ).count()
    except Exception:
        pass

    def _cleanup() -> None:
        spark.catalog.clearCache()
        for rdd in dict(sc._jsc.getPersistentRDDs()).values():
            rdd.unpersist()

    # count jobs by diffing the max job id seen so far (cheapest
    # reliable counter; a py4j listener would add its own overhead)
    def _max_job_id() -> int:
        ids = sc._jsc.sc().statusTracker().getJobIdsForGroup(None)
        return max(ids) if ids else -1

    queries = all_queries()
    if only:
        queries = {k: v for k, v in queries.items() if k in only}

    out: dict[str, dict] = {}
    for name, fn in sorted(queries.items()):
        _cleanup()
        try:
            j0 = _max_job_id()
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            j1 = _max_job_id()
            df.selectExpr(
                "count(*)", *[f"count({c})" for c in df.columns]
            ).collect()
            t2 = time.perf_counter()
            j2 = _max_job_id()
            out[name] = {
                "build_s": round(t1 - t0, 3),
                "exec_s": round(t2 - t1, 3),
                "total_s": round(t2 - t0, 3),
                "jobs_build": j1 - j0,
                "jobs_exec": j2 - j1,
            }
        except Exception as exc:  # noqa: BLE001
            out[name] = {"error": f"{type(exc).__name__}: {exc}"[:200]}
        print(name, out[name], flush=True)
        _cleanup()

    doc = {
        "sf_dir": sf_dir,
        "cpus": cpus,
        "queries": out,
        "total_build_s": round(
            sum(v.get("build_s", 0) for v in out.values()), 2
        ),
        "total_exec_s": round(
            sum(v.get("exec_s", 0) for v in out.values()), 2
        ),
    }
    with open(Path(__file__).resolve().parent.parent / "PROFILE_r12.json", "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps({k: doc[k] for k in ("total_build_s", "total_exec_s")}))


if __name__ == "__main__":
    main()
