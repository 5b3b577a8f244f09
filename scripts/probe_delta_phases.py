"""Phase timing for the fixture-building table-format queries.

Times each lifecycle step of delta_row_tracking, delta_liquid_cluster
and iceberg_row_lineage separately (same steps the suite queries run),
plus the Spark job count per phase via the status tracker. Run on an
idle box; repeats each query end-to-end N times and prints per-phase
mins.
"""

from __future__ import annotations

import os
import sys
import time
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

N = int(os.environ.get("PROBE_N", "3"))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.environ.setdefault("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))

    from pyspark.sql import functions as F

    from featureform_spark.session import get_spark
    from featureform_spark.sources.testdata import load_table

    spark = get_spark("probe_delta_phases")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    load_table(spark, sf_dir, "events").count()
    load_table(spark, sf_dir, "lineitem").count()
    spark.range(128, numPartitions=32).mapInPandas(
        lambda it: it, schema="id long"
    ).count()

    st = spark.sparkContext.statusTracker()

    def phases_row_tracking(run):
        import shutil

        from featureform_spark.sources.delta_protocol import DeltaProtocolTable

        path = f"/tmp/probe_rt_{run}"
        shutil.rmtree(path, ignore_errors=True)
        events = load_table(spark, sf_dir, "events").select(
            "event_id", "user_id", "event_type", "value"
        )
        out = {}

        def ph(name, fn):
            j0 = len(st.getJobIdsForGroup(None) or [])
            t0 = time.perf_counter()
            r = fn()
            out[name] = (
                round(time.perf_counter() - t0, 3),
                len(st.getJobIdsForGroup(None) or []) - j0,
            )
            return r

        t = DeltaProtocolTable(spark, path)
        ph("create", lambda: t.create(
            events.filter(F.col("event_id") % 3 == 0),
            properties={"delta.enableRowTracking": "true"},
        ))
        ph("append", lambda: t.append(events.filter(F.col("event_id") % 3 == 1)))
        ph("delete", lambda: t.delete_where(F.col("event_type") == "click"))
        before = t.snapshot_with_row_ids().select(
            "event_id", F.col("_row_id").alias("__before_id")
        )
        src = events.filter(
            (F.col("event_id") % 3 == 2) | (F.col("event_id") % 6 == 1)
        ).withColumn("value", F.col("value") + 1000)
        ph("merge", lambda: t.merge(src, "event_id"))
        after = t.snapshot_with_row_ids()
        ph("asserts", lambda: after.join(before, "event_id", "left").agg(
            F.sum((F.col("__before_id").isNotNull()
                   & (F.col("__before_id") != F.col("_row_id"))).cast("int")),
            (F.count("*") - F.countDistinct("_row_id")),
        ).first())
        ph("force", lambda: after.select(
            "event_id", "user_id", "event_type", "value"
        ).selectExpr("count(*)", "count(event_id)", "count(user_id)",
                     "count(event_type)", "count(value)").collect())
        shutil.rmtree(path, ignore_errors=True)
        return out

    def phases_liquid(run):
        import shutil

        from featureform_spark.sources.delta_protocol import DeltaProtocolTable

        path = f"/tmp/probe_lq_{run}"
        shutil.rmtree(path, ignore_errors=True)
        li = load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_partkey", "l_quantity", "l_extendedprice"
        )
        out = {}

        def ph(name, fn):
            j0 = len(st.getJobIdsForGroup(None) or [])
            t0 = time.perf_counter()
            r = fn()
            out[name] = (
                round(time.perf_counter() - t0, 3),
                len(st.getJobIdsForGroup(None) or []) - j0,
            )
            return r

        target = ph("count", lambda: max(500, li.count() // 12))
        t = DeltaProtocolTable(spark, path)
        ph("create", lambda: t.create(
            li.filter(F.col("l_orderkey") % 10 == 0),
            cluster_by=["l_orderkey", "l_partkey"],
            target_rows_per_file=target,
        ))
        ph("append", lambda: t.append(li.filter(F.col("l_orderkey") % 10 != 0)))
        ph("compact", lambda: t.compact(target_rows_per_file=target))
        df = ph("read", lambda: t.snapshot_pruned("l_orderkey", 1000, 3000))
        ph("force", lambda: df.filter(
            F.col("l_partkey").between(50, 1500)
        ).selectExpr("count(*)", "count(l_orderkey)").collect())
        shutil.rmtree(path, ignore_errors=True)
        return out

    def phases_lineage(run):
        import shutil

        from featureform_spark.sources.iceberg_protocol import (
            IcebergProtocolTable,
        )

        path = f"/tmp/probe_il_{run}"
        shutil.rmtree(path, ignore_errors=True)
        events = load_table(spark, sf_dir, "events").select(
            "event_id", "user_id", "event_type", "value"
        )
        out = {}

        def ph(name, fn):
            j0 = len(st.getJobIdsForGroup(None) or [])
            t0 = time.perf_counter()
            r = fn()
            out[name] = (
                round(time.perf_counter() - t0, 3),
                len(st.getJobIdsForGroup(None) or []) - j0,
            )
            return r

        t = IcebergProtocolTable(spark, path)
        ph("create", lambda: t.create(events.filter(F.col("event_id") % 3 == 0)))
        ph("upgrade", lambda: t.upgrade_format_version(3))
        ph("append", lambda: t.append(events.filter(F.col("event_id") % 3 == 1)))
        ph("delete", lambda: t.delete_rows(F.col("event_type") == "click"))
        before = t.snapshot_with_row_ids().select(
            "event_id", F.col("_row_id").alias("__before_id")
        )
        ph("rewrite", lambda: t.rewrite_data_files())
        after = t.snapshot_with_row_ids()
        ph("asserts", lambda: after.join(before, "event_id", "left").agg(
            F.count("*")).first())
        ph("force", lambda: after.select(
            "event_id", "user_id", "event_type", "value"
        ).selectExpr("count(*)", "count(event_id)").collect())
        shutil.rmtree(path, ignore_errors=True)
        return out

    which = sys.argv[1:] or ["row_tracking", "liquid", "lineage"]
    fns = {
        "row_tracking": phases_row_tracking,
        "liquid": phases_liquid,
        "lineage": phases_lineage,
    }
    for name in which:
        best: dict[str, tuple] = {}
        jobs: dict[str, int] = {}
        for i in range(N):
            res = fns[name](i)
            for k, (sec, nj) in res.items():
                if k not in best or sec < best[k]:
                    best[k] = sec
                jobs[k] = nj
        total = round(sum(best.values()), 3)
        print(f"PHASES {name}: total_min_sum={total}")
        for k in best:
            print(f"  {k:10s} {best[k]:7.3f}s  jobs={jobs[k]}")


if __name__ == "__main__":
    main()
