"""Skew stress for the PIT join: default single-window path vs the
segmented time_bucket escape hatch, on a synthetically hot entity.

Generates N events (default 5M) where HALF of all rows belong to one
entity — the profile that serializes a per-entity window sort onto one
reducer. Runs the identical point_in_time_join twice (time_bucket=None
vs "7 days"), verifies both produce the same row count, and prints one
JSON line with wall times.

Usage:  python scripts/bench_skew.py [n_rows]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000

    from pyspark.sql import functions as F

    from featureform_spark.operators.training_set import (
        FeatureInput,
        point_in_time_join,
    )
    from featureform_spark.session import get_spark

    spark = get_spark("bench_skew")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warmup

    # half the rows on entity 0, the rest uniform over 100k entities;
    # timestamps uniform over 90 days
    ev = (
        spark.range(n)
        .select(
            F.col("id").alias("event_id"),
            F.when(F.col("id") % 2 == 0, F.lit(0))
            .otherwise((F.hash("id") % 100_000 + 100_000) % 100_000 + 1)
            .alias("user_id"),
            F.timestamp_seconds(
                F.lit(1704067200) + (F.hash("id", "id") % (90 * 86400) + 90 * 86400) % (90 * 86400)
            ).alias("ts"),
            (F.col("id") % 4 == 0).cast("int").alias("is_label"),
            (F.hash("id") % 1000).cast("double").alias("value"),
        )
        .persist()
    )
    ev.count()

    label = ev.filter(F.col("is_label") == 1)
    feat_df = ev.filter(F.col("is_label") == 0)

    def run(bucket):
        feat = FeatureInput(
            name="f_val", df=feat_df, entity_col="user_id",
            value_col="value", ts_col="ts", order_col="event_id",
        )
        out = point_in_time_join(
            label, [feat], label_entity_col="user_id",
            label_value_col="value", label_ts_col="ts", time_bucket=bucket,
        )
        t0 = time.perf_counter()
        rows = out.count()
        return time.perf_counter() - t0, rows

    plain_s, plain_rows = run(None)
    bucket_s, bucket_rows = run("7 days")
    assert plain_rows == bucket_rows, (plain_rows, bucket_rows)

    print(json.dumps({
        "metric": "pit_skew_seconds",
        "n_rows": n,
        "hot_entity_share": 0.5,
        "plain_window_sec": round(plain_s, 2),
        "time_bucket_sec": round(bucket_s, 2),
        "speedup": round(plain_s / bucket_s, 2),
        "rows_out": plain_rows,
    }))


if __name__ == "__main__":
    main()
