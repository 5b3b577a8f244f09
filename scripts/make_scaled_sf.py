"""Generate an N×-scaled copy of a testdata sf directory (default: sf0.1
× 10 ≈ sf1) so bench.py can run the whole suite at a scale the driver
doesn't ship.

Each table is replicated ``factor``× with keys remapped
(``key*factor + i``) so referential joins stay consistent and key
cardinality scales with volume (a pure row copy would keep entity counts
flat and turn every per-entity operator into a skew test instead of a
scale test). Dimension tables (region/nation) stay fixed, like TPC-H.
Document text gets a per-copy suffix so dedup structure is preserved
instead of collapsing to 100% duplicates.

Usage: python scripts/make_scaled_sf.py [factor] [src_sf_dir] [out_dir]
Then:  SPARK_GRAFT_SF_DIR=<out_dir> python bench.py
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# key columns remapped per table: new_key = key * factor + copy_i
KEY_COLS = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
DIMENSIONS = ["region", "nation"]  # copied as-is


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out = sys.argv[3] if len(sys.argv) > 3 else f"/tmp/ffspark_scaled_x{factor}"

    from pyspark.sql import functions as F

    from featureform_spark.session import get_spark
    from featureform_spark.sources.testdata import load_table

    spark = get_spark("make_scaled_sf")
    Path(out).mkdir(parents=True, exist_ok=True)

    for t in DIMENSIONS:
        load_table(spark, src, t).write.mode("overwrite").parquet(f"{out}/{t}.parquet")
        print(f"{t}: copied")

    for t, keys in KEY_COLS.items():
        df = load_table(spark, src, t)
        copies = df.crossJoin(
            spark.range(factor).select(F.col("id").alias("__copy"))
        )
        for k in keys:
            copies = copies.withColumn(
                k, (F.col(k) * factor + F.col("__copy")).cast("long")
            )
        if t == "documents":
            # perturb text per copy so near-dup structure survives scaling
            copies = copies.withColumn(
                "text",
                F.when(F.col("__copy") == 0, F.col("text")).otherwise(
                    F.concat(F.col("text"), F.lit(" c"), F.col("__copy"))
                ),
            ).withColumn("n_chars", F.length("text").cast("long"))
        n_out = max(4, factor * 2)
        copies.drop("__copy").repartition(n_out).write.mode(
            "overwrite"
        ).parquet(f"{out}/{t}.parquet")
        print(f"{t}: x{factor} -> {out}")

    print(f"done: {out}")


if __name__ == "__main__":
    main()
