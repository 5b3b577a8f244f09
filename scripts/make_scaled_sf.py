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

``--unique`` (r12, VERDICT r11 #5) switches the CORPUS SHAPE: instead
of ~factor near-identical copies per doc/vector (which makes the dedup
family's output genuinely quadratic-in-copies — candidate sets ARE the
output, so auto-banding's false-candidate cut never shows), copies are
perturbed PAST the dedup thresholds — documents interleave a per-copy
unique token after every original token (every word shingle crosses an
inserted token, so copy shingle sets are disjoint: pairwise j ≈ 0),
embeddings rotate their coordinates by copy positions (norm-preserved;
cosine between rotations of the same vector is far below any near-dup
threshold). The result is the uniform low-background-similarity shape
where bucketing/banding quality, not output volume, dominates the
wall clock.

Usage: python scripts/make_scaled_sf.py [factor] [src_sf_dir] [out_dir] [--unique]
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
    args = [a for a in sys.argv[1:] if a != "--unique"]
    unique = "--unique" in sys.argv[1:]
    factor = int(args[0]) if len(args) > 0 else 10
    src = args[1] if len(args) > 1 else "/root/testdata/sf0.1"
    out = (
        args[2]
        if len(args) > 2
        else f"/tmp/ffspark_scaled_x{factor}{'_unique' if unique else ''}"
    )

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
            if unique:
                # interleave a per-copy token after EVERY original
                # token (every word shingle crosses an inserted token,
                # so copy shingle sets are disjoint from the original
                # and from each other), then prepend an 11-token GLOBAL
                # preamble: 9 shared shingles over ~117 per median doc
                # sets the pairwise background Jaccard at ~0.04 — the
                # uniform moderate-similarity shape where r=3 banding
                # drowns in false candidates at 500k docs and the
                # measured-j auto path re-bands to r=4
                preamble = " ".join(f"bg{k}" for k in range(11))
                copies = copies.withColumn(
                    "text",
                    F.when(F.col("__copy") == 0, F.col("text")).otherwise(
                        F.concat(
                            F.lit(preamble + " "),
                            F.array_join(
                                F.expr(
                                    "transform(filter(split(text, ' '), "
                                    "x -> x <> ''), (t, i) -> concat(t, ' q', "
                                    "__copy, 'x', i))"
                                ),
                                " ",
                            ),
                        )
                    ),
                ).withColumn("n_chars", F.length("text").cast("long"))
            else:
                # perturb text per copy so near-dup structure survives
                # scaling
                copies = copies.withColumn(
                    "text",
                    F.when(F.col("__copy") == 0, F.col("text")).otherwise(
                        F.concat(F.col("text"), F.lit(" c"), F.col("__copy"))
                    ),
                ).withColumn("n_chars", F.length("text").cast("long"))
        if t == "embeddings" and unique:
            # rotate coordinates by a per-copy offset (never 0), and
            # negate on the second rotation cycle: norm-preserved,
            # no two copies identical up to factor 2*(dim-1), and
            # cosine(rotationA, rotationB) sits far below any near-dup
            # threshold for non-degenerate vectors
            copies = copies.withColumn(
                "__rot",
                F.expr(
                    "CAST(1 + ((__copy - 1) % (size(embedding) - 1)) AS INT)"
                ),
            ).withColumn(
                "embedding",
                F.expr(
                    "CASE WHEN __copy = 0 THEN embedding ELSE "
                    "transform(concat("
                    "slice(embedding, __rot + 1, size(embedding) - __rot), "
                    "slice(embedding, 1, __rot)), x -> "
                    "CASE WHEN ((__copy - 1) DIV (size(embedding) - 1)) % 2 "
                    "= 1 THEN -x ELSE x END) END"
                ),
            ).drop("__rot")
        n_out = max(4, factor * 2)
        copies.drop("__copy").repartition(n_out).write.mode(
            "overwrite"
        ).parquet(f"{out}/{t}.parquet")
        print(f"{t}: x{factor} -> {out}")

    print(f"done: {out}")


if __name__ == "__main__":
    main()
