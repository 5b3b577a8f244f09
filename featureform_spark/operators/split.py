"""Deterministic train/test split (O4).

Reference: ClickHouse counts rows then assigns ``is_test`` via a seeded
``cityHash64`` row-number window (provider/clickhouse.go:1278-1331). An
exact-count split needs a global sort + count — a scalability tax. We use
a seeded *hash-bucket* split instead: each row's assignment is a pure
function of (key, seed), so it is deterministic, stable under
re-partitioning and re-runs, reproducible by any engine that has md5
(which is how the DuckDB oracle validates it), and embarrassingly
parallel. The split is fractional-in-expectation rather than exact-count —
the documented deviation from the reference (SURVEY §7.4).

Bucketing uses the first 8 hex chars of ``md5(key || '#' || seed)``
compared against a hex threshold — string comparison on fixed-width
lowercase hex is identical in every engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_bucket(key: Column, seed: int = 42) -> Column:
    """Uniform [0, 1) bucket from a deterministic md5 of (key, seed)."""
    h = F.md5(F.concat(key.cast("string"), F.lit(f"#{seed}")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("double") / F.lit(float(16**8))


def threshold_hex(frac: float) -> str:
    """Hex threshold t such that P(md5_prefix < t) == frac (8 hex chars).

    Clamped at the edges: frac >= 1.0 returns 'g' (lexicographically
    above every hex digit, so ``prefix < t`` keeps ALL rows — the naive
    9-char '100000000' would keep only hashes starting with '0'), and
    frac <= 0 returns '00000000' (keeps none).
    """
    if frac >= 1.0:
        return "g"
    if frac <= 0.0:
        return "00000000"
    return format(int(frac * 16**8), "08x")


def with_split_column(
    df: DataFrame,
    key_cols: list[str],
    test_fraction: float = 0.2,
    seed: int = 42,
    out_col: str = "is_test",
) -> DataFrame:
    """Attach is_test ∈ {0,1}: 1 iff md5 prefix of the key < threshold."""
    key = F.concat_ws("|", *[F.col(c).cast("string") for c in key_cols])
    h = F.substring(F.md5(F.concat(key, F.lit(f"#{seed}"))), 1, 8)
    return df.withColumn(
        out_col, F.when(h < F.lit(threshold_hex(test_fraction)), 1).otherwise(0)
    )


def train_test_split(
    df: DataFrame,
    key_cols: list[str],
    test_fraction: float = 0.2,
    seed: int = 42,
) -> tuple[DataFrame, DataFrame]:
    """(train, test) DataFrames; assignment deterministic per key."""
    tagged = with_split_column(df, key_cols, test_fraction, seed)
    return (
        tagged.filter(F.col("is_test") == 0).drop("is_test"),
        tagged.filter(F.col("is_test") == 1).drop("is_test"),
    )


def train_test_split_exact(
    df: DataFrame,
    key_cols: list[str],
    test_fraction: float = 0.2,
    seed: int = 42,
    out_col: str = "is_test",
) -> DataFrame:
    """Exact-count split matching the reference
    (provider/clickhouse.go:1278-1331): ``testRows = int(total * frac)``,
    rows ranked by a seeded hash, rank <= testRows -> test. Unlike
    ``with_split_column`` (fractional-in-expectation), the test set has
    EXACTLY ``int(total * frac)`` rows.

    Scale shape: one count pass, then a rank over the seeded hash via
    ``with_row_index`` — a range repartition with per-partition sorts and
    a broadcast of per-partition offsets, not a single-partition global
    window (the reference's ClickHouse ``row_number() OVER (ORDER BY
    cityHash64(...))`` implies the same distributed sort). Assignment is
    deterministic per key: stable under retries and reproducible by the
    DuckDB oracle via the same md5 ordering.
    """
    from featureform_spark.operators.materialize import with_row_index

    total = df.count()
    test_rows = int(total * test_fraction)
    key = F.concat_ws("|", *[F.col(c).cast("string") for c in key_cols])
    tagged = df.withColumn("__h", F.md5(F.concat(key, F.lit(f"#{seed}"))))
    indexed = with_row_index(tagged, order_cols=["__h"], index_col="__rn")
    return (
        indexed.withColumn(
            out_col, F.when(F.col("__rn") <= test_rows, 1).otherwise(0)
        )
        .drop("__h", "__rn")
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    key_cols: list[str],
    seed: int = 42,
) -> DataFrame:
    """Deterministic per-stratum sampling: keep a row iff its md5
    hash-bucket falls under the stratum's fraction.

    Unlike ``df.sampleBy`` (rand()-based, run-dependent), assignment is
    a pure function of (key, seed): stable across retries, partitions,
    and engines — the DuckDB oracle reproduces it exactly. Strata absent
    from ``fractions`` are dropped (fraction 0).
    """
    key = F.concat_ws("|", *[F.col(c).cast("string") for c in key_cols])
    h = F.substring(F.md5(F.concat(key, F.lit(f"#{seed}"))), 1, 8)
    thr = F.lit("00000000")
    for stratum, frac in fractions.items():
        thr = F.when(
            F.col(strata_col) == stratum, F.lit(threshold_hex(frac))
        ).otherwise(thr)
    return df.filter(h < thr)
