"""Per-group feature scaling: z-score and min-max normalization.

The standard pre-training feature transform, done the scale-safe way:
one partial-aggregated groupBy computes per-group stats (a handful of
rows), which broadcast-join back onto the fact table — the corpus is
scanned twice but never shuffled on the group key for the projection
(a per-group Window would sort every fact row instead).

Cross-engine float discipline (the driver hash-compares): sums go
through DECIMAL (exact in both engines), and every double-valued
expression (mean, variance, z) has the same algebraic shape as the SQL
oracle, so identical exact inputs produce identical doubles. Variance
uses the (Σx² − (Σx)²/n)/(n−1) form on exact decimal sums rather than
Welford/AVG, precisely so no engine-specific accumulation order leaks
into the result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def group_scale_stats(
    df: DataFrame, group_col: str, value_col: str
) -> DataFrame:
    """Per-group n / exact decimal sum & sum-of-squares / min / max."""
    d = F.col(value_col).cast("decimal(18,4)")
    return df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(d).alias("_sum"),
        F.sum(d * d).alias("_sumsq"),
        F.min(d).alias("_min"),
        F.max(d).alias("_max"),
    )


def feature_scale(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_cols: list[str] | None = None,
) -> DataFrame:
    """Attach ``zscore`` and ``minmax`` columns to every row, scaled
    within its group. Groups with a single row or zero spread yield
    NULL (no defined scale), matching the SQL oracle's NULLIF guards.
    """
    stats = group_scale_stats(df, group_col, value_col)
    x = F.col(value_col).cast("decimal(18,4)").cast("double")
    n = F.col("_n").cast("double")
    s = F.col("_sum").cast("double")
    sq = F.col("_sumsq").cast("double")
    mean = s / n
    var = (sq - s * s / n) / F.nullif(n - F.lit(1.0), F.lit(0.0))
    z = (x - mean) / F.sqrt(F.nullif(var, F.lit(0.0)))
    mn = F.col("_min").cast("double")
    mx = F.col("_max").cast("double")
    minmax = (x - mn) / F.nullif(mx - mn, F.lit(0.0))
    keep = id_cols or [c for c in df.columns if c not in (group_col, value_col)]
    return df.join(F.broadcast(stats), group_col).select(
        *keep,
        F.col(group_col),
        F.col(value_col),
        z.alias("zscore"),
        minmax.alias("minmax"),
    )
