"""Exact corpus-wide heavy hitters with bounded shuffle.

The classic two-pass frequent-items recipe (Misra–Gries / mergeable
summaries, Agarwal et al. PODS'12; Spark ships the Karp–Shenker–
Papadimitriou variant JVM-side as ``df.stat.freqItems``):

- **Pass 1 — candidates**: ``freqItems`` keeps a fixed ``1/support``-slot
  counter map per task and merges them; every item with frequency
  > support·N is guaranteed to survive (false positives possible, false
  negatives not). Output volume is O(1/support) TOTAL, independent of
  corpus size — at 100 TB the candidate set is still a broadcast.
- **Pass 2 — exact verify**: one broadcast semi-join narrows the corpus
  to candidate items, then a partial-aggregated groupBy counts them
  exactly and keeps ``count >= ceil(min_frac * N)``.

Output is EXACT (the oracle is a plain GROUP BY ... HAVING), but the
full-item shuffle a naive groupBy-over-everything would do is replaced
by (#map-tasks x #candidates) partial rows — the difference between
shuffling a 100 TB n-gram explosion and shuffling kilobytes.

``support`` must be strictly below ``min_frac`` (default ``min_frac/2``,
floored at Spark's 1e-4 minimum): the superset guarantee is strict
(freq > support·N), so an item sitting exactly on ``min_frac·N`` is only
covered when support < min_frac.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from featureform_spark.functions.text import tokens_expr


def frequent_items(
    df: DataFrame,
    item_col: str,
    min_frac: float,
    support: float | None = None,
    out_count_col: str = "cnt",
) -> DataFrame:
    """Items of ``df[item_col]`` occurring in >= ceil(min_frac * N) rows.

    Fully declarative — no driver-side collect; the candidate list and
    the total-count row both flow through broadcasts.
    """
    if support is None:
        support = max(1e-4, min_frac / 2)
    if not support < min_frac:
        raise ValueError(
            f"support ({support}) must be < min_frac ({min_frac}) for the "
            "candidate superset guarantee to cover the threshold boundary"
        )
    candidates = df.stat.freqItems([item_col], support).select(
        F.explode(F.col(f"{item_col}_freqItems")).alias(item_col)
    )
    total = df.agg(F.count(F.lit(1)).alias("_n"))
    counts = (
        df.join(F.broadcast(candidates), item_col, "left_semi")
        .groupBy(item_col)
        .agg(F.count(F.lit(1)).alias(out_count_col))
    )
    return (
        counts.crossJoin(F.broadcast(total))
        .filter(
            F.col(out_count_col) >= F.ceil(F.lit(float(min_frac)) * F.col("_n"))
        )
        .select(item_col, out_count_col)
    )


def ngrams_expr(toks: Column, n: int, sep: str = " ") -> Column:
    """Token n-grams as an array column — pure JVM expression, no UDF.

    Guarded so documents shorter than ``n`` tokens yield an empty array
    (Spark's ``sequence(1, 0)`` would otherwise count DOWN)."""
    count = F.size(toks) - (n - 1)
    grams = F.transform(
        F.sequence(F.lit(1), count),
        lambda i: F.concat_ws(sep, *[F.element_at(toks, i + j) for j in range(n)]),
    )
    return F.when(count >= 1, grams).otherwise(
        F.array().cast("array<string>")
    )


def frequent_ngrams(
    df: DataFrame,
    n: int = 3,
    min_frac: float = 2e-4,
    text_col: str = "text",
    support: float | None = None,
) -> DataFrame:
    """Corpus-wide frequent token n-grams — the boilerplate/template
    detector of LLM data pipelines (repeated headers, license blocks,
    navigation chrome show up as heavy-hitter n-grams).

    The n-gram explode runs twice (candidate pass + verify pass) but
    never shuffles: both scans are map-side until the bounded aggregates.
    Output: ``(ngram, cnt)``.
    """
    items = df.select(
        F.explode(ngrams_expr(tokens_expr(text_col), n)).alias("ngram")
    )
    return frequent_items(items, "ngram", min_frac, support)
