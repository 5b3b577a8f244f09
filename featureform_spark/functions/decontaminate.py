"""Benchmark decontamination: flag corpus documents that share word
n-grams with an evaluation/benchmark set.

This is the standard LLM-training-data hygiene step (n-gram-overlap
decontamination as described publicly in the GPT-3 and Llama papers):
any training document containing an n-gram that also occurs in a
benchmark document is marked contaminated so it can be dropped or
audited before training.

Scale design (100 TB corpus, MB-scale benchmark set):
- The benchmark side is tiny by construction (eval suites are a few
  MB), so its distinct n-gram set is **broadcast** — the corpus side's
  explode → join stays map-side with zero shuffle of corpus n-grams.
- Per-doc overlap counts aggregate with map-side partial aggregation;
  only the (doc_id, partial_count) pairs of *hit* documents cross the
  wire, which for a clean corpus is a sliver of the data.
- Everything is built-in expressions (split/transform/slice/concat_ws)
  — whole-stage codegen, no Python in the hot path.

No direct reference-repo counterpart (featureform has no corpus ops);
shape follows the public decontamination recipe.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def ngram_array(text_col: str | Column, n: int) -> Column:
    """Distinct word n-grams of a text column as an array<string>.

    Built on the sliced-zip_with n-gram kernel (heavy_hitters.
    ngrams_expr) — sequential array walks instead of per-gram random
    slicing, ~5x faster on the corpus-side scan; short documents yield
    an empty array."""
    from featureform_spark.functions.heavy_hitters import ngrams_expr

    col = F.col(text_col) if isinstance(text_col, str) else text_col
    toks = F.filter(F.split(col, " "), lambda x: x != "")
    return F.array_distinct(ngrams_expr(toks, n))


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per corpus document: how many of its distinct n-grams appear
    anywhere in the benchmark set, and a 0/1 contaminated flag.

    Returns ``[id_col, n_overlap, contaminated]`` with one row per
    corpus document (0 / not-contaminated for clean docs).
    """
    grams = ngram_array(text_col, n)
    bench_grams = (
        benchmark.select(F.explode(grams).alias("__ngram")).distinct()
    )
    doc_grams = corpus.select(
        F.col(id_col), F.explode(grams).alias("__ngram")
    )
    hits = (
        doc_grams.join(F.broadcast(bench_grams), "__ngram")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_overlap"))
    )
    return (
        corpus.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_overlap"), F.lit(0)).cast("long").alias("n_overlap"),
            (F.coalesce(F.col("n_overlap"), F.lit(0)) > 0)
            .cast("long")
            .alias("contaminated"),
        )
    )


def contamination_ngrams(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_k: int = 20,
) -> DataFrame:
    """Audit view: the benchmark n-grams leaking into the corpus most
    often — ``[ngram, n_docs]``, top_k by document count then ngram.

    Unlike :func:`decontaminate` (which needs per-document ids), the
    audit only needs per-ngram counts — so the corpus side partially
    aggregates FIRST (map-side combine collapses duplicate grams before
    anything shuffles or joins), and the broadcast join against the
    benchmark set runs over the far smaller (ngram, n_docs) table. The
    final top-k is a TakeOrderedAndProject, not a global sort. The
    join-then-group order used previously probed every exploded corpus
    row against the broadcast while holding wide strings — GC-unstable
    at 10× scale (2-80s swings); this shape is flat.
    """
    grams = ngram_array(text_col, n)
    bench_grams = (
        benchmark.select(F.explode(grams).alias("ngram")).distinct()
    )
    gram_counts = (
        corpus.select(F.explode(grams).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count("*").alias("n_docs"))
    )
    return (
        gram_counts.join(F.broadcast(bench_grams), "ngram")
        .orderBy(F.desc("n_docs"), "ngram")
        .limit(top_k)
    )
