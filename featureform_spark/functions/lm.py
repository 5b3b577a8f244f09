"""Corpus-fit n-gram language-model scoring (KenLM-style quality signal).

A standard LLM-corpus filter scores each document by how well a cheap
n-gram LM trained on the corpus predicts it; outlier docs (wrong
language, boilerplate, garbled text) score low and get dropped
(CCNet / Gopher both use a perplexity filter of this family).

Two twists make it oracle-exact and actually discriminative:

- **Transcendental-free score.** Instead of summing log-probabilities
  (libm ``log`` differs in the last ulp across engines and would break
  hash-exact cross-engine oracles), the score is a ratio of two exact
  int64 sums (associative, order-independent under any partitioning)
  with one final IEEE division.
- **Leave-one-out support.** The model is trained on the same corpus
  being scored, so naive MLE gives every document probability ~1 on its
  own unique transitions (a gibberish doc is "perfectly predicted" by
  the model it alone induced). Each bigram occurrence is therefore
  scored by its support from OTHER documents only:

      lm_fit_score = sum n_occ * (c_bg - n_occ)      [cross-doc bigram]
                   / sum n_occ * (c_w1 - d_w1)       [cross-doc context]

  where ``n_occ``/``d_w1`` are the doc's own bigram/context counts and
  ``c_bg``/``c_w1`` the corpus totals. Per-term ``c_bg - n_occ <=
  c_w1 - d_w1`` (other docs' uses of the exact bigram are a subset of
  their uses of the context), so the score is in [0, 1]; a doc whose
  transitions appear nowhere else scores exactly 0.

Plan shape (the 100 TB story): bigram extraction is a zero-shuffle
``zip_with`` over adjacent token slices; everything downstream operates
on the per-doc-deduplicated (doc, w1, w2, n_occ) table — one groupBy
of the exploded corpus, after which model training and the scoring
joins all run on pre-aggregated (strictly smaller) inputs keyed by the
same (w1, w2)/(w1) columns they shuffle on. No windows, no driver
state, the model is never collected.

No reference parity: featureform has no LM surface; this backs the
beyond-reference LLM-data layer (SURVEY.md §8.10/§8.12).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from featureform_spark.functions.text import tokens_expr


def bigrams_exploded(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """One row per adjacent token pair: (id, w1, w2), doc order not
    retained (the consumers are all order-independent aggregates).
    Docs with fewer than 2 tokens contribute no rows."""
    toks = tokens_expr(text_col)
    n = F.greatest(F.size(toks) - F.lit(1), F.lit(0))
    pairs = F.zip_with(
        F.slice(toks, F.lit(1), n),
        F.slice(toks, F.lit(2), n),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    return df.select(F.col(id_col), F.explode(pairs).alias("_bg")).select(
        id_col, F.col("_bg.w1").alias("w1"), F.col("_bg.w2").alias("w2")
    )


def doc_bigram_counts(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, w1, w2, n_occ): per-document bigram multiplicities — the
    compact working set every later stage aggregates or joins on.

    The explicit non-null filter is an optimization contract, not a
    semantic quirk: ``ngram_lm_score`` consumes this subtree four ways
    (docbg / cbg / cw / docw), and without it the optimizer infers a
    DIFFERENT ``isnotnull`` set per branch from each join's keys, so
    the four subtrees stop being canonically equal and Spark's
    exchange reuse never fires — the corpus is tokenized, exploded and
    partially aggregated four times. With the filter stated once here,
    every branch is identical and the three duplicate exchanges become
    ``ReusedExchange`` (plan-pinned in tests/test_plan_shapes_r12.py).
    Row semantics: w1/w2 are explode outputs and can never be null; a
    null ``id`` row would be dropped by every downstream join anyway
    (same null-drop convention as bm25's corpus stats)."""
    return (
        bigrams_exploded(df, id_col, text_col)
        .filter(
            F.col(id_col).isNotNull()
            & F.col("w1").isNotNull()
            & F.col("w2").isNotNull()
        )
        .groupBy(id_col, "w1", "w2")
        .agg(F.count(F.lit(1)).cast("long").alias("n_occ"))
    )


def bigram_model(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Corpus bigram model: (w1, w2, c_bg, c_w1) where ``c_bg`` counts
    the bigram and ``c_w1`` counts the context (= bigrams starting with
    w1). ``c_bg / c_w1`` is the MLE conditional probability."""
    docbg = doc_bigram_counts(df, id_col, text_col)
    cbg = docbg.groupBy("w1", "w2").agg(F.sum("n_occ").cast("long").alias("c_bg"))
    cw = cbg.groupBy("w1").agg(F.sum("c_bg").cast("long").alias("c_w1"))
    return cbg.join(cw, "w1")


def ngram_lm_score(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Leave-one-out corpus-fit score for every document with >= 1
    bigram. Output: (id, n_bigrams, xdoc_bigram_support,
    xdoc_context_support, lm_fit_score)."""
    docbg = doc_bigram_counts(df, id_col, text_col)
    docw = docbg.groupBy(id_col, "w1").agg(
        F.sum("n_occ").cast("long").alias("d_w1")
    )
    model = bigram_model(df, id_col, text_col)
    num = F.sum(F.col("n_occ") * (F.col("c_bg") - F.col("n_occ"))).cast("long")
    den = F.sum(F.col("n_occ") * (F.col("c_w1") - F.col("d_w1"))).cast("long")
    return (
        docbg.join(model, ["w1", "w2"])
        .join(docw, [id_col, "w1"])
        .groupBy(id_col)
        .agg(
            F.sum("n_occ").cast("long").alias("n_bigrams"),
            num.alias("xdoc_bigram_support"),
            den.alias("xdoc_context_support"),
            F.when(den > 0, num.cast("double") / den.cast("double"))
            .otherwise(F.lit(0.0))
            .alias("lm_fit_score"),
        )
    )
