"""Text analysis for training-data pipelines: token stats, quality
scoring, language ID, document fingerprinting.

All expressions are JVM-side built-ins (split/filter/transform/md5 —
whole-stage-codegen'd, no Python UDFs), so these run at full scan speed
over 100 TB of documents. Every operator is deterministic and
SQL-expressible so the DuckDB oracle can replicate it bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# small marker-word lists for the n-gram/stopword language heuristic.
# Plain Python constants: the suite bakes the same literals into the
# oracle SQL, so both engines score identically.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "is"),
    "es": ("el", "la", "de", "y", "es"),
    "de": ("der", "die", "das", "und", "ist"),
    "fr": ("le", "la", "de", "et", "est"),
}

STOPWORDS: tuple[str, ...] = ("the", "a", "of", "and", "is", "to", "in", "it")


def tokens_expr(text_col: str = "text") -> Column:
    """Whitespace tokens, empties dropped (same as DuckDB
    list_filter(string_split(text, ' '), x -> x <> ''))."""
    return F.filter(F.split(F.col(text_col), " "), lambda t: t != "")


def with_tokens(df: DataFrame, text_col: str = "text", out: str = "tokens") -> DataFrame:
    return df.withColumn(out, tokens_expr(text_col))


def text_stats(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Quality-scoring stats per document.

    n_tokens, distinct tokens, char length, avg token length, stopword
    ratio, and a quality score in [0, 1] combining them (deterministic
    double arithmetic — identical in any engine).
    """
    toks = tokens_expr(text_col)
    n_tokens = F.size(toks).cast("long")
    n_distinct = F.size(F.array_distinct(toks)).cast("long")
    n_chars = F.length(F.col(text_col)).cast("long")
    # chars in tokens / token count (spaces removed the same way both sides)
    avg_token_len = (
        F.length(F.replace(F.col(text_col), F.lit(" "), F.lit(""))).cast("double")
        / n_tokens.cast("double")
    )
    stop_ratio = (
        F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS))).cast("double")
        / n_tokens.cast("double")
    )
    diversity = n_distinct.cast("double") / n_tokens.cast("double")
    quality = (
        F.least(n_tokens.cast("double") / F.lit(50.0), F.lit(1.0)) * F.lit(0.4)
        + diversity * F.lit(0.4)
        + stop_ratio * F.lit(0.2)
    )
    return df.select(
        F.col(id_col),
        n_tokens.alias("n_tokens"),
        n_distinct.alias("n_distinct_tokens"),
        n_chars.alias("n_chars_actual"),
        avg_token_len.alias("avg_token_len"),
        stop_ratio.alias("stopword_ratio"),
        quality.alias("quality_score"),
    )


def language_id(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    markers: dict[str, tuple[str, ...]] | None = None,
) -> DataFrame:
    """Marker-word language heuristic: per-language hit counts over
    tokens (with multiplicity); argmax with fixed precedence order.

    Emits per-language scores plus ``lang_pred`` ('und' when no marker
    hits at all).
    """
    markers = markers or LANG_MARKERS
    # project the token array ONCE; inlining tokens_expr into every
    # per-language score would re-split the text once per language per
    # row (same trap measured in quality.py: 36 s -> 2 s)
    tokd = df.withColumn("__toks", tokens_expr(text_col))
    toks = F.col("__toks")

    def _score(words: tuple[str, ...]):
        # single-arg lambda: a 2-arg one would be treated as (elem, idx)
        return F.size(F.filter(toks, lambda t: t.isin(*words))).cast("long")

    langs = list(markers)
    # project each score once as a real column: the argmax when-chain
    # below references every score several times, and inlined filter
    # expressions would be re-evaluated at each reference
    tokd = tokd.withColumns(
        {f"score_{lang}": _score(words) for lang, words in markers.items()}
    )
    scores = {lang: F.col(f"score_{lang}") for lang in langs}
    # fixed precedence: first language in dict order wins ties
    pred = F.lit("und")
    best = F.lit(-1).cast("long")
    for lang in langs:
        better = scores[lang] > best
        pred = F.when(better & (scores[lang] > 0), F.lit(lang)).otherwise(pred)
        best = F.when(better, scores[lang]).otherwise(best)
    return tokd.select(
        F.col(id_col),
        *[F.col(f"score_{lang}") for lang in langs],
        pred.alias("lang_pred"),
    )


def doc_fingerprint(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Deterministic content fingerprint: md5 of the normalized text."""
    return df.select(
        F.col(id_col),
        F.md5(F.lower(F.trim(F.col(text_col)))).alias("fingerprint"),
    )


# BPE-ish pre-tokenizer: letter runs, digit runs, single punctuation —
# the classic GPT-2-style split shape, restricted to constructs that RE2
# (DuckDB) and Java regex (Spark) interpret identically
BPE_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def token_counts(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Whitespace token count + BPE-ish regex token count per doc."""
    toks = tokens_expr(text_col)
    bpe = F.regexp_extract_all(F.col(text_col), F.lit(BPE_PATTERN), 0)
    return df.select(
        F.col(id_col),
        F.size(toks).cast("long").alias("n_ws_tokens"),
        F.size(bpe).cast("long").alias("n_bpe_tokens"),
    )


def tf_idf(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_k: int = 3,
) -> DataFrame:
    """Top-k characteristic terms per document by tf-idf ranking.

    The idf factor is the *rational* form ``(N + 1) / (df + 1)`` rather
    than its logarithm — it up-weights rare terms the same way and, at
    equal tf, ranks identically (monotone in df); where tf and df
    trade off, the rational form penalizes common terms harder than
    log-idf would. Chosen because it is bit-exact across engines:
    ln()'s last-ulp behavior differs between libm implementations,
    which would break hash-compared oracles. Ties broken by term
    ascending.

    Plan shape: explode -> two partial-aggregated groupBys -> shuffle
    join on term -> broadcast of the single-row corpus count -> per-doc
    window. Everything JVM-side; scales linearly in corpus size.
    """
    toks = tokens_expr(text_col)
    exploded = df.select(F.col(id_col), F.explode(toks).alias("term"))
    tf = exploded.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df_docs"))
    n_docs = df.agg(F.count(F.lit(1)).alias("n_docs"))

    from pyspark.sql import Window

    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.col("tf").cast("double")
            * (F.col("n_docs") + F.lit(1.0))
            / (F.col("df_docs") + F.lit(1.0)),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= top_k)
        .select(id_col, "term", "tf", "df_docs", "score")
    )


def token_diversity(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document lexical-diversity / repetition signals:
    ``[id, n_tokens, n_distinct, simpson_diversity, top_token_ratio]``.

    ``simpson_diversity`` is the Gini-Simpson index ``1 - sum(c_i^2)/n^2``
    (probability two sampled tokens differ) and ``top_token_ratio`` is
    ``max(c_i)/n`` — both deliberately transcendental-free: Shannon
    entropy's ln() differs in the last ulp across libm implementations
    and would break hash-exact cross-engine oracles, while these stay in
    exact integer arithmetic until one final IEEE division.

    Plan shape: explode -> groupBy(id, token) -> groupBy(id), both with
    map-side partial aggregation; no windows, no joins. Low-diversity
    (spammy) docs are exactly the skewed groups, but the first groupBy
    keys on (id, token) so even a one-token 10 GB document splits across
    the token dimension's hash range only as far as its distinct tokens —
    the second groupBy then sees one row per (id, token), already tiny.
    """
    exploded = df.select(F.col(id_col), F.explode(tokens_expr(text_col)).alias("__t"))
    counts = exploded.groupBy(id_col, "__t").agg(F.count(F.lit(1)).alias("__c"))
    return counts.groupBy(id_col).agg(
        F.sum("__c").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_distinct"),
        # n*n in double space (n^2 overflows int64 for multi-billion-token
        # docs); sum(c^2) stays exact-integer
        (
            F.lit(1.0)
            - F.sum(F.col("__c") * F.col("__c")).cast("double")
            / (F.sum("__c").cast("double") * F.sum("__c").cast("double"))
        ).alias("simpson_diversity"),
        (F.max("__c").cast("double") / F.sum("__c").cast("double")).alias(
            "top_token_ratio"
        ),
    )


def collocations(
    df: DataFrame,
    min_count: int = 5,
    top_n: int = 50,
    text_col: str = "text",
) -> DataFrame:
    """Collocation extraction: adjacent-token pairs ranked by PMI lift.

    lift = P(w1 w2) / (P(w1) * P(w2)) with bigram probability over the
    bigram total and unigram probabilities over the token total — the
    classic corpus-linguistics statistic for multi-word expressions
    ("New York", "machine learning") and, in LLM-data work, for spotting
    templated word pairs that survive token-level dedup.

    Determinism: counts stay exact integers until ONE final double
    expression (explicit double casts — a bigint product c_xy * N
    overflows int64 at corpus scale and DuckDB would silently widen to
    HUGEINT, diverging from double math); lift is rounded to 6dp.
    Plan: two partial-aggregated groupBys (bigram + unigram), unigram
    vocab broadcast back twice, TakeOrderedAndProject for the top-n —
    the corpus shuffles nothing but (pair, count) partials.
    """
    toks = tokens_expr(text_col)
    pairs = df.select(
        F.explode(
            F.arrays_zip(
                F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
                F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
            )
        ).alias("__p")
    ).select(F.col("__p.0").alias("w1"), F.col("__p.1").alias("w2"))
    uni = df.select(F.explode(toks).alias("w"))
    uni_counts = uni.groupBy("w").agg(F.count(F.lit(1)).alias("__c"))
    n_uni = uni.agg(F.count(F.lit(1)).alias("__n_uni"))
    bi_counts = pairs.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).alias("pair_count")
    )
    n_bi = pairs.agg(F.count(F.lit(1)).alias("__n_bi"))
    enriched = (
        bi_counts.filter(F.col("pair_count") >= min_count)
        .join(
            F.broadcast(uni_counts.select(F.col("w").alias("w1"), F.col("__c").alias("w1_count"))),
            "w1",
        )
        .join(
            F.broadcast(uni_counts.select(F.col("w").alias("w2"), F.col("__c").alias("w2_count"))),
            "w2",
        )
        .crossJoin(F.broadcast(n_uni))
        .crossJoin(F.broadcast(n_bi))
    )
    p_xy = F.col("pair_count").cast("double") / F.col("__n_bi").cast("double")
    p_x = F.col("w1_count").cast("double") / F.col("__n_uni").cast("double")
    p_y = F.col("w2_count").cast("double") / F.col("__n_uni").cast("double")
    return (
        enriched.select(
            "w1",
            "w2",
            "pair_count",
            "w1_count",
            "w2_count",
            F.round(p_xy / (p_x * p_y), 6).alias("lift"),
        )
        .orderBy(F.desc("lift"), F.asc("w1"), F.asc("w2"))
        .limit(top_n)
    )


def dedup_sentences(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = ". ",
) -> DataFrame:
    """Within-document repeated-sentence removal — the CLEANUP
    counterpart of the repetition quality signals (quality.py's
    dup_line_frac flags boilerplate; this strips it): keep the FIRST
    occurrence of each sentence, preserve original order, rejoin.

    Shape: split → posexplode → (doc, sentence) min-pos groupBy →
    per-doc ordered re-aggregation. Both shuffles key on the doc id
    (the second piggybacks on the first's partitioning), nothing is
    quadratic in document length, and no Python runs. Output
    ``(id, clean_text, n_sentences, n_removed)``.
    """
    import re

    parts = df.select(
        F.col(id_col),
        F.posexplode(
            F.split(F.col(text_col), re.escape(sep), -1)
        ).alias("pos", "sent"),
    )
    firsts = parts.groupBy(id_col, "sent").agg(
        F.min("pos").alias("pos"), F.count("*").alias("n")
    )
    return (
        firsts.groupBy(id_col)
        .agg(
            F.concat_ws(
                sep,
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("pos"), F.col("sent")))
                    ),
                    lambda x: x["sent"],
                ),
            ).alias("clean_text"),
            F.sum("n").alias("n_sentences"),
            (F.sum("n") - F.count("*")).alias("n_removed"),
        )
    )


def script_profile(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Unicode SCRIPT composition per document — the signal language
    filters use before any model-based lang-ID: ratio of Latin,
    Cyrillic, CJK (unified ideographs), Arabic, and digit characters
    over total characters, plus ``keep_latin`` (>= 50% Latin — the
    corpus gate for a Latin-script pipeline). Pure codegen: one
    ``length - length(regexp_replace(class, ''))`` count per class,
    no explode, no Python; scale cost is a single projection."""
    from featureform_spark.functions.parallel import (
        fan_out_if_underparallel,
    )

    df = fan_out_if_underparallel(df)
    n = F.length(F.col(text_col))

    def ratio(rng: str) -> Column:
        # regexp_count over a single-char class equals the former
        # length(text) - length(regexp_replace(class, '')) to the
        # integer: every match is exactly one character. (It is
        # RuntimeReplaceable sugar for size(regexp_extract_all(...)),
        # so the mechanism is expression-form, not avoided copies —
        # the staging below is what removes repeated evaluation.)
        cnt = F.regexp_count(F.col(text_col), F.lit(f"[{rng}]"))
        return F.when(n > 0, cnt.cast("double") / n.cast("double")).otherwise(
            F.lit(0.0)
        )

    # stage latin_ratio as a real column: the keep gate would
    # otherwise re-run the full regex scan per row (no codegen CSE
    # fires across the projection + the comparison)
    staged = df.withColumn("__latin", ratio("A-Za-z"))
    latin = F.col("__latin")
    return staged.select(
        F.col(id_col),
        n.cast("long").alias("n_chars"),
        latin.alias("latin_ratio"),
        ratio("Ѐ-ӿ").alias("cyrillic_ratio"),
        ratio("一-鿿").alias("cjk_ratio"),
        ratio("؀-ۿ").alias("arabic_ratio"),
        ratio("0-9").alias("digit_ratio"),
        (latin >= 0.5).cast("long").alias("keep_latin"),
    )
