"""Retrieval-quality evaluation: recall@k, MRR, NDCG over ranked results.

The IR-eval loop every embedding/retrieval pipeline needs: score an ANN
index's ranked output against exact ground truth (or human labels) and
report per-query metrics. The reference serves vectors (provider/redis.go
Nearest()) but has no eval operator; this closes that loop Spark-side.

Scale shape: the inputs are already per-query top-k lists (≤ Q×k rows),
so every join/aggregate here is eval-set-sized — the corpus-scale work
happened upstream in `similarity.cosine_topk_batch` /
`ann_topk_lsh_batch`. Float determinism: DCG gains (1/log2(rank+1)) and
ideal-DCG prefix sums are computed in PYTHON and injected as array
literals, and the DCG fold runs over rank-sorted hit lists — so Spark
and any SQL oracle produce bit-identical doubles (no engine log2, no
unordered float sums).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dcg_gain_table(k: int) -> list[float]:
    """gain[r] = 1/log2(r+1) for ranks 1..k (1-indexed positions)."""
    return [1.0 / math.log2(r + 1) for r in range(1, k + 1)]


def idcg_prefix_table(k: int) -> list[float]:
    """idcg[n] = sum of the first n gains — the ideal DCG when n relevant
    items exist; left-to-right Python sum, injected as literals so no
    engine ever re-derives it."""
    gains = dcg_gain_table(k)
    out, acc = [], 0.0
    for g in gains:
        acc += g
        out.append(acc)
    return out


def retrieval_metrics(
    retrieved: DataFrame,
    truth: DataFrame,
    k: int,
    query_col: str = "query_id",
    item_col: str = "item_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Per-query recall@k, MRR and NDCG@k.

    ``retrieved``: ranked results ``(query_col, item_col, rank_col)``
    with rank 1..k. ``truth``: relevant items ``(query_col, item_col)``
    (binary relevance). Queries present in ``truth`` always get a row;
    a query with no hits scores 0.0 across the board.

    recall@k = |hits| / min(k, |truth|)
    MRR      = 1 / rank of the first hit (0 if none)
    NDCG@k   = Σ_hits 1/log2(rank+1)  /  Σ_{i≤min(k,|truth|)} 1/log2(i+1)
    """
    gains = F.array(*[F.lit(g) for g in dcg_gain_table(k)])
    idcg = F.array(*[F.lit(v) for v in idcg_prefix_table(k)])

    # ONE left join + ONE aggregation consumes each input exactly once.
    # The obvious two-branch formulation (count truth per query, then
    # inner-join hits and aggregate those separately) evaluates the
    # ``truth`` subtree twice — and in retrieval_eval that subtree is
    # the exact Q x N cosine ground-truth pass, the most expensive
    # thing in the query. Every truth row survives the left join
    # exactly once (``retrieved`` is a ranked top-k list, unique per
    # (query, item)), so n_truth = count(*), hits are the rows whose
    # rank is non-null, and the rank-sorted DCG fold sees the same
    # sorted hit-rank list as before (collect_list drops nulls):
    # bit-identical doubles, half the corpus-scale work. ``retrieved``
    # is a ranked top-k list (Q x k rows — eval-set-sized at any corpus
    # scale), so it broadcasts: the left join adds no exchange, and the
    # following groupBy reuses the query_id hash partitioning ``truth``
    # already has from its ranking window — zero added shuffles.
    joined = truth.join(
        F.broadcast(retrieved), [query_col, item_col], "left"
    )
    per_q = joined.groupBy(query_col).agg(
        F.count(F.lit(1)).alias("n_truth"),
        F.count(rank_col).alias("n_hits"),
        F.min(rank_col).alias("_first_rank"),
        # rank-sorted fold: deterministic double addition order
        # cross-engine
        F.aggregate(
            F.sort_array(F.collect_list(rank_col)),
            F.lit(0.0),
            lambda acc, r: acc + F.element_at(gains, r.cast("int")),
        ).alias("_dcg"),
    )
    per_q = per_q.select(
        F.col(query_col),
        F.col("n_truth"),
        F.coalesce(F.col("n_hits"), F.lit(0)).alias("n_hits"),
        F.round(
            F.coalesce(F.col("n_hits"), F.lit(0))
            / F.least(F.lit(k), F.col("n_truth")),
            6,
        ).alias("recall_at_k"),
        F.round(
            F.coalesce(F.lit(1.0) / F.col("_first_rank"), F.lit(0.0)), 6
        ).alias("mrr"),
        F.round(
            F.coalesce(
                F.col("_dcg")
                / F.element_at(
                    idcg, F.least(F.lit(k), F.col("n_truth")).cast("int")
                ),
                F.lit(0.0),
            ),
            6,
        ).alias("ndcg"),
    )
    return per_q


def tokenize_terms(col: Column) -> Column:
    """Lowercased alphanumeric terms of a text column (the same split
    both the Spark side and the DuckDB differential use:
    ``[^a-z0-9]+`` on the lowercased string, empties dropped).
    Explicit ASCII classes — Python/Java ``\\w`` is Unicode-aware and
    RE2's is not, the cross-engine regex trap."""
    return F.filter(
        F.split(F.lower(col), "[^a-z0-9]+"), lambda t: t != ""
    )


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    term_weights: dict[str, float] | None = None,
) -> DataFrame:
    """BM25 lexical retrieval: top-``k`` documents for a bag of query
    terms — the sparse half of hybrid retrieval (the dense half is the
    ANN plane). Robertson/Lucene scoring::

        score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))
        idf(t)   = ln(1 + (N − df + 0.5)/(df + 0.5))

    Spark-first at 100 TB: ONE tokenize projection; ``avgdl``, ``N``
    and every per-term ``df`` come from a SINGLE partial-aggregated
    corpus pass (conditional ``array_contains`` counts — one agg job,
    #terms+2 output numbers); ``avgdl`` is an integer dl sum + one
    division (exact); idf folds to per-term literals; scoring is a
    single codegen projection over docs passing a cheap
    ``arrays_overlap`` pre-filter (non-matching docs never evaluate
    the tf expressions); top-k is Spark's TakeOrderedAndProject with
    ``id_col`` tiebreak. Two corpus passes total (stats, score), no
    Python in the hot path, no corpus-scale shuffle.

    Scores are IEEE doubles built from +,*,/ over exact inputs — every
    op but the driver-side ``ln`` is bit-deterministic cross-engine
    (libm ln differs in the last ulp between engines, so differential
    tests compare scores with tolerance and ranks exactly; same
    convention as quality_model's logit note).

    ``term_weights`` replaces corpus idf with caller-supplied weights
    — the production precomputed-idf mode (a global idf snapshot from
    a background corpus, refreshed offline, is standard in search
    stacks so per-shard scoring doesn't depend on shard-local df).
    With weights the score contains NO transcendental at all (tf, dl,
    avgdl are exact integers + one division), so results are
    bit-deterministic cross-engine end to end — this is the mode the
    hash-compared oracle row uses. Terms absent from the dict weigh 0.
    """
    terms = sorted(set(query_terms))
    if not terms:
        raise ValueError("bm25_topk: no query terms")
    if k < 1:
        raise ValueError("bm25_topk: k must be >= 1")
    lit_terms = F.array(*[F.lit(t) for t in terms])
    toks = df.select(
        F.col(id_col),
        tokenize_terms(F.col(text_col)).alias("_terms"),
    ).where(F.col("_terms").isNotNull())
    # NULL-text rows tokenize to NULL and can never match a term;
    # dropping them BEFORE the stats pass keeps N, avgdl, and df
    # computed over the same document set (counting them in N alone
    # would silently deflate avgdl and inflate idf)
    # aggregation-scale driver fold (centroid precedent): N, Σdl, and
    # one df count per query term — ALL from one partial-agg corpus
    # pass (#terms+2 output numbers), never a row collect. In
    # term_weights mode df is unused (weights come from the caller),
    # so the pass shrinks to the two corpus numbers.
    aggs = [
        F.count(F.lit(1)).alias("n"),
        F.sum(F.size("_terms")).alias("dl_sum"),
    ] + (
        []
        if term_weights is not None
        else [
            F.sum(
                F.when(F.array_contains("_terms", t), 1).otherwise(0)
            ).alias(f"_df{i}")
            for i, t in enumerate(terms)
        ]
    )
    stats = toks.agg(*aggs).collect()[0]
    n_docs, dl_sum = int(stats["n"]), int(stats["dl_sum"] or 0)
    if n_docs == 0:
        return df.select(
            F.col(id_col),
            F.lit(0.0).alias("bm25"),
            F.lit(0).alias("rank"),
        ).limit(0)
    avgdl = dl_sum / n_docs  # exact: int/int, one division
    matched = toks.where(F.arrays_overlap("_terms", lit_terms))
    dfs = (
        {}
        if term_weights is not None
        else {t: int(stats[f"_df{i}"] or 0) for i, t in enumerate(terms)}
    )
    score = F.lit(0.0)
    dl = F.size("_terms").cast("double")
    norm = F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * dl / F.lit(float(avgdl))
    )
    def _tf(term: str) -> Column:
        # a closure, NOT a default-arg lambda: pyspark reads a
        # 2-parameter lambda as (element, index) and would bind the
        # array INDEX over the default
        return F.size(
            F.filter("_terms", lambda x: x == F.lit(term))
        ).cast("double")

    for t in terms:
        if term_weights is not None:
            idf = float(term_weights.get(t, 0.0))
            if idf == 0.0:
                continue  # unweighted terms contribute nothing
        else:
            dft = dfs.get(t, 0)
            if dft == 0:
                continue  # absent terms contribute nothing
            idf = math.log(1.0 + (n_docs - dft + 0.5) / (dft + 0.5))
        tf = _tf(t)
        score = score + F.lit(idf) * (
            tf * F.lit(k1 + 1.0) / (tf + norm)
        )
    topk = (
        matched.select(F.col(id_col), score.alias("bm25"))
        .orderBy(F.col("bm25").desc(), F.col(id_col))
        .limit(k)
    )
    # rank window runs over at most k rows (post-limit), one partition
    return topk.select(
        id_col,
        "bm25",
        F.row_number()
        .over(Window.orderBy(F.col("bm25").desc(), F.col(id_col)))
        .alias("rank"),
    )


def rrf_fuse(
    rankings: list[DataFrame],
    k: int = 10,
    c: int = 60,
    item_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Reciprocal-rank fusion of N rankers (the standard hybrid
    lexical+dense combiner): ``rrf(d) = Σ_r 1/(c + rank_r(d))`` over
    the rankers that returned d. Pure rank arithmetic — no score
    calibration across rankers needed, and (unlike raw-score mixing)
    deterministic regardless of each ranker's score scale.

    Scale: each input is already top-k-bounded (k·N rows total), so
    the union + groupBy is ranker-output-scale, never corpus-scale."""
    if not rankings:
        raise ValueError("rrf_fuse: no rankings")
    parts = [
        r.select(
            F.col(item_col),
            (F.lit(1.0) / (F.lit(c) + F.col(rank_col).cast("double"))).alias(
                "_rr"
            ),
        )
        for r in rankings
    ]
    allr = parts[0]
    for p in parts[1:]:
        allr = allr.unionByName(p)
    fused = (
        allr.groupBy(item_col)
        .agg(F.sum("_rr").alias("rrf"), F.count(F.lit(1)).alias("n_rankers"))
        .orderBy(F.col("rrf").desc(), F.col(item_col))
        .limit(k)
    )
    return fused.select(
        item_col,
        "rrf",
        "n_rankers",
        F.row_number()
        .over(Window.orderBy(F.col("rrf").desc(), F.col(item_col)))
        .alias("rank"),
    )
