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

from pyspark.sql import DataFrame
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

    truth_per_q = truth.groupBy(query_col).agg(
        F.count(F.lit(1)).alias("n_truth")
    )
    hits = retrieved.join(truth, [query_col, item_col])
    # rank-sorted fold: deterministic double addition order cross-engine
    hits_per_q = hits.groupBy(query_col).agg(
        F.count(F.lit(1)).alias("n_hits"),
        F.min(rank_col).alias("_first_rank"),
        F.aggregate(
            F.sort_array(F.collect_list(rank_col)),
            F.lit(0.0),
            lambda acc, r: acc + F.element_at(gains, r.cast("int")),
        ).alias("_dcg"),
    )
    per_q = truth_per_q.join(hits_per_q, query_col, "left").select(
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
