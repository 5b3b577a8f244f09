"""Retrieval metrics (recall@k/MRR/NDCG) + batched ANN plan shape."""

import math

from pyspark.sql import functions as F

from featureform_spark.functions.retrieval import (
    dcg_gain_table,
    idcg_prefix_table,
    retrieval_metrics,
)


def test_metrics_known_answer(spark):
    # truth for q1: items 1,2,3; retrieved hits at ranks 1 and 3
    # truth for q2: items 7,8; no hits at all
    retrieved = spark.createDataFrame(
        [(1, 1, 1), (1, 99, 2), (1, 3, 3), (2, 50, 1), (2, 51, 2)],
        "query_id int, item_id int, rank int",
    )
    truth = spark.createDataFrame(
        [(1, 1), (1, 2), (1, 3), (2, 7), (2, 8)],
        "query_id int, item_id int",
    )
    out = {
        r["query_id"]: r
        for r in retrieval_metrics(retrieved, truth, k=3).collect()
    }
    q1, q2 = out[1], out[2]
    assert q1["n_truth"] == 3 and q1["n_hits"] == 2
    assert q1["recall_at_k"] == round(2 / 3, 6)
    assert q1["mrr"] == 1.0  # first hit at rank 1
    dcg = 1 / math.log2(2) + 1 / math.log2(4)  # hits at ranks 1 and 3
    idcg = sum(1 / math.log2(r + 1) for r in (1, 2, 3))
    assert q1["ndcg"] == round(dcg / idcg, 6)
    # zero-hit query still gets a row, all metrics zero
    assert q2["n_hits"] == 0
    assert q2["recall_at_k"] == 0.0 and q2["mrr"] == 0.0 and q2["ndcg"] == 0.0


def test_truth_smaller_than_k_normalizes_by_truth_size(spark):
    # |truth| = 1 < k=5: perfect retrieval of the single relevant item
    # must score recall 1.0 and ndcg 1.0 (idcg uses min(k, n_truth))
    retrieved = spark.createDataFrame(
        [(1, 42, 1), (1, 2, 2)], "query_id int, item_id int, rank int"
    )
    truth = spark.createDataFrame([(1, 42)], "query_id int, item_id int")
    row = retrieval_metrics(retrieved, truth, k=5).collect()[0]
    assert row["recall_at_k"] == 1.0 and row["ndcg"] == 1.0


def test_gain_tables_match_formula():
    gains = dcg_gain_table(4)
    assert gains[0] == 1.0
    assert gains[2] == 1 / math.log2(4)
    prefix = idcg_prefix_table(4)
    assert prefix[3] == gains[0] + gains[1] + gains[2] + gains[3]


def test_batch_ann_plan_broadcasts_queries_no_corpus_shuffle(spark, sf_dir):
    from featureform_spark.functions.similarity import ann_topk_lsh_batch
    from featureform_spark.sources.testdata import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    plan = (
        ann_topk_lsh_batch(emb, queries, dim=64, k=5, num_planes=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan  # queries broadcast to the corpus scan
    assert "SortMergeJoin" not in plan  # candidate join never shuffles corpus


def test_batch_ann_matches_single_query_ann(spark, sf_dir):
    from featureform_spark.functions.similarity import (
        ann_topk_lsh,
        ann_topk_lsh_batch,
    )
    from featureform_spark.sources.testdata import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 3).first()["embedding"]]
    single = {
        r["vec_id"]: round(r["score"], 9)
        for r in ann_topk_lsh(emb, qvec, k=5, num_planes=8).collect()
    }
    queries = emb.filter(F.col("vec_id") == 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    batch = {
        r["vec_id"]: round(r["score"], 9)
        for r in ann_topk_lsh_batch(
            emb, queries, dim=64, k=5, num_planes=8
        ).collect()
    }
    assert batch == single
