"""k-means (Lloyd) + SemDeDup: determinism, convergence shape, dedup
semantics, and plan discipline (broadcast assignment, cluster-key-only
self-join)."""

import pytest
from pyspark.sql import functions as F

from featureform_spark.functions.clustering import (
    kmeans_assign,
    kmeans_fit,
    kmeans_init,
    refine_centroids,
    semantic_dedup,
)


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    from featureform_spark.sources.testdata import load_table

    return load_table(spark, sf_dir, "embeddings")


DIM = 64


def test_init_is_deterministic_k_rows(emb):
    a = kmeans_init(emb, 8).orderBy("cid").collect()
    b = kmeans_init(emb, 8).orderBy("cid").collect()
    assert len(a) == 8 and [r.cid for r in a] == [r.cid for r in b]


def test_every_vector_assigned_exactly_once(emb):
    n = emb.count()
    assigned = kmeans_fit(emb, k=8, dim=DIM, iters=1)
    assert assigned.count() == n
    assert assigned.select("vec_id").distinct().count() == n


def test_refinement_reduces_or_holds_wcss(emb):
    """Lloyd iterations never increase within-cluster dissimilarity
    (here: mean cosine to the assigned centroid never decreases)."""

    def mean_cos(assigned, cents):
        re = kmeans_assign(
            assigned.select("vec_id", F.col("_v").alias("embedding")),
            cents,
            vec_col="embedding",
        )
        from featureform_spark.functions.clustering import dot_expr, norm_expr

        joined = re.join(
            cents.withColumnRenamed("cid", "cluster"), "cluster"
        )
        return joined.select(
            F.avg(
                dot_expr(F.col("_v"), F.col("cv"))
                / (F.col("_nv") * norm_expr(F.col("cv")))
            ).alias("m")
        ).first()["m"]

    c0 = kmeans_init(emb, 8)
    a0 = kmeans_assign(emb, c0)
    c1 = refine_centroids(a0, DIM)
    a1 = kmeans_assign(
        a0.select("vec_id", F.col("_v").alias("embedding")),
        c1,
        vec_col="embedding",
    )
    c2 = refine_centroids(a1, DIM)
    m1 = mean_cos(a0, c1)
    m2 = mean_cos(a1, c2)
    assert m2 >= m1 - 1e-9


def test_assignment_plan_is_broadcast_no_shuffle_of_corpus(emb):
    cents = kmeans_init(emb, 8)
    plan = kmeans_assign(emb, cents)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    # no sort-merge join anywhere: assignment must not shuffle the corpus
    assert "SortMergeJoin" not in plan


def test_semantic_dedup_drops_only_near_dups(spark, emb):
    # plant an exact duplicate of vec 0 with a higher id
    dup = emb.filter(F.col("vec_id") == 0).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        "embedding",
        "label",
    )
    with_dup = emb.unionByName(dup)
    kept = semantic_dedup(with_dup, k=8, dim=DIM, threshold=0.999, iters=1)
    ids = {r.vec_id for r in kept.collect()}
    assert 0 in ids  # canonical (smaller id) survives
    assert 1_000_000 not in ids  # the planted dup is dropped
    # nothing else is near-identical at this threshold
    assert len(ids) == emb.count()


def test_semantic_dedup_survivors_keep_cluster_labels(emb):
    kept = semantic_dedup(emb, k=8, dim=DIM, threshold=0.4, iters=2)
    assert kept.columns == ["vec_id", "cluster"]
    assert kept.count() <= emb.count()
    assert kept.select("cluster").distinct().count() <= 8


def test_vectorized_assign_bit_identical_to_hof(spark, sf_dir):
    """_assign_vectorized must reproduce the HOF expression exactly —
    same floats to the last ulp, same argmax tie-break."""
    from featureform_spark.functions.clustering import (
        _assign_vectorized,
        kmeans_assign,
        kmeans_init,
    )
    from featureform_spark.sources.testdata import load_table

    df = load_table(spark, sf_dir, "embeddings")
    cents = kmeans_init(df, 8)
    hof = kmeans_assign(df, cents).orderBy("vec_id").collect()
    vec = (
        _assign_vectorized(df, cents.collect()).orderBy("vec_id").collect()
    )
    assert len(hof) == len(vec) > 0
    for a, b in zip(hof, vec):
        assert a["vec_id"] == b["vec_id"]
        assert a["cluster"] == b["cluster"]
        assert a["_nv"] == b["_nv"]          # exact float equality
        assert list(a["_v"]) == list(b["_v"])


def test_vectorized_assign_matches_hof_for_zero_norm_vectors(spark, sf_dir):
    """Degenerate (all-zero) vectors score NaN against every centroid;
    Spark's total ordering ranks NaN above every double and ties break
    to the smallest cid — the numpy kernel must reproduce that instead
    of keeping its initialized cid (r4 ADVICE bug)."""
    from featureform_spark.functions.clustering import (
        _assign_vectorized,
        kmeans_assign,
        kmeans_init,
    )
    from featureform_spark.sources.testdata import load_table

    df = load_table(spark, sf_dir, "embeddings")
    dim = len(df.select("embedding").first()["embedding"])
    zero = spark.createDataFrame(
        [(10_000_000 + i, [0.0] * dim) for i in range(3)],
        "vec_id long, embedding array<double>",
    )
    mixed = df.select("vec_id", "embedding").unionByName(zero)
    cents = kmeans_init(df, 5)
    hof = kmeans_assign(mixed, cents).orderBy("vec_id").collect()
    vec = _assign_vectorized(mixed, cents.collect()).orderBy("vec_id").collect()
    assert len(hof) == len(vec)
    for a, b in zip(hof, vec):
        assert (a["vec_id"], a["cluster"]) == (b["vec_id"], b["cluster"])
