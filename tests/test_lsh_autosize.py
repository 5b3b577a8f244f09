"""Round-11 task #1: corpus-size-aware LSH parameter derivation.

The r10 verdict's one `weak`: fixed bucket/band defaults made the
dedup/ANN candidate-join family the 100-TB tail (37-75x at x100).
These tests pin (a) the derivations — floors reproduce the long-pinned
defaults at test scale, growth matches the occupancy model at bench
scale; (b) the wiring — auto-sized calls are bit-identical to pinned
calls wherever the floors bind; (c) recall — planted duplicates
survive an up-sized bucket space.
"""

import pytest
from pyspark.sql import functions as F

from featureform_spark.functions.lsh_autosize import (
    auto_minhash_params,
    auto_num_planes,
)


# ------------------------------------------------------------ derivations


def test_planes_floor_reproduces_pinned_default():
    # every driver/parity corpus (<= 4k vectors at occupancy 16) -> 8
    for n in (0, 1, 500, 2000, 4096):
        assert auto_num_planes(n) == 8


def test_planes_growth_matches_occupancy_model():
    assert auto_num_planes(10_000) == 10
    # the x100 embeddings table (200k vectors) -> the 14 planes the
    # r10 verdict measured at 41.9s -> 6.9s with recall 1.0
    assert auto_num_planes(200_000) == 14
    assert auto_num_planes(20_000_000) == 20  # hits the cap
    assert auto_num_planes(10**12) == 20


def test_planes_monotonic_in_n():
    prev = 0
    for n in (1, 10, 100, 10**3, 10**4, 10**5, 10**6, 10**7, 10**9):
        p = auto_num_planes(n)
        assert p >= prev
        prev = p


def test_minhash_floor_reproduces_pinned_default():
    # every driver/parity corpus (500-5000 docs) -> the pinned 24/8
    for n in (0, 1, 500, 5_000, 50_000):
        assert auto_minhash_params(n) == (24, 8)


def test_minhash_growth_holds_candidate_rate():
    # x100 documents (500k) -> r=4: bands follow the s-curve at the
    # 0.5 design threshold (b = 2^r), so k = 64, b = 16
    assert auto_minhash_params(500_000) == (64, 16)
    # far larger corpora keep growing r but respect the hash budget
    # (capped bands raise the effective threshold — stricter, never
    # looser on false candidates)
    k, b = auto_minhash_params(10**9)
    r = k // b
    assert r == 7
    assert k <= 96
    assert b * r == k


def test_minhash_validation():
    with pytest.raises(ValueError, match="design_threshold"):
        auto_minhash_params(100, design_threshold=1.5)
    with pytest.raises(ValueError, match="baseline_jaccard"):
        auto_minhash_params(100, baseline_jaccard=0.9)
    with pytest.raises(ValueError, match="target_bucket_rows"):
        auto_num_planes(100, target_bucket_rows=0)


# ------------------------------------------------------------ wiring


def _docs(spark):
    rows = [
        (i, f"alpha beta gamma delta epsilon zeta doc {i} tail {i % 7}")
        for i in range(40)
    ]
    # two planted exact near-dup pairs (identical text)
    rows += [(100, rows[0][1]), (101, rows[1][1])]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_minhash_auto_equals_pinned_at_small_n(spark):
    from featureform_spark.functions.dedup import minhash_lsh_pairs

    docs = _docs(spark)
    auto = minhash_lsh_pairs(docs, jaccard_threshold=0.3)
    pinned = minhash_lsh_pairs(
        docs, num_hashes=24, bands=8, jaccard_threshold=0.3
    )
    key = lambda r: (r["id_a"], r["id_b"], r["jaccard"])
    assert sorted(map(key, auto.collect())) == sorted(
        map(key, pinned.collect())
    )


def test_embedding_auto_equals_pinned_at_small_n(spark):
    from featureform_spark.functions.similarity import (
        embedding_near_dup_pairs,
    )

    rows = [
        (i, [float((i * 7 + j * 3) % 11 - 5) for j in range(8)])
        for i in range(30)
    ]
    rows += [(100, rows[0][1])]  # planted exact dup
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    auto = embedding_near_dup_pairs(emb, dim=8, cosine_threshold=0.9)
    pinned = embedding_near_dup_pairs(
        emb, dim=8, num_planes=8, cosine_threshold=0.9
    )
    key = lambda r: (r["id_a"], r["id_b"])
    assert sorted(map(key, auto.collect())) == sorted(
        map(key, pinned.collect())
    )
    assert (0, 100) in {key(r) for r in auto.collect()}


def test_n_rows_override_sizes_up_and_keeps_exact_dup_recall(spark):
    """Simulate bench scale on small data: n_rows=200_000 forces 14
    planes (16384 buckets over 31 vectors). Identical vectors share
    every hyperplane sign, so the planted dup MUST survive any
    up-sizing — the recall guarantee auto-sizing must not break."""
    from featureform_spark.functions.similarity import (
        embedding_near_dup_pairs,
    )

    rows = [
        (i, [float((i * 7 + j * 3) % 11 - 5) for j in range(8)])
        for i in range(30)
    ]
    rows += [(100, rows[0][1])]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = embedding_near_dup_pairs(
        emb, dim=8, cosine_threshold=0.999, n_rows=200_000
    )
    got = {(r["id_a"], r["id_b"]) for r in out.collect()}
    assert (0, 100) in got
    # sized-up bucket space means FEWER candidates, never more pairs
    # than the pinned-8 run at the same threshold
    base = embedding_near_dup_pairs(
        emb, dim=8, num_planes=8, cosine_threshold=0.999
    )
    assert got <= {(r["id_a"], r["id_b"]) for r in base.collect()}


def test_minhash_n_rows_override_sizes_up_and_keeps_exact_dup_recall(spark):
    from featureform_spark.functions.dedup import minhash_lsh_pairs

    docs = _docs(spark)
    out = minhash_lsh_pairs(
        docs, jaccard_threshold=0.95, n_rows=500_000
    )
    got = {(r["id_a"], r["id_b"]) for r in out.collect()}
    # identical docs have identical signatures at ANY banding
    assert {(0, 100), (1, 101)} <= got


def test_hard_negatives_auto_equals_pinned_at_small_n(spark):
    from featureform_spark.functions.similarity import hard_negatives

    rows = [
        (
            i,
            [float((i * 5 + j) % 9 - 4) for j in range(8)],
            f"label{i % 3}",
        )
        for i in range(24)
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label string"
    )
    auto = hard_negatives(emb, dim=8, k=2)
    pinned = hard_negatives(emb, dim=8, k=2, num_planes=8)
    key = lambda r: (r["anchor_id"], r["rank"], r["negative_id"])
    assert sorted(map(key, auto.collect())) == sorted(
        map(key, pinned.collect())
    )


def test_auto_kmeans_k_bounds():
    from featureform_spark.functions.lsh_autosize import auto_kmeans_k

    assert auto_kmeans_k(0) == 4
    assert auto_kmeans_k(100) == 4       # floor
    assert auto_kmeans_k(6400) == 100
    assert auto_kmeans_k(6401) == 101    # ceil division
    assert auto_kmeans_k(10**10) == 65536  # cap
    with pytest.raises(ValueError, match="target_cluster_rows"):
        auto_kmeans_k(100, target_cluster_rows=0)


def test_semantic_dedup_auto_k(spark):
    from featureform_spark.functions.clustering import semantic_dedup

    rows = [
        (i, [float((i * 3 + j) % 7 - 3) for j in range(8)])
        for i in range(40)
    ]
    rows += [(100, rows[0][1])]  # exact dup of vec 0
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = semantic_dedup(emb, k=None, dim=8, threshold=0.999)
    ids = {r["vec_id"] for r in out.collect()}
    assert 0 in ids and 100 not in ids  # min-id survivor rule held


def test_signature_store_auto_bootstrap(spark, tmp_path):
    """New store: banding sized for the EXPECTED corpus; existing
    store: pinned properties win over a different expectation."""
    from featureform_spark.streaming.signature_store import SignatureStore

    path = str(tmp_path / "sigstore")
    docs = _docs(spark)
    st = SignatureStore.auto(spark, path, expected_corpus_rows=500_000)
    assert st.params["num_hashes"] == 64 and st.params["bands"] == 16
    st.ingest(docs)
    # reopen with a WILDLY different expectation: pinned scheme wins
    st2 = SignatureStore.auto(spark, path, expected_corpus_rows=10)
    assert st2.params == st.params
    flags = {r["doc_id"]: r["is_dup"] for r in st2.flag(docs).collect()}
    assert flags[100] == 1  # identical text flags at any banding


def test_half_specified_banding_refused(spark):
    from featureform_spark.functions.dedup import minhash_lsh_pairs

    docs = _docs(spark)
    with pytest.raises(ValueError, match="BOTH num_hashes and bands"):
        minhash_lsh_pairs(docs, bands=16)
    with pytest.raises(ValueError, match="BOTH num_hashes and bands"):
        minhash_lsh_pairs(docs, num_hashes=48)
