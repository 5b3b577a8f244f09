"""DSIR hashed-ngram importance resampling: weight math, the
zero-shuffle scoring plan, and deterministic Gumbel-top-k selection."""

import pytest
from pyspark.sql import functions as F

from featureform_spark.functions.dsir import (
    dsir_fixed_point_weights,
    dsir_log_weights,
    dsir_resample,
    dsir_score,
    dsir_select,
    hashed_token_histogram,
)


@pytest.fixture(scope="module")
def corpora(spark):
    # target: "spark"-heavy domain; raw: mixed
    target = spark.createDataFrame(
        [(i, "spark shuffle partition broadcast join") for i in range(5)],
        "doc_id long, text string",
    )
    raw = spark.createDataFrame(
        [
            (0, "spark shuffle partition tuning notes"),
            (1, "chocolate cake recipe with butter"),
            (2, "broadcast join strategies in spark"),
            (3, "gardening tips for tomato plants"),
            (4, ""),
        ],
        "doc_id long, text string",
    )
    return target, raw


def test_weight_formula_matches_hand_fold():
    # two buckets of a 4-bucket space: target concentrated in bucket 1
    t = [(1, 90), (2, 10)]
    r = [(1, 50), (2, 50)]
    w = dsir_fixed_point_weights(t, r, n_buckets=4, scale=1000)
    assert len(w) == 4
    # bucket 1: 1000 * 91 * 104 // (51 * 104) = 1000*91//51
    assert w[1] == 1000 * 91 * 104 // (51 * 104)
    assert w[1] > 1000 > w[2]  # over-represented up, under down
    # untouched bucket: smoothing-only ratio
    assert w[0] == 1000 * 1 * 104 // (51 * 1 * 104) * 51 // 51 or w[0] >= 0
    assert w[0] == 1000 * 1 * (100 + 4) // (1 * (100 + 4))


def test_log_weights_rank_identical():
    t = [(0, 100), (1, 10), (2, 1)]
    r = [(0, 10), (1, 10), (2, 100)]
    fp = dsir_fixed_point_weights(t, r, n_buckets=4)
    lg = dsir_log_weights(t, r, n_buckets=4)
    order_fp = sorted(range(4), key=lambda b: fp[b])
    order_lg = sorted(range(4), key=lambda b: lg[b])
    assert order_fp == order_lg


def test_histogram_bounded_and_consistent(spark, corpora):
    target, _ = corpora
    h = hashed_token_histogram(target, n_buckets=16).collect()
    assert all(0 <= r["bucket"] < 16 for r in h)
    assert sum(r["cnt"] for r in h) == 5 * 5  # 5 docs x 5 tokens


def test_select_scores_target_like_docs_higher(spark, corpora):
    target, raw = corpora
    out = {
        r["doc_id"]: r
        for r in dsir_select(target, raw, n_buckets=64).collect()
    }
    # spark-domain docs outweigh off-domain ones
    assert out[0]["dsir_weight"] > out[1]["dsir_weight"]
    assert out[2]["dsir_weight"] > out[3]["dsir_weight"]
    # empty doc: zero tokens, NULL weight
    assert out[4]["n_tokens"] == 0 and out[4]["dsir_weight"] is None
    # fixed-point score equals weight * tokens (single final division)
    r0 = out[0]
    assert r0["dsir_weight"] == r0["score_fp"] / r0["n_tokens"]


def test_scoring_projection_has_no_shuffle(spark, corpora):
    _, raw = corpora
    scored = dsir_score(raw, [1] * 64, n_buckets=64)
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # one scan, one projection
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan  # all-JVM codegen scoring


def test_score_rejects_wrong_weight_count(spark, corpora):
    _, raw = corpora
    with pytest.raises(ValueError, match="entries"):
        dsir_score(raw, [1, 2, 3], n_buckets=64)


def test_resample_deterministic_and_weight_driven(spark):
    rows = [(i, float(10.0 if i < 10 else 0.0)) for i in range(100)]
    scored = spark.createDataFrame(
        rows, "doc_id long, dsir_weight double"
    ).withColumn("n_tokens", F.lit(5)).withColumn("score_fp", F.lit(0))
    a = sorted(r["doc_id"] for r in dsir_resample(scored, 10).collect())
    b = sorted(r["doc_id"] for r in dsir_resample(scored, 10).collect())
    assert a == b  # md5-derived Gumbel keys: reruns pick the same docs
    # zero-weight docs have sampling probability 0 — only the 10
    # positive-weight docs are eligible, so exactly they are selected
    assert set(a) == set(range(10))
    # different seed reorders ties but stays deterministic
    c = dsir_resample(scored, 10, seed=99).collect()
    assert len(c) == 10
    # NULL-weight docs are never selected
    with_null = scored.union(
        spark.createDataFrame(
            [(999, None, 5, 0)],
            "doc_id long, dsir_weight double, n_tokens int, score_fp int",
        )
    )
    d = {r["doc_id"] for r in dsir_resample(with_null, 100).collect()}
    assert 999 not in d
