"""Distributed Bloom filters: sizing math, no-false-negatives
guarantee vs the exact decontaminate join, distributed-build ==
single-pass equivalence, and bounded false positives."""

import numpy as np
import pytest

from featureform_spark.functions.bloom import (
    build_ngram_bloom,
    may_contain,
    optimal_params,
    score_membership,
)


def test_optimal_params_math():
    m, k = optimal_params(1_000_000, 0.01)
    assert m % 8 == 0
    assert 9 * 1_000_000 <= m <= 11 * 1_000_000  # ~9.6 bits/item @1%
    assert 6 <= k <= 8
    with pytest.raises(ValueError):
        optimal_params(0)
    with pytest.raises(ValueError):
        optimal_params(100, 1.5)


@pytest.fixture(scope="module")
def corpora(spark):
    ref_rows = [
        (i, f"ref tokens number {i} " + " ".join(
            f"w{i}x{j}" for j in range(10)))
        for i in range(200)
    ]
    ref = spark.createDataFrame(
        ref_rows, "doc_id long, text string"
    ).repartition(6)
    tgt_rows = [
        # doc 0: verbatim copy of ref doc 5 (full memorization)
        (0, ref_rows[5][1]),
        # doc 1: half ref-doc-7 text, half novel
        (1, ref_rows[7][1] + " totally novel words " + " ".join(
            f"nv{j}" for j in range(12))),
        # doc 2: fully novel
        (2, " ".join(f"unique{j} token{j}" for j in range(20))),
        # doc 3: too short for any n-gram
        (3, "tiny"),
    ]
    tgt = spark.createDataFrame(tgt_rows, "doc_id long, text string")
    return ref, tgt


def test_no_false_negatives_vs_exact_join(spark, corpora):
    ref, tgt = corpora
    n = 4
    bloom = build_ngram_bloom(ref, n=n, m_bits=1 << 20, k=7)
    scored = {
        r["doc_id"]: r for r in score_membership(tgt, bloom, n=n).collect()
    }
    # exact overlap via the existing broadcast decontaminate join
    from featureform_spark.functions.decontaminate import decontaminate

    exact = {
        r["doc_id"]: r["n_overlap"]
        for r in decontaminate(tgt, ref, n=n).collect()
    }
    for did, row in scored.items():
        # Bloom hits must cover every true overlap (no false negatives)
        assert row["n_hits"] >= exact.get(did, 0)
    assert scored[0]["hit_frac"] == 1.0  # verbatim copy: all grams hit
    assert scored[1]["n_hits"] >= exact[1] > 0  # partial overlap found
    assert scored[3]["n_grams"] == 0 and scored[3]["hit_frac"] is None


def test_false_positive_rate_bounded(spark, corpora):
    ref, tgt = corpora
    n = 4
    bloom = build_ngram_bloom(ref, n=n, m_bits=1 << 20, k=7)
    novel = {
        r["doc_id"]: r for r in score_membership(tgt, bloom, n=n).collect()
    }[2]
    # fully-novel doc: at 2^20 bits for ~2k items the fp rate is ~0 —
    # allow a whisker, but a hit_frac near 1 would mean broken hashing
    assert novel["hit_frac"] < 0.05


def test_distributed_build_equals_single_partition(spark, corpora):
    ref, _ = corpora
    a = build_ngram_bloom(ref.repartition(8), n=4, m_bits=1 << 16, k=5)
    b = build_ngram_bloom(ref.coalesce(1), n=4, m_bits=1 << 16, k=5)
    assert a == b  # OR-union is exact: partitioning can't change bits


def test_may_contain_driver_probes(spark, corpora):
    ref, _ = corpora
    bloom = build_ngram_bloom(ref, n=4, m_bits=1 << 18, k=7)
    # "ref tokens number 5" is the first 4-gram of ref doc 5
    assert may_contain(bloom, ["ref tokens number 5"]) == [True]
    # a miss is near-certain at this sizing (fp ~1e-9); if this ever
    # flakes the hashing is broken, not unlucky
    assert may_contain(
        bloom, ["definitely not in the reference corpus"]
    ) == [False]
    assert np.frombuffer(bloom, dtype=np.uint8, offset=16).any()


def test_build_rejects_unaligned_bits(spark, corpora):
    ref, _ = corpora
    with pytest.raises(ValueError, match="multiple of 8"):
        build_ngram_bloom(ref, m_bits=1001)


def test_bloom_header_prevents_param_mismatch(spark, corpora):
    """(k, m_bits) ride the blob header: probes can't run with
    mismatched parameters (a larger probe k would fabricate false
    negatives), and headerless/corrupt blobs are rejected."""
    import struct

    from featureform_spark.functions.bloom import _parse_bloom

    ref, tgt = corpora
    bloom = build_ngram_bloom(ref, n=4, m_bits=1 << 16, k=5)
    _, m_bits, k = _parse_bloom(bloom)
    assert (m_bits, k) == (1 << 16, 5)
    # scoring uses the header k (5), not any default — the verbatim
    # copy still hits 100%
    scored = {
        r["doc_id"]: r
        for r in score_membership(tgt, bloom, n=4).collect()
    }
    assert scored[0]["hit_frac"] == 1.0
    with pytest.raises(ValueError, match="header"):
        may_contain(b"rawbitsnoheader" * 4, ["x"])
    bad = bloom[:4] + struct.pack("<IQ", 5, 8)  # header/body mismatch
    with pytest.raises(ValueError, match="mismatch"):
        may_contain(bad + bloom[16:], ["x"])
