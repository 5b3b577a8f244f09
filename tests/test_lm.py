"""Bigram-LM corpus-fit scoring (functions/lm.py)."""

import pytest

from featureform_spark.functions.lm import (
    bigram_model,
    bigrams_exploded,
    ngram_lm_score,
)


@pytest.fixture(scope="module")
def corpus(spark):
    # "a b" occurs 3x (docs 0,1,2); "b a" 1x; "x y" 1x; doc 4 has no bigram
    return spark.createDataFrame(
        [(0, "a b"), (1, "a b a"), (2, "  a   b "), (3, "x y"), (4, "solo")],
        "doc_id long, text string",
    )


def test_bigrams_exploded(spark, corpus):
    rows = {(r.doc_id, r.w1, r.w2) for r in bigrams_exploded(corpus).collect()}
    assert rows == {(0, "a", "b"), (1, "a", "b"), (1, "b", "a"),
                    (2, "a", "b"), (3, "x", "y")}
    # short docs (0 or 1 token) contribute nothing and don't error
    assert bigrams_exploded(
        spark.createDataFrame([(9, ""), (10, "one")], "doc_id long, text string")
    ).count() == 0


def test_bigram_model_counts(spark, corpus):
    m = {(r.w1, r.w2): (r.c_bg, r.c_w1) for r in bigram_model(corpus).collect()}
    assert m[("a", "b")] == (3, 3)   # only a-starting bigram
    assert m[("b", "a")] == (1, 1)
    assert m[("x", "y")] == (1, 1)


def test_ngram_lm_score_leave_one_out(spark, corpus):
    out = {r.doc_id: r for r in ngram_lm_score(corpus).collect()}
    # doc 0: its (a,b) is supported by docs 1,2 -> 2 of 2 cross-doc contexts
    assert out[0].n_bigrams == 1
    assert (out[0].xdoc_bigram_support, out[0].xdoc_context_support) == (2, 2)
    assert out[0].lm_fit_score == 1.0
    # doc 1: (a,b) has 2 cross-doc; (b,a) appears nowhere else -> 2/2
    assert (out[1].xdoc_bigram_support, out[1].xdoc_context_support) == (2, 2)
    # doc 3: (x,y) unique to it -> zero cross-doc support -> score 0, not 0/0
    assert (out[3].xdoc_bigram_support, out[3].xdoc_context_support) == (0, 0)
    assert out[3].lm_fit_score == 0.0
    assert 4 not in out  # no bigrams -> no row


def test_rare_transitions_score_low(spark):
    # 10 formulaic docs + 1 doc of transitions seen nowhere else
    rows = [(i, "the cat sat on the mat") for i in range(10)]
    rows.append((99, "zq wv kj pm xr"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r.lm_fit_score for r in ngram_lm_score(df).collect()}
    assert out[99] == 0.0
    # every transition supported by the 9 clones; < 1.0 only because the
    # context "the" legitimately splits between two continuations
    assert out[0] == pytest.approx(45 / 63)


def test_repeated_bigram_within_doc(spark):
    # (a b) x2 inside doc 0, once in doc 1: doc 0's pair has cross-doc
    # support 1 per occurrence; its context likewise
    df = spark.createDataFrame(
        [(0, "a b c a b"), (1, "a b")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in ngram_lm_score(df).collect()}
    # doc0 pairs: (a,b) n_occ=2, (b,c) 1, (c,a) 1; cross-doc: (a,b): 2*(3-2)=2
    assert out[0].xdoc_bigram_support == 2
    # contexts: d_a=2 within doc0, c_a=3 -> 2*(3-2)=2; b,c contexts unique
    assert out[0].xdoc_context_support == 2
    assert out[0].lm_fit_score == 1.0
    # doc1: (a,b) 1*(3-1)=2 over context 1*(3-1)=2
    assert out[1].lm_fit_score == 1.0
