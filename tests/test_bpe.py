"""Corpus-trained BPE tokenizer (functions/bpe.py): distributed
histogram == pure-python reference, published merge semantics,
round-trippable encoding."""

import pytest
from pyspark.sql import functions as F

from featureform_spark.functions.bpe import (
    EOW,
    bpe_encode,
    encode_word,
    train_bpe,
    train_bpe_from_histogram,
    word_histogram,
)
from featureform_spark.sources.testdata import load_table


def _py_histogram(texts):
    from collections import Counter

    c = Counter()
    for t in texts:
        for w in t.split(" "):
            if w:
                c[w] += 1
    return sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))


def test_distributed_histogram_matches_python(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    texts = [r["text"] for r in docs.select("text").collect()]
    assert word_histogram(docs) == _py_histogram(texts)


def test_merge_loop_published_semantics():
    # the canonical Sennrich toy corpus shape: 'low' x5, 'lower' x2,
    # 'newest' x6, 'widest' x3 — first merges fuse the frequent
    # 'es'/'est'/'est</w>' chain
    hist = [("newest", 6), ("low", 5), ("widest", 3), ("lower", 2)]
    merges = train_bpe_from_histogram(hist, num_merges=4)
    assert merges[0] == ("e", "s")          # count 9 (newest+widest)
    assert merges[1] == ("es", "t")         # chain continues
    assert merges[2] == ("est", EOW)
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    assert "est" + EOW in encode_word("newest", ranks)


def test_merge_loop_stops_when_nothing_repeats():
    merges = train_bpe_from_histogram([("ab", 1), ("cd", 1)], 50)
    assert merges == []  # every pair occurs once — no merge earns it


def test_encode_roundtrip_and_determinism(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(50)
    merges = train_bpe(docs, num_merges=60)
    assert len(merges) > 10
    out = bpe_encode(docs, merges).collect()
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    for r in out:
        toks = r["bpe_tokens"]
        assert r["n_bpe_tokens"] == len(toks)
        # lossless: stripping EOW markers and rejoining reproduces the
        # whitespace-normalized document
        rebuilt = "".join(toks).replace(EOW, " ").rstrip()
        expected = " ".join(w for w in texts[r["doc_id"]].split(" ") if w)
        assert rebuilt == expected
    # deterministic across runs
    merges2 = train_bpe(docs, num_merges=60)
    assert merges2 == merges


def test_trained_bpe_compresses_vs_chars(spark, sf_dir):
    """The point of training: learned subwords yield far fewer tokens
    than character-level splitting on the same corpus."""
    docs = load_table(spark, sf_dir, "documents").limit(50)
    merges = train_bpe(docs, num_merges=120)
    out = bpe_encode(docs, merges)
    agg = out.agg(F.sum("n_bpe_tokens").alias("bpe")).first()
    chars = docs.select(
        F.sum(F.length(F.regexp_replace("text", r"\s+", ""))).alias("c")
    ).first()
    assert agg["bpe"] < 0.5 * chars["c"]


def test_word_histogram_bounds(spark):
    """The driver-side histogram is BOUNDED before collect: min_count
    prunes hapax noise in-plan and top_words caps the table via a
    distributed TakeOrdered in the merge loop's own total order — the
    merge chain over the bounded histogram equals the exact one when
    the bound doesn't bite, and drops only tail words when it does."""
    from featureform_spark.functions.bpe import (
        train_bpe_from_histogram,
        word_histogram,
    )

    rows = [
        (0, "low low low low lower lower newest newest newest widest"),
        (1, "newest newest newest widest widest zzz_once"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    exact = word_histogram(df, top_words=None)
    assert ("zzz_once", 1) in exact

    pruned = word_histogram(df, min_count=2, top_words=None)
    assert all(c >= 2 for _, c in pruned)
    assert ("zzz_once", 1) not in pruned

    capped = word_histogram(df, top_words=3)
    assert capped == exact[:3]  # same (count desc, word asc) order

    # a bound that doesn't bite leaves the merge chain unchanged
    assert train_bpe_from_histogram(
        word_histogram(df, top_words=100), num_merges=20
    ) == train_bpe_from_histogram(exact, num_merges=20)
