"""Benchmark decontamination: semantics + the broadcast-join scale shape."""

import pytest
from pyspark.sql import functions as F

from featureform_spark.functions.decontaminate import (
    contamination_ngrams,
    decontaminate,
    ngram_array,
)
from tests.test_plans import count_nodes, plan_of


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_ngram_array_basic(spark):
    df = _docs(spark, [(1, "a b c d"), (2, "a  b"), (3, "x")])
    got = {
        r["doc_id"]: r["g"]
        for r in df.select("doc_id", ngram_array("text", 2).alias("g")).collect()
    }
    assert got[1] == ["a b", "b c", "c d"]
    assert got[2] == ["a b"]  # double space collapses to one token gap
    assert got[3] == []  # shorter than n -> empty, not descending-sequence junk


def test_ngram_array_dedups_within_doc(spark):
    df = _docs(spark, [(1, "a b a b a b")])
    [r] = df.select(ngram_array("text", 2).alias("g")).collect()
    assert sorted(r["g"]) == ["a b", "b a"]


def test_decontaminate_flags_overlap(spark):
    bench = _docs(spark, [(100, "the quick brown fox jumps")])
    corpus = _docs(
        spark,
        [
            (1, "he saw the quick brown fox run"),  # shares 2 trigrams
            (2, "completely unrelated words here now"),
            (3, "xx yy"),  # too short for n=3
        ],
    )
    got = {
        r["doc_id"]: (r["n_overlap"], r["contaminated"])
        for r in decontaminate(corpus, bench, n=3).collect()
    }
    assert got == {1: (2, 1), 2: (0, 0), 3: (0, 0)}


def test_contamination_ngrams_ranks_leaks(spark):
    bench = _docs(spark, [(100, "alpha beta gamma")])
    corpus = _docs(
        spark,
        [
            (1, "alpha beta gamma one"),
            (2, "two alpha beta gamma"),
            (3, "alpha gamma beta"),  # scrambled: no shared trigram
        ],
    )
    rows = contamination_ngrams(corpus, bench, n=3, top_k=5).collect()
    assert [(r["ngram"], r["n_docs"]) for r in rows] == [("alpha beta gamma", 2)]


def test_decontaminate_benchmark_side_broadcasts(spark):
    bench = _docs(spark, [(100, "a b c d e f g h i j")])
    corpus = _docs(spark, [(i, f"w{i} a b c d e f g h x") for i in range(50)])
    plan = plan_of(decontaminate(corpus, bench, n=8))
    # the n-gram membership join must be broadcast: the corpus explode
    # stays map-side, nothing corpus-sized shuffles on the ngram key
    assert count_nodes(plan, "BroadcastHashJoin") >= 1
    assert "Exchange hashpartitioning(__ngram" not in plan
