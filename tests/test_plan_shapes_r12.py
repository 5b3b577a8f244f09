"""Round-12 optimization plan pins.

Each test asserts the executed (AQE-final) physical plan shape that a
round-12 optimization claims, so a regression that silently reverts the
plan fails loudly. The executed plan is inspected on the SAME DataFrame
that ran (``df.collect()`` executes ``df``'s own QueryExecution;
``df.count()`` would plan a different query and leave the original
unexecuted)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _executed_plan(df) -> str:
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def _final_plan(df) -> str:
    """Final-plan section only: the AQE toString repeats every operator
    under '== Initial Plan ==', which double-counts expression pins."""
    return _executed_plan(df).split("== Initial Plan ==")[0]


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    from featureform_spark.sources.testdata import load_table

    return load_table(spark, sf_dir, "documents")


def test_dedup_substrings_hash_agg_and_shared_shuffle(docs):
    """dedup_substrings' winner aggregate is two all-long HashAggregate
    levels (the old ``min(struct(doc, pos))`` buffered a struct and
    compiled to SortAggregate), and the shingle pipeline's stext shuffle
    is consumed by BOTH the winner chain and the join probe via
    ReusedExchange — the tokenize+explode+slice subtree runs once."""
    from featureform_spark.functions.dedup import dedup_substrings

    plan = _executed_plan(
        dedup_substrings(docs, id_col="doc_id", text_col="text", min_tokens=8)
    )
    assert "SortAggregate" not in plan, plan
    assert "ReusedExchange" in plan, plan


def test_dedup_blocks_hash_agg_and_shared_shuffle(docs):
    """Same two claims for the fixed-width block variant: no
    struct-buffer SortAggregate in the winner chain, and one btext
    exchange shared between the aggregate and the mark join."""
    from featureform_spark.functions.dedup import dedup_blocks

    plan = _executed_plan(
        dedup_blocks(docs, id_col="doc_id", text_col="text", block_tokens=8)
    )
    assert "SortAggregate" not in plan, plan
    assert "ReusedExchange" in plan, plan


def test_with_row_index_single_full_data_shuffle(spark):
    """with_row_index(order_cols) ships the data through exactly ONE
    full-data shuffle: the explicit range repartition. The old
    Window.partitionBy(spark_partition_id()) local index forced a second
    hash exchange + sort of every row. The range exchange must be
    REPARTITION_BY_NUM — a user-specified count is exempt from AQE
    coalescing, which keeps partition ids identical across the main
    branch and the per-partition stats branch (with the implicit count
    AQE may coalesce one consumer's read and not the other's, and the
    _pid equi-join then silently drops rows)."""
    from featureform_spark.operators.materialize import with_row_index

    from pyspark.sql import functions as F

    df = spark.range(0, 5000).select((F.col("id") * 7 % 5000).alias("k"))
    idx = with_row_index(df, order_cols=["k"], index_col="_idx", start=0)
    plan = _executed_plan(idx)
    assert "REPARTITION_BY_NUM" in plan, plan
    assert "hashpartitioning(_pid" not in plan, plan
    # index must be a dense 0..n-1 permutation following k order
    rows = idx.orderBy("k").collect()
    assert [r._idx for r in rows] == list(range(5000))


def test_ngram_lm_score_reuses_bigram_exchange(docs):
    """ngram_lm_score consumes the (doc, w1, w2, n_occ) subtree four
    ways; the explicit non-null filter in doc_bigram_counts makes the
    branches canonically identical so the duplicate exchanges become
    ReusedExchange — the corpus is tokenized/exploded once, not four
    times."""
    from featureform_spark.functions.lm import ngram_lm_score

    plan = _executed_plan(ngram_lm_score(docs))
    assert plan.count("ReusedExchange") >= 3, plan


def test_quality_signals_single_evaluation_and_fanout(docs):
    """quality_signals stages each signal as a real column before the
    keep verdict — the signal projections are interpreted (HOF lambdas
    block codegen CSE), so referencing the expression trees in `keep`
    re-ran mean_word_len's O(tokens) fold 3x and every dup fraction
    2x. The staged plan evaluates each exactly once; the raw rows fan
    out first (single-split local scan would run one core)."""
    from featureform_spark.functions.quality import quality_signals

    plan = _final_plan(quality_signals(docs))
    # one aggregate(...) fold for mean_word_len in the whole plan
    # (the keep gate reuses the attribute, never the tree)
    assert plan.count("aggregate(__toks") == 1, plan
    assert plan.count("array_distinct") == 2, plan  # lines + bigrams
    assert "RoundRobinPartitioning" in plan, plan  # fan-out fired


def test_script_profile_counts_without_stripped_copies(docs):
    """script_profile counts class characters with regexp_count (same
    integer as length - length(regexp_replace(class, '')), no stripped
    string copy) and stages latin_ratio so keep_latin reuses it — six
    full-string rewrites and a duplicate regex scan removed."""
    from featureform_spark.functions.text import script_profile

    plan = _final_plan(script_profile(docs))
    assert "regexp_replace" not in plan, plan
    assert plan.count("[A-Za-z]") == 1, plan


def test_code_detect_counts_without_match_arrays(docs):
    """code_detect counts matches with regexp_count instead of
    size(regexp_extract_all(...)) (no per-row match-array
    materialization) and stages the densities so is_code reuses them."""
    from featureform_spark.functions.quality import code_detect

    plan = _final_plan(code_detect(docs))
    # regexp_count is RuntimeReplaceable sugar for
    # size(regexp_extract_all(...)), so the node still names it; the
    # real claims are single evaluation of each density (is_code
    # references the staged attributes) and no duplicate regex scans.
    assert plan.count("[{};]") == 1, plan
    assert plan.count("[{}();=") == 1, plan
