"""Collocation PMI + CUBE corpus report semantics."""

from pyspark.sql import functions as F

from featureform_spark.functions.text import collocations


def test_pmi_known_answer(spark):
    # "x y" always adjacent; "a b" never adjacent -> lift separates them
    df = spark.createDataFrame(
        [("x y a", ), ("x y b",), ("b a x y",)], "text string"
    )
    rows = collocations(df, min_count=2, top_n=10).collect()
    pairs = {(r["w1"], r["w2"]): r for r in rows}
    assert ("x", "y") in pairs
    xy = pairs[("x", "y")]
    # 10 tokens, 7 bigrams; c_xy=3, c_x=3, c_y=3
    assert xy["pair_count"] == 3
    expected = round((3 / 7) / ((3 / 10) * (3 / 10)), 6)
    assert xy["lift"] == expected


def test_short_and_empty_docs_contribute_no_pairs(spark):
    df = spark.createDataFrame([("solo",), ("",), ("a b",)], "text string")
    rows = collocations(df, min_count=1, top_n=10).collect()
    assert {(r["w1"], r["w2"]) for r in rows} == {("a", "b")}


def test_corpus_report_marginals_consistent(spark, sf_dir):
    from featureform_spark.suite_llm import corpus_report_q

    rows = corpus_report_q(spark, sf_dir).collect()
    grand = [r for r in rows if r["source"] == "(all)" and r["lang"] == "(all)"]
    assert len(grand) == 1
    by_source = [
        r for r in rows if r["source"] != "(all)" and r["lang"] == "(all)"
    ]
    assert sum(r["n_docs"] for r in by_source) == grand[0]["n_docs"]
    assert sum(r["total_tokens"] for r in by_source) == grand[0]["total_tokens"]


def test_corpus_report_is_single_scan(spark, sf_dir):
    from featureform_spark.suite_llm import corpus_report_q

    plan = (
        corpus_report_q(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # CUBE expands grouping sets from one scan — the parquet relation
    # must appear exactly once
    assert plan.count("documents.parquet") == 1
