"""Plan-shape pins for the round-11 operators: the scale claims in
their docstrings, asserted against the executed plan so a regression
that silently changes the physical strategy fails loudly.
"""

from pyspark.sql import functions as F

from featureform_spark.registry import Registry
from featureform_spark.serving.ondemand_batch import ondemand_batch


def test_ondemand_batch_adds_no_shuffle(spark):
    """The batch scorer is a projection: input partitioning passes
    through untouched — mapInPandas appears, and the plan carries no
    MORE exchanges than the input plan already had."""
    df = spark.createDataFrame(
        [(i, float(i), i % 7 + 1) for i in range(100)],
        "custkey long, total_spend double, n_orders long",
    ).groupBy("custkey").agg(
        F.sum("total_spend").alias("total_spend"),
        F.max("n_orders").alias("n_orders"),
    )
    base_plan = df._jdf.queryExecution().executedPlan().toString()

    reg = Registry()

    def ratio(client, params, entities):
        a, b = client.features(["total_spend", "n_orders"])
        return a / b

    reg.register_ondemand("ratio", ratio)
    out = ondemand_batch(reg, df, ["ratio"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan
    assert plan.count("Exchange") == base_plan.count("Exchange")


def test_bm25_weights_mode_plan_has_no_df_aggs(spark):
    """term_weights mode: the stats pass shrinks to N + dl_sum (no
    per-term conditional aggregates), and scoring stays codegen (no
    Python eval) with TakeOrderedAndProject top-k."""
    from featureform_spark.functions.retrieval import bm25_topk

    docs = spark.createDataFrame(
        [(i, f"data model x{i}") for i in range(50)],
        "doc_id long, text string",
    )
    out = bm25_topk(
        docs, ["data", "model"], k=5,
        term_weights={"data": 1.0, "model": 2.0},
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan


def test_temperature_mix_exact_alpha_stays_broadcast(spark):
    """The (p, q) exact path reuses mix_corpus's machinery: per-source
    counts and the k fold ride BROADCAST joins — the corpus never
    shuffles on source."""
    rows = [(i, f"s{i % 3}") for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    from featureform_spark.operators.mixing import temperature_mix

    out = temperature_mix(df, "source", ["doc_id"], alpha=(7, 10))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan
