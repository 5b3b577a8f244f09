"""BM25 lexical retrieval: hand-computed scores, a DuckDB differential
(scores to tolerance — ln differs by a ulp across libms, measured 6/171
inputs this box — ranks exactly), and the 100-TB plan shape."""

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from featureform_spark.functions.retrieval import bm25_topk

K1, B = 1.2, 0.75


def _py_bm25(docs, terms, k1=K1, b=B):
    """Reference implementation, straight from the formula."""
    import re

    toks = {i: [t for t in re.split("[^a-z0-9]+", s.lower()) if t] for i, s in docs}
    n = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / n
    dfs = {t: sum(1 for v in toks.values() if t in v) for t in terms}
    out = {}
    for i, v in toks.items():
        s = 0.0
        for t in sorted(set(terms)):
            if dfs[t] == 0:
                continue
            tf = v.count(t)
            idf = math.log(1.0 + (n - dfs[t] + 0.5) / (dfs[t] + 0.5))
            s += idf * (tf * (k1 + 1.0) / (tf + k1 * (1 - b + b * len(v) / avgdl)))
        if any(t in v for t in terms):
            out[i] = s
    return out


DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "quick quick quick fox"),
    (3, "a lazy afternoon with a lazy dog and a lazy cat"),
    (4, "nothing relevant here at all whatsoever"),
    (5, "fox and dog, dog and fox; quick!"),
]


def test_bm25_matches_reference_formula(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = bm25_topk(df, ["quick", "fox", "lazy"], k=5).collect()
    want = _py_bm25(DOCS, ["quick", "fox", "lazy"])
    assert len(got) == 4  # doc 4 matches nothing
    for r in got:
        assert r["bm25"] == pytest.approx(want[r["doc_id"]], rel=1e-12)
    # ranks follow (score desc, doc_id)
    order = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))
    assert [r["doc_id"] for r in sorted(got, key=lambda r: r["rank"])] == [
        i for i, _ in order
    ]


def test_bm25_duckdb_differential(spark, sf_dir):
    """Same corpus, same formula, independently in DuckDB SQL: ranks
    must agree exactly, scores to 1e-9 relative."""
    from featureform_spark.sources.testdata import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    terms = ["data", "model", "system"]
    got = bm25_topk(docs, terms, k=15).collect()

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{sf_dir}/documents.parquet'"
    )
    term_struct = ", ".join(f"'{t}'" for t in sorted(set(terms)))
    sql = f"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         t -> t <> '') AS terms
      FROM documents),
    stats AS (SELECT count(*) AS n, sum(len(terms)) AS dl_sum FROM toks),
    dfs AS (
      SELECT t, count(*) AS df
      FROM (SELECT DISTINCT doc_id, unnest(list_intersect(terms,
                    [{term_struct}])) AS t FROM toks)
      GROUP BY t),
    scored AS (
      SELECT k.doc_id,
             sum(ln(1 + (s.n - d.df + 0.5)/(d.df + 0.5))
                 * (tf * ({K1} + 1.0)
                    / (tf + {K1} * (1 - {B} + {B} * dl
                                    / (s.dl_sum * 1.0 / s.n))))) AS bm25
      FROM (SELECT doc_id, terms, len(terms)::DOUBLE AS dl,
                   unnest([{term_struct}]) AS t FROM toks) k
      JOIN dfs d ON d.t = k.t
      CROSS JOIN stats s
      CROSS JOIN LATERAL (SELECT len(list_filter(k.terms,
                    x -> x = k.t))::DOUBLE AS tf) tfv
      WHERE list_contains(k.terms, k.t)
      GROUP BY k.doc_id)
    SELECT doc_id, bm25 FROM scored
    ORDER BY bm25 DESC, doc_id LIMIT 15
    """
    want = con.execute(sql).fetchall()
    assert [r["doc_id"] for r in got] == [w[0] for w in want]
    for r, w in zip(got, want):
        assert r["bm25"] == pytest.approx(w[1], rel=1e-9)


def test_bm25_plan_shape(spark, sf_dir):
    """100-TB shape: scoring is a codegen projection (no Python eval),
    the only corpus-scale pass is the scan, and top-k is
    TakeOrderedAndProject — never a global sort of all matches."""
    from featureform_spark.sources.testdata import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    # plan of the pre-rank top-k (the rank window runs over k rows)
    out = bm25_topk(docs, ["data", "model"], k=10)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan


def test_bm25_edge_cases(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    # absent term contributes nothing; all-absent returns empty
    assert bm25_topk(df, ["zebra"], k=3).count() == 0
    with pytest.raises(ValueError, match="no query terms"):
        bm25_topk(df, [])
    with pytest.raises(ValueError, match="k must be"):
        bm25_topk(df, ["fox"], k=0)
    # k larger than matches: returns just the matches
    assert bm25_topk(df, ["cat"], k=50).count() == 1


def test_rrf_fuse_hand_computed(spark):
    from featureform_spark.functions.retrieval import rrf_fuse

    a = spark.createDataFrame(
        [(1, 1), (2, 2), (3, 3)], "doc_id long, rank long"
    )
    b = spark.createDataFrame(
        [(3, 1), (1, 2), (4, 3)], "doc_id long, rank long"
    )
    got = {r["doc_id"]: (r["rrf"], r["n_rankers"], r["rank"])
           for r in rrf_fuse([a, b], k=4).collect()}
    exp = {
        1: 1 / 61 + 1 / 62,
        3: 1 / 63 + 1 / 61,
        2: 1 / 62,
        4: 1 / 63,
    }
    assert set(got) == set(exp)
    for d, v in exp.items():
        assert got[d][0] == pytest.approx(v, rel=1e-12)
    # doc 1 and 3 both hit twice; 1 wins (higher sum), then 3, 2, 4
    order = [d for d, _ in sorted(exp.items(), key=lambda kv: (-kv[1], kv[0]))]
    assert [d for d, v in sorted(got.items(), key=lambda kv: kv[1][2])] == order
    assert got[1][1] == 2 and got[2][1] == 1

    with pytest.raises(ValueError, match="no rankings"):
        rrf_fuse([])


def test_bm25_rrf_hybrid_end_to_end(spark, sf_dir):
    """The hybrid pattern: BM25 lexical + dense cosine top-k fused by
    RRF — both rankers bounded, fusion ranker-output-scale."""
    from pyspark.sql import Window

    from featureform_spark.functions.retrieval import rrf_fuse
    from featureform_spark.functions.similarity import cosine_topk
    from featureform_spark.sources.testdata import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    lex = bm25_topk(docs, ["data", "model"], k=10)

    emb = load_table(spark, sf_dir, "embeddings")
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    dense = cosine_topk(emb, qvec, k=10).select(
        F.col("vec_id").alias("doc_id"),
        F.row_number().over(
            Window.orderBy(F.col("score").desc(), F.col("vec_id"))
        ).alias("rank"),
    )
    fused = rrf_fuse([lex, dense], k=10).collect()
    assert len(fused) == 10
    assert [r["rank"] for r in fused] != []
    assert all(1 <= r["n_rankers"] <= 2 for r in fused)


def test_bm25_term_weights_mode_matches_manual(spark):
    """Precomputed-weights mode: score = sum_t w_t * tf*(k1+1) /
    (tf + k1*(1-b+b*dl/avgdl)) with NO ln anywhere — hand-computed on
    a 3-doc corpus."""
    docs = [
        (1, "data data model"),
        (2, "model system tools"),
        (3, "plain text here"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    w = {"data": 2.0, "model": 0.5}
    got = {
        r["doc_id"]: r["bm25"]
        for r in bm25_topk(df, ["data", "model"], k=3, term_weights=w).collect()
    }
    k1, b = 1.2, 0.75
    avgdl = 9 / 3  # 3 tokens per doc
    def score(tfs, dl):
        norm = k1 * (1 - b + b * dl / avgdl)
        return sum(
            w[t] * (tf * (k1 + 1.0) / (tf + norm)) for t, tf in tfs.items()
        )
    assert got[1] == pytest.approx(score({"data": 2, "model": 1}, 3), abs=0)
    assert got[2] == pytest.approx(score({"data": 0, "model": 1}, 3), abs=0)
    assert 3 not in got  # no query term -> filtered by the prefilter


def test_bm25_term_weights_skips_df_aggs(spark):
    """Weights mode must not compute per-term df aggregates (the
    stats pass shrinks to N + dl_sum)."""
    docs = spark.createDataFrame(
        [(1, "data model")], "doc_id long, text string"
    )
    out = bm25_topk(
        docs, ["data"], k=1, term_weights={"data": 1.0}
    )
    assert out.count() == 1
