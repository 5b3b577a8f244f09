"""Product Quantization: code validity, zero-shuffle encode plan,
ADC-vs-exact recall, determinism."""

import pytest
from pyspark.sql import functions as F

from featureform_spark.functions.quantization import (
    pq_encode,
    pq_topk,
    pq_train,
)

DIM, M, KSUB = 64, 8, 16


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    from featureform_spark.sources.testdata import load_table

    return load_table(spark, sf_dir, "embeddings")


@pytest.fixture(scope="module")
def codebook(emb):
    return pq_train(emb, dim=DIM, m=M, ksub=KSUB)


def test_codebook_shape(codebook):
    rows = codebook.collect()
    assert len(rows) <= M * KSUB
    by_s = {}
    for r in rows:
        by_s.setdefault(r.s, []).append(r.code)
        assert len(r.cv) == DIM // M
    assert set(by_s) == set(range(M))
    for s, cs in by_s.items():
        assert sorted(cs) == list(range(len(cs)))  # dense 0..n-1


def test_encode_is_total_and_in_range(emb, codebook):
    enc = pq_encode(emb, codebook, dim=DIM, m=M)
    assert enc.count() == emb.count()
    bad = enc.filter(
        (F.size("codes") != M)
        | F.exists("codes", lambda c: (c < 0) | (c >= KSUB) | c.isNull())
    )
    assert bad.count() == 0


def test_encode_plan_has_no_shuffle_of_corpus(emb, codebook):
    enc = pq_encode(emb, codebook, dim=DIM, m=M)
    plan = enc._jdf.queryExecution().executedPlan().toString()
    # zero-shuffle encode: scan → Arrow kernel → project; the codebook
    # rides the closure (no join node at all), and the corpus never
    # exchanges
    assert "ArrowEvalPython" in plan
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_adc_topk_recall_vs_exact(emb):
    """ADC is approximate; on 64-dim data with 8x compression the true
    nearest neighbors should still dominate the PQ top-k."""
    from featureform_spark.functions.similarity import _as_double
    from featureform_spark.functions.quantization import l2sq_expr

    q = emb.filter(F.col("vec_id") == 0).select(
        _as_double(F.col("embedding")).alias("_q")
    )
    exact = (
        emb.select("vec_id", _as_double(F.col("embedding")).alias("_v"))
        .crossJoin(F.broadcast(q))
        .select("vec_id", l2sq_expr(F.col("_v"), F.col("_q")).alias("d"))
        .orderBy(F.col("d").asc(), "vec_id")
        .limit(20)
    )
    exact_ids = {r.vec_id for r in exact.collect()}
    pq_ids = {r.vec_id for r in pq_topk(emb, 0, k=10, dim=DIM, m=M, ksub=KSUB).collect()}
    assert 0 in pq_ids  # the query itself has ADC distance ~0
    # chance overlap of a random 10-pick with the exact top-20 is
    # 10*20/500 = 0.4 ids; require >= 3 (≈8x over chance) — PQ with 16
    # codewords/subspace is coarse on near-random synthetic vectors
    assert len(pq_ids & exact_ids) >= 3


def test_pq_topk_deterministic(emb):
    a = pq_topk(emb, 0, k=10, dim=DIM, m=M, ksub=KSUB).collect()
    b = pq_topk(emb, 0, k=10, dim=DIM, m=M, ksub=KSUB).collect()
    assert [(r.vec_id, r.adc_dist) for r in a] == [
        (r.vec_id, r.adc_dist) for r in b
    ]


def _exact_l2_ids(emb, qid: int, k: int) -> set:
    from featureform_spark.functions.quantization import l2sq_expr
    from featureform_spark.functions.similarity import _as_double

    q = emb.filter(F.col("vec_id") == qid).select(
        _as_double(F.col("embedding")).alias("_q")
    )
    return {
        r.vec_id
        for r in (
            emb.select(
                "vec_id", _as_double(F.col("embedding")).alias("_v")
            )
            .crossJoin(F.broadcast(q))
            .select(
                "vec_id", l2sq_expr(F.col("_v"), F.col("_q")).alias("d")
            )
            .orderBy(F.col("d").asc(), "vec_id")
            .limit(k)
        ).collect()
    }


def test_ivfpq_topk_residuals_and_recall(emb):
    """IVFADC: residual codebook must not collapse (the coarse sampler
    and the PQ seeder use the same md5 order — without seed exclusion
    every seed is a zero residual), candidates come only from probed
    cells, and residual quantization beats raw-vector PQ on recall
    aggregated over queries."""
    from featureform_spark.functions.quantization import ivfpq_topk
    from featureform_spark.functions.similarity import (
        ivf_assign,
        ivf_centroids,
    )

    got = ivfpq_topk(emb, 0, k=10, dim=DIM, num_cells=16, nprobe=4)
    rows = got.collect()
    assert len(rows) == 10
    # non-degenerate: distances are not all equal (the collapsed-
    # codebook failure mode scored every vector in a cell identically)
    assert len({r.adc_dist for r in rows}) > 5
    assert rows[0].vec_id == 0  # the query's own residual re-encodes best
    # candidates only from probed cells
    cents = ivf_centroids(emb, 16)
    cells = {
        r["cell"]
        for r in ivf_assign(emb, cents)
        .filter(F.col("vec_id").isin([r.vec_id for r in rows]))
        .select("cell")
        .collect()
    }
    assert len(cells) <= 4
    # recall vs exact L2, aggregated over queries: residual codes must
    # be at least as good as raw-vector PQ with the same m/ksub budget
    # *given that IVFADC only sees nprobe/16 of the corpus*
    qids = [r.vec_id for r in emb.select("vec_id").orderBy("vec_id").limit(5).collect()]
    ivfpq_hits = pq_hits = 0
    for qid in qids:
        exact = _exact_l2_ids(emb, qid, 10)
        ivfpq_ids = {
            r.vec_id for r in ivfpq_topk(emb, qid, k=10, dim=DIM).collect()
        }
        pq_ids = {
            r.vec_id
            for r in pq_topk(emb, qid, k=10, dim=DIM, m=M, ksub=KSUB).collect()
        }
        ivfpq_hits += len(ivfpq_ids & exact)
        pq_hits += len(pq_ids & exact)
    assert ivfpq_hits >= pq_hits


def test_ivfpq_topk_deterministic(emb):
    from featureform_spark.functions.quantization import ivfpq_topk

    a = ivfpq_topk(emb, 0, k=10, dim=DIM).collect()
    b = ivfpq_topk(emb, 0, k=10, dim=DIM).collect()
    assert [(r.vec_id, r.adc_dist) for r in a] == [
        (r.vec_id, r.adc_dist) for r in b
    ]


def test_ivfpq_topk_filtered_scales_probes(emb):
    """Filtered vector search (where=...): results come only from the
    allowed subset, and the ACORN-style 1/selectivity probe+rerank
    scaling makes the answer exact vs brute force over that subset —
    at 20% selectivity the 4-of-16 probe expands to cover every cell,
    which is what recovers the recall a fixed budget loses (0.68 ->
    1.0 in ANN_RECALL.json)."""
    from featureform_spark.functions.quantization import (
        ivfpq_topk,
        l2sq_expr,
    )
    from featureform_spark.functions.similarity import _as_double

    where = F.col("vec_id") % 5 == 0
    got = ivfpq_topk(
        emb, query_id=0, k=5, dim=64, num_cells=16, nprobe=4, m=8,
        ksub=16, rerank=100, where=where,
    ).collect()
    assert len(got) == 5
    assert all(r.vec_id % 5 == 0 for r in got)
    q = emb.filter(F.col("vec_id") == 0).select(
        _as_double(F.col("embedding")).alias("_q")
    )
    exact = (
        emb.filter(where)
        .select("vec_id", _as_double(F.col("embedding")).alias("_v"))
        .crossJoin(F.broadcast(q))
        .select("vec_id", l2sq_expr(F.col("_v"), F.col("_q")).alias("d"))
        .orderBy(F.col("d").asc(), "vec_id")
        .limit(5)
        .collect()
    )
    assert [r.vec_id for r in got] == [r.vec_id for r in exact]


def test_ivfpq_topk_filtered_empty_allow(emb):
    from featureform_spark.functions.quantization import ivfpq_topk

    got = ivfpq_topk(
        emb, query_id=0, k=5, dim=64, num_cells=16, nprobe=4, m=8,
        ksub=16, rerank=50, where=F.col("vec_id") < 0,
    ).collect()
    assert got == []


def test_serving_index_filtered_query_scales_probes(emb):
    """IvfPqIndex.query under a selective collection filter probes
    beyond nprobe (exact selectivity from |allow|/n) and matches
    brute force over the allowed vectors; a callable filter estimates
    selectivity from the first probes and gets the same answer."""
    import numpy as np

    from featureform_spark.serving.ann_index import IvfPqIndex

    ix = IvfPqIndex.build(emb, num_cells=16, m=8, ksub=16)
    rows = emb.select("vec_id", "embedding").collect()
    vecs = {r.vec_id: np.asarray(r.embedding, dtype=np.float64) for r in rows}
    q = vecs[0]
    allow = frozenset(i for i in vecs if i % 5 == 0)
    exact = sorted(
        ((float(((vecs[i] - q) ** 2).sum()), i) for i in allow),
    )[:5]
    want = [i for _, i in exact]
    got = [i for i, _ in ix.query(list(q), k=5, nprobe=4, rerank=100,
                                  allow=allow)]
    assert got == want
    got_fn = [
        i
        for i, _ in ix.query(
            list(q), k=5, nprobe=4, rerank=100,
            allow=lambda i: i % 5 == 0,
        )
    ]
    assert got_fn == want
