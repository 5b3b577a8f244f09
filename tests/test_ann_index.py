"""Serving-side IVF-PQ index (serving/ann_index.py): distributed
build, in-RAM numpy queries, incremental add — the repo's analog of
the reference embeddinghub's hnswlib index
(embeddinghub/embeddingstore/index.h:19-33)."""

import time

import numpy as np
import pytest
from pyspark.sql import functions as F

from featureform_spark.serving.ann_index import IvfPqIndex
from featureform_spark.sources.testdata import load_table


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


@pytest.fixture(scope="module")
def index(emb):
    return IvfPqIndex.build(emb, num_cells=16, m=8, ksub=64)


def _exact_l2_ids(emb, qvec, k):
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows])
    V = np.array([r["embedding"] for r in rows], dtype=np.float64)
    d = ((V - np.asarray(qvec, dtype=np.float64)) ** 2).sum(axis=1)
    order = np.lexsort((ids, d))[:k]
    return [int(ids[i]) for i in order]


def test_build_shapes_and_query_self(index, emb):
    n = emb.count()
    assert len(index) == n
    assert index.codes.shape == (n, 8)
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    got = index.query(qvec, k=5, nprobe=4)
    assert got[0][0] == 0 and got[0][1] == 0.0  # self is nearest, exact rerank


def test_recall_vs_exact(index, emb):
    """IVFADC-R with 8/16 probed cells + exact re-rank: recall@10 must
    clear the probe ceiling band on real testdata embeddings."""
    rows = emb.select("vec_id", "embedding").orderBy("vec_id").limit(8).collect()
    hits = total = 0
    for r in rows:
        qvec = [float(x) for x in r["embedding"]]
        exact = set(_exact_l2_ids(emb, qvec, 10))
        got = {i for i, _ in index.query(qvec, k=10, nprobe=8, rerank=200)}
        hits += len(got & exact)
        total += 10
    recall = hits / total
    assert recall >= 0.6, recall
    # wider probe must not lose recall
    got_all = {
        i for i, _ in index.query(
            [float(x) for x in rows[0]["embedding"]], k=10,
            nprobe=16, rerank=500,
        )
    }
    exact0 = set(_exact_l2_ids(emb, [float(x) for x in rows[0]["embedding"]], 10))
    assert got_all == exact0  # all cells probed + rerank == exact


def test_incremental_add_becomes_queryable(index):
    rng = np.random.default_rng(7)
    base = index.vectors[0].astype(np.float64)
    newv = (base + rng.normal(0, 1e-3, size=base.shape)).tolist()
    new_id = int(index.ids.max()) + 1000
    n_before = len(index)
    index.add([new_id], [newv])
    assert len(index) == n_before + 1
    got = index.query(newv, k=3, nprobe=4)
    assert got[0][0] in (new_id, int(index.ids[0]))  # near-duplicate pair
    assert any(i == new_id for i, _ in got)


def test_query_runs_without_spark(index, emb):
    """The whole point: serving queries are numpy-only — time a batch
    and assert no Spark job is needed (sub-10ms per query here vs a
    full distributed scan for exact mode)."""
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 3).first()["embedding"]]
    index.query(qvec, k=10)  # warm
    t0 = time.perf_counter()
    for _ in range(50):
        index.query(qvec, k=10, nprobe=8, rerank=100)
    per_query = (time.perf_counter() - t0) / 50
    assert per_query < 0.05, per_query


def test_store_integration(spark, emb):
    from featureform_spark.serving.online import InMemoryOnlineStore

    store = InMemoryOnlineStore()
    store.register_vectors("emb", emb)
    store.build_ann_index("emb", num_cells=16, m=8, ksub=64)
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 5).first()["embedding"]]
    approx = store.nearest("emb", qvec, k=3, approximate=True)
    assert approx[0][0] == 5  # self
    store.add_vectors("emb", [999999], [qvec])
    got = store.nearest("emb", qvec, k=3, approximate=True)
    assert {i for i, _ in got} >= {5, 999999}


def test_save_load_roundtrip(index, tmp_path):
    """Pickle-free npz persistence: identical query results after a
    save/load cycle (np.load with allow_pickle=False)."""
    p = str(tmp_path / "ivfpq.npz")
    index.save(p)
    loaded = IvfPqIndex.load(p)
    assert len(loaded) == len(index)
    qvec = index.vectors[3].astype("float64").tolist()
    assert loaded.query(qvec, k=10, nprobe=8, rerank=100) == index.query(
        qvec, k=10, nprobe=8, rerank=100
    )


def _clone(index):
    return IvfPqIndex(
        index.centroids,
        index.codebook,
        index.ids.copy(),
        index.cells.copy(),
        index.codes.copy(),
        None if index.vectors is None else index.vectors.copy(),
        index.n_codes,
    )


def test_add_is_upsert_not_duplicate(index, emb):
    """A re-added id SUPERSEDES its old entry (streaming replays must
    converge): size is stable, query never returns the same id twice,
    and get() serves the new vector."""
    ix = _clone(index)
    n0 = len(ix.ids)
    old = ix.get(4)
    newv = [v + 0.25 for v in old]
    ix.add([4], [newv])
    assert len(ix.ids) == n0
    assert np.allclose(ix.get(4), newv, atol=1e-6)
    got = ix.query(newv, k=10, nprobe=16)
    ids = [i for i, _ in got]
    assert len(ids) == len(set(ids))
    assert got[0][0] == 4 and got[0][1] < 1e-6


def test_replayed_batch_converges(index):
    """At-least-once replay of the same micro-batch leaves the index
    unchanged — no growth, no duplicate hits crowding out real
    neighbors."""
    ix = _clone(index)
    base = ix.get(2)
    batch_ids = [5_000_001, 5_000_002]
    batch_vecs = [[v + 0.1 for v in base], [v - 0.1 for v in base]]
    ix.add(batch_ids, batch_vecs)
    n1 = len(ix.ids)
    for _ in range(3):  # replays
        ix.add(batch_ids, batch_vecs)
    assert len(ix.ids) == n1
    got = ix.query(base, k=10, nprobe=16)
    ids = [i for i, _ in got]
    assert len(ids) == len(set(ids))
    assert {5_000_001, 5_000_002} <= set(ids)


def test_intra_batch_duplicate_keeps_last(index):
    """An id repeated WITHIN one batch keeps the last occurrence
    (matching get()'s latest-wins rule)."""
    ix = _clone(index)
    n0 = len(ix.ids)
    v1 = [0.1] * ix.dim
    v2 = [0.9] * ix.dim
    ix.add([6_000_000, 6_000_000], [v1, v2])
    assert len(ix.ids) == n0 + 1
    assert np.allclose(ix.get(6_000_000), v2, atol=1e-6)


def test_filtered_query_ivfpq(index):
    """allow= masks ADC candidates before top-k: every hit passes the
    filter and matches exact search over the allowed subset when
    re-ranking with full probes."""
    allowed = frozenset(int(i) for i in index.ids[::3])
    qvec = index.vectors[5].astype(np.float64).tolist()
    got = index.query(
        qvec, k=5, nprobe=len(index.centroids), rerank=10_000,
        allow=allowed,
    )
    assert got and all(i in allowed for i, _ in got)
    d = ((index.vectors.astype(np.float64) - np.asarray(qvec)) ** 2).sum(
        axis=1
    )
    mask = np.fromiter(
        (int(i) in allowed for i in index.ids), dtype=bool
    )
    order = np.lexsort((index.ids[mask], d[mask]))
    want = [int(i) for i in index.ids[mask][order][:5]]
    assert [i for i, _ in got] == want


def test_lloyd_trained_build_and_l2_routing(emb):
    """train_iters Lloyd-refines the coarse cells (broadcast
    assignment + k-row groupBy per round, corpus never shuffles).
    Everything is md5-deterministic so the numbers are stable, but
    Lloyd is a statistical improvement, not a pointwise guarantee —
    at this tiny scale assert it stays within noise of the sampled
    build while the structural contracts hold exactly: same shapes,
    same id set, and full-probe + big-rerank queries are EXACT
    regardless of how the centroids were trained (the training only
    moves cell boundaries, never the reranked distances)."""
    base = IvfPqIndex.build(emb, num_cells=8, m=8, ksub=16)
    lloyd = IvfPqIndex.build(
        emb, num_cells=8, m=8, ksub=16, train_iters=3
    )
    assert lloyd.centroids.shape == base.centroids.shape
    assert sorted(lloyd.ids) == sorted(base.ids)
    # Lloyd must actually have moved the centroids off the seeds
    assert not np.allclose(lloyd.centroids, base.centroids)

    def recall(ix, q, k=10, nprobe=4):
        got = {i for i, _ in ix.query(q, k=k, nprobe=nprobe, rerank=200)}
        return len(got & set(_exact_l2_ids(emb, q, k))) / k

    rows = emb.orderBy("vec_id").limit(10).collect()
    qs = [list(map(float, r["embedding"])) for r in rows]
    r_base = sum(recall(base, q) for q in qs) / len(qs)
    r_lloyd = sum(recall(lloyd, q) for q in qs) / len(qs)
    assert r_lloyd >= r_base - 0.1  # within noise at 1k vectors
    for q in qs[:3]:
        got = [i for i, _ in lloyd.query(q, k=5, nprobe=8, rerank=10_000)]
        assert got == _exact_l2_ids(emb, q, 5)


def test_metric_coherence_persists(emb, tmp_path):
    """Assignment, routing, and add() share ONE metric: the Lloyd
    build is euclidean end-to-end (cells carved by L2, probes ranked
    by L2), the default build stays cosine end-to-end, and the metric
    survives the npz round-trip so a loaded snapshot keeps probing the
    way its cells were carved."""
    base = IvfPqIndex.build(emb, num_cells=8, m=8, ksub=16)
    lloyd = IvfPqIndex.build(emb, num_cells=8, m=8, ksub=16, train_iters=2)
    assert base.metric == "cosine" and lloyd.metric == "l2"
    p = str(tmp_path / "ix.npz")
    lloyd.save(p)
    loaded = IvfPqIndex.load(p)
    assert loaded.metric == "l2"
    q = [float(x) for x in emb.orderBy("vec_id").first()["embedding"]]
    assert [i for i, _ in loaded.query(q, k=5, nprobe=8, rerank=1000)] == [
        i for i, _ in lloyd.query(q, k=5, nprobe=8, rerank=1000)
    ]
    # add() assigns by the stored metric: the added vector lands in
    # its true L2-nearest cell and is findable at nprobe=1
    v = list(np.asarray(q, dtype=np.float64) + 0.001)
    loaded.add([999_999], [v])
    got = [i for i, _ in loaded.query(v, k=1, nprobe=1, rerank=10)]
    assert got == [999_999]
