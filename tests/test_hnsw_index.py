"""Serving-side HNSW graph index (serving/hnsw_index.py): the numpy
reimplementation of the reference embeddinghub's hnswlib
``HierarchicalNSW`` (embeddinghub/embeddingstore/index.h:19-33) plus
the sharded executor-side build the reference can't do."""

import threading
import time

import numpy as np
import pytest
from pyspark.sql import functions as F

from featureform_spark.serving.hnsw_index import HnswIndex, ShardedHnsw
from featureform_spark.sources.testdata import load_table


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


@pytest.fixture(scope="module")
def index(emb):
    return HnswIndex.build(emb, m=16, ef_construction=100)


def _exact_l2_ids(emb, qvec, k):
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows])
    V = np.array([r["embedding"] for r in rows], dtype=np.float64)
    d = ((V - np.asarray(qvec, dtype=np.float64)) ** 2).sum(axis=1)
    order = np.lexsort((ids, d))[:k]
    return [int(ids[i]) for i in order]


def test_build_and_query_self(index, emb):
    assert len(index) == emb.count()
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    got = index.query(qvec, k=5, ef=64)
    assert got[0][0] == 0 and got[0][1] == 0.0


def test_recall_beats_ivf_band(index, emb):
    """The point of the graph index: recall@10 at ef=64 must clear
    0.9 on the testdata embeddings — well above the IVFADC probe
    ceiling (~0.75) at a comparable candidate budget."""
    rows = emb.select("vec_id", "embedding").orderBy("vec_id").limit(10).collect()
    hits = total = 0
    for r in rows:
        qvec = [float(x) for x in r["embedding"]]
        exact = set(_exact_l2_ids(emb, qvec, 10))
        got = {i for i, _ in index.query(qvec, k=10, ef=64)}
        hits += len(got & exact)
        total += 10
    assert hits / total >= 0.9, hits / total


def test_wider_ef_monotone_not_worse(index, emb):
    """Raising ef can only widen the beam — recall at ef=128 must be
    >= recall at ef=16 over a query sample."""
    rows = emb.select("vec_id", "embedding").orderBy("vec_id").limit(6).collect()
    r_lo = r_hi = 0
    for r in rows:
        qvec = [float(x) for x in r["embedding"]]
        exact = set(_exact_l2_ids(emb, qvec, 10))
        r_lo += len({i for i, _ in index.query(qvec, k=10, ef=16)} & exact)
        r_hi += len({i for i, _ in index.query(qvec, k=10, ef=128)} & exact)
    assert r_hi >= r_lo


def test_deterministic_rebuild(emb):
    a = HnswIndex.build(emb, m=8, ef_construction=50)
    b = HnswIndex.build(emb, m=8, ef_construction=50)
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 7).first()["embedding"]]
    assert a.query(qvec, k=10, ef=40) == b.query(qvec, k=10, ef=40)
    assert a.top_level == b.top_level and a.entry == b.entry


def test_incremental_add_becomes_queryable(index):
    rng = np.random.default_rng(11)
    base = index.vectors[0].astype(np.float64)
    newv = (base + rng.normal(0, 1e-3, size=base.shape)).tolist()
    new_id = int(index.ids.max()) + 1000
    n_before = len(index)
    index.add([new_id], [newv])
    assert len(index) == n_before + 1
    got = index.query(newv, k=3, ef=32)
    assert any(i == new_id for i, _ in got)


def test_query_is_numpy_only_and_fast(index, emb):
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 3).first()["embedding"]]
    index.query(qvec, k=10, ef=64)  # warm
    t0 = time.perf_counter()
    for _ in range(50):
        index.query(qvec, k=10, ef=64)
    assert (time.perf_counter() - t0) / 50 < 0.05


def test_flight_compat_kwargs(index):
    """Flight passes nprobe/rerank to every registered index — the
    graph index must swallow them (and IvfPq must swallow ef)."""
    qvec = [float(x) for x in index.vectors[0]]
    assert index.query(qvec, k=3, nprobe=8, rerank=100, ef=32)
    from featureform_spark.serving.ann_index import IvfPqIndex  # noqa: F401

    # signature-level check: both accept the union of kwargs
    import inspect

    assert "k" in inspect.signature(index.query).parameters


def test_concurrent_add_and_query(index):
    """adds from one thread while another queries: no torn state."""
    errs = []

    def adder():
        try:
            for j in range(20):
                vid = 10_000_000 + j
                index.add([vid], [index.vectors[j % 5].tolist()])
        except Exception as e:  # pragma: no cover
            errs.append(e)

    def querier():
        try:
            for j in range(40):
                index.query(index.vectors[j % 5].tolist(), k=5, ef=32)
        except Exception as e:  # pragma: no cover
            errs.append(e)

    ts = [threading.Thread(target=adder), threading.Thread(target=querier)]
    [t.start() for t in ts]
    [t.join() for t in ts]
    assert not errs


def test_sharded_build_covers_all_vectors(emb):
    sh = ShardedHnsw.build(emb, shards=4, m=8, ef_construction=50)
    assert len(sh.shards) == 4
    assert len(sh) == emb.count()
    all_ids = sorted(
        int(i) for s in sh.shards for i in s.ids
    )
    expected = sorted(r["vec_id"] for r in emb.select("vec_id").collect())
    assert all_ids == expected  # disjoint shards, nothing dropped


def test_sharded_recall_matches_single_graph(emb):
    """Fan-out + merge over 4 shard graphs must reach at least the
    single-graph recall band (each shard is searched exhaustively at
    the same ef, so the merged top-k can only gain candidates)."""
    sh = ShardedHnsw.build(emb, shards=4, m=16, ef_construction=100)
    rows = emb.select("vec_id", "embedding").orderBy("vec_id").limit(8).collect()
    hits = total = 0
    for r in rows:
        qvec = [float(x) for x in r["embedding"]]
        exact = set(_exact_l2_ids(emb, qvec, 10))
        got = {i for i, _ in sh.query(qvec, k=10, ef=64)}
        hits += len(got & exact)
        total += 10
    assert hits / total >= 0.9, hits / total


def test_sharded_add_routes_and_serves(emb):
    sh = ShardedHnsw.build(emb, shards=3, m=8, ef_construction=50)
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 2).first()["embedding"]]
    new_id = 55_555_555
    sh.add([new_id], [qvec])
    got = sh.query(qvec, k=2, ef=32)
    assert {i for i, _ in got} >= {2, new_id}


def test_store_integration_hnsw(spark, emb):
    from featureform_spark.serving.online import InMemoryOnlineStore

    store = InMemoryOnlineStore()
    store.register_vectors("emb", emb)
    store.build_ann_index("emb", algo="hnsw", m=8, ef_construction=50)
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 5).first()["embedding"]]
    got = store.nearest("emb", qvec, k=3, approximate=True)
    assert got[0][0] == 5
    store.add_vectors("emb", [888888], [qvec])
    got = store.nearest("emb", qvec, k=3, approximate=True)
    assert {i for i, _ in got} >= {5, 888888}


def test_store_rejects_unknown_algo(spark, emb):
    from featureform_spark.serving.online import InMemoryOnlineStore

    store = InMemoryOnlineStore()
    store.register_vectors("emb", emb)
    with pytest.raises(ValueError, match="unknown ANN algo"):
        store.build_ann_index("emb", algo="faiss")


def test_empty_build_raises(spark, emb):
    with pytest.raises(ValueError, match="0 vectors"):
        HnswIndex.build(emb.filter(F.lit(False)))


def test_empty_sharded_build_raises(spark, emb):
    with pytest.raises(ValueError, match="0 vectors"):
        ShardedHnsw.build(emb.filter(F.lit(False)), shards=2)


def test_add_is_upsert_not_duplicate(emb):
    ix = HnswIndex(2, m=4, ef_construction=20)
    ix.add([1, 2], [[0.0, 0.0], [1.0, 0.0]])
    ix.add([1], [[0.125, 0.0]])  # update id 1
    assert len(ix) == 2
    got = ix.query([0.125, 0.0], k=3, ef=16)
    ids = [i for i, _ in got]
    assert ids.count(1) == 1  # no duplicate slots
    assert got[0] == (1, 0.0)  # the NEW vector answers, not the stale one


def test_failed_add_leaves_index_intact(emb):
    ix = HnswIndex(3, m=4, ef_construction=20)
    ix.add([1, 2], [[0, 0, 1], [0, 1, 0]])
    with pytest.raises(ValueError, match="dim 3"):
        ix.add([3], [[1.0, 2.0]])  # wrong dimension
    with pytest.raises(ValueError, match="ids for"):
        ix.add([4, 5], [[0, 0, 1]])  # count skew
    # index still consistent: same size, correct answers
    assert len(ix) == 2
    assert ix.query([0, 0, 1], k=1, ef=8)[0] == (1, 0.0)
    ix.add([4], [[0.5, 0.5, 0.0]])  # and future adds land correctly
    assert ix.query([0.5, 0.5, 0.0], k=1, ef=8)[0] == (4, 0.0)


def test_sharded_upsert_no_cross_shard_duplicate(emb):
    sh = ShardedHnsw.build(emb, shards=3, m=8, ef_construction=50)
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 9).first()["embedding"]]
    before = len(sh)
    shifted = [v + 0.5 for v in qvec]
    sh.add([9], [shifted])  # update an id that came from the build
    assert len(sh) == before  # upsert, not grow
    owners = [i for i, s in enumerate(sh.shards) if 9 in s._pos_of]
    assert len(owners) == 1  # exactly one shard owns the id
    got = sh.query(shifted, k=1, ef=32)
    # float32 storage: distance to the updated vector is ~0 (not the
    # old vector's 0.5-shift distance)
    assert got[0][0] == 9 and got[0][1] < 1e-9  # the update took effect


def test_sharded_build_pads_empty_buckets(spark):
    df = spark.createDataFrame(
        [(i, [float(i), 0.0]) for i in range(3)],
        "vec_id long, embedding array<double>",
    )
    sh = ShardedHnsw.build(df, shards=8, m=4, ef_construction=10)
    assert len(sh.shards) == 8  # empty hash buckets padded
    assert len(sh) == 3
    assert sh.query([2.0, 0.0], k=1, ef=8)[0] == (2, 0.0)


def test_save_load_roundtrip(index, tmp_path):
    """hnswlib saveIndex/loadIndex parity — pickle-free npz format
    (np.load with allow_pickle=False), identical query results, upsert
    state (alive flags, live count) preserved."""
    p = str(tmp_path / "ix.npz")
    index.save(p)
    loaded = HnswIndex.load(p)
    assert len(loaded) == len(index)
    qvec = index.vectors[7].tolist()
    assert loaded.query(qvec, k=10, ef=64) == index.query(qvec, k=10, ef=64)


def test_sharded_save_load_roundtrip(emb, tmp_path):
    sh = ShardedHnsw.build(emb, shards=3, m=8, ef_construction=50)
    sh.save(str(tmp_path / "shards"))
    loaded = ShardedHnsw.load(str(tmp_path / "shards"))
    assert len(loaded) == len(sh)
    assert len(loaded.shards) == 3
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 11).first()["embedding"]]
    assert loaded.query(qvec, k=5, ef=32) == sh.query(qvec, k=5, ef=32)


def test_shard_routing_probe_subset(spark):
    """Centroid routing: with well-separated clusters, probing ONE
    shard answers from the right cluster; probing all shards equals the
    default fan-out exactly."""
    import numpy as np

    rng = np.random.default_rng(5)
    # 3 tight clusters far apart; ids chosen so xxhash64 spreads them
    centers = np.array([[0.0, 0.0], [100.0, 0.0], [0.0, 100.0]])
    rows = []
    for i in range(90):
        c = centers[i % 3]
        rows.append((i, (c + rng.normal(0, 0.1, 2)).tolist()))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    sh = ShardedHnsw.build(df, shards=3, m=8, ef_construction=40)
    q = [100.0, 0.5]
    full = sh.query(q, k=5, ef=32)
    routed_all = sh.query(q, k=5, ef=32, probe_shards=3)
    assert routed_all == full
    got1 = sh.query(q, k=5, ef=32, probe_shards=1)
    # hash sharding mixes clusters into every shard, so the probed
    # shard still holds near-cluster points; everything returned must
    # come from the query's cluster (ids = 1 mod 3)
    assert got1 and all(i % 3 == 1 for i, _ in got1)
    # routing knob rides the Flight-style kwargs path on other indexes
    from featureform_spark.serving.ann_index import IvfPqIndex  # noqa: F401


def test_centroid_tracks_upserts(spark):
    ix = HnswIndex(2, m=4, ef_construction=10)
    ix.add([1, 2], [[0.0, 0.0], [2.0, 0.0]])
    c1 = ix.centroid()
    assert c1 is not None and abs(c1[0] - 1.0) < 1e-9
    ix.add([2], [[4.0, 0.0]])  # upsert moves the mean to (0+4)/2
    c2 = ix.centroid()
    assert abs(c2[0] - 2.0) < 1e-9


def test_freeze_and_delete_space(spark, emb):
    """embeddinghub space lifecycle parity: FreezeSpace makes writes
    fail ('Cannot write to immutable space', server.cc:113-127) while
    reads keep serving; DeleteSpace removes everything."""
    from featureform_spark.serving.online import InMemoryOnlineStore

    store = InMemoryOnlineStore()
    store.register_vectors("emb", emb)
    store.build_ann_index("emb", algo="hnsw", m=8, ef_construction=50)
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 4).first()["embedding"]]
    store.freeze_vectors("emb")
    with pytest.raises(PermissionError, match="immutable space"):
        store.add_vectors("emb", [777], [qvec])
    # reads still serve after freeze
    assert store.nearest("emb", qvec, k=1, approximate=True)[0][0] == 4
    with pytest.raises(KeyError):
        store.freeze_vectors("nope")
    store.delete_vector_space("emb")
    with pytest.raises(KeyError):
        store.nearest("emb", qvec, k=1, approximate=True)
    # a recreated space is writable again
    store.register_vectors("emb", emb)
    store.build_ann_index("emb", algo="hnsw", m=8, ef_construction=50)
    store.add_vectors("emb", [777], [qvec])


def test_get_vector_point_lookup(spark, emb):
    """embeddinghub Get parity: the stored embedding comes back by id —
    from the index when built (upsert-aware), from the DataFrame
    otherwise, None when absent."""
    from featureform_spark.serving.online import InMemoryOnlineStore

    expected = [
        float(x) for x in emb.filter(F.col("vec_id") == 8).first()["embedding"]
    ]
    store = InMemoryOnlineStore()
    store.register_vectors("emb", emb)
    got_df = store.get_vector("emb", 8)  # no index yet: DataFrame path
    assert got_df == expected
    store.build_ann_index("emb", algo="hnsw", m=8, ef_construction=50)
    got_ix = np.asarray(store.get_vector("emb", 8))
    assert np.allclose(got_ix, expected, atol=1e-6)  # float32 storage
    assert store.get_vector("emb", 10**9) is None
    # upsert visibility: the NEW vector answers
    store.add_vectors("emb", [8], [[0.5] * len(expected)])
    assert store.get_vector("emb", 8) == [0.5] * len(expected)
    # IVFADC index get (latest add wins) and sharded get
    from featureform_spark.serving.ann_index import IvfPqIndex

    ivf = IvfPqIndex.build(emb, num_cells=8, m=8, ksub=16)
    assert np.allclose(np.asarray(ivf.get(8)), expected, atol=1e-6)
    assert ivf.get(10**9) is None
    sh = ShardedHnsw.build(emb, shards=3, m=8, ef_construction=50)
    assert np.allclose(np.asarray(sh.get(8)), expected, atol=1e-6)
    assert sh.get(10**9) is None


def test_query_returns_k_live_after_heavy_upsert():
    """Soft-deleted nodes are filtered after the beam search; the
    effective ef must stretch past them (hnswlib keeps searching past
    deleted elements) so a heavily upserted index still returns k live
    results when k exist."""
    rng = np.random.default_rng(7)
    dim = 8
    ix = HnswIndex(dim, m=6, ef_construction=40)
    ids = list(range(40))
    vecs = rng.normal(size=(40, dim)).tolist()
    ix.add(ids, vecs)
    # upsert most ids several times -> the graph is mostly tombstones
    for _ in range(4):
        upd = rng.normal(size=(35, dim)).tolist()
        ix.add(ids[:35], upd)
    assert len(ix) == 40
    q = rng.normal(size=dim).tolist()
    got = ix.query(q, k=10, ef=10)  # ef == k: worst case pre-fix
    assert len(got) == 10
    live_ids = [i for i, _ in got]
    assert len(live_ids) == len(set(live_ids))
    # asking for more live results than exist returns all 40, once each
    got_all = ix.query(q, k=64, ef=16)
    assert len(got_all) == 40


def _exact_l2_ids_local(rows, q, k):
    ids = np.array([i for i, _ in rows])
    V = np.array([v for _, v in rows], dtype=np.float64)
    d = ((V - np.asarray(q, dtype=np.float64)) ** 2).sum(axis=1)
    order = np.lexsort((ids, d))[:k]
    return [int(ids[i]) for i in order]


def test_kmeans_sharding_clustered_low_replication(spark):
    """On genuinely clustered data the kmeans partitioner puts each
    cluster in its own shard with ~no boundary replication, and
    probing ONE shard recalls the query's whole neighborhood."""
    rng = np.random.default_rng(11)
    centers = np.array(
        [[10.0, 0.0, 0.0], [0.0, 10.0, 0.0], [0.0, 0.0, 10.0],
         [-10.0, -10.0, -10.0]]
    )
    rows = [
        (i, (centers[i % 4] + rng.normal(0, 0.2, 3)).tolist())
        for i in range(120)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    sh = ShardedHnsw.build(
        df, shards=4, m=8, ef_construction=40, partitioner="kmeans"
    )
    assert sh.centroids is not None
    assert len(sh) == 120  # every vector covered (unique ids)
    total = sum(len(s) for s in sh.shards)
    assert total <= 130  # separated clusters: margin barely triggers
    for qi in (0, 1, 2, 3):
        q = rows[qi][1]
        exact = _exact_l2_ids_local(rows, q, 10)
        got = [i for i, _ in sh.query(q, k=10, ef=48, probe_shards=1)]
        assert len(set(got) & set(exact)) >= 9, (qi, got, exact)


def test_kmeans_sharding_unclustered_recall_via_closure(spark):
    """On UNclustered data, hash shards cap routed recall near p/N;
    the kmeans partitioner's SPANN closure (boundary vectors
    replicated into near cells) keeps probe-2-of-4 recall >= 0.9."""
    rng = np.random.default_rng(3)
    rows = [(i, rng.normal(0, 1, 16).tolist()) for i in range(400)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    km = ShardedHnsw.build(
        df, shards=4, m=12, ef_construction=80, partitioner="kmeans"
    )
    assert len(km) == 400
    total = sum(len(s) for s in km.shards)
    assert total <= 3 * 400  # replication bounded by max_assign
    recalls = []
    for qi in range(20):
        q = rows[qi][1]
        exact = set(_exact_l2_ids_local(rows, q, 10))
        got = {i for i, _ in km.query(q, k=10, ef=64, probe_shards=2)}
        assert len(got) == 10  # replicas deduplicated, still k results
        recalls.append(len(got & exact) / 10)
    assert sum(recalls) / len(recalls) >= 0.9, recalls


def test_kmeans_sharded_upsert_updates_all_replicas(spark):
    """An id replicated into several shards by closure assignment must
    be updated in EVERY replica on upsert — a stale replica would let
    query() return the old vector from an unrouted shard."""
    rng = np.random.default_rng(9)
    rows = [(i, rng.normal(0, 1, 8).tolist()) for i in range(120)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    km = ShardedHnsw.build(
        df, shards=4, m=8, ef_construction=40, partitioner="kmeans"
    )
    # find an id that closure-replicated into >= 2 shards
    vid = next(
        i for i, _ in rows
        if sum(1 for s in km.shards if i in s._pos_of) >= 2
    )
    newv = rng.normal(0, 1, 8).tolist()
    km.add([vid], [newv])
    for s in km.shards:
        if vid in s._pos_of:
            assert np.allclose(s.get(vid), newv, atol=1e-9)
    assert np.allclose(km.get(vid), newv, atol=1e-9)
    # new ids route by closure assignment, not md5
    km.add([9_000_001], [newv])
    owners = [i for i, s in enumerate(km.shards) if 9_000_001 in s._pos_of]
    assert owners == km._closure_cells(newv)


def test_kmeans_sharded_save_load_roundtrip(spark, tmp_path):
    rng = np.random.default_rng(21)
    rows = [(i, rng.normal(0, 1, 8).tolist()) for i in range(80)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    km = ShardedHnsw.build(
        df, shards=3, m=8, ef_construction=40, partitioner="kmeans"
    )
    d = str(tmp_path / "km_idx")
    km.save(d)
    back = ShardedHnsw.load(d)
    assert back.centroids is not None
    assert np.allclose(back.centroids, km.centroids)
    assert back.closure_margin == km.closure_margin
    assert back.max_assign == km.max_assign
    q = rows[5][1]
    assert back.query(q, k=5, ef=32, probe_shards=2) == km.query(
        q, k=5, ef=32, probe_shards=2
    )


def test_unknown_partitioner_raises(spark):
    df = spark.createDataFrame(
        [(0, [0.0, 1.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="partitioner"):
        ShardedHnsw.build(df, shards=2, partitioner="zorp")


def test_farthest_first_seeds_unique_on_duplicate_pool(spark):
    """An all-duplicate candidate pool must still yield k DISTINCT seed
    rows (argmax over zero distances must not re-pick a chosen row)."""
    from featureform_spark.serving.hnsw_index import _farthest_first_seeds

    rows = [(i, [1.0, 2.0, 3.0]) for i in range(12)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    seeds = _farthest_first_seeds(df, 4, "vec_id", "embedding")
    assert len(seeds) == 4
    assert len({s["cid"] for s in seeds}) == 4


def test_filtered_query_hnsw():
    """allow= is the metadata-filter hook: disallowed nodes stay
    routing-only and ef stretches until k passing results — exact
    agreement with brute force OVER THE ALLOWED SUBSET."""
    import numpy as np
    from featureform_spark.serving.hnsw_index import HnswIndex

    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(400, 16))
    ix = HnswIndex(dim=16, m=8, ef_construction=64)
    ix.add(list(range(400)), vecs)
    q = rng.normal(size=16)
    allowed = frozenset(range(0, 400, 5))  # 20% selectivity
    got = ix.query(q, k=10, ef=32, allow=allowed)
    assert len(got) == 10
    assert all(i in allowed for i, _ in got)
    # brute-force over the allowed subset
    ids = np.asarray(sorted(allowed))
    d = ((vecs[ids] - q) ** 2).sum(axis=1)
    want = set(ids[np.argsort(d)[:10]].tolist())
    assert len(set(i for i, _ in got) & want) >= 9  # ANN: allow 1 miss
    # callable predicate form
    got2 = ix.query(q, k=10, ef=32, allow=lambda i: i % 5 == 0)
    assert [i for i, _ in got2] == [i for i, _ in got]


def test_filtered_query_sharded_and_tiny_allow():
    import numpy as np
    from featureform_spark.serving.hnsw_index import HnswIndex, ShardedHnsw

    rng = np.random.default_rng(3)
    vecs = rng.normal(size=(300, 8))
    shards = []
    for s in range(3):
        ix = HnswIndex(dim=8, m=8, ef_construction=32)
        ids = list(range(s * 100, (s + 1) * 100))
        ix.add(ids, vecs[s * 100 : (s + 1) * 100])
        shards.append(ix)
    sh = ShardedHnsw(shards)
    q = rng.normal(size=8)
    allowed = frozenset([7, 142, 256])  # fewer than k
    got = sh.query(q, k=10, allow=allowed)
    assert sorted(i for i, _ in got) == [7, 142, 256]
