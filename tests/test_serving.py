"""Serving plane: dataset iterators, online store, chunked copy, nearest."""

from featureform_spark.operators.materialize import materialize_latest
from featureform_spark.serving.dataset import Dataset
from featureform_spark.serving.online import InMemoryOnlineStore, materialize_to_online


def make_df(spark, n=10):
    return spark.createDataFrame(
        [(i, float(i * 10)) for i in range(n)], "id long, value double"
    )


def test_iterate(spark):
    ds = Dataset(make_df(spark))
    assert sorted(r["id"] for r in ds) == list(range(10))


def test_shuffle_deterministic_and_complete(spark):
    ds = Dataset(make_df(spark)).shuffle(buffer_size=4, seed=7)
    a = [r["id"] for r in ds]
    b = [r["id"] for r in ds]
    assert a == b                      # seeded → reproducible
    assert sorted(a) == list(range(10))  # a permutation, nothing lost


def test_repeat_and_batch(spark):
    ds = Dataset(make_df(spark, 5)).repeat(3).batch(4)
    batches = list(ds)
    assert sum(len(b) for b in batches) == 15
    assert all(len(b) == 4 for b in batches[:-1])


def test_split_disjoint_and_stable(spark):
    ds = Dataset(make_df(spark, 1000))
    train, test = ds.split(["id"], test_fraction=0.3, seed=1)
    tr = {r["id"] for r in train}
    te = {r["id"] for r in test}
    assert tr.isdisjoint(te) and len(tr) + len(te) == 1000
    assert 200 < len(te) < 400  # fractional-in-expectation
    # same seed → identical assignment
    tr2, _ = ds.split(["id"], test_fraction=0.3, seed=1)
    assert {r["id"] for r in tr2} == tr


def test_online_copy_and_serve(spark):
    df = spark.createDataFrame(
        [("a", 1.0, 1), ("a", 2.0, 2), ("b", 5.0, 1)],
        "entity string, value double, ord long",
    )
    mat = materialize_latest(df, "entity", "value", None, "ord")
    store = InMemoryOnlineStore()
    chunks = materialize_to_online(mat, store, "feat1")
    assert chunks == 1
    assert store.get("feat1", "a") == 2.0
    store.set("feat2", "a", 10.0)
    assert store.serve_features(["feat1", "feat2"], "a") == [2.0, 10.0]


def test_nearest(spark):
    vecs = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0]), (2, [0.9, 0.1])],
        "vec_id long, embedding array<float>",
    )
    store = InMemoryOnlineStore()
    store.register_vectors("emb", vecs)
    got = store.nearest("emb", [1.0, 0.0], k=2)
    assert [g[0] for g in got] == [0, 2]


def test_conf_for_scale_sizing():
    from featureform_spark.session import conf_for_scale

    # 100 TB on 1000 x 4-core executors: six-figure shuffle partitions
    big = conf_for_scale(100 * 1024**4, executor_cores=4, num_executors=1000)
    assert int(big["spark.sql.files.maxPartitionBytes"]) == 128 * 1024**2
    assert int(big["spark.sql.shuffle.partitions"]) > 100_000
    # test scale: collapses to the core floor, never the 200 default
    small = conf_for_scale(10 * 1024**2, executor_cores=4, num_executors=1)
    assert int(small["spark.sql.shuffle.partitions"]) == 8


def test_set_if_newer_refreshes_ttl():
    """A winning streaming upsert must refresh/clear the TTL deadline;
    a stale deadline would reap the FRESH value."""
    from featureform_spark.serving.online import InMemoryOnlineStore

    clock = [0.0]
    store = InMemoryOnlineStore(clock=lambda: clock[0])
    store.set("f", "a", 1.0, ttl_seconds=5)
    store.set_if_newer("f", "a", 2.0, ts=10)  # newer write, no TTL
    clock[0] = 100.0
    assert store.get("f", "a") == 2.0  # old deadline cleared
    store.set_if_newer("f", "a", 3.0, ts=20, ttl_seconds=5)
    clock[0] = 104.0
    assert store.get("f", "a") == 3.0
    clock[0] = 105.0
    assert store.get("f", "a") is None  # refreshed deadline honored
    # a STALE write must not touch value or deadline (the baseline
    # must carry a timestamp — plain set() records none, and a
    # ts-less entry accepts any writer, the documented upsert rule)
    store.set_if_newer("f", "b", 1.0, ts=10, ttl_seconds=50)
    store.set_if_newer("f", "b", 0.5, ts=5)  # stale: ignored
    store.set_if_newer("f", "b", 9.9, ts=None)  # no ts: stale too
    clock[0] = 140.0
    assert store.get("f", "b") == 1.0
