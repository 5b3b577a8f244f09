"""Filtered nearest through the online store: exact mode pushes an
isin predicate into the Spark scan; approximate mode forwards the
allow set to whichever index build_ann_index built. Both paths agree
on which ids are admissible."""

import os

from pyspark.sql import functions as F

from featureform_spark.serving.online import InMemoryOnlineStore


def _emb(spark, sf_dir):
    return spark.read.parquet(
        os.path.join(sf_dir, "embeddings.parquet")
    ).select("vec_id", "embedding")


def test_nearest_allow_exact_and_approximate(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    store = InMemoryOnlineStore()
    store.register_vectors("e", emb)
    store.build_ann_index("e", algo="hnsw", m=8, ef_construction=64)
    qvec = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 7).first()["embedding"]
    ]
    allow = frozenset(range(0, 200, 4))

    exact = store.nearest("e", qvec, k=5, allow=allow)
    assert exact and all(i in allow for i, _ in exact)
    assert all(i != 7 for i, _ in exact)  # 7 % 4 != 0: filtered out

    approx = store.nearest(
        "e", qvec, k=5, approximate=True, allow=allow, ef=64
    )
    assert approx and all(i in allow for i, _ in approx)
    # both paths admit only allowed ids; rankings agree modulo the
    # cosine-vs-L2 metric difference (unnormalized vectors can swap
    # the tail) — require 4-of-5 overlap
    assert len({i for i, _ in approx} & {i for i, _ in exact}) >= 4


def test_nearest_allow_accepts_list_and_tuple(spark, sf_dir):
    """A bare id sequence (list/tuple) must work on BOTH paths — the
    indexes dispatch on set/frozenset/dict vs callable, so nearest()
    normalizes sequences to frozenset before forwarding (a raw list
    used to reach the index and raise TypeError: not callable)."""
    emb = _emb(spark, sf_dir)
    store = InMemoryOnlineStore()
    store.register_vectors("e", emb)
    store.build_ann_index("e", algo="hnsw", m=8, ef_construction=64)
    qvec = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 7).first()["embedding"]
    ]
    allow_list = list(range(0, 200, 4))

    approx = store.nearest(
        "e", qvec, k=5, approximate=True, allow=allow_list, ef=64
    )
    assert approx and all(i in set(allow_list) for i, _ in approx)
    exact = store.nearest("e", qvec, k=5, allow=tuple(allow_list))
    assert exact and all(i in set(allow_list) for i, _ in exact)
