"""Measure recall@k of the four ANN paths (LSH bucket probe, IVF
nprobe, PQ ADC, IVFADC) against exact cosine/L2 top-k, over a sample of query
vectors. Prints one JSON line; run at any sf dir.

Usage: python scripts/bench_ann_recall.py [sf_dir] [n_queries] [k]
"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    os.environ.setdefault("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    from pyspark.sql import functions as F

    from featureform_spark.functions.quantization import ivfpq_topk, pq_topk
    from featureform_spark.functions.similarity import (
        ann_topk_lsh,
        cosine_topk,
        ivf_topk,
    )
    from featureform_spark.session import get_spark
    from featureform_spark.sources.testdata import load_table

    spark = get_spark("ann_recall")
    emb = load_table(spark, sf_dir, "embeddings").cache()
    n = emb.count()
    query_ids = [r.vec_id for r in emb.select("vec_id").orderBy("vec_id").limit(n_queries).collect()]

    from featureform_spark.serving.ann_index import IvfPqIndex

    # serving-side in-RAM indexes: built ONCE (the reference's
    # embeddinghub shape), queried per qid in numpy
    serving_ix = IvfPqIndex.build(emb, num_cells=16, m=8, ksub=64)
    serving_lloyd = IvfPqIndex.build(
        emb, num_cells=16, m=8, ksub=64, train_iters=3
    )
    from featureform_spark.serving.hnsw_index import HnswIndex, ShardedHnsw

    hnsw_ix = HnswIndex.build(emb, m=16, ef_construction=100)
    hnsw_sh = ShardedHnsw.build(emb, shards=4, m=16, ef_construction=100)
    hnsw_km = ShardedHnsw.build(
        emb, shards=4, m=16, ef_construction=100, partitioner="kmeans"
    )
    recalls = {"lsh": [], "lsh_mp1": [], "ivf": [], "pq": [], "ivfpq": [], "ivfpq_serving": [], "ivfpq_serving_lloyd": [], "hnsw": [], "hnsw_sharded": [], "hnsw_sharded_p2of4": [], "hnsw_sharded_kmeans_p2of4": [], "hnsw_filtered_20pct": [], "ivfpq_filtered_20pct": []}
    # filtered search: 20%-selectivity id filter, graded against exact
    # L2 over the SAME allowed subset
    allow = frozenset(range(0, n, 5))
    for qid in query_ids:
        qvec = [
            float(x)
            for x in emb.filter(F.col("vec_id") == qid).first()["embedding"]
        ]
        exact = {
            r.vec_id for r in cosine_topk(emb, qvec, k=k).collect()
        }
        # PQ ranks by squared L2, so grade it against the exact-L2 top-k
        from featureform_spark.functions.quantization import l2sq_expr
        from featureform_spark.functions.similarity import _as_double

        q1 = emb.filter(F.col("vec_id") == qid).select(
            _as_double(F.col("embedding")).alias("_q")
        )
        exact_l2 = {
            r.vec_id
            for r in emb.select(
                "vec_id", _as_double(F.col("embedding")).alias("_v")
            )
            .crossJoin(F.broadcast(q1))
            .select("vec_id", l2sq_expr(F.col("_v"), F.col("_q")).alias("d"))
            .orderBy(F.col("d").asc(), "vec_id")
            .limit(k)
            .collect()
        }
        lsh = {
            r.vec_id
            for r in ann_topk_lsh(emb, qvec, k=k, num_planes=8).collect()
        }
        lsh_mp = {
            r.vec_id
            for r in ann_topk_lsh(
                emb, qvec, k=k, num_planes=8, hamming_radius=1
            ).collect()
        }
        ivf = {
            r.vec_id
            for r in ivf_topk(emb, qid, k=k, num_centroids=16, nprobe=4).collect()
        }
        pq = {r.vec_id for r in pq_topk(emb, qid, k=k).collect()}
        # IVFADC-R production config: same 4-of-16 cells as IVF,
        # 6-bit residual codes, exact re-rank of the ADC top-200 —
        # reaches the probed-cell ceiling (= IVF-alone's recall) while
        # scanning codes, not floats. Graded against exact-L2 like PQ.
        ivfpq = {
            r.vec_id
            for r in ivfpq_topk(
                emb, qid, k=k, num_cells=16, nprobe=4, ksub=64,
                rerank=200,
            ).collect()
        }
        recalls["lsh"].append(len(lsh & exact) / k)
        recalls["lsh_mp1"].append(len(lsh_mp & exact) / k)
        recalls["ivf"].append(len(ivf & exact) / k)
        recalls["pq"].append(len(pq & exact_l2) / k)
        recalls["ivfpq"].append(len(ivfpq & exact_l2) / k)
        srv = {i for i, _ in serving_ix.query(qvec, k=k, nprobe=8, rerank=200)}
        recalls["ivfpq_serving"].append(len(srv & exact_l2) / k)
        srl = {
            i for i, _ in serving_lloyd.query(qvec, k=k, nprobe=8, rerank=200)
        }
        recalls["ivfpq_serving_lloyd"].append(len(srl & exact_l2) / k)
        hn = {i for i, _ in hnsw_ix.query(qvec, k=k, ef=64)}
        recalls["hnsw"].append(len(hn & exact_l2) / k)
        hs = {i for i, _ in hnsw_sh.query(qvec, k=k, ef=64)}
        recalls["hnsw_sharded"].append(len(hs & exact_l2) / k)
        hp = {i for i, _ in hnsw_sh.query(qvec, k=k, ef=64, probe_shards=2)}
        recalls["hnsw_sharded_p2of4"].append(len(hp & exact_l2) / k)
        hk = {i for i, _ in hnsw_km.query(qvec, k=k, ef=64, probe_shards=2)}
        recalls["hnsw_sharded_kmeans_p2of4"].append(len(hk & exact_l2) / k)
        exact_allowed = {
            r.vec_id
            for r in emb.filter(F.col("vec_id") % 5 == 0)
            .select("vec_id", _as_double(F.col("embedding")).alias("_v"))
            .crossJoin(F.broadcast(q1))
            .select(
                "vec_id", l2sq_expr(F.col("_v"), F.col("_q")).alias("d")
            )
            .orderBy(F.col("d").asc(), "vec_id")
            .limit(k)
            .collect()
        }
        hf = {i for i, _ in hnsw_ix.query(qvec, k=k, ef=64, allow=allow)}
        recalls["hnsw_filtered_20pct"].append(len(hf & exact_allowed) / k)
        sf = {
            i
            for i, _ in serving_ix.query(
                qvec, k=k, nprobe=8, rerank=200, allow=allow
            )
        }
        recalls["ivfpq_filtered_20pct"].append(len(sf & exact_allowed) / k)

    out = {
        "metric": "ann_recall_at_k",
        "k": k,
        "n_vectors": n,
        "n_queries": n_queries,
        "recall": {
            m: round(sum(v) / len(v), 3) for m, v in recalls.items()
        },
        "sf_dir": sf_dir,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
