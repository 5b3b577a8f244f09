"""Distributed k-means (Lloyd) and SemDeDup semantic deduplication.

The IVF coarse quantizer in ``similarity.py`` stops at the sampled-seed
init; this module adds the Lloyd refinement loop and the
cluster-then-dedup pattern (SemDeDup, Abbas et al. 2023) built on it —
the standard way to semantically deduplicate an embedding corpus at
scale: cluster once (cheap, k centroids broadcast), then compare pairs
only *within* a cluster, never across the whole corpus.

Everything is deterministic and engine-portable:

- init picks the ``k`` corpus vectors with the smallest ``md5(id)`` —
  a reproducible uniform sample, no RNG (same trick as
  ``ivf_centroids``);
- assignment is a broadcast of ONE packed centroid row + a pure
  ``array_max`` argmax expression — zero exchange per iteration beyond
  the tiny centroid aggregation (same shape as ``ivf_assign``);
- refined centroids are per-dimension means **rounded to 6 decimals**,
  which pins the floating point across engines: Spark's and DuckDB's
  AVG may sum in different orders, and rounding collapses the ulp-level
  drift before it can flip a downstream argmax;
- cosine scores reuse the sequential-fold ``dot_expr`` so Spark and the
  DuckDB oracle produce bit-identical similarity values.

Scale notes (100 TB): each Lloyd iteration is one corpus scan + one
groupBy(cluster) with ``dim`` partially-aggregated AVG columns
(map-side combine, only k×dim doubles cross the wire) + one broadcast.
The corpus is never self-joined; SemDeDup's pairwise stage is bounded
by the largest cluster, which the caller controls via ``k``.

Reference parity: the reference has no clustering operator — this is
part of the beyond-reference LLM-pipeline surface (SURVEY.md §8.10);
its vector serving (provider/redis.go:454-508) only does point KNN.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from featureform_spark.functions.similarity import (
    _as_double,
    dot_expr,
    norm_expr,
)


def kmeans_init(
    df: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic seed centroids: the ``k`` vectors with the smallest
    ``md5(id)`` (uniform, engine-reproducible). Output ``(cid, cv)``
    where ``cid`` is the seed row's numeric id."""
    h = F.md5(F.col(id_col).cast("string"))
    # one scan: the vector rides the top-k heap — the former id-sample +
    # join-back shape scanned the corpus twice and paid a broadcast
    # build job per call (see similarity.ivf_centroids, same change)
    return (
        df.select(
            F.col(id_col).alias("cid"),
            _as_double(F.col(vec_col)).alias("cv"),
            h.alias("_h"),
        )
        .orderBy("_h", "cid")
        .limit(k)
        .select("cid", "cv")
    )


def kmeans_assign(
    df: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign every vector to its max-cosine centroid (spherical k-means
    assignment). One broadcast of a single packed row; the per-vector
    argmax is a pure expression — no shuffle, no per-row join.

    Ties on the (rounded) cosine fall to the smallest ``cid`` via
    struct comparison, mirroring the oracle's ``ORDER BY score DESC,
    cid`` tie-break. Zero-norm (degenerate) vectors or centroids score
    0.0 against everything — cosine is undefined there, and a plain
    division would raise DIVIDE_BY_ZERO under ANSI mode — so the
    tie-break assigns them to the smallest cid, deterministically.
    Output: ``(id, _v, cluster)``.
    """
    packed = centroids.agg(
        F.collect_list(F.struct(F.col("cid"), F.col("cv"))).alias("_cents")
    )

    def _score(c):
        denom = F.col("_nv") * norm_expr(c["cv"])
        return F.when(denom == 0.0, F.lit(0.0)).otherwise(
            dot_expr(F.col("_v"), c["cv"]) / denom
        )

    best = F.array_max(
        F.transform(
            F.col("_cents"),
            lambda c: F.struct(
                _score(c).alias("s"),
                (-c["cid"].cast("double")).alias("negcid"),
                c["cid"].alias("cid"),
            ),
        )
    )
    return (
        df.select(F.col(id_col), _as_double(F.col(vec_col)).alias("_v"))
        .withColumn("_nv", norm_expr(F.col("_v")))
        .crossJoin(F.broadcast(packed))
        .select(
            F.col(id_col),
            F.col("_v"),
            F.col("_nv"),
            best["cid"].alias("cluster"),
        )
    )


def refine_centroids(
    assigned: DataFrame, dim: int, round_digits: int = 6
) -> DataFrame:
    """One Lloyd update: new centroid = per-dimension mean of the
    cluster's members, rounded to pin cross-engine floats.

    ``dim`` AVG aggregates over one groupBy — map-side partial
    aggregation means only ``k × dim`` doubles ever cross the shuffle,
    regardless of corpus size. Clusters that lose every member simply
    drop out (standard Lloyd behavior with hard assignment).
    """
    avgs = [
        F.round(F.avg(F.col("_v")[i]), round_digits).alias(f"_d{i}")
        for i in range(dim)
    ]
    return (
        assigned.groupBy(F.col("cluster").alias("cid"))
        .agg(*avgs)
        .select(
            "cid", F.array(*[F.col(f"_d{i}") for i in range(dim)]).alias("cv")
        )
    )


def _cents_with_norms(cents_rows: list) -> list:
    """(cid, cv float64, norm) triples with the norm computed by the
    SAME sequential scalar fold as ``norm_expr`` — shared by the
    distributed assignment kernel and driver-side callers so both
    reproduce the HOF expression to the last ulp."""
    import numpy as np

    out = []
    for r in cents_rows:
        cid = int(r["cid"])
        cv = np.asarray(r["cv"], dtype=np.float64)
        acc = 0.0
        for x in cv:  # sequential fold, matches norm_expr
            acc = acc + float(x) * float(x)
        out.append((cid, cv, float(np.sqrt(acc))))
    return out


def _cosine_argmax_batch(V, cents):
    """The scoring core of ``_assign_vectorized``: per-row argmax-cosine
    centroid over ``cents`` (triples from ``_cents_with_norms``).
    Returns ``(best_cid int64[n], row_norms float64[n])``. Kept as a
    standalone function so driver-side consumers (IVFADC seed-residual
    construction) run literally the same scalar sequence as the
    distributed kernel."""
    import numpy as np

    n, dim = V.shape
    acc = np.zeros(n)
    for d in range(dim):
        acc = acc + V[:, d] * V[:, d]
    nv = np.sqrt(acc)
    best_s = np.full(n, -np.inf)
    best_nan = np.zeros(n, dtype=bool)
    best_neg = np.full(n, -np.inf)
    best_cid = np.zeros(n, dtype=np.int64)
    for cid, cv, ncid in cents:
        dot = np.zeros(n)
        for d in range(dim):
            dot = dot + V[:, d] * cv[d]
        denom = nv * ncid
        with np.errstate(divide="ignore", invalid="ignore"):
            s = np.where(denom == 0.0, 0.0, dot / denom)
        # Spark's total ordering puts NaN ABOVE every double
        # (array_max picks a NaN score over any real one, and
        # NaN == NaN falls through to the cid tie-break). numpy
        # NaN comparisons are all False, which would silently
        # keep the initialized cid 0 for zero-norm vectors —
        # compare (is_nan, score, -cid) lexicographically
        # instead so degenerate vectors match the HOF result.
        isn = np.isnan(s)
        s_cmp = np.where(isn, np.inf, s)
        neg = -np.float64(cid)
        take = (isn & ~best_nan) | (
            (isn == best_nan)
            & ((s_cmp > best_s) | ((s_cmp == best_s) & (neg > best_neg)))
        )
        best_s = np.where(take, s_cmp, best_s)
        best_nan = np.where(take, isn, best_nan)
        best_neg = np.where(take, neg, best_neg)
        best_cid = np.where(take, cid, best_cid)
    return best_cid, nv


def _assign_vectorized(
    df: DataFrame,
    cents_rows: list,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """kmeans_assign against COLLECTED centroids via one Arrow-batched
    mapInPandas pass — bit-identical to the HOF expression, ~10× less
    constant cost (the HOF lambda interpreter charges ~µs per element;
    numpy charges ~ns).

    Bit-exactness argument: ``dot_expr`` is the sequential left fold
    ``((0 + a0·b0) + a1·b1) + …`` in float64. Iterating DIMENSIONS in
    order and accumulating column-vectors (``acc += V[:,d]·c[d]``)
    performs, for every row, exactly that scalar sequence in the same
    order — IEEE 754 ops are deterministic, so the floats match the JVM
    to the last ulp (equality asserted in tests/test_clustering.py).
    The (score desc, cid asc) argmax tie-break replicates the
    ``array_max(struct(s, -cid, cid))`` comparison with the same float
    equality. Embarrassingly parallel: centroids ride the closure
    (k×dim doubles), the corpus never shuffles.
    """
    import numpy as np

    cents = _cents_with_norms(cents_rows)

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.vstack(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            best_cid, nv = _cosine_argmax_batch(V, cents)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "_v": [row for row in V],
                    "_nv": nv,
                    "cluster": best_cid,
                }
            )

    id_type = dict(df.dtypes)[id_col]
    return df.select(id_col, vec_col).mapInPandas(
        gen,
        schema=f"{id_col} {id_type}, _v array<double>, _nv double, "
        "cluster bigint",
    )


def _refine_vectorized(
    df: DataFrame,
    cents_rows: list,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> list:
    """One FUSED Lloyd round (r13, guide §4.1/§1.2): assignment and the
    per-cluster partial sums run in a single Arrow kernel pass, so only
    ``<= k`` rows per batch cross the Python→JVM boundary — the
    unfused shape (``_assign_vectorized`` + ``refine_centroids``)
    Arrow-serialized the ENTIRE corpus (id, dim-array, norm, cluster)
    back to the JVM every refinement pass just so a JVM partial-AVG
    could immediately collapse it to k×dim doubles. Returns the
    refined centroid rows, same contract as
    ``refine_centroids(...).collect()``.

    Equivalence to ``round(avg(_v[i]), 6)``: assignment is the
    bit-identical ``_cosine_argmax_batch`` sequence; the mean is the
    same Σvalues/count in float64 — numpy's column sum associates
    additions differently than Spark's per-row fold, but Spark's own
    AVG already merges map-side partials in nondeterministic fetch
    order, so the 6-dp round is what pins the value in BOTH shapes
    (hash-verified against the DuckDB oracle at sf0.001/0.01/0.1)."""
    import numpy as np

    cents = _cents_with_norms(cents_rows)
    scols = [f"_s{i}" for i in range(dim)]

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.vstack(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            best_cid, _nv = _cosine_argmax_batch(V, cents)
            cids = np.unique(best_cid)
            counts = np.empty(len(cids), dtype=np.int64)
            sums = np.empty((len(cids), dim), dtype=np.float64)
            for j, cid in enumerate(cids):
                mask = best_cid == cid
                counts[j] = int(mask.sum())
                sums[j] = V[mask].sum(axis=0)
            out = {"cluster": cids, "_n": counts}
            for i in range(dim):
                out[scols[i]] = sums[:, i]
            yield pd.DataFrame(out)

    partials = df.select(vec_col).mapInPandas(
        gen,
        schema="cluster bigint, _n bigint, "
        + ", ".join(f"{c} double" for c in scols),
    )
    refined = partials.groupBy(F.col("cluster").alias("cid")).agg(
        F.sum("_n").alias("_nt"),
        *[F.sum(c).alias(c) for c in scols],
    )
    return refined.select(
        "cid",
        F.array(
            *[
                F.round(F.col(c) / F.col("_nt"), round_digits)
                for c in scols
            ]
        ).alias("cv"),
    ).collect()


def kmeans_fit(
    df: DataFrame,
    k: int,
    dim: int,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Lloyd's algorithm: md5-seeded init + ``iters`` refinement rounds.

    Returns the final assignment ``(id, _v, _nv, cluster)``. Cost per
    round: one scan + one k-row groupBy over FUSED per-batch partials
    (``_refine_vectorized`` — assignment and partial sums in one Arrow
    kernel pass; the corpus never re-crosses the Python boundary). The
    k-row centroid table is COLLECTED between rounds (k×dim doubles —
    metadata scale, independent of corpus size) and rides the next
    round's closure, so every round plans a flat scan → mapInPandas →
    tiny-agg tree instead of nested lineage. Values are identical to
    the unfused rounds: collected centroids are the 6-dp-rounded
    means, and the kernel reproduces the fold arithmetic to the last
    ulp (see ``_refine_vectorized`` for the AVG-order argument).
    """
    cents_rows = kmeans_init(df, k, id_col, vec_col).collect()
    for _ in range(iters):
        # k rows — same scale as a top-k fetch
        cents_rows = _refine_vectorized(
            df, cents_rows, dim, id_col, vec_col
        )
    return _assign_vectorized(df, cents_rows, id_col, vec_col)


def semantic_dedup(
    df: DataFrame,
    k: int | None,
    dim: int,
    threshold: float,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_rows: int | None = None,
) -> DataFrame:
    """SemDeDup: k-means the embeddings, then inside each cluster drop
    every vector that has a higher-priority (smaller-id) near-duplicate
    at cosine ≥ ``threshold``. Survivors keep their cluster label.

    The pairwise stage joins the corpus to itself ONLY on the cluster
    key — candidate volume is Σ|cluster|², bounded by ``k``, never
    |corpus|². ``k=None`` auto-sizes from the corpus row count
    (``lsh_autosize.auto_kmeans_k`` holds expected cluster size at 64,
    so the pairwise volume stays ~64·n at any scale; pass ``n_rows``
    to skip the count job). The keep rule is the greedy
    min-id rule (drop b iff ∃ a<b in the same cluster with cos≥τ):
    single anti-join, no iteration — the transitive-closure variant
    lives in ``dedup.dedup_keep_canonical`` for when cluster-chains
    matter. Output: ``(id, cluster)`` of survivors.
    """
    if k is None:
        from featureform_spark.functions.lsh_autosize import auto_kmeans_k

        k = auto_kmeans_k(n_rows if n_rows is not None else df.count())
    # materialize the assignment once: the pairwise stage reads it twice
    # (both join sides) and the final anti-join a third time — lazy
    # checkpoint turns three recomputes of the Lloyd chain into one
    assigned = kmeans_fit(df, k, dim, iters, id_col, vec_col).localCheckpoint(
        eager=False
    )
    left = assigned.select(
        F.col("cluster"),
        F.col(id_col).alias("id_a"),
        F.col("_v").alias("_va"),
        F.col("_nv").alias("_na"),
    )
    right = assigned.select(
        F.col("cluster").alias("cluster_b"),
        F.col(id_col).alias("id_b"),
        F.col("_v").alias("_vb"),
        F.col("_nv").alias("_nb"),
    )
    # EXISTS-style left_semi: a vector is dropped iff SOME smaller-id
    # cluster-mate clears the threshold. Versus materializing all
    # qualifying pairs + distinct, the semi join (a) never builds the
    # pair rows, (b) short-circuits per probe row at the first match —
    # most duplicates find their dominator early — and (c) removes the
    # distinct's extra shuffle. Exact same fold arithmetic, same result.
    dropped = right.join(
        left,
        on=(
            (F.col("cluster_b") == F.col("cluster"))
            & (F.col("id_a") < F.col("id_b"))
            & (
                dot_expr(F.col("_va"), F.col("_vb"))
                / (F.col("_na") * F.col("_nb"))
                >= threshold
            )
        ),
        how="left_semi",
    ).select(F.col("id_b").alias(id_col))
    return assigned.join(dropped, id_col, "left_anti").select(
        F.col(id_col), F.col("cluster")
    )


def closure_assign(
    df: DataFrame,
    cents_rows: list,
    margin: float = 0.25,
    max_assign: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SPANN-style cluster CLOSURE assignment (Chen et al. 2021):
    every vector is assigned to its best centroid PLUS any centroid
    whose cosine is within ``margin`` of the best, capped at
    ``max_assign`` memberships — the boundary replication that lets
    routed shard probes keep recall on unclustered data
    (``serving.hnsw_index.ShardedHnsw`` builds with the same rule).

    Returns one row per membership: ``(id_col, shard)`` where shard is
    the centroid's cid. Embarrassingly parallel: centroids ride the
    mapInPandas closure (k x dim doubles), one corpus scan, no
    shuffle, output rows <= max_assign per input row.

    Bit-exact to the DuckDB oracle: scores use the SAME sequential
    per-dimension fold as :func:`_assign_vectorized`, ranked by
    (score desc, cid asc) with Spark/DuckDB's NaN-above-everything
    total order (NaN scores compare as +inf and NaN == NaN ties fall
    to the cid order), so the margin test ``s >= best - margin``
    agrees to the last ulp.
    """
    import numpy as np

    cents = sorted(
        (int(r["cid"]), np.asarray(r["cv"], dtype=np.float64))
        for r in cents_rows
    )
    norms = []
    for _cid, cv in cents:
        acc = 0.0
        for x in cv:  # sequential fold, matches norm_expr / _NORM
            acc = acc + float(x) * float(x)
        norms.append(float(np.sqrt(acc)))
    cids = np.asarray([c for c, _ in cents], dtype=np.int64)
    cap = max(1, int(max_assign))
    mg = float(margin)

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.vstack(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            n, dim = V.shape
            acc = np.zeros(n)
            for d in range(dim):
                acc = acc + V[:, d] * V[:, d]
            nv = np.sqrt(acc)
            S = np.empty((n, len(cents)))
            for j, (cid, cv) in enumerate(cents):
                dot = np.zeros(n)
                for d in range(dim):
                    dot = dot + V[:, d] * cv[d]
                denom = nv * norms[j]
                with np.errstate(divide="ignore", invalid="ignore"):
                    S[:, j] = np.where(denom == 0.0, 0.0, dot / denom)
            S_cmp = np.where(np.isnan(S), np.inf, S)
            # stable argsort on -score keeps ascending cid on ties
            # (columns are built in sorted-cid order)
            order = np.argsort(-S_cmp, axis=1, kind="stable")
            best = S_cmp[np.arange(n), order[:, 0]]
            out_ids, out_shards = [], []
            ids = pdf[id_col].to_numpy()
            for i in range(n):
                for j in range(min(cap, len(cents))):
                    col = order[i, j]
                    if j > 0 and not (S_cmp[i, col] >= best[i] - mg):
                        break  # scores only fall from here
                    out_ids.append(ids[i])
                    out_shards.append(int(cids[col]))
            yield pd.DataFrame({id_col: out_ids, "shard": out_shards})

    id_type = dict(df.dtypes)[id_col]
    return df.select(id_col, vec_col).mapInPandas(
        gen, schema=f"{id_col} {id_type}, shard bigint"
    )
