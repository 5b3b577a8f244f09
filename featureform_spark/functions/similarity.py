"""Similarity search over embedding columns (array<float>).

The ANN ladder, mirroring what a vector store does (the reference
serves Nearest() via RediSearch KNN / hnswlib,
provider/redis.go:454-508):

- **brute-force cosine top-k** — the exact baseline. The dot product is a
  sequential left-fold over doubles (``F.aggregate``), bit-identical to
  DuckDB's ``list_reduce``; top-k goes through ``orderBy().limit(k)``
  which Spark executes as a distributed TakeOrderedAndProject (per
  partition heap + driver merge — no global sort, no single-partition
  window).
- **hyperplane LSH buckets** — md5-seeded random hyperplanes → bit-string
  bucket signature; ANN probes the query's bucket, optionally expanded
  to a Hamming-radius probe set (multi-probe LSH). Hyperplane signs are
  Python-computed md5 constants baked into the plan (and into the
  oracle SQL) — no RNG, no cross-engine drift.
- **IVF** — sampled coarse quantizer (optionally Lloyd-refined via
  ``functions.clustering``), broadcast argmax assignment, nprobe-cell
  probe.
- **hard-negative mining** — bucketed different-label top-k pairs for
  contrastive training-data curation.

Product-Quantization ADC (8-byte codes instead of vectors on the scan
side) lives in ``functions.quantization``; measured recall per path in
``scripts/bench_ann_recall.py`` / SCALING.md.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from featureform_spark.functions.lsh_autosize import auto_num_planes


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot_expr(a: Column, b: Column) -> Column:
    """Sequential left-fold dot product (deterministic double order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm_expr(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_expr(a: Column, b: Column) -> Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


# --------------------------------------------------------------------------
# Arrow-vectorized kernels, bit-identical to the fold expressions above.
#
# The HOF expressions (aggregate/zip_with/transform) are evaluated by
# Spark's interpreted lambda evaluator — ~µs per array ELEMENT — which
# makes them the constant-cost ceiling of every batch ANN path. These
# pandas UDFs replace them on the high-volume sites only (pair scoring,
# bucket signatures), keeping the EXACT float semantics: each kernel
# iterates dimensions in fold order and accumulates column vectors, so
# every row sees precisely the scalar sequence ((0+x0)+x1)+… the fold
# computes; IEEE 754 ops are deterministic, so results match the JVM —
# and therefore the DuckDB oracle — to the last ulp (equality asserted
# in tests/test_llm_ops.py::test_pandas_kernels_bit_identical).
# --------------------------------------------------------------------------


def _rows_matrix(series):
    import numpy as np

    return np.vstack([np.asarray(v, dtype=np.float64) for v in series])


def dot_pandas() -> "Column":
    """pandas_udf: fold-exact dot product of two array<double> cols."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _dot(a, b):
        import numpy as np

        if len(a) == 0:
            return pd.Series([], dtype="float64")
        A, B = _rows_matrix(a), _rows_matrix(b)
        acc = np.zeros(len(a))
        for d in range(A.shape[1]):
            acc = acc + A[:, d] * B[:, d]
        return pd.Series(acc)

    # real annotation objects: the module-wide `from __future__ import
    # annotations` would otherwise hand pyspark unresolvable strings
    _dot.__annotations__ = {"a": pd.Series, "b": pd.Series, "return": pd.Series}
    return pandas_udf(_dot, "double").asNondeterministic()


def cosine_pandas() -> "Column":
    """pandas_udf: fold-exact cosine of two array<double> cols —
    dot/(norm_a*norm_b) with the same op order as cosine_expr."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _cos(a, b):
        import numpy as np

        if len(a) == 0:
            return pd.Series([], dtype="float64")
        A, B = _rows_matrix(a), _rows_matrix(b)
        n = len(a)
        dot, na, nb = np.zeros(n), np.zeros(n), np.zeros(n)
        for d in range(A.shape[1]):
            dot = dot + A[:, d] * B[:, d]
            na = na + A[:, d] * A[:, d]
            nb = nb + B[:, d] * B[:, d]
        return pd.Series(dot / (np.sqrt(na) * np.sqrt(nb)))

    _cos.__annotations__ = {"a": pd.Series, "b": pd.Series, "return": pd.Series}
    return pandas_udf(_cos, "double").asNondeterministic()


def norm_pandas() -> "Column":
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _norm(a):
        import numpy as np

        if len(a) == 0:
            return pd.Series([], dtype="float64")
        A = _rows_matrix(a)
        acc = np.zeros(len(a))
        for d in range(A.shape[1]):
            acc = acc + A[:, d] * A[:, d]
        return pd.Series(np.sqrt(acc))

    _norm.__annotations__ = {"a": pd.Series, "return": pd.Series}
    return pandas_udf(_norm, "double").asNondeterministic()


def bucket_pandas(
    dim: int, num_planes: int, null_bucket: str | None = None
) -> "Column":
    """pandas_udf: hyperplane-sign bucket string, fold-exact per plane
    (same md5 hyperplanes and projection order as bucket_expr).

    ``null_bucket`` (e.g. ``"__null__"``): route NULL vectors to that
    bucket instead of failing — the drift monitor's semantics
    (``functions.drift.embedding_compare``); the ONE kernel serves
    both so the bit-exactness contract with the DuckDB oracle has a
    single implementation to audit."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    signs = hyperplane_signs(num_planes, dim)

    def _project(live):
        import numpy as np

        A = _rows_matrix(live)
        if A.shape[1] != dim:
            raise ValueError(
                f"bucket_pandas: vector dim {A.shape[1]} != declared "
                f"dim {dim}"
            )
        n = len(live)
        bits = []
        for plane in signs:
            acc = np.zeros(n)
            for d in range(A.shape[1]):
                acc = acc + A[:, d] * plane[d]
            bits.append(np.where(acc >= 0, "1", "0"))
        out = bits[0]
        for b in bits[1:]:
            out = np.char.add(out, b)
        return out

    def _bucket(a):
        import numpy as np

        if len(a) == 0:
            return pd.Series([], dtype="object")
        if null_bucket is None:
            return pd.Series(_project(a))
        null_mask = a.isna().to_numpy()
        out = np.full(len(a), null_bucket, dtype=object)
        live = a[~null_mask]
        if len(live):
            out[~null_mask] = _project(live)
        return pd.Series(out)

    _bucket.__annotations__ = {"a": pd.Series, "return": pd.Series}
    # asNondeterministic: joins/filters on the bucket column otherwise
    # push their inferred isnotnull(_bucket(...)) predicate BELOW the
    # projection and the kernel runs twice over the corpus (one
    # ArrowEvalPython feeding the Filter, a second feeding the Project
    # — the classic duplicated-UDF pushdown). The kernel IS pure; the
    # marker only forbids the optimizer from duplicating/reordering
    # it, yielding a single corpus pass per bucket column.
    return pandas_udf(_bucket, "string").asNondeterministic()


def cosine_topk(
    df: DataFrame,
    query_vec: list[float] | DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine similarity against one query vector.

    ``query_vec``: a Python list, or a 1-row DataFrame with ``vec_col``
    (broadcast-joined so the plan stays fully distributed).
    """
    base = df.select(F.col(id_col), _as_double(F.col(vec_col)).alias("_v"))
    if isinstance(query_vec, DataFrame):
        q = query_vec.select(_as_double(F.col(vec_col)).alias("_q"))
        joined = base.crossJoin(F.broadcast(q))
    else:
        joined = base.withColumn(
            "_q", F.array(*[F.lit(float(x)) for x in query_vec])
        )
    scored = joined.select(
        F.col(id_col), cosine_expr(F.col("_v"), F.col("_q")).alias("score")
    )
    # TakeOrderedAndProject: per-partition heaps, no global sort
    return scored.orderBy(F.col("score").desc(), F.col(id_col)).limit(k)


def hyperplane_signs(num_planes: int, dim: int) -> list[list[float]]:
    """Deterministic ±1 hyperplanes from md5 — reproducible anywhere."""
    planes = []
    for p in range(num_planes):
        hex_chars = ""
        blk = 0
        while len(hex_chars) < dim:
            hex_chars += hashlib.md5(f"plane-{p}-{blk}".encode()).hexdigest()
            blk += 1
        planes.append(
            [1.0 if int(c, 16) % 2 == 1 else -1.0 for c in hex_chars[:dim]]
        )
    return planes


def hyperplane_lsh_buckets(
    df: DataFrame,
    dim: int,
    num_planes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_col: str = "bucket",
) -> DataFrame:
    """Assign each vector a bit-string bucket from hyperplane signs.

    Corpus-wide, so the signature rides the Arrow kernel
    (``bucket_pandas``) instead of planes×dim interpreted HOF lambdas
    per row — bit-identical (see kernel block above)."""
    return df.select(
        F.col(id_col),
        bucket_pandas(dim, num_planes)(
            _as_double(F.col(vec_col))
        ).alias(out_col),
    )


def bucket_expr(vec: Column, dim: int, num_planes: int) -> Column:
    """Hyperplane-sign bucket as a pure expression over a double-array
    column — usable inline so callers never need a join to attach it."""
    signs = hyperplane_signs(num_planes, dim)
    bits = []
    for p in range(num_planes):
        plane = F.array(*[F.lit(s) for s in signs[p]])
        proj = dot_expr(vec, plane)
        bits.append(F.when(proj >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def embedding_near_dup_pairs(
    df: DataFrame,
    dim: int,
    num_planes: int | None = None,
    cosine_threshold: float = 0.2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_rows: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, LSH-bucketed.

    Candidates = vectors sharing an LSH bucket (equi-join — at 100 TB the
    bucket is a clustering key and this is the only non-linear step);
    exact cosine computed on candidates only. Output (id_a, id_b, cosine)
    with id_a < id_b.

    ``num_planes=None`` (default) auto-sizes the bucket space from the
    corpus row count so expected occupancy stays flat as the corpus
    grows (``ceil(log2(n/16))``, floor 8 — identical to the old pinned
    default under 4k vectors; 14 planes at the 200k-vector x100 run
    that measured 41.9s -> 6.9s from this one knob). Pass ``n_rows``
    to skip the count job when the size is already known.

    Single-scan design: bucket and vector norm are inline expressions on
    the one projection (no join to attach the bucket, which would be a
    whole-corpus shuffle), so the per-candidate-pair work after the
    bucket equi-join is just the dot product — the norms ride along
    precomputed. ``dot/(na*nb)`` preserves the exact fp operation order
    of ``cosine_expr``, so results are bit-identical to the oracle.
    """
    if num_planes is None:
        num_planes = auto_num_planes(
            n_rows if n_rows is not None else df.count()
        )
    v = _as_double(F.col(vec_col))
    base = df.select(
        F.col(id_col),
        v.alias("_v"),
        norm_pandas()(v).alias("_n"),
        bucket_pandas(dim, num_planes)(v).alias("bucket"),
    )
    left = base.select(
        F.col(id_col).alias("id_a"), F.col("_v").alias("_va"),
        F.col("_n").alias("_na"), "bucket",
    )
    right = base.select(
        F.col(id_col).alias("id_b"), F.col("_v").alias("_vb"),
        F.col("_n").alias("_nb"), "bucket",
    )
    pairs = (
        left.join(right, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            (
                dot_pandas()(F.col("_va"), F.col("_vb"))
                / (F.col("_na") * F.col("_nb"))
            ).alias("cosine"),
        )
    )
    return pairs.filter(F.col("cosine") >= cosine_threshold)


def ivf_centroids(
    df: DataFrame,
    num_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    with_hash: bool = False,
) -> DataFrame:
    """Deterministic IVF "coarse quantizer": pick ``num_centroids`` vectors
    from the data itself, ordered by ``md5(id)`` — a reproducible uniform
    sample (no RNG, identical in any engine). Real IVF would k-means these;
    the sampled-seed variant is the standard k-means|| init and is already
    a valid coarse quantizer. Output: (cid, cv), plus the md5 ordering
    key ``_h`` when ``with_hash`` (so a driver-side consumer can re-sort
    by the EXACT key the top-k used instead of recomputing md5 — a
    str(id) reimplementation only matches Spark's cast for integral
    ids, r12 advice).
    """
    h = F.md5(F.col(id_col).cast("string"))
    # one scan: the vector rides the top-k heap (TakeOrderedAndProject
    # keeps num_centroids rows per partition) — the former id-sample +
    # join-back shape scanned the corpus twice and paid a broadcast
    # build job per call
    out = (
        df.select(
            F.col(id_col).alias("cid"),
            _as_double(F.col(vec_col)).alias("cv"),
            h.alias("_h"),
        )
        .orderBy("_h", "cid")
        .limit(num_centroids)
    )
    return out if with_hash else out.select("cid", "cv")


def ivf_assign(
    df: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign every vector to its nearest (max-cosine) centroid.

    The centroid table is aggregated into ONE row holding an
    array<struct<cid,cv>>, broadcast, and the per-vector argmax is a pure
    expression: ``array_max`` over ``struct(score, -cid, cid)`` (struct
    comparison is field-by-field, so ties on score fall to the smallest
    cid — same ordering the old window used). Zero exchange: the whole
    assignment is a broadcast of one row plus a projection, instead of a
    whole-corpus shuffle for a per-row decision over <=16 centroids.
    Requires a numeric ``cid`` (vec_id ids) for the tie-break negation.

    Runs on the shared bit-identical Arrow kernel
    (clustering._assign_vectorized — same struct-comparison tie-break,
    same fold floats); the ≤16-row centroid table is collected and
    rides the closure, so the corpus side is scan → kernel → project
    with no join at all.
    """
    from featureform_spark.functions.clustering import _assign_vectorized

    rows = centroids.select("cid", "cv").collect()
    assigned = _assign_vectorized(df, rows, id_col, vec_col)
    return assigned.select(
        F.col(id_col), F.col("_v"), F.col("cluster").alias("cell")
    )


def ivf_topk(
    df: DataFrame,
    query_id: int,
    k: int = 10,
    num_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    lloyd_iters: int = 0,
) -> DataFrame:
    """IVF approximate top-k: probe only the ``nprobe`` cells whose
    centroids are closest to the query, exact cosine inside them.

    ``lloyd_iters`` > 0 refines the sampled coarse quantizer with that
    many k-means rounds (``functions.clustering``) before assignment —
    better-balanced cells, higher recall per probed cell, at one extra
    scan + tiny groupBy per round.

    The scale path next to LSH (`ann_topk_lsh`): centroid assignment is
    precomputable/persistable, the probe is a broadcast semi-join on the
    cell key, and scored candidates go through TakeOrderedAndProject —
    no global sort anywhere.
    """
    cents = ivf_centroids(df, num_centroids, id_col, vec_col)
    if lloyd_iters > 0:
        from featureform_spark.functions.clustering import (
            kmeans_assign,
            refine_centroids,
        )

        dim = len(df.select(vec_col).first()[0])
        assigned_r = kmeans_assign(df, cents, id_col, vec_col)
        for _ in range(lloyd_iters):
            cents = refine_centroids(assigned_r, dim).localCheckpoint(
                eager=False
            )
            assigned_r = kmeans_assign(df, cents, id_col, vec_col)
    assigned = ivf_assign(df, cents, id_col, vec_col)
    q = (
        df.filter(F.col(id_col) == query_id)
        .select(_as_double(F.col(vec_col)).alias("_q"))
    )
    probe = (
        cents.crossJoin(F.broadcast(q))
        .select("cid", cosine_expr(F.col("cv"), F.col("_q")).alias("_cs"))
        .orderBy(F.desc("_cs"), F.asc("cid"))
        .limit(nprobe)
        .select(F.col("cid").alias("cell"))
    )
    candidates = assigned.join(F.broadcast(probe), "cell")
    scored = candidates.crossJoin(F.broadcast(q)).select(
        F.col(id_col), cosine_expr(F.col("_v"), F.col("_q")).alias("score")
    )
    return scored.orderBy(F.col("score").desc(), F.col(id_col)).limit(k)


def ann_topk_lsh(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    num_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    hamming_radius: int = 0,
) -> DataFrame:
    """Approximate top-k: score only vectors in the query's LSH bucket.

    ``hamming_radius`` > 0 enables multi-probe LSH (Lv et al., VLDB'07):
    also probe every bucket within that Hamming distance of the query's
    — radius 1 turns 1 probed bucket into 1+planes, trading a linear
    candidate increase for a large recall gain (a near neighbor that
    falls on the wrong side of ONE hyperplane is recovered). The probe
    set is precomputed driver-side (it depends only on the query) and
    pushed as an IN filter, so at scale it stays a partition-prune.
    """
    dim = len(query_vec)
    buckets = hyperplane_lsh_buckets(df, dim, num_planes, id_col, vec_col)
    signs = hyperplane_signs(num_planes, dim)
    qbits = "".join(
        "1" if sum(s * x for s, x in zip(plane, query_vec)) >= 0 else "0"
        for plane in signs
    )
    probe = {qbits}
    for _ in range(hamming_radius):
        probe |= {
            b[:i] + ("0" if b[i] == "1" else "1") + b[i + 1 :]
            for b in list(probe)
            for i in range(num_planes)
        }
    candidates = df.join(
        buckets.filter(F.col("bucket").isin(sorted(probe))).select(id_col),
        id_col,
    )
    return cosine_topk(candidates, query_vec, k, id_col, vec_col)


def cosine_topk_batch(
    df: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    exclude_self: bool = False,
) -> DataFrame:
    """Exact top-k per query for a batch of queries in ONE corpus scan.

    The query set is broadcast (eval sets are small by construction), so
    scoring never shuffles the corpus; the per-query rank is a window on
    ``query_id``, which shuffles the Q×N scored rows. That makes this the
    ground-truth/eval tool — for serving-scale batches run
    ``ann_topk_lsh_batch`` instead, whose window only sees the bounded
    LSH candidate set. ``exclude_self`` drops rows where the corpus id
    equals the query id (self-matches poison retrieval ground truth).

    Output: ``(query_id, id_col, score, rank)`` with rank 1..k.
    """
    from pyspark.sql import Window

    corpus = df.select(F.col(id_col), _as_double(F.col(vec_col)).alias("_v"))
    q = queries.select(
        F.col(query_id_col), _as_double(F.col(vec_col)).alias("_q")
    )
    joined = corpus.crossJoin(F.broadcast(q))
    if exclude_self:
        joined = joined.filter(F.col(id_col) != F.col(query_id_col))
    scored = joined.select(
        F.col(query_id_col),
        F.col(id_col),
        cosine_pandas()(F.col("_v"), F.col("_q")).alias("score"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("score"), F.asc(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def ann_topk_lsh_batch(
    df: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    num_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    exclude_self: bool = False,
) -> DataFrame:
    """Approximate top-k for MANY queries at once — the serving shape.

    Corpus and queries get the same inline hyperplane bucket expression;
    candidates come from ONE bucket equi-join (queries broadcast), so the
    corpus is scanned once and never shuffled, and the per-query ranking
    window runs over the bounded candidate set only — never Q×N. This is
    the plan that survives 100 TB: scan + broadcast-hash-join + a window
    whose input is proportional to bucket occupancy, not corpus size.

    Output: ``(query_id, id_col, score, rank)`` with rank 1..k.
    """
    from pyspark.sql import Window

    corpus = df.select(
        F.col(id_col), _as_double(F.col(vec_col)).alias("_v")
    ).withColumn("_b", bucket_pandas(dim, num_planes)(F.col("_v")))
    q = queries.select(
        F.col(query_id_col), _as_double(F.col(vec_col)).alias("_q")
    ).withColumn("_b", bucket_pandas(dim, num_planes)(F.col("_q")))
    cand = corpus.join(F.broadcast(q), "_b")
    if exclude_self:
        cand = cand.filter(F.col(id_col) != F.col(query_id_col))
    scored = cand.select(
        F.col(query_id_col),
        F.col(id_col),
        cosine_pandas()(F.col("_v"), F.col("_q")).alias("score"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("score"), F.asc(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def hard_negatives(
    df: DataFrame,
    dim: int,
    k: int = 3,
    num_planes: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    n_rows: int | None = None,
) -> DataFrame:
    """Hard-negative mining for contrastive training: per anchor, the
    ``k`` most-similar vectors with a DIFFERENT label — the pairs a
    retrieval/embedding model most needs to learn to separate.

    Candidates come from the anchor's LSH bucket only (same bucketed
    equi-join as ``embedding_near_dup_pairs`` — never corpus²); ranking
    is a per-anchor window over that bounded candidate set. Output:
    ``(anchor_id, negative_id, cosine, rank)``.

    ``num_planes=None`` auto-sizes the bucket space from the corpus
    row count (same derivation and floor-8 pinned-compatibility as
    ``embedding_near_dup_pairs``), but at occupancy target 64 rather
    than near-dup's 16: mining needs each anchor's bucket to keep
    holding enough DIFFERENT-label vectors to fill k ranks, so the
    bucket space grows 4x slower than the dedup path's. Pass
    ``n_rows`` to skip the count.
    """
    from pyspark.sql import Window

    if num_planes is None:
        num_planes = auto_num_planes(
            n_rows if n_rows is not None else df.count(),
            target_bucket_rows=64,
        )
    base = df.select(
        F.col(id_col),
        F.col(label_col),
        _as_double(F.col(vec_col)).alias("_v"),
    ).withColumn("_b", bucket_pandas(dim, num_planes)(F.col("_v")))
    a = base.select(
        F.col("_b"),
        F.col(id_col).alias("anchor_id"),
        F.col(label_col).alias("_la"),
        F.col("_v").alias("_va"),
    )
    b = base.select(
        F.col("_b"),
        F.col(id_col).alias("negative_id"),
        F.col(label_col).alias("_lb"),
        F.col("_v").alias("_vb"),
    )
    pairs = (
        a.join(b, "_b")
        .filter(F.col("_la") != F.col("_lb"))
        .select(
            "anchor_id",
            "negative_id",
            cosine_pandas()(F.col("_va"), F.col("_vb")).alias("cosine"),
        )
    )
    w = Window.partitionBy("anchor_id").orderBy(
        F.desc("cosine"), F.asc("negative_id")
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("anchor_id", "negative_id", "cosine", "rank")
    )
