"""Product Quantization (PQ) for embedding columns.

The memory-bound path for ANN at 100 TB: instead of scanning 256 B+ of
floats per vector, train per-subspace codebooks once, encode every
vector as ``m`` small integer codes (here 8 bytes), and answer queries
by scanning only the codes with an asymmetric-distance (ADC) lookup
table (Jégou et al., "Product Quantization for Nearest Neighbor
Search", TPAMI 2011). Squared-L2 throughout, as in the paper.

Determinism / engine portability (same tricks as ``clustering.py``):

- codebook init: the ``ksub`` corpus vectors with the smallest
  ``md5(id)`` seed every subspace — no RNG;
- one Lloyd round per subspace; refined centroids are per-dimension
  means rounded to 6 decimals, pinning cross-engine floats;
- every argmin ties to the smallest centroid id via struct/ORDER BY
  comparison;
- the ADC score is a **fixed-order fold** over subspaces (not a
  groupBy SUM), so Spark and DuckDB add the same doubles in the same
  order — bit-identical scores, no rounding needed.

Scale design:

- training shuffles the exploded (vector × subspace) table once per
  Lloyd round on the (subspace, centroid) key — bounded output
  (m × ksub rows); at real scale you train on a sample anyway
  (``df.sample`` upstream, the API takes any DataFrame);
- **encoding is zero-shuffle**: the whole m-codebook set is ONE packed
  broadcast row and the per-vector code array is a pure nested-HOF
  expression — the 100 TB scan never exchanges;
- query scoring reads codes + one broadcast m×ksub lookup table and
  ends in TakeOrderedAndProject (per-partition heaps, no global sort).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from featureform_spark.functions.similarity import _as_double


def _local_relation(spark, rows: list, schema) -> DataFrame:
    """Collected rows -> a true LocalRelation (Arrow pandas path via
    ``sources.local_df``). ``createDataFrame(list_of_rows)`` builds a
    pickled-Python LogicalRDD instead — every plan evaluation of such
    a node launches a Python worker task to re-deserialize 16 rows,
    and the node carries no statistics."""
    from featureform_spark.sources.local_df import local_df

    return local_df(spark, rows, schema)


def l2sq_expr(a: Column, b: Column) -> Column:
    """Squared L2 distance as a sequential left-fold (deterministic
    summation order, mirrored by the DuckDB oracle's list_reduce)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def pq_train(
    df: DataFrame,
    dim: int,
    m: int = 8,
    ksub: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed_exclude: DataFrame | None = None,
    seed_pool: DataFrame | None = None,
    checkpoint: bool = True,
    seed_vectors: list | None = None,
) -> DataFrame:
    """Train per-subspace codebooks: md5-seeded init + one Lloyd round.

    Output ``(s, code, cv)`` with ``code`` densely renumbered 0..<count
    within each subspace (ORDER BY seed id) — ADC tables index by it.
    The only corpus-sized shuffle is the refine groupBy on
    (subspace, centroid); its output is m × ksub rows.

    ``seed_exclude`` (single ``id_col`` column) drops ids from seed
    eligibility. IVFADC needs it: the coarse quantizer samples by the
    SAME md5 order, so without the exclusion every residual-codebook
    seed would be a cell centroid whose residual is the zero vector —
    ksub identical seeds, and the one Lloyd round collapses the
    codebook to a single code.

    ``seed_pool`` (single ``id_col`` column) substitutes a cheap id
    source for seed *selection* only — seed selection touches nothing
    but ``md5(id_col)``, so when ``df`` is itself an expensive derived
    frame (IVFADC residuals: scan + assignment kernel + centroid join)
    the caller passes the raw table's id column and the seed subquery
    becomes a single-column scan instead of a full kernel pass. Must
    contain exactly the ids of ``df``.

    ``seed_vectors`` (list of ``(cid, vector)``) bypasses seed
    selection entirely for callers that already hold the seed vectors
    driver-side (``ivfpq_topk`` derives residual seeds from the same
    top-k collect that fetches the coarse centroids — zero extra
    corpus passes).

    One Lloyd round costs ONE corpus pass: the per-subspace argmin
    runs in the same Arrow numpy kernel family as ``pq_encode``
    (bit-identical to the former ``array_min(struct(l2sq, cid))`` HOF
    join — strict ``<`` over ascending cids reproduces the struct
    comparison, the per-dimension ``acc += diff*diff`` loop reproduces
    ``l2sq_expr``'s fold order), and the refine aggregation reads each
    subvector element straight from the full vector. The former
    formulation exploded the corpus 8× BEFORE assignment and evaluated
    that subtree twice more (seed-subvector fetch join + argmin join).
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    sub_dim = dim // m
    spark = df.sparkSession
    if seed_vectors is None:
        h = F.md5(F.col(id_col).cast("string"))
        if seed_exclude is None and seed_pool is None:
            # the seed VECTORS ride the md5 top-k heap — one scan, no
            # join-back (same trick as similarity.ivf_centroids)
            rows = (
                df.select(
                    F.col(id_col).alias("_sid"),
                    _as_double(F.col(vec_col)).alias("_sv"),
                    h.alias("_h"),
                )
                .orderBy("_h", "_sid")
                .limit(ksub)
                .select("_sid", "_sv")
                .collect()
            )
        else:
            pool = seed_pool if seed_pool is not None else df
            if seed_exclude is not None:
                pool = pool.join(
                    F.broadcast(seed_exclude.select(id_col)),
                    id_col,
                    "left_anti",
                )
            sids = (
                pool.select(F.col(id_col), h.alias("_h"))
                .orderBy("_h", id_col)
                .limit(ksub)
                .select(id_col)
            )
            rows = (
                df.join(F.broadcast(sids), id_col)
                .select(
                    F.col(id_col).alias("_sid"),
                    _as_double(F.col(vec_col)).alias("_sv"),
                )
                .collect()
            )
        seed_vectors = [(r["_sid"], r["_sv"]) for r in rows]
    seeds = sorted(
        (int(cid), np.asarray(v, dtype=np.float64))
        for cid, v in seed_vectors
    )
    if not seeds:
        return _local_relation(
            spark, [], "s int, code int, cv array<double>"
        )
    seed_cids = [cid for cid, _ in seeds]
    seed_subs = [
        [v[s * sub_dim : (s + 1) * sub_dim] for _, v in seeds]
        for s in range(m)
    ]

    def _asg(a):
        if len(a) == 0:
            return pd.Series([], dtype="object")
        vals = a.values
        ok = [v is not None for v in vals]
        out_list: list = [None] * len(vals)
        if any(ok):
            V = np.vstack(
                [
                    np.asarray(v, dtype=np.float64)
                    for v, keep in zip(vals, ok)
                    if keep
                ]
            )
            n = V.shape[0]
            codes = np.zeros((n, m), dtype=np.int64)
            for s in range(m):
                Vs = V[:, s * sub_dim : (s + 1) * sub_dim]
                best_d = np.full(n, np.inf)
                best_c = np.full(n, seed_cids[0], dtype=np.int64)
                for cid, cv in zip(seed_cids, seed_subs[s]):
                    acc = np.zeros(n)
                    for d in range(sub_dim):
                        diff = Vs[:, d] - cv[d]
                        acc = acc + diff * diff
                    take = acc < best_d  # strict: ties keep smaller cid
                    best_d = np.where(take, acc, best_d)
                    best_c = np.where(take, cid, best_c)
                codes[:, s] = best_c
            it = iter(codes)
            out_list = [next(it) if keep else None for keep in ok]
        return pd.Series(out_list)

    _asg.__annotations__ = {"a": pd.Series, "return": pd.Series}
    asg = pandas_udf(_asg, "array<long>")

    a0 = (
        df.select(_as_double(F.col(vec_col)).alias("_v"))
        .select(F.col("_v"), asg(F.col("_v")).alias("_cids"))
        .select(F.col("_v"), F.posexplode(F.col("_cids")).alias("s", "cid"))
    )
    sv = lambda i: F.element_at(  # noqa: E731
        F.col("_v"), F.col("s") * sub_dim + i + 1
    )
    avgs = [
        F.round(F.avg(sv(i)), 6).alias(f"_d{i}") for i in range(sub_dim)
    ]
    c1 = (
        a0.groupBy("s", "cid")
        .agg(*avgs)
        .select(
            "s",
            "cid",
            F.array(*[F.col(f"_d{i}") for i in range(sub_dim)]).alias("cv"),
        )
    )
    # dense renumber (a seed centroid can lose every member); 128-row table
    w = Window.partitionBy("s").orderBy("cid")
    out = c1.select("s", (F.row_number().over(w) - 1).alias("code"), "cv")
    # checkpoint=False for callers that collect the codebook right away
    # (ivfpq_topk/pq_topk turn it into a LocalRelation): materializing
    # checkpoint blocks for a single consumer is pure overhead
    return out.localCheckpoint(eager=False) if checkpoint else out


def pq_encode(
    df: DataFrame,
    codebook: DataFrame,
    dim: int,
    m: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """Encode every vector as an array of m codes — ZERO shuffle.

    The codebook is m×ksub rows (metadata scale); it rides the encode
    closure and the per-vector code assignment runs in an Arrow-batched
    numpy kernel that reproduces the ``array_min(struct(l2sq, code))``
    expression exactly: the squared-L2 fold iterates subspace
    dimensions in fold order over column vectors (``acc += diff*diff``
    — the scalar sequence of ``l2sq_expr``), and the strict ``<``
    argmin over ascending codes keeps the smallest code on ties, same
    as the struct comparison (and the DuckDB oracle's ORDER BY d,
    code). Replaces m × ksub interpreted HOF folds per row — the HOF
    evaluator charged ~1k lambda calls per vector. Output ``(id, codes
    array<int>)`` — the 8-byte index record.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    sub_dim = dim // m
    cb: dict[int, list] = {}
    for r in codebook.select("s", "code", "cv").collect():
        cb.setdefault(int(r["s"]), []).append(
            (int(r["code"]), np.asarray(r["cv"], dtype=np.float64))
        )
    for s in cb:
        cb[s].sort()

    def _enc(a):
        if len(a) == 0:
            return pd.Series([], dtype="object")
        V = np.vstack([np.asarray(v, dtype=np.float64) for v in a])
        n = len(a)
        out = np.zeros((n, m), dtype=np.int32)
        for s in range(m):
            Vs = V[:, s * sub_dim : (s + 1) * sub_dim]
            best_d = np.full(n, np.inf)
            best_c = np.zeros(n, dtype=np.int32)
            for code, cv in cb.get(s, []):
                acc = np.zeros(n)
                for d in range(sub_dim):
                    diff = Vs[:, d] - cv[d]
                    acc = acc + diff * diff
                take = acc < best_d  # strict: ties keep smaller code
                best_d = np.where(take, acc, best_d)
                best_c = np.where(take, code, best_c)
            out[:, s] = best_c
        return pd.Series([row for row in out])

    _enc.__annotations__ = {"a": pd.Series, "return": pd.Series}
    enc = pandas_udf(_enc, "array<int>")
    return df.select(
        F.col(id_col),
        *[F.col(c) for c in carry],
        enc(_as_double(F.col(vec_col))).alias("codes"),
    )


def pq_topk(
    df: DataFrame,
    query_id: int,
    k: int = 10,
    dim: int = 64,
    m: int = 8,
    ksub: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ADC top-k: train, encode, then score every vector as a
    fixed-order fold over its codes against the query's m×ksub
    distance-lookup table. Returns ``(id, adc_dist)`` ascending.

    The scan side touches only (id, codes); the float math happens once
    per (subspace, centroid) in the tiny broadcast table — this is the
    plan shape that survives a 100 TB corpus.
    """
    sub_dim = dim // m
    # NOTE: pq_topk keeps the lazy-localCheckpoint codebook (pq_encode's
    # collect materializes it once; the ADC table reads the checkpoint).
    # The eager collect + LocalRelation variant used by ivfpq_topk was
    # A/B-probed here and consistently LOST (~2.5s -> ~2.8s min-of-5 at
    # sf0.1) — the checkpoint already dedups the train subtree and the
    # extra eager job only adds latency in this single-level path.
    codebook = pq_train(df, dim, m, ksub, id_col, vec_col)
    encoded = pq_encode(df, codebook, dim, m, id_col, vec_col)
    # one-row query vector, collected once (see ivfpq_topk): the ADC
    # table crossJoin otherwise re-scans the corpus for a single row
    q_rows = df.filter(F.col(id_col) == query_id).select(
        _as_double(F.col(vec_col)).alias("_q")
    )
    q = df.sparkSession.createDataFrame(q_rows.collect(), q_rows.schema)
    # per-subspace distance lists ordered by code, then a list of lists
    # ordered by s — ragged-safe positional lookup dtab[s][code]
    dt = codebook.crossJoin(F.broadcast(q)).select(
        "s",
        "code",
        l2sq_expr(
            F.col("cv"),
            F.slice(F.col("_q"), F.col("s") * sub_dim + 1, sub_dim),
        ).alias("d"),
    )
    dtab = (
        dt.groupBy("s")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("code", "d"))),
                lambda x: x["d"],
            ).alias("ds")
        )
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("s", "ds"))),
                lambda x: x["ds"],
            ).alias("_dtab")
        )
    )
    score = F.aggregate(
        F.sequence(F.lit(0), F.lit(m - 1)),
        F.lit(0.0),
        lambda acc, s: acc
        + F.element_at(
            F.element_at(F.col("_dtab"), s + 1),
            F.element_at(F.col("codes"), s + 1) + 1,
        ),
    )
    scored = encoded.crossJoin(F.broadcast(dtab)).select(
        F.col(id_col), score.alias("adc_dist")
    )
    return scored.orderBy(F.col("adc_dist").asc(), F.col(id_col)).limit(k)


def ivfpq_topk(
    df: DataFrame,
    query_id: int,
    k: int = 10,
    dim: int = 64,
    num_cells: int = 16,
    nprobe: int = 4,
    m: int = 8,
    ksub: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rerank: int = 0,
    where=None,
) -> DataFrame:
    """IVFADC (Jégou et al. 2011, §V): the production composition of
    the two halves this module and ``similarity`` already ship —
    IVF coarse cells bound the scan to ``nprobe`` inverted lists,
    and a PQ codebook trained on the RESIDUALS (vector minus its
    cell centroid) scores candidates from 8-byte codes via one
    asymmetric-distance table per probed cell. This is the recall
    role the reference's embeddinghub fills with an hnswlib
    ``HierarchicalNSW`` index (embeddinghub/embeddingstore/
    index.h:19-33), at a scale a single-node graph index can't reach.

    Residuals concentrate the quantizer's dynamic range around each
    cell, so the same m×ksub code budget yields materially lower
    quantization error than PQ over raw vectors — one SHARED residual
    codebook across cells, per the paper.

    Determinism (cross-engine hash parity): coarse cells are the
    md5-sampled quantizer of ``ivf_centroids``; assignment runs the
    bit-identical Arrow kernel; residual subtraction is elementwise;
    PQ train/encode reuse the fixed-fold-order kernels; the per-cell
    ADC score is a fixed-order fold over subspaces.

    Scale shape: one bounded shuffle to train the codebook (exploded
    residual × subspace, m×ksub output), ZERO-shuffle encode (packed
    broadcast codebook), and a query side that is broadcast joins on
    the cell key ending in TakeOrderedAndProject — no corpus shuffle,
    no global sort. The scan reads (id, cell, codes): ~12 bytes per
    vector instead of dim×8.

    ``where`` (a Column predicate over ``df``) is filtered vector
    search: candidates are masked BEFORE top-k via a broadcast
    semi-join on the allowed ids, and — ACORN-style — the probe and
    rerank budgets scale by the observed 1/selectivity (one cheap
    aggregate measures the allow fraction), because filtered top-k
    over an s-fraction of the corpus has the breadth of unfiltered
    top-(k/s). A fully-unselective predicate degrades to an
    exhaustive ADC scan, which is the honest cost ceiling.
    """
    from concurrent.futures import ThreadPoolExecutor

    from featureform_spark.functions.clustering import _assign_vectorized
    from featureform_spark.functions.similarity import (
        cosine_expr,
        ivf_centroids,
    )

    spark = df.sparkSession
    sub_dim = dim // m
    # The coarse quantizer is ≤num_cells rows but its DataFrame is a
    # corpus-scan subtree; every downstream consumer (assignment
    # kernel, residual cmap join, seed exclusion, probe ranking) would
    # re-evaluate that subtree — the _before_ plan carried 14 parquet
    # scans for a 16-row table. Collect it ONCE (the assignment kernel
    # needs driver-side rows anyway) and serve every other consumer
    # from a 16-row local relation. The SAME top-k is extended by ksub
    # rows to yield the PQ seed vectors: the residual codebook's seeds
    # are the ksub smallest-md5 ids NOT among the centroids, which is
    # exactly positions num_cells..num_cells+ksub-1 of this ordering —
    # the former seed-exclusion anti-join and its full residual-frame
    # fetch pass disappear.
    cents = ivf_centroids(
        df, num_cells + ksub, id_col, vec_col, with_hash=True
    )
    # one-row query vector, needed driver-side for the probe/ADC
    # broadcasts. When a filter predicate is present it RIDES the
    # selectivity aggregate's corpus scan (first(when(id = query)) —
    # exactly one row can match); otherwise it is its own pruned scan.
    # Either way the independent driver actions here (centroid top-k,
    # selectivity/query aggregate) overlap in a 2-thread pool — the
    # actions are sequential only because driver code calls them
    # sequentially (guide §2.6), and each is a sub-second job whose
    # latency would otherwise add up.
    q_sel_df = (
        df.agg(
            F.count(F.lit(1)).alias("_tot"),
            F.count(F.when(where, F.lit(1))).alias("_ok"),
            F.first(
                F.when(
                    F.col(id_col) == query_id, _as_double(F.col(vec_col))
                ),
                ignorenulls=True,
            ).alias("_q"),
        )
        if where is not None
        else df.filter(F.col(id_col) == query_id).select(
            _as_double(F.col(vec_col)).alias("_q")
        )
    )
    with ThreadPoolExecutor(max_workers=2) as pool:
        f_cents = pool.submit(cents.collect)
        f_q = pool.submit(q_sel_df.collect)
        top_rows = f_cents.result()
        q_sel_rows = f_q.result()
    # split centroids from PQ seeds by the same (md5, id) order the
    # top-k used — re-sort on the COLLECTED `_h` column, the very key
    # Spark ordered by, so the split is exact for any id type (a
    # driver-side hashlib.md5(str(id)) reimplementation only matched
    # Spark's md5(cast(id as string)) for integral ids — r12 advice).
    # Belt-and-braces: TakeOrderedAndProject already returns sorted.
    import numpy as np

    top_rows = sorted(top_rows, key=lambda r: (r["_h"], r["cid"]))
    cent_rows = top_rows[:num_cells]
    seed_raw = top_rows[num_cells:]

    allowed = None
    if where is not None:
        row = q_sel_rows[0]
        tot, n_ok = row["_tot"], row["_ok"]
        q_vals = [] if row["_q"] is None else [(row["_q"],)]
        sel = (n_ok / tot) if tot else 0.0
        if sel <= 0.0:
            nprobe = num_cells  # vacuous filter: result is empty anyway
        else:
            nprobe = min(
                num_cells, max(nprobe, int(-(-nprobe // sel)))
            )
            if rerank > 0:
                rerank = max(rerank, int(-(-rerank // sel)))
        allowed = df.filter(where).select(id_col)
    else:
        q_vals = [(r["_q"],) for r in q_sel_rows]

    cents_local = _local_relation(
        spark,
        [(r["cid"], r["cv"]) for r in cent_rows],
        cents.select("cid", "cv").schema,
    )
    q = _local_relation(spark, q_vals, "_q array<double>")
    assigned = _assign_vectorized(df, cent_rows, id_col, vec_col).select(
        F.col(id_col), F.col("_v"), F.col("cluster").alias("cell")
    )  # (id, _v, cell) — same contract as similarity.ivf_assign
    cmap = cents_local.select(F.col("cid").alias("cell"), F.col("cv"))
    res = assigned.join(F.broadcast(cmap), "cell").select(
        F.col(id_col),
        F.col("cell"),
        F.zip_with("_v", "cv", lambda x, y: x - y).alias("_r"),
    )
    # seed residuals computed DRIVER-side from the rows already
    # collected: assignment via the very scalar sequence the
    # distributed kernel runs (_cosine_argmax_batch), subtraction is
    # the same elementwise float64 op as the zip_with — bit-identical
    # to evaluating `res` for the seed ids, without the full
    # scan + assignment-kernel + residual-join pass that fetch cost
    from featureform_spark.functions.clustering import (
        _cents_with_norms,
        _cosine_argmax_batch,
    )

    seed_vectors: list = []
    if seed_raw:
        cents_trip = _cents_with_norms(cent_rows)
        sv_mat = np.vstack(
            [np.asarray(r["cv"], dtype=np.float64) for r in seed_raw]
        )
        best, _nv = _cosine_argmax_batch(sv_mat, cents_trip)
        cvec = {cid: cv for cid, cv, _n in cents_trip}
        seed_vectors = [
            (int(r["cid"]), sv_mat[i] - cvec[int(best[i])])
            for i, r in enumerate(seed_raw)
        ]
    codebook = pq_train(
        res, dim, m, ksub, id_col, "_r",
        seed_vectors=seed_vectors,
        checkpoint=False,
    )
    # m×ksub rows; pq_encode collects them anyway — do it once and let
    # the ADC-table consumers read a LocalRelation instead of the
    # checkpointed-RDD scan (which pays a task launch per evaluation)
    codebook = _local_relation(
        spark, codebook.collect(), codebook.schema
    )
    encoded = pq_encode(
        res, codebook, dim, m, id_col, "_r", carry=("cell",)
    )
    probe = (
        cents_local.crossJoin(F.broadcast(q))
        .select(
            "cid", "cv",
            cosine_expr(F.col("cv"), F.col("_q")).alias("_cs"),
        )
        .orderBy(F.desc("_cs"), F.asc("cid"))
        .limit(nprobe)
        .select(F.col("cid").alias("cell"), "cv")
    )
    # per-probed-cell query residual → one ADC lookup table per cell
    # (nprobe × m × ksub doubles — metadata scale, broadcast)
    qres = probe.crossJoin(F.broadcast(q)).select(
        "cell", F.zip_with("_q", "cv", lambda x, y: x - y).alias("_qr")
    )
    dt = codebook.crossJoin(F.broadcast(qres)).select(
        "cell",
        "s",
        "code",
        l2sq_expr(
            F.col("cv"),
            F.slice(F.col("_qr"), F.col("s") * sub_dim + 1, sub_dim),
        ).alias("d"),
    )
    dtab = (
        dt.groupBy("cell", "s")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("code", "d"))),
                lambda x: x["d"],
            ).alias("ds")
        )
        .groupBy("cell")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("s", "ds"))),
                lambda x: x["ds"],
            ).alias("_dtab")
        )
    )
    score = F.aggregate(
        F.sequence(F.lit(0), F.lit(m - 1)),
        F.lit(0.0),
        lambda acc, s: acc
        + F.element_at(
            F.element_at(F.col("_dtab"), s + 1),
            F.element_at(F.col("codes"), s + 1) + 1,
        ),
    )
    scored = encoded.join(F.broadcast(dtab), "cell").select(
        F.col(id_col), score.alias("adc_dist")
    )
    if allowed is not None:
        # mask BEFORE top-k so k passing results return whenever the
        # probed cells hold them
        scored = scored.join(F.broadcast(allowed), id_col, "left_semi")
    if rerank <= 0:
        return scored.orderBy(
            F.col("adc_dist").asc(), F.col(id_col)
        ).limit(k)
    # IVFADC-R (paper §V-D): exact re-rank of the top-``rerank`` ADC
    # candidates recovers most of the recall the quantizer loses —
    # the exact math runs on ≤R rows (broadcast semi-join back to the
    # corpus scan), so the code-only scan economics are unchanged
    cand = (
        scored.orderBy(F.col("adc_dist").asc(), F.col(id_col))
        .limit(max(rerank, k))
        .select(id_col)
    )
    exact = df.join(F.broadcast(cand), id_col).select(
        F.col(id_col), _as_double(F.col(vec_col)).alias("_v")
    )
    rescored = exact.crossJoin(F.broadcast(q)).select(
        F.col(id_col),
        l2sq_expr(F.col("_v"), F.col("_q")).alias("dist"),
    )
    return rescored.orderBy(F.col("dist").asc(), F.col(id_col)).limit(k)
