"""Serving-side IVF-PQ vector index: build distributed, query in RAM.

The reference's embeddinghub answers ``Nearest()`` from an hnswlib
``HierarchicalNSW`` index held in memory
(embeddinghub/embeddingstore/index.h:19-33, add/rebuild on write) —
queries never touch the storage engine. The repo's online store
previously ran an exact Spark job per ``nearest()`` call; this module
gives serving the same shape as the reference: the INDEX BUILD is a
distributed Spark pipeline (the same residual-codebook IVFADC stages
``functions.quantization.ivfpq_topk`` runs), but what reaches the
serving process is compact numpy state — ids, one cell byte and ``m``
code bytes per vector, plus (optionally, exactly like hnswlib) the raw
float32 vectors for re-ranking — and each query is pure numpy: probe
``nprobe`` cells by centroid dot products, ADC-scan only those cells'
codes, exact re-rank the short list. Microseconds per query, no Spark
job, no JVM.

Incremental ``add()`` mirrors the reference's write path: new vectors
are assigned to their coarse cell and residual-encoded against the
FROZEN codebook (the standard production IVFADC practice — codebooks
retrain offline, membership updates online).

Scale: the per-vector index payload is ~(8 + 1 + m) bytes, so 100M
vectors fit a serving pod at m=8; the optional rerank vectors dominate
(dim x 4 B) exactly as they do for hnswlib. Build-side work is the
bounded-shuffle training + zero-shuffle encode already audited in
``quantization.py``; the only driver-side collect is the index payload
itself — the same driver-side bound the reference accepts by holding
its whole index in one process.
"""

from __future__ import annotations

import threading

import numpy as np
from pyspark.sql import DataFrame, functions as F


def _l2_assign(
    df: DataFrame,
    cents_rows: list,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Euclidean cell assignment against COLLECTED centroids via one
    Arrow-batched mapInPandas pass: ``cluster = argmin ||v - c||^2 =
    argmin(c.c - 2 v.c)``, ties to the smallest cid. Centroids ride
    the closure (k x dim doubles); the corpus never shuffles. Output
    ``(id, _v, cluster)`` — the shape ``refine_centroids`` folds."""
    cents = sorted(
        (int(r["cid"]), np.asarray(r["cv"], dtype=np.float64))
        for r in cents_rows
    )
    cids = np.array([c for c, _ in cents], dtype=np.int64)
    C = np.stack([v for _, v in cents])
    cc = np.einsum("ij,ij->i", C, C)

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            V = np.stack(
                [np.asarray(x, dtype=np.float64) for x in pdf["_v"]]
            ) if len(pdf) else np.zeros((0, C.shape[1]))
            if len(pdf):
                d = cc[None, :] - 2.0 * (V @ C.T)
                best = cids[np.argmin(d, axis=1)]
            else:
                best = np.array([], dtype=np.int64)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "_v": pdf["_v"],
                    "cluster": best,
                }
            )

    from featureform_spark.functions.similarity import _as_double

    base = df.select(
        F.col(id_col), _as_double(F.col(vec_col)).alias("_v")
    )
    return base.mapInPandas(
        gen, f"{id_col} long, _v array<double>, cluster long"
    )


class IvfPqIndex:
    """In-memory IVFADC index over an embedding DataFrame.

    Thread-safe: ``add`` and ``query`` share one lock — Flight serves
    RPCs from multiple threads, and an unsynchronized ``add`` could
    leave ids/cells/codes at different lengths mid-update.
    """

    def __init__(
        self,
        centroids: np.ndarray,      # (C, dim) float64
        codebook: np.ndarray,       # (m, ksub, sub_dim) float64
        ids: np.ndarray,            # (n,) int64
        cells: np.ndarray,          # (n,) int32
        codes: np.ndarray,          # (n, m) uint8
        vectors: np.ndarray | None,  # (n, dim) float32 for re-rank
        n_codes: np.ndarray | None = None,  # (m,) real codes per subspace
        metric: str = "cosine",
    ):
        if metric not in ("cosine", "l2"):
            raise ValueError(f"unknown metric {metric!r}")
        self.centroids = centroids
        self.codebook = codebook
        self.ids = ids
        self.cells = cells
        self.codes = codes
        self.vectors = vectors
        # cell-ASSIGNMENT metric, used for routing too: probing must
        # rank cells with the same rule that placed vectors in them, or
        # the probe order systematically misses the assigned cell on
        # corpora with varying centroid norms
        self.metric = metric
        self.dim = centroids.shape[1]
        self.m = codebook.shape[0]
        self.sub_dim = self.dim // self.m
        # the trained codebook can hold FEWER than ksub real codes
        # (small build sets); the zero-filled tail must never win an
        # encode argmin — track the real count per subspace
        self.n_codes = (
            n_codes
            if n_codes is not None
            else np.full(self.m, codebook.shape[1], dtype=np.int64)
        )
        self._lock = threading.Lock()
        self._reindex()

    def _reindex(self) -> None:
        # inverted lists: cell -> row positions
        order = np.argsort(self.cells, kind="stable")
        self._order = order
        self._cell_bounds = np.searchsorted(
            self.cells[order], np.arange(len(self.centroids) + 1)
        )

    # -- build ---------------------------------------------------------------

    @classmethod
    def build(
        cls,
        df: DataFrame,
        num_cells: int = 16,
        m: int = 8,
        ksub: int = 16,
        dim: int = 64,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        keep_vectors: bool = True,
        train_iters: int = 0,
    ) -> "IvfPqIndex":
        """Distributed IVFADC build (same stages as
        ``quantization.ivfpq_topk``): md5-sampled coarse cells, one
        Lloyd round on residual subspaces, zero-shuffle encode; the
        collect is the compact index payload only.

        ``train_iters`` > 0 Lloyd-refines the COARSE centroids first
        (broadcast assignment + k-row groupBy per round, the
        clustering.kmeans_fit machinery — corpus never shuffles).
        Sampled seeds leave cells unbalanced, and cell quality is the
        recall limiter once an exact rerank is on (the true neighbor
        must merely land in a probed cell): 3 rounds are worth
        ~6-9 pts of recall@10 at the same nprobe/rerank budget on the
        near-uniform test embeddings (more on genuinely clustered
        corpora, where Lloyd actually finds structure). Default 0
        keeps the md5-seed build (bit-comparable with the in-plan
        ivfpq_topk oracle ladder)."""
        from featureform_spark.functions.quantization import (
            pq_encode,
            pq_train,
        )
        from featureform_spark.functions.similarity import (
            _as_double,
            ivf_assign,
            ivf_centroids,
        )

        if train_iters > 0:
            from featureform_spark.functions.clustering import (
                kmeans_init,
                refine_centroids,
            )
            from featureform_spark.sources.local_df import local_df

            # EUCLIDEAN Lloyd (not clustering.kmeans_fit, which is
            # spherical/cosine for semantic dedup): the index reranks
            # by L2, so cells must be carved by L2 too — assignment,
            # routing, and rerank all share one metric. Assignment is
            # a broadcast numpy argmin per round; refinement is the
            # k-row mean groupBy. The corpus never shuffles.
            cents_rows = kmeans_init(df, num_cells, id_col, vec_col).collect()
            assigned_k = _l2_assign(df, cents_rows, id_col, vec_col)
            for _ in range(train_iters):
                cents_rows = refine_centroids(assigned_k, dim).collect()
                assigned_k = _l2_assign(df, cents_rows, id_col, vec_col)
            assigned = assigned_k.select(
                F.col(id_col), F.col("cluster").alias("cell"), F.col("_v")
            )
            cents = local_df(
                df.sparkSession,
                [
                    (int(r["cid"]), [float(x) for x in r["cv"]])
                    for r in cents_rows
                ],
                "cid long, cv array<double>",
            )
            metric = "l2"
        else:
            cents = ivf_centroids(df, num_cells, id_col, vec_col)
            assigned = ivf_assign(df, cents, id_col, vec_col)
            metric = "cosine"
        cmap = cents.select(F.col("cid").alias("cell"), F.col("cv"))
        res = assigned.join(F.broadcast(cmap), "cell").select(
            F.col(id_col),
            F.col("cell"),
            F.zip_with("_v", "cv", lambda x, y: x - y).alias("_r"),
        )
        codebook_df = pq_train(
            res, dim, m, ksub, id_col, "_r",
            seed_exclude=cents.select(F.col("cid").alias(id_col)),
        )
        encoded = pq_encode(
            res, codebook_df, dim, m, id_col, "_r", carry=("cell",)
        )
        cent_rows = cents.orderBy("cid").collect()
        centroids = np.array(
            [r["cv"] for r in cent_rows], dtype=np.float64
        )
        # ivf_centroids labels cells by the sampled vector's id —
        # remap to dense 0..C-1 positions in centroid order
        cell_of = {int(r["cid"]): i for i, r in enumerate(cent_rows)}
        cb = np.zeros((m, ksub, dim // m), dtype=np.float64)
        n_codes = np.zeros(m, dtype=np.int64)
        for r in codebook_df.collect():
            cb[int(r["s"]), int(r["code"])] = r["cv"]
            n_codes[int(r["s"])] = max(
                n_codes[int(r["s"])], int(r["code"]) + 1
            )
        rows = encoded.orderBy(id_col).collect()
        ids = np.array([r[id_col] for r in rows], dtype=np.int64)
        cells = np.array(
            [cell_of[int(r["cell"])] for r in rows], dtype=np.int32
        )
        codes = np.array([r["codes"] for r in rows], dtype=np.uint8)
        vectors = None
        if keep_vectors:
            vrows = (
                df.select(F.col(id_col), _as_double(F.col(vec_col)).alias("_v"))
                .orderBy(id_col)
                .collect()
            )
            vectors = np.array([r["_v"] for r in vrows], dtype=np.float32)
        return cls(centroids, cells=cells, codebook=cb, ids=ids,
                   codes=codes, vectors=vectors, n_codes=n_codes,
                   metric=metric)

    def get(self, vid: int) -> list[float] | None:
        """Point lookup of the stored vector (embeddinghub's Get RPC);
        needs ``keep_vectors``. Latest add wins for re-added ids."""
        if self.vectors is None:
            return None
        with self._lock:
            hits = np.nonzero(self.ids == int(vid))[0]
            if len(hits) == 0:
                return None
            return [float(x) for x in self.vectors[hits[-1]]]

    # -- persistence -----------------------------------------------------------

    def save(self, path: str) -> None:
        """Persist to one ``.npz`` (pure arrays; the load path never
        unpickles, so a tampered file can't execute code)."""
        with self._lock:
            kwargs = dict(
                centroids=self.centroids,
                codebook=self.codebook,
                ids=self.ids,
                cells=self.cells,
                codes=self.codes,
                n_codes=self.n_codes,
            )
            kwargs["metric"] = np.array(self.metric)
            if self.vectors is not None:
                kwargs["vectors"] = self.vectors
            np.savez_compressed(path, **kwargs)

    @classmethod
    def load(cls, path: str) -> "IvfPqIndex":
        with np.load(path, allow_pickle=False) as z:
            return cls(
                centroids=z["centroids"],
                codebook=z["codebook"],
                ids=z["ids"],
                cells=z["cells"],
                codes=z["codes"],
                vectors=z["vectors"] if "vectors" in z else None,
                n_codes=z["n_codes"],
                # pre-metric snapshots were cosine-assigned
                metric=str(z["metric"]) if "metric" in z else "cosine",
            )

    # -- incremental write path ----------------------------------------------

    def add(self, new_ids: list[int], new_vectors: list[list[float]]) -> None:
        """Assign + residual-encode against the frozen codebook (the
        reference's index ``add``; hnswlib also mutates in place).

        UPSERT semantics: a re-added id SUPERSEDES its old entry — old
        positions are dropped before the append, so at-least-once
        streaming replays (``stream_to_ann_index``) converge instead of
        duplicating (id, vector) rows, and ``query`` can never return
        the same id twice. A batch that repeats an id keeps the LAST
        occurrence (matching ``get``'s latest-wins rule)."""
        v = np.asarray(new_vectors, dtype=np.float64)
        if v.ndim == 1:
            v = v[None, :]
        # nearest cell by the INDEX's assignment metric (cosine matches
        # ivf_assign's rule on the default build; l2 matches the
        # Lloyd-trained build) — an add that assigned differently from
        # the build would scatter a key's entries across rules
        if self.metric == "l2":
            cells = np.argmin(
                np.einsum("ij,ij->i", self.centroids, self.centroids)[
                    None, :
                ]
                - 2.0 * (v @ self.centroids.T),
                axis=1,
            ).astype(np.int32)
        else:
            vn = v / np.maximum(
                np.linalg.norm(v, axis=1, keepdims=True), 1e-30
            )
            cn = self.centroids / np.maximum(
                np.linalg.norm(self.centroids, axis=1, keepdims=True),
                1e-30,
            )
            cells = np.argmax(vn @ cn.T, axis=1).astype(np.int32)
        resid = v - self.centroids[cells]
        sub = resid.reshape(len(v), self.m, self.sub_dim)
        # per-subspace argmin over REAL codes only (the zero-filled
        # tail of an underfilled codebook must never win)
        codes = np.zeros((len(v), self.m), dtype=np.uint8)
        for s in range(self.m):
            nc = max(1, int(self.n_codes[s]))
            d = ((sub[:, s, None, :] - self.codebook[s, :nc][None]) ** 2).sum(
                axis=2
            )
            codes[:, s] = d.argmin(axis=1).astype(np.uint8)
        new_id_arr = np.asarray(new_ids, np.int64)
        # intra-batch dedup: keep the LAST occurrence of each id
        _, last = np.unique(new_id_arr[::-1], return_index=True)
        keep_new = np.sort(len(new_id_arr) - 1 - last)
        if len(keep_new) < len(new_id_arr):
            new_id_arr = new_id_arr[keep_new]
            cells = cells[keep_new]
            codes = codes[keep_new]
            v = v[keep_new]
        with self._lock:
            # supersede: drop existing entries for re-added ids
            stale = np.isin(self.ids, new_id_arr)
            if stale.any():
                live = ~stale
                self.ids = self.ids[live]
                self.cells = self.cells[live]
                self.codes = self.codes[live]
                if self.vectors is not None:
                    self.vectors = self.vectors[live]
            self.ids = np.concatenate([self.ids, new_id_arr])
            self.cells = np.concatenate([self.cells, cells])
            self.codes = np.concatenate([self.codes, codes])
            if self.vectors is not None:
                self.vectors = np.concatenate(
                    [self.vectors, v.astype(np.float32)]
                )
            self._reindex()

    # -- query ---------------------------------------------------------------

    def query(
        self,
        vector: list[float],
        k: int = 10,
        nprobe: int = 4,
        rerank: int = 100,
        allow=None,
        **_compat,
    ) -> list[tuple[int, float]]:
        """Pure-numpy IVFADC query: returns [(id, l2_distance)] — exact
        distances when re-ranking (needs ``keep_vectors``), ADC
        estimates otherwise. ``**_compat`` swallows graph-index kwargs
        (ef) so Flight treats every registered index uniformly.
        ``allow`` (set of ids or callable id->bool) masks candidates
        BEFORE top-k, so k passing results return whenever the probed
        cells hold them — filtered vector search. Under a selective
        filter the probe and rerank budgets scale by 1/selectivity
        (ACORN-style): a 20%-selective filter probes 5x the cells and
        reranks a 5x pool, because filtered top-k over an s-fraction
        of the data has the breadth of unfiltered top-(k/s). The
        selectivity is exact for collection filters (|allow|/n) and
        estimated from the first ``nprobe`` cells' pass rate for
        callables; unfiltered queries are untouched."""
        with self._lock:
            return self._query(vector, k, nprobe, rerank, allow)

    def _query(
        self,
        vector: list[float],
        k: int,
        nprobe: int,
        rerank: int,
        allow=None,
    ) -> list[tuple[int, float]]:
        q = np.asarray(vector, dtype=np.float64)
        n_cells_total = len(self.centroids)
        # route with the SAME metric that assigned vectors to cells —
        # mixing (e.g. cosine assignment + L2 routing) systematically
        # skips the assigned cell whenever centroid norms vary. l2:
        # ||q - c||^2 = ||q||^2 - 2 q.c + ||c||^2 with the constant
        # ||q||^2 dropped.
        if self.metric == "l2":
            probe_order = np.argsort(
                np.einsum("ij,ij->i", self.centroids, self.centroids)
                - 2.0 * (self.centroids @ q)
            )
        else:
            qn = q / max(float(np.linalg.norm(q)), 1e-30)
            cn = self.centroids / np.maximum(
                np.linalg.norm(self.centroids, axis=1, keepdims=True),
                1e-30,
            )
            probe_order = np.argsort(-(cn @ qn))
        ok = None
        sel = None  # estimated allow fraction
        if allow is not None:
            if isinstance(allow, (set, frozenset, dict)):
                ok = allow.__contains__
                sel = len(allow) / max(len(self.ids), 1)
            else:
                ok = allow  # callable: estimate after the first probes

        def _scaled(budget: int, s: float | None) -> int:
            # 1/selectivity scaling with a hard floor so a degenerate
            # estimate (0 allowed seen) falls back to exhaustive
            if s is None:
                return budget
            if s <= 0.0:
                return n_cells_total * max(budget, 1)
            return int(np.ceil(budget / s))

        base_probe = min(nprobe, n_cells_total)
        n_probe_eff = (
            min(n_cells_total, max(base_probe, _scaled(nprobe, sel)))
            if ok is not None
            else base_probe
        )
        cand_pos: list[np.ndarray] = []
        cand_dist: list[np.ndarray] = []
        raw_seen = kept = 0
        i = 0
        while i < n_cells_total and i < n_probe_eff:
            c = probe_order[i]
            i += 1
            lo, hi = self._cell_bounds[c], self._cell_bounds[c + 1]
            pos = self._order[lo:hi]
            raw_seen += len(pos)
            if ok is not None and len(pos):
                mask = np.fromiter(
                    (bool(ok(int(self.ids[p]))) for p in pos),
                    dtype=bool,
                    count=len(pos),
                )
                pos = pos[mask]
            if len(pos) == 0:
                if ok is not None and sel is None and i >= base_probe:
                    sel = kept / raw_seen if raw_seen else 0.0
                    n_probe_eff = min(
                        n_cells_total,
                        max(base_probe, _scaled(nprobe, sel)),
                    )
                continue
            kept += len(pos)
            qres = (q - self.centroids[c]).reshape(self.m, self.sub_dim)
            # ADC table: (m, ksub) distances from query residual subvectors
            table = ((self.codebook - qres[:, None, :]) ** 2).sum(axis=2)
            dist = table[np.arange(self.m)[None, :], self.codes[pos]].sum(
                axis=1
            )
            cand_pos.append(pos)
            cand_dist.append(dist)
            if ok is not None and sel is None and i >= base_probe:
                # callable filter: first-probe pass rate is the estimate
                sel = kept / raw_seen if raw_seen else 0.0
                n_probe_eff = min(
                    n_cells_total, max(base_probe, _scaled(nprobe, sel))
                )
        if not cand_pos:
            return []
        pos = np.concatenate(cand_pos)
        dist = np.concatenate(cand_dist)
        if self.vectors is not None and rerank > 0:
            r = max(rerank, k)
            if ok is not None:
                r = max(r, _scaled(rerank, sel if sel else None))
            top = np.argsort(dist, kind="stable")[:r]
            pos = pos[top]
            exact = ((self.vectors[pos].astype(np.float64) - q) ** 2).sum(
                axis=1
            )
            order = np.lexsort((self.ids[pos], exact))[:k]
            return [
                (int(self.ids[pos[i]]), float(exact[i])) for i in order
            ]
        order = np.lexsort((self.ids[pos], dist))[:k]
        return [(int(self.ids[pos[i]]), float(dist[i])) for i in order]

    def __len__(self) -> int:
        return len(self.ids)
