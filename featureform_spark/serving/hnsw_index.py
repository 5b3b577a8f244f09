"""Serving-side HNSW graph index: the reference's actual ANN structure.

The reference's embeddinghub answers ``Nearest()`` from an hnswlib
``HierarchicalNSW`` graph held in memory
(embeddinghub/embeddingstore/index.h:19-33, ``add``/``rebuild`` on every
write) — a hierarchical navigable-small-world graph per Malkov &
Yashunin 2016 ("Efficient and robust approximate nearest neighbor
search using Hierarchical Navigable Small World graphs"). This module
is that structure re-implemented from the public paper in numpy: a
multi-layer proximity graph where upper layers are an exponentially
sparser expressway (geometric level assignment, mL = 1/ln(M)), greedy
descent picks the entry point, and a beam of width ``ef`` over layer 0
yields the candidates. Recall at equal candidate budget beats the
IVF/IVFADC cell probes in ``ann_index.py`` because the graph walk
adapts to the query's neighborhood instead of committing to ``nprobe``
fixed cells.

Two build paths:

- ``HnswIndex.build(df)`` — single graph, sequential inserts on the
  driver. The collect is the index payload itself, the same
  driver-side bound the reference accepts by holding its whole hnswlib
  index in one process.
- ``ShardedHnsw.build(df, shards=N)`` — the 100-TB path: vectors are
  hash-sharded, each shard builds an INDEPENDENT graph executor-side
  (``groupBy().applyInPandas``, one serialized blob per shard), and
  the serving process fans each query out to every shard and merges
  top-k. Build is embarrassingly parallel (graph inserts never cross
  shards), shard blobs are the only thing collected, and per-shard
  memory is bounded at n/N vectors — the standard segment design of
  production vector stores. Query cost is shards × one beam, each
  over an n/N graph, so total distance evaluations stay ~constant.

Determinism: hnswlib draws levels from an RNG; we derive the level
from md5(id) instead, so the same (ids, vectors) always build the same
graph and tests can pin exact results.

Distances are squared L2 over float64 (matching ``IvfPqIndex``'s
re-rank metric), computed in vectorized numpy batches per visited
node's neighbor list.
"""

from __future__ import annotations

import hashlib
import heapq
import math
import pickle
import threading

import numpy as np

__all__ = ["HnswIndex", "ShardedHnsw"]


def _level_for(vid: int, m_l: float, cap: int = 32) -> int:
    """Deterministic geometric level: u ~ U(0,1) from md5(id),
    level = floor(-ln(u) * mL) (the paper's draw, derandomized)."""
    h = hashlib.md5(f"hnsw:{vid}".encode()).digest()
    u = (int.from_bytes(h[:8], "big") + 1) / float(2**64 + 1)
    return min(cap, int(-math.log(u) * m_l))


class HnswIndex:
    """In-memory hierarchical NSW graph over (id, vector) pairs.

    Thread-safe like ``IvfPqIndex``: ``add`` and ``query`` share one
    lock (Flight serves RPCs from multiple threads).
    """

    def __init__(self, dim: int, m: int = 16, ef_construction: int = 100):
        if m < 2:
            raise ValueError(f"M must be >= 2, got {m}")
        self.dim = dim
        self.m = m
        self.m0 = 2 * m
        self.ef_construction = max(ef_construction, m)
        self.m_l = 1.0 / math.log(m)
        self.ids = np.empty(0, dtype=np.int64)
        self.vectors = np.empty((0, dim), dtype=np.float32)
        self.levels: list[int] = []
        # per node: list of per-layer neighbor lists (layer 0 first)
        self.links: list[list[list[int]]] = []
        # soft-delete flags (hnswlib markDelete): superseded nodes stay
        # in the graph as routing waypoints but never appear in results
        self.alive: list[bool] = []
        self._pos_of: dict[int, int] = {}  # id -> live node position
        self.entry: int = -1  # node position, not id
        self.top_level: int = -1
        self._lock = threading.Lock()

    # -- distance ----------------------------------------------------------

    def _dist_many(self, q: np.ndarray, pos: np.ndarray) -> np.ndarray:
        d = self.vectors[pos].astype(np.float64) - q
        return (d * d).sum(axis=1)

    # -- core beam search (paper's SEARCH-LAYER) ----------------------------

    def _search_layer(
        self, q: np.ndarray, eps: list[int], ef: int, layer: int
    ) -> list[tuple[float, int]]:
        """Beam search on one layer from entry points ``eps``; returns
        up to ``ef`` (dist, pos) pairs, unsorted heap order."""
        visited = set(eps)
        ep_d = self._dist_many(q, np.asarray(eps, dtype=np.int64))
        # candidates: min-heap by distance; results: max-heap (negated)
        cand = [(float(d), p) for d, p in zip(ep_d, eps)]
        heapq.heapify(cand)
        res = [(-float(d), p) for d, p in zip(ep_d, eps)]
        heapq.heapify(res)
        while len(res) > ef:
            heapq.heappop(res)
        while cand:
            d_c, c = heapq.heappop(cand)
            if d_c > -res[0][0] and len(res) >= ef:
                break
            fresh = [
                n for n in self.links[c][layer] if n not in visited
            ]
            if not fresh:
                continue
            visited.update(fresh)
            dists = self._dist_many(q, np.asarray(fresh, dtype=np.int64))
            bound = -res[0][0]
            for d_n, n in zip(dists, fresh):
                d_n = float(d_n)
                if len(res) < ef or d_n < bound:
                    heapq.heappush(cand, (d_n, n))
                    heapq.heappush(res, (-d_n, n))
                    if len(res) > ef:
                        heapq.heappop(res)
                    bound = -res[0][0]
        return [(-nd, p) for nd, p in res]

    # -- neighbor selection (paper's SELECT-NEIGHBORS-HEURISTIC) ------------

    def _select(
        self, q: np.ndarray, cands: list[tuple[float, int]], m: int
    ) -> list[int]:
        """Keep a candidate only if it is closer to q than to every
        already-kept neighbor — the diversity heuristic that keeps the
        graph navigable on clustered data."""
        out: list[int] = []
        for d_c, c in sorted(cands):
            if len(out) >= m:
                break
            if not out:
                out.append(c)
                continue
            cv = self.vectors[c].astype(np.float64)
            dd = self.vectors[np.asarray(out)].astype(np.float64) - cv
            if float((dd * dd).sum(axis=1).min()) >= d_c:
                out.append(c)
        return out

    # -- insert --------------------------------------------------------------

    def _link(self, pos: int, vid: int, vec: np.ndarray) -> None:
        """Wire node ``pos`` (vector already appended) into the graph."""
        level = _level_for(vid, self.m_l)
        self.levels.append(level)
        self.links.append([[] for _ in range(level + 1)])
        if self.entry < 0:
            self.entry, self.top_level = pos, level
            return
        q = vec.astype(np.float64)
        ep = [self.entry]
        # greedy descent through layers above the node's level
        for layer in range(self.top_level, level, -1):
            ep = [min(self._search_layer(q, ep, 1, layer))[1]]
        for layer in range(min(self.top_level, level), -1, -1):
            w = self._search_layer(q, ep, self.ef_construction, layer)
            m_max = self.m0 if layer == 0 else self.m
            neigh = self._select(q, w, self.m)
            self.links[pos][layer] = list(neigh)
            for n in neigh:
                nl = self.links[n][layer]
                nl.append(pos)
                if len(nl) > m_max:
                    # re-select the neighbor's links with the same
                    # heuristic (paper's shrink step)
                    nv = self.vectors[n].astype(np.float64)
                    nd = self._dist_many(nv, np.asarray(nl))
                    self.links[n][layer] = self._select(
                        nv, list(zip(nd.tolist(), nl)), m_max
                    )
            ep = [p for _, p in sorted(w)]
        if level > self.top_level:
            self.entry, self.top_level = pos, level

    # -- public API ------------------------------------------------------------

    def add(self, new_ids, new_vectors) -> None:
        """Incremental UPSERT (the reference index's write path is a
        key->vector Set): re-adding an existing id soft-deletes the old
        node (it keeps routing, like hnswlib markDelete, but never
        appears in results) and inserts the new vector.

        All inputs are validated BEFORE any state mutates — a malformed
        batch (dim mismatch, ragged lists, id/vector count skew) raises
        and leaves the index exactly as it was. Vectors are appended in
        ONE array concat per call (per-insert vstack would be O(n²)
        copying), then each node is wired in sequentially."""
        v = np.asarray(new_vectors, dtype=np.float64)
        if v.ndim == 1:
            v = v[None, :]
        if v.shape[0] == 0:
            return
        if v.ndim != 2 or v.shape[1] != self.dim:
            raise ValueError(
                f"expected vectors of dim {self.dim}, got shape {v.shape}"
            )
        ids_arr = np.asarray([int(x) for x in new_ids], dtype=np.int64)
        if len(ids_arr) != v.shape[0]:
            raise ValueError(
                f"{len(ids_arr)} ids for {v.shape[0]} vectors"
            )
        with self._lock:
            start = len(self.levels)
            self.ids = np.concatenate([self.ids, ids_arr])
            self.vectors = np.vstack([self.vectors, v.astype(np.float32)])
            for i, vid in enumerate(ids_arr.tolist()):
                old = self._pos_of.get(vid)
                if old is not None:
                    self.alive[old] = False
                self.alive.append(True)
                self._pos_of[vid] = start + i
                self._link(start + i, vid, v[i])

    def query(
        self, vector, k: int = 10, ef: int = 64, allow=None, **_compat
    ) -> list[tuple[int, float]]:
        """Return [(id, squared_l2)] of the ~k nearest. ``**_compat``
        swallows IVF-style kwargs (nprobe/rerank) so Flight can treat
        every registered index uniformly.

        Soft-deleted nodes are routing-only: they are filtered AFTER
        the beam search, so the effective ``ef`` is scaled up by the
        deleted fraction and doubled until k live results (or the
        whole graph) — hnswlib's equivalent of continuing the search
        past deleted elements. Without this, a heavily upserted index
        could return fewer than k live results even when k exist.

        ``allow`` is the FILTERED-SEARCH hook (a set/frozenset of ids
        or a callable id->bool): disallowed nodes stay routing-only,
        exactly like soft-deleted ones, and the same ef-doubling loop
        guarantees k passing results whenever k exist — the
        metadata-filtered vector search every production store needs
        (same-domain dedup, per-tenant retrieval)."""
        ok = None
        if allow is not None:
            ok = (
                allow.__contains__
                if isinstance(allow, (set, frozenset, dict))
                else allow
            )
        with self._lock:
            if self.entry < 0:
                return []
            n_total = len(self.alive)
            n_live = len(self._pos_of)
            if n_live == 0:
                return []
            q = np.asarray(vector, dtype=np.float64)
            ep = [self.entry]
            for layer in range(self.top_level, 0, -1):
                ep = [min(self._search_layer(q, ep, 1, layer))[1]]
            eff = max(int(ef), k)
            if n_live < n_total:
                eff = min(n_total, -(-eff * n_total // n_live))
            while True:
                w = self._search_layer(q, ep, eff, 0)
                live = [
                    (d, p)
                    for d, p in w
                    if self.alive[p]
                    and (ok is None or ok(int(self.ids[p])))
                ]
                if len(live) >= k or eff >= n_total:
                    break
                eff = min(n_total, eff * 2)
            if not live:
                return []
            pos = np.asarray([p for _, p in live], dtype=np.int64)
            dist = np.asarray([d for d, _ in live])
            order = np.lexsort((self.ids[pos], dist))[:k]
            return [
                (int(self.ids[pos[i]]), float(dist[i])) for i in order
            ]

    def __len__(self) -> int:
        """Live element count (soft-deleted nodes excluded)."""
        return len(self._pos_of)

    def get(self, vid: int) -> list[float] | None:
        """Point lookup of the LIVE vector for an id (embeddinghub's
        Get RPC); None when absent or superseded-and-not-re-added."""
        with self._lock:
            pos = self._pos_of.get(int(vid))
            if pos is None:
                return None
            return [float(x) for x in self.vectors[pos]]

    def centroid(self) -> np.ndarray | None:
        """Mean of the LIVE vectors (float64); None when empty. Cached
        per node-count epoch — adds invalidate it."""
        with self._lock:
            epoch = len(self.levels)
            cached = getattr(self, "_centroid_cache", None)
            if cached is not None and cached[0] == epoch:
                return cached[1]
            if not self._pos_of:
                return None
            pos = np.fromiter(
                self._pos_of.values(), dtype=np.int64, count=len(self._pos_of)
            )
            c = self.vectors[pos].astype(np.float64).mean(axis=0)
            self._centroid_cache = (epoch, c)
            return c

    # -- (de)serialization for the sharded executor-side build ---------------

    def to_state(self) -> dict:
        return {
            "dim": self.dim,
            "m": self.m,
            "ef_construction": self.ef_construction,
            "ids": self.ids,
            "vectors": self.vectors,
            "levels": self.levels,
            "links": self.links,
            "alive": self.alive,
            "entry": self.entry,
            "top_level": self.top_level,
        }

    @classmethod
    def from_state(cls, st: dict) -> "HnswIndex":
        ix = cls(st["dim"], st["m"], st["ef_construction"])
        ix.ids = np.asarray(st["ids"], dtype=np.int64)
        ix.vectors = np.asarray(st["vectors"], dtype=np.float32)
        ix.levels = list(st["levels"])
        ix.links = st["links"]
        ix.alive = list(st.get("alive", [True] * len(ix.levels)))
        ix._pos_of = {
            int(ix.ids[p]): p for p, a in enumerate(ix.alive) if a
        }
        ix.entry = st["entry"]
        ix.top_level = st["top_level"]
        return ix

    def save(self, path: str) -> None:
        """Persist to one ``.npz`` (hnswlib saveIndex parity). Arrays go
        in natively; graph structure rides as JSON — the LOAD path never
        unpickles, so a tampered file can't execute code."""
        import json

        import numpy as _np

        meta = {
            "dim": self.dim,
            "m": self.m,
            "ef_construction": self.ef_construction,
            "levels": self.levels,
            "links": self.links,
            "alive": self.alive,
            "entry": self.entry,
            "top_level": self.top_level,
        }
        with self._lock:
            _np.savez_compressed(
                path,
                ids=self.ids,
                vectors=self.vectors,
                meta=_np.frombuffer(
                    json.dumps(meta).encode(), dtype=_np.uint8
                ),
            )

    @classmethod
    def load(cls, path: str) -> "HnswIndex":
        import json

        import numpy as _np

        with _np.load(path, allow_pickle=False) as z:
            meta = json.loads(bytes(z["meta"]).decode())
            st = dict(meta, ids=z["ids"], vectors=z["vectors"])
        return cls.from_state(st)

    @classmethod
    def build(
        cls,
        df,
        m: int = 16,
        ef_construction: int = 100,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> "HnswIndex":
        """Single-graph build: collect (id, vector) in id order (the
        driver-side bound hnswlib itself has) and insert sequentially
        — id order + hash levels make the graph reproducible."""
        rows = df.select(id_col, vec_col).orderBy(id_col).collect()
        if not rows:
            raise ValueError("cannot build an HNSW index over 0 vectors")
        dim = len(rows[0][vec_col])
        ix = cls(dim, m=m, ef_construction=ef_construction)
        ix.add(
            [int(r[id_col]) for r in rows],
            [[float(x) for x in r[vec_col]] for r in rows],
        )
        return ix


def _closure_members(
    S: "np.ndarray", margin: float, cap: int
) -> list[list[int]]:
    """THE closure rule, defined once: given a (n, k) cosine score
    matrix, each row's memberships are its best column plus any column
    within ``margin`` of the best, capped at ``cap``, ranked
    (score desc, column asc). NaN scores (zero-norm degenerates) sort
    above everything, mirroring Spark/DuckDB's total order. Build-time
    assignment (``ShardedHnsw.build``) and write-time routing
    (``_closure_cells``) both call this so replication and routing can
    never drift apart; ``functions.clustering.closure_assign`` encodes
    the same rule with bit-exact sequential folds for its SQL oracle."""
    S = np.where(np.isnan(S), np.inf, S)
    order = np.argsort(-S, axis=1, kind="stable")
    best = S[np.arange(len(S)), order[:, 0]]
    out: list[list[int]] = []
    for i in range(len(S)):
        cells = [int(order[i, 0])]
        for j in range(1, min(max(1, cap), S.shape[1])):
            c = int(order[i, j])
            if not (S[i, c] >= best[i] - margin):
                break  # scores only fall from here
            cells.append(c)
        out.append(cells)
    return out


def _farthest_first_seeds(
    df, k: int, id_col: str, vec_col: str, oversample: int = 8
) -> list[dict]:
    """Deterministic k-center seeding for the kmeans partitioner:
    md5-sample a ``k * oversample`` candidate pool (one bounded
    collect), then greedy farthest-first traversal by cosine distance.
    Plain md5-smallest seeding (``clustering.kmeans_init``) can land
    several seeds in one true cluster and Lloyd never escapes — with
    cosine assignment the duplicate seeds split that cluster while the
    rest of the space collapses into one mega-cell, which is exactly
    the shape that ruins routed-probe recall. Farthest-first spreads
    the seeds across the data's actual directions. Returns rows shaped
    like ``kmeans_init`` output (``cid``/``cv``)."""
    from pyspark.sql import functions as F

    from featureform_spark.functions.similarity import _as_double

    h = F.md5(F.col(id_col).cast("string"))
    pool = (
        df.select(
            F.col(id_col), _as_double(F.col(vec_col)).alias("_v"), h.alias("_h")
        )
        .orderBy("_h", id_col)
        .limit(max(1, int(k)) * max(1, int(oversample)))
        .collect()
    )
    ids = [int(r[id_col]) for r in pool]
    V = np.asarray([r["_v"] for r in pool], dtype=np.float64)
    Vn = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-30)
    chosen = [0]  # the smallest-md5 row anchors the traversal
    mind = 1.0 - Vn @ Vn[0]
    mind[0] = -np.inf  # chosen rows can never be re-picked (an
    # all-duplicate pool would otherwise argmax back to index 0)
    while len(chosen) < min(k, len(pool)):
        nxt = int(np.argmax(mind))  # ties -> lowest pool position
        chosen.append(nxt)
        mind = np.minimum(mind, 1.0 - Vn @ Vn[nxt])
        mind[nxt] = -np.inf
    return [{"cid": ids[i], "cv": [float(x) for x in V[i]]} for i in chosen]


class ShardedHnsw:
    """N independent HNSW graphs built executor-side, merged at query.

    The scale path: ``applyInPandas`` builds one graph per shard in
    parallel (no cross-shard edges, so no shuffle beyond the initial
    partitioning), the driver collects only the serialized shard
    blobs, and queries fan out to shards and merge by distance.

    Two partitioners:

    - ``"hash"`` — shard by ``xxhash64(id)``. Perfectly balanced, but
      a query's true neighbors scatter uniformly across shards, so
      routed probing (``probe_shards < N``) caps recall at roughly
      p/N: every shard must be probed for high recall.
    - ``"kmeans"`` — SPANN-style cluster closure (Chen et al. 2021,
      "SPANN: Highly-efficient Billion-scale Approximate Nearest
      Neighbor Search"): shards are k-means cells, and each vector is
      assigned to its best cell PLUS any cell whose cosine is within
      ``closure_margin`` of the best (capped at ``max_assign``
      replicas). Boundary vectors live in every shard they could be
      recalled from, so probing the ``probe_shards`` cells nearest the
      query keeps recall high — ~1x replication on clustered data
      (the margin rarely triggers), a bounded ~2-3x on adversarially
      unclustered data. Routing uses the stored build-time centroids
      with the same cosine rule as assignment.
    """

    def __init__(
        self,
        shards: list[HnswIndex],
        centroids: "np.ndarray | None" = None,
        closure_margin: float = 0.25,
        max_assign: int = 3,
    ):
        if not shards:
            raise ValueError("ShardedHnsw needs at least one shard")
        if centroids is not None and len(centroids) != len(shards):
            raise ValueError(
                f"{len(centroids)} routing centroids for "
                f"{len(shards)} shards"
            )
        self.shards = shards
        self.centroids = (
            None
            if centroids is None
            else np.asarray(centroids, dtype=np.float64)
        )
        self.closure_margin = float(closure_margin)
        self.max_assign = max(1, int(max_assign))
        self._lock = threading.Lock()

    @classmethod
    def build(
        cls,
        df,
        shards: int = 4,
        m: int = 16,
        ef_construction: int = 100,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        partitioner: str = "hash",
        closure_margin: float = 0.25,
        max_assign: int = 3,
        kmeans_iters: int = 2,
    ) -> "ShardedHnsw":
        import pandas as pd
        from pyspark.sql import functions as F

        dim_row = df.select(F.size(F.col(vec_col)).alias("d")).first()
        if dim_row is None:
            raise ValueError("cannot build an HNSW index over 0 vectors")
        dim = int(dim_row["d"])
        n_shards = max(1, int(shards))

        def build_shard(pdf):
            if len(pdf) == 0:
                return pd.DataFrame({"shard": [], "blob": []})
            ids = [int(x) for x in pdf[id_col]]
            vecs = [[float(v) for v in e] for e in pdf[vec_col]]
            # deterministic per-shard graph: insert in id order
            order = sorted(range(len(ids)), key=lambda i: ids[i])
            ix = HnswIndex(dim, m=m, ef_construction=ef_construction)
            ix.add([ids[i] for i in order], [vecs[i] for i in order])
            return pd.DataFrame(
                {
                    "shard": [int(pdf["_shard"].iloc[0])],
                    "blob": [pickle.dumps(ix.to_state(), protocol=4)],
                }
            )

        centroids = None
        if partitioner == "kmeans":
            # cluster-aware shards: Lloyd over the same distributed
            # primitives semantic_dedup uses (broadcast centroids, one
            # scan + one k-row groupBy per round), then SPANN closure
            # assignment executor-side — one mapInPandas pass emitting
            # (shard, id, vec) replicas, no self-join.
            from featureform_spark.functions.clustering import (
                _assign_vectorized,
                refine_centroids,
            )
            from featureform_spark.functions.similarity import _as_double

            cents_rows = _farthest_first_seeds(
                df, n_shards, id_col, vec_col
            )
            assigned = _assign_vectorized(df, cents_rows, id_col, vec_col)
            for _ in range(max(0, int(kmeans_iters))):
                cents_rows = refine_centroids(assigned, dim).collect()
                assigned = _assign_vectorized(df, cents_rows, id_col, vec_col)
            if not cents_rows:
                raise ValueError("cannot build an HNSW index over 0 vectors")
            # dense shard ids in sorted-cid order (Lloyd can drop
            # empty clusters: shard count = surviving centroids)
            cents_sorted = sorted(
                (int(r["cid"]), [float(x) for x in r["cv"]])
                for r in cents_rows
            )
            centroids = np.asarray(
                [cv for _, cv in cents_sorted], dtype=np.float64
            )
            n_shards = len(centroids)
            margin = float(closure_margin)
            cap = max(1, int(max_assign))
            cn = centroids / np.maximum(
                np.linalg.norm(centroids, axis=1, keepdims=True), 1e-30
            )

            def closure_assign(batches):
                for pdf in batches:
                    if len(pdf) == 0:
                        continue
                    V = np.vstack(
                        [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
                    )
                    Vn = V / np.maximum(
                        np.linalg.norm(V, axis=1, keepdims=True), 1e-30
                    )
                    S = Vn @ cn.T
                    out_shard: list[int] = []
                    out_pos: list[int] = []
                    for i, cells in enumerate(
                        _closure_members(S, margin, cap)
                    ):
                        out_shard.extend(cells)
                        out_pos.extend([i] * len(cells))
                    yield pd.DataFrame(
                        {
                            "_shard": pd.array(out_shard, dtype="int32"),
                            id_col: pdf[id_col].iloc[out_pos].to_numpy(),
                            vec_col: pdf[vec_col].iloc[out_pos].to_numpy(),
                        }
                    )

            id_type = df.schema[id_col].dataType.simpleString()
            sharded = df.select(
                F.col(id_col), _as_double(F.col(vec_col)).alias(vec_col)
            ).mapInPandas(
                closure_assign,
                schema=(
                    f"_shard int, {id_col} {id_type}, "
                    f"{vec_col} array<double>"
                ),
            )
        elif partitioner == "hash":
            sharded = df.select(
                F.col(id_col),
                F.col(vec_col),
                (F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_shards))).alias(
                    "_shard"
                ),
            )
        else:
            raise ValueError(f"unknown partitioner: {partitioner!r}")
        # one group per shard key (a plain repartition could fold two
        # shard keys into one task and build a merged graph)
        blobs = (
            sharded.groupBy("_shard")
            .applyInPandas(build_shard, schema="shard int, blob binary")
            .collect()
        )
        # applyInPandas only emits groups that exist — pad buckets
        # that happened to be empty with empty graphs so the caller
        # always gets exactly the shard count it asked for
        built = {
            int(r["shard"]): HnswIndex.from_state(pickle.loads(r["blob"]))
            for r in blobs
        }
        return cls(
            [
                built.get(i, HnswIndex(dim, m=m, ef_construction=ef_construction))
                for i in range(n_shards)
            ],
            centroids=centroids,
            closure_margin=closure_margin,
            max_assign=max_assign,
        )

    def _closure_cells(self, vec) -> list[int]:
        """SPANN closure assignment for one vector against the stored
        build-time centroids — same cosine rule and defaults as the
        build kernel."""
        q = np.asarray(vec, dtype=np.float64)
        qn = q / max(float(np.linalg.norm(q)), 1e-30)
        cn = self.centroids / np.maximum(
            np.linalg.norm(self.centroids, axis=1, keepdims=True), 1e-30
        )
        return _closure_members(
            (cn @ qn)[None, :], self.closure_margin, self.max_assign
        )[0]

    def add(self, new_ids, new_vectors) -> None:
        """Batched upsert: an id that already lives in shards is
        updated in EVERY shard holding it (closure assignment can
        replicate an id — all replicas must stay consistent); new ids
        route by closure assignment when the index is kmeans-sharded,
        else by md5 (dependency-free, deterministic — shard membership
        only affects which graphs hold the vector, not correctness).
        Vectors are bucketed per shard first so each shard sees ONE
        batched ``add`` (per-vector calls would re-copy the shard's
        arrays once per insert)."""
        with self._lock:
            n = len(self.shards)
            buckets: dict[int, tuple[list, list]] = {}
            for vid, vec in zip(new_ids, new_vectors):
                vid = int(vid)
                owners = [
                    i
                    for i, s in enumerate(self.shards)
                    if vid in s._pos_of
                ]
                if not owners:
                    if self.centroids is not None:
                        owners = self._closure_cells(vec)
                    else:
                        h = int.from_bytes(
                            hashlib.md5(f"shard:{vid}".encode()).digest()[:8],
                            "big",
                        )
                        owners = [h % n]
                for owner in owners:
                    ids, vecs = buckets.setdefault(owner, ([], []))
                    ids.append(vid)
                    vecs.append(vec)
            for owner, (ids, vecs) in buckets.items():
                self.shards[owner].add(ids, vecs)

    def query(
        self,
        vector,
        k: int = 10,
        ef: int = 64,
        probe_shards: int | None = None,
        allow=None,
        **_compat,
    ) -> list[tuple[int, float]]:
        """Fan out to every shard by default. ``probe_shards=p`` routes
        to only the ``p`` nearest shards: at fleet scale (hundreds of
        shards) full fan-out is the query bottleneck, and centroid
        routing is the IVF coarse-cell idea applied to graph shards.
        kmeans-sharded indexes route by cosine against the stored
        build-time centroids (the same rule closure assignment used,
        so boundary replicas sit exactly where routed probes look);
        hash-sharded indexes fall back to the live-vector centroid by
        squared L2 — an honest approximation whose recall caps near
        p/N on unclustered shards. Replicated ids are deduplicated at
        merge (min distance; distances of replicas are equal)."""
        targets = self.shards
        if probe_shards is not None and probe_shards < len(self.shards):
            p = max(1, int(probe_shards))
            q = np.asarray(vector, dtype=np.float64)
            if self.centroids is not None:
                qn = q / max(float(np.linalg.norm(q)), 1e-30)
                cn = self.centroids / np.maximum(
                    np.linalg.norm(self.centroids, axis=1, keepdims=True),
                    1e-30,
                )
                s = cn @ qn
                ranked = sorted((-float(s[i]), i) for i in range(len(s)))
            else:
                ranked = sorted(
                    (float(((c - q) ** 2).sum()), i)
                    for i, sh in enumerate(self.shards)
                    if (c := sh.centroid()) is not None
                )
            targets = [self.shards[i] for _, i in ranked[:p]]
        best: dict[int, float] = {}
        for sh in targets:
            for vid, d in sh.query(vector, k=k, ef=ef, allow=allow):
                if vid not in best or d < best[vid]:
                    best[vid] = d
        hits = sorted(best.items(), key=lambda t: (t[1], t[0]))
        return hits[:k]

    def get(self, vid: int) -> list[float] | None:
        for sh in self.shards:
            v = sh.get(vid)
            if v is not None:
                return v
        return None

    def save(self, dirpath: str) -> None:
        """One ``shard_<i>.npz`` per shard under ``dirpath`` (same
        pickle-free format as :meth:`HnswIndex.save`), plus a
        ``routing.npz`` with the kmeans centroids + closure params
        when cluster-sharded."""
        import os

        os.makedirs(dirpath, exist_ok=True)
        for i, sh in enumerate(self.shards):
            sh.save(os.path.join(dirpath, f"shard_{i}.npz"))
        if self.centroids is not None:
            np.savez_compressed(
                os.path.join(dirpath, "routing.npz"),
                centroids=self.centroids,
                closure=np.asarray(
                    [self.closure_margin, float(self.max_assign)]
                ),
            )

    @classmethod
    def load(cls, dirpath: str) -> "ShardedHnsw":
        import os
        import re as _re

        names = sorted(
            (
                n
                for n in os.listdir(dirpath)
                if _re.fullmatch(r"shard_\d+\.npz", n)
            ),
            key=lambda n: int(n[6:-4]),
        )
        kwargs: dict = {}
        routing = os.path.join(dirpath, "routing.npz")
        if os.path.exists(routing):
            with np.load(routing, allow_pickle=False) as z:
                kwargs["centroids"] = z["centroids"]
                if "closure" in z:
                    kwargs["closure_margin"] = float(z["closure"][0])
                    kwargs["max_assign"] = int(z["closure"][1])
        return cls(
            [HnswIndex.load(os.path.join(dirpath, n)) for n in names],
            **kwargs,
        )

    def __len__(self) -> int:
        """Unique live ids across shards (closure assignment can
        replicate an id into several shards; hash shards are disjoint
        so this equals the sum there)."""
        seen: set[int] = set()
        for s in self.shards:
            seen.update(s._pos_of.keys())
        return len(seen)
