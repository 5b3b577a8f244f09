"""Corpus-size-aware LSH parameter derivation (round-11 scale knob).

The LSH family (MinHash banding, hyperplane bucketing) was shipped with
fixed defaults (24 hashes / 8 bands, 8 planes) tuned for the test
corpora. Fixed bucket/band counts are a 100-TB trap: expected bucket
occupancy grows linearly with corpus size, so the in-bucket candidate
join — the only super-linear step in any of these pipelines — grows
quadratically in occupancy. The x100 scale stress measured the shape:
37-75x wall at 100x data, all from candidate-list growth, and proved
the knob (num_planes 8 -> 14 at x100: 41.9s -> 6.9s, recall 1.0).

These derivations size the knob from ONE cheap number — the corpus row
count — using the standard occupancy models:

* **Hyperplane LSH** (``auto_num_planes``): ``2^planes`` buckets over
  ``n`` vectors gives expected occupancy ``n / 2^planes``; hold it at
  ``target_bucket_rows`` => ``planes = ceil(log2(n / target))``.
* **MinHash banding** (``auto_minhash_params``): for an unrelated doc
  pair with baseline Jaccard ``j``, a band of ``r`` rows collides with
  probability ``j^r``, so each doc draws ``n * j^r`` false candidates
  per band; hold that at ``target_candidates_per_band`` =>
  ``r = ceil(ln(n / target) / ln(1 / j))``. Bands then come from the
  s-curve threshold ``t ~ (1/b)^(1/r)`` at the DESIGN similarity =>
  ``b = round(t^-r)`` (capped by ``max_hashes``), preserving the
  detection threshold while the false-candidate rate stays flat.

Floors reproduce the long-pinned defaults on every test corpus
(n <= 16k docs => 24 hashes / 8 bands; n <= 4k vectors => 8 planes), so
auto-sized callers are bit-identical to the pinned suite queries at
driver scale and only re-size where it matters. The oracle-paired
suite rows stay EXPLICITLY pinned regardless (sf-independence of the
oracle SQL); library callers get auto by default.

Cost model for the count itself: one ``count()`` over the input — for
a parquet-backed corpus that is a metadata fold, and every caller
accepts ``n_rows=`` to skip it when the size is already known (e.g. a
catalog row count or an upstream ``.count()``).
"""

from __future__ import annotations

import math

__all__ = [
    "auto_num_planes",
    "auto_minhash_params",
    "auto_kmeans_k",
    "estimate_baseline_jaccard",
]


def auto_num_planes(
    n_rows: int,
    target_bucket_rows: int = 16,
    min_planes: int = 8,
    max_planes: int = 20,
) -> int:
    """Hyperplane count holding expected bucket occupancy at
    ``target_bucket_rows``: ``ceil(log2(n / target))``, clamped.

    min_planes=8 reproduces the pinned default for every corpus under
    ``target * 2^8`` = 4,096 vectors; max_planes=20 caps the bucket
    space at ~1M (beyond that the bucket key itself stops paying for
    its shuffle width, and 2^20 buckets holds a trillion rows at the
    default target occupancy of 16... per shard — shard first)."""
    if n_rows <= 0:
        return min_planes
    if target_bucket_rows < 1:
        raise ValueError("target_bucket_rows must be >= 1")
    planes = math.ceil(math.log2(max(n_rows / target_bucket_rows, 1.0)))
    return max(min_planes, min(max_planes, planes))


def auto_kmeans_k(
    n_rows: int,
    target_cluster_rows: int = 64,
    min_k: int = 4,
    max_k: int = 65536,
) -> int:
    """Cluster count holding expected cluster size at
    ``target_cluster_rows`` — the SemDeDup knob: its pairwise stage
    costs Σ|cluster|² ≈ n · target, so a fixed k turns quadratic as
    the corpus grows (same failure mode as fixed LSH buckets).
    max_k=65536 bounds the broadcast centroid table (k × dim doubles
    — 33 MB at dim 64); past that, shard the corpus first."""
    if n_rows <= 0:
        return min_k
    if target_cluster_rows < 1:
        raise ValueError("target_cluster_rows must be >= 1")
    return max(min_k, min(max_k, -(-n_rows // target_cluster_rows)))


def estimate_baseline_jaccard(
    docs,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    sample_docs: int = 512,
    floor: float = 0.01,
    cap: float = 0.45,
) -> float:
    """Sample-estimated background Jaccard — replaces the pinned
    ``baseline_jaccard=0.05`` design constant with a measurement
    (r12, VERDICT r11 #3: the last heuristic constant in the scale
    story).

    Deterministic md5 sample: the ``sample_docs`` docs with the
    smallest ``md5(id)`` (stable across runs, engines, partitionings),
    collected driver-side (≤1k short rows), then EXACT pairwise
    word-shingle Jaccard over the sample — the same whitespace-token
    ``shingle_n``-gram sets :mod:`dedup` hashes, so the estimate is in
    the units the occupancy model ``n · j^r`` consumes.

    The statistic is the MEDIAN pairwise Jaccard: robust to the
    near-dup tail (a corpus with duplicate clusters has a few j≈1
    pairs; the false-candidate model wants the TYPICAL unrelated
    pair). Clamped to [``floor``, ``cap``]: all-disjoint samples
    estimate 0 — banding still needs a positive j (floor keeps r
    finite), and ``cap`` keeps the estimate below any sane design
    threshold. Cost: one LIMIT-k scan + ~k²/2 small set
    intersections on the driver (~1s at the 512 default)."""
    from pyspark.sql import functions as F

    if sample_docs < 2:
        raise ValueError("estimate_baseline_jaccard: sample_docs >= 2")
    rows = (
        docs.select(
            F.col(text_col).alias("_t"),
            F.md5(F.col(id_col).cast("string")).alias("_k"),
        )
        .where(F.col("_t").isNotNull())
        .orderBy("_k")
        .limit(sample_docs)
        .collect()
    )
    sets = []
    for r in rows:
        toks = [t for t in r["_t"].split(" ") if t]
        sets.append(
            frozenset(
                " ".join(toks[i : i + shingle_n])
                for i in range(len(toks) - shingle_n + 1)
            )
        )
    sets = [s for s in sets if s]
    if len(sets) < 2:
        return max(floor, min(0.05, cap))  # nothing to measure: pinned
    sims = []
    for i in range(len(sets)):
        a = sets[i]
        for j in range(i + 1, len(sets)):
            b = sets[j]
            inter = len(a & b)
            sims.append(inter / (len(a) + len(b) - inter))
    sims.sort()
    m = len(sims)
    med = (
        sims[m // 2]
        if m % 2
        else (sims[m // 2 - 1] + sims[m // 2]) / 2.0
    )
    return max(floor, min(med, cap))


def auto_minhash_params(
    n_rows: int,
    design_threshold: float = 0.5,
    target_candidates_per_band: int = 8,
    baseline_jaccard: float = 0.05,
    min_rows_per_band: int = 3,
    max_hashes: int = 96,
) -> tuple[int, int]:
    """(num_hashes, bands) holding the per-doc false-candidate rate
    flat while keeping the s-curve threshold at ``design_threshold``.

    Rows per band: ``r = ceil(ln(n / target) / ln(1 / j_baseline))``
    — the smallest r where an unrelated pair (baseline similarity j)
    draws at most ``target`` collisions per doc per band. Bands:
    ``b = round(design_threshold ** -r)`` so ``(1/b)^(1/r)`` stays at
    the design threshold, capped at ``max_hashes // r`` (a capped b
    raises the effective threshold slightly — stricter, never looser
    on false candidates).

    min_rows_per_band=3 with threshold 0.5 reproduces the pinned
    default (r=3, b=8, k=24) for every corpus under
    ``target / j^3`` = 64k docs; growth beyond is logarithmic
    (500k docs -> r=4, b=16, k=64)."""
    if not 0.0 < design_threshold < 1.0:
        raise ValueError("design_threshold must be in (0, 1)")
    if not 0.0 < baseline_jaccard < design_threshold:
        raise ValueError(
            "baseline_jaccard must be in (0, design_threshold)"
        )
    if n_rows <= 0:
        r = min_rows_per_band
    else:
        need = math.log(
            max(n_rows / target_candidates_per_band, 1.0)
        ) / math.log(1.0 / baseline_jaccard)
        r = max(min_rows_per_band, math.ceil(need))
    r = min(r, max_hashes // 2)  # keep at least 2 bands possible
    bands = round(design_threshold ** -r)
    bands = max(1, min(bands, max_hashes // r))
    return bands * r, bands
